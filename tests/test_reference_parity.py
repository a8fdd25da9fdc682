"""Numerical parity against the actual reference implementation.

Loads the PyTorch reference from /root/reference (read-only), builds each
model family with fixed weights, ports those weights into our functional
params, and asserts allclose on prefix scores / triple scores / ranking
metrics.  This is the BASELINE.md "per-layer activations allclose" target.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference repo not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from openkge.dataset import EntityRelationDatasetMeta as RefMeta  # noqa: E402
from openkge.model import Models as RefModels  # noqa: E402

from open_knowledge_graph_embeddings_tpu.data.dataset import DatasetMeta
from open_knowledge_graph_embeddings_tpu.models.model import build_model

E, R, TE, TR, L = 12, 6, 30, 20, 6


def _toy_token_maps(rng):
    ent_map = {}
    for i in range(E):
        n = int(rng.integers(1, L - 2))
        ent_map[i] = [2] + rng.integers(4, TE, n).tolist() + [3]
    ent_map[0] = [1]
    ent_map[1] = [1]
    rel_map = {}
    for i in range(R):
        n = int(rng.integers(1, L - 2))
        rel_map[i] = [2] + rng.integers(4, TR, n).tolist() + [3]
    rel_map[0] = [1]
    rel_map[1] = [1]
    return ent_map, rel_map


def _metas(rng):
    ent_map, rel_map = _toy_token_maps(rng)
    ref_meta = RefMeta(
        entity_id_count_map={i: 1 for i in range(E)},
        relation_id_count_map={i: 1 for i in range(R)},
        entity_token_id_count_map={i: 1 for i in range(TE)},
        relation_token_id_count_map={i: 1 for i in range(TR)},
        entity_id_to_tokens_map=tuple(ent_map[i] for i in range(E)),
        relation_id_to_tokens_map=tuple(rel_map[i] for i in range(R)),
        entities_size=E,
        relations_size=R,
        min_entities_size=2,
        min_relations_size=2,
        entity_tokens_size=TE,
        relation_tokens_size=TR,
        max_length=(L, L),
    )

    def mat(m, size, max_len):
        out = np.zeros((size, max_len), dtype=np.int32)
        for i in range(size):
            toks = m[i][-max_len:]
            out[i, : len(toks)] = toks
        return out

    our_meta = DatasetMeta(
        entities_size=E, relations_size=R, min_entities_size=2, min_relations_size=2,
        entity_tokens_size=TE, relation_tokens_size=TR, max_length=(L, L),
        entity_token_ids=mat(ent_map, E, L), relation_token_ids=mat(rel_map, R, L),
    )
    return ref_meta, our_meta


def _inputs(rng, B=5):
    subj = rng.integers(2, E, B)
    rel = rng.integers(2, R, B)
    obj = rng.integers(2, E, B)
    return subj, rel, obj


def _compare_prefix_scores(ref_model, our_model, variables, subj, rel, obj, atol=1e-5):
    ref_model.eval()
    B = len(subj)
    with torch.no_grad():
        ref_sp = ref_model.sp_prefix_score(
            torch.IntTensor(subj), torch.IntTensor(rel)
        ).numpy()
        ref_po = ref_model.po_prefix_score(
            torch.IntTensor(rel), torch.IntTensor(obj)
        ).numpy()

    cand_emb, _, _ = our_model.encode_candidates(variables, None, train=False)
    q_sp, _, _ = our_model.queries(
        variables, jnp.asarray(subj), jnp.asarray(rel), jnp.ones(B, bool), train=False
    )
    q_po, _, _ = our_model.queries(
        variables, jnp.asarray(obj), jnp.asarray(rel), jnp.zeros(B, bool), train=False
    )
    from open_knowledge_graph_embeddings_tpu.ops.scoring import score_against_candidates

    our_sp = np.asarray(score_against_candidates(q_sp, cand_emb))
    our_po = np.asarray(score_against_candidates(q_po, cand_emb))
    np.testing.assert_allclose(our_sp, ref_sp, rtol=1e-4, atol=atol, err_msg="sp scores")
    np.testing.assert_allclose(our_po, ref_po, rtol=1e-4, atol=atol, err_msg="po scores")


class TestLookupComplexParity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.LookupComplexRelationModel(
            entity_slot_size=d, train_data=ref_meta, init_std=0.1
        )
        our = build_model("LookupComplexRelationModel", our_meta, entity_slot_size=d)
        variables = our.init(jax.random.key(0))
        variables["params"]["entity_embedding"] = jnp.asarray(
            ref.entity_embedding.weight.detach().numpy()
        )
        variables["params"]["relation_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj)

        # triple scores
        with torch.no_grad():
            ref.eval()
            ref_t = ref(
                torch.IntTensor(subj), torch.IntTensor(rel), torch.IntTensor(obj)
            ).numpy().reshape(-1)
        our_t, _, _ = our.triple_score(
            variables, jnp.asarray(subj), jnp.asarray(rel), jnp.asarray(obj), train=False
        )
        np.testing.assert_allclose(np.asarray(our_t), ref_t, rtol=1e-4, atol=1e-5)


class TestLookupTucker3Parity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 6
        ref = RefModels.LookupTucker3RelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, init_std=0.1
        )
        our = build_model(
            "LookupTucker3RelationModel", our_meta, entity_slot_size=d, relation_slot_size=d
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_embedding"] = jnp.asarray(ref.relation_embedding.weight.detach().numpy())
        # reference relation_projection is Sequential(Linear); grab the Linear
        lin = ref.relation_projection.modules_list[0] if hasattr(
            ref.relation_projection, "modules_list"
        ) else list(ref.relation_projection.children())[0]
        p["relation_projection"]["w"] = jnp.asarray(lin.weight.detach().numpy())
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj, atol=1e-4)


class TestLSTMComplexParity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.LSTMComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, init_std=0.1
        )
        our = build_model(
            "LSTMComplexRelationModel", our_meta, entity_slot_size=d, relation_slot_size=d
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        for kind, lstm in (("entity", ref.entity_encoder_in), ("relation", ref.relation_encoder_in)):
            p[f"{kind}_lstm"] = {
                "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy()),
                "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy()),
                "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
                "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
            }
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj, atol=1e-4)


class TestUnigramParity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.UnigramPoolingComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, pool="sum"
        )
        # the reference's encode_subj/obj reference a never-assigned
        # self.entity_projection (latent bug, openkge/model.py:789);
        # set it so the reference can run
        ref.entity_projection = None
        our = build_model(
            "UnigramPoolingComplexRelationModel", our_meta,
            entity_slot_size=d, relation_slot_size=d, pool="sum",
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj)

    def test_mean_pool(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.UnigramPoolingComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, pool="mean"
        )
        ref.entity_projection = None
        our = build_model(
            "UnigramPoolingComplexRelationModel", our_meta,
            entity_slot_size=d, relation_slot_size=d, pool="mean",
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj)


class TestBigramParity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.BigramPoolingComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta
        )
        our = build_model(
            "BigramPoolingComplexRelationModel", our_meta,
            entity_slot_size=d, relation_slot_size=d,
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        for kind, enc in (("entity", ref.entity_encoder_in), ("relation", ref.relation_encoder_in)):
            conv = [m for m in enc.modules() if isinstance(m, torch.nn.Conv1d)][0]
            p[f"{kind}_conv"] = jnp.asarray(conv.weight.detach().numpy())
        subj, rel, obj = _inputs(rng)

        # The reference bigram embedder is missing the id->token mapping its
        # unigram/LSTM siblings have (latent bug: openkge/model.py:874-906
        # expects [B, L] token input but encode_subj passes [B] ids), so we
        # compare the composition math by feeding the reference its token
        # matrices directly.
        ref.eval()
        with torch.no_grad():
            ref_e = ref._encode(
                ref.entity_token_ids[torch.LongTensor(subj)].long(),
                ref.entity_embedding, ref.entity_encoder_in, None, 0.0,
            ).squeeze(1).numpy()
            ref_r = ref._encode(
                ref.relation_token_ids[torch.LongTensor(rel)].long(),
                ref.relation_embedding, ref.relation_encoder_in, None, 0.0,
            ).squeeze(1).numpy()
        our_e, _, _ = our.embedder.encode_entity(variables, jnp.asarray(subj), train=False)
        our_r, _, _ = our.embedder.encode_relation(variables, jnp.asarray(rel), train=False)
        np.testing.assert_allclose(np.asarray(our_e), ref_e, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(our_r), ref_r, rtol=1e-4, atol=1e-5)


class TestMetricsParity:
    def test_filtered_ranking_matches_reference(self, rng):
        """Random scores/filters/golds: reference compute_metrics vs ours."""
        from openkge.dataset import OneToNMentionRelationDataset as RefDS

        from open_knowledge_graph_embeddings_tpu.train.evaluate import (
            metric_sums_from_ranks,
            ranks_from_scores,
        )

        B, N = 6, 40
        scores = rng.standard_normal((B, N)).astype(np.float32)
        filter_mask = rng.random((B, N)) < 0.2
        label_ids = []  # per row: list of golds, each a list of mention cols
        g_rows, g_ments = [], []
        for b in range(B):
            n_golds = int(rng.integers(1, 4))
            row_golds = []
            for _ in range(n_golds):
                n_alt = int(rng.integers(1, 4))
                cols = rng.choice(N, n_alt, replace=False)
                filter_mask[b, cols] = True  # golds are always known-true
                row_golds.append(torch.IntTensor(cols))
                g_rows.append(b)
                g_ments.append(cols)
            label_ids.append(row_golds)

        ref_result = RefDS.compute_metrics(
            torch.BoolTensor(filter_mask), label_ids, torch.tensor(scores)
        )

        # ours
        fr, fc = np.nonzero(filter_mask)
        A = max(len(m) for m in g_ments)
        G = len(g_rows)
        gm = np.full((G, A), -1, np.int32)
        for i, m in enumerate(g_ments):
            gm[i, : len(m)] = m
        ranks, valid = ranks_from_scores(
            jnp.asarray(scores),
            jnp.asarray(fr.astype(np.int32)), jnp.asarray(fc.astype(np.int32)),
            jnp.asarray(np.asarray(g_rows, np.int32)), jnp.asarray(gm),
            None,
        )
        sums = metric_sums_from_ranks(ranks, valid)
        cnt = float(sums["count"])
        for m in ("mrr", "mr", "h1", "h3", "h10", "h50"):
            assert float(sums[m]) / cnt == pytest.approx(
                ref_result[m].avg, abs=1e-5
            ), f"metric {m}"

    def test_filtered_ranking_padded_and_col_valid(self, rng):
        """The sparse-correction formulation under batch-shared conditions:
        padding in filter/gold arrays (-1) and invalid candidate columns.
        Oracle: the reference's dense semantics (mask -> FILTER_VALUE,
        invalid cols -> -inf) computed in numpy."""
        from open_knowledge_graph_embeddings_tpu.train.evaluate import (
            FILTER_VALUE,
            ranks_from_scores,
        )

        B, N, N_real = 5, 48, 37
        scores = rng.standard_normal((B, N)).astype(np.float32)
        col_valid = np.zeros(N, bool)
        col_valid[:N_real] = True
        filter_mask = (rng.random((B, N)) < 0.25) & col_valid[None, :]
        g_rows, g_ments = [], []
        for b in range(B):
            for _ in range(int(rng.integers(1, 3))):
                cols = rng.choice(N_real, int(rng.integers(1, 3)), replace=False)
                filter_mask[b, cols] = True
                g_rows.append(b)
                g_ments.append(cols)

        # dense oracle
        filtered = np.where(filter_mask, FILTER_VALUE, scores)
        filtered = np.where(col_valid[None, :], filtered, -np.inf)
        want = []
        for r, m in zip(g_rows, g_ments):
            t = scores[r, m].max()
            want.append(int((filtered[r] > t).sum() + (filtered[r] == t).sum() // 2))

        fr, fc = np.nonzero(filter_mask)
        F = len(fr) + 7  # padded tail
        frp = np.full(F, -1, np.int32); frp[: len(fr)] = fr
        fcp = np.full(F, -1, np.int32); fcp[: len(fc)] = fc
        G, A = len(g_rows) + 3, max(len(m) for m in g_ments)
        grp = np.full(G, -1, np.int32)
        gmp = np.full((G, A), -1, np.int32)
        for i, (r, m) in enumerate(zip(g_rows, g_ments)):
            grp[i] = r
            gmp[i, : len(m)] = m
        ranks, valid = ranks_from_scores(
            jnp.asarray(scores), jnp.asarray(frp), jnp.asarray(fcp),
            jnp.asarray(grp), jnp.asarray(gmp), jnp.asarray(col_valid),
        )
        np.testing.assert_array_equal(np.asarray(valid), grp >= 0)
        np.testing.assert_array_equal(np.asarray(ranks)[: len(want)], want)

    def test_chunked_eval_matches_dense(self, rng):
        """eval_stats_chunked (the full-vocab chunked-scan formulation) ==
        dense ranks_from_scores + indexed BCE, including tie cells from
        DUPLICATE candidate embeddings, across chunk sizes that do and do
        not divide N."""
        from open_knowledge_graph_embeddings_tpu.train.evaluate import (
            eval_stats_chunked,
            ranks_from_scores,
        )
        from open_knowledge_graph_embeddings_tpu.train.loss import (
            bce_with_logits_sum_indexed,
            cell_mask,
        )

        B, N, N_real, d = 5, 100, 90, 16
        q = rng.standard_normal((B, d)).astype(np.float32)
        cand = rng.standard_normal((N, d)).astype(np.float32)
        # duplicate mention embeddings -> exact tie cells
        cand[7] = cand[3]
        cand[11] = cand[3]
        col_valid = np.zeros(N, bool)
        col_valid[:N_real] = True
        scores = q @ cand.T

        filter_mask = (rng.random((B, N)) < 0.2) & col_valid[None, :]
        g_rows, g_ments = [], []
        for b in range(B):
            for _ in range(int(rng.integers(1, 3))):
                cols = rng.choice(N_real, int(rng.integers(1, 3)), replace=False)
                filter_mask[b, cols] = True
                g_rows.append(b)
                g_ments.append(cols)
        # a gold whose mention set includes a duplicate-embedding column
        g_rows.append(2)
        g_ments.append(np.array([3]))
        filter_mask[2, 3] = True

        fr, fc = np.nonzero(filter_mask)
        F = len(fr) + 5
        frp = np.full(F, -1, np.int32); frp[: len(fr)] = fr
        fcp = np.full(F, -1, np.int32); fcp[: len(fc)] = fc
        G, A = len(g_rows) + 2, max(len(m) for m in g_ments)
        grp = np.full(G, -1, np.int32)
        gmp = np.full((G, A), -1, np.int32)
        for i, (r, m) in enumerate(zip(g_rows, g_ments)):
            grp[i] = r
            gmp[i, : len(m)] = m
        P = 8
        pos_r = rng.integers(0, B, P).astype(np.int32)
        pos_c = rng.integers(0, N_real, P).astype(np.int32)
        # dedup positive pairs (the builder contract)
        pairs = sorted(set(zip(pos_r.tolist(), pos_c.tolist())))
        pos_rp = np.full(P, -1, np.int32); pos_cp = np.full(P, -1, np.int32)
        for i, (r, c) in enumerate(pairs):
            pos_rp[i], pos_cp[i] = r, c
        row_valid = np.ones(B, bool)

        ranks_d, valid_d = ranks_from_scores(
            jnp.asarray(scores), jnp.asarray(frp), jnp.asarray(fcp),
            jnp.asarray(grp), jnp.asarray(gmp), jnp.asarray(col_valid),
        )
        mask = cell_mask(jnp.asarray(row_valid), jnp.asarray(col_valid), N)
        loss_d = bce_with_logits_sum_indexed(
            jnp.asarray(scores), jnp.asarray(pos_rp), jnp.asarray(pos_cp),
            mask, jnp.float32(N_real), 0.0,
        )

        for chunk in (16, 32, 100, 33):  # divides / exceeds-row / equals / ragged
            loss_c, ranks_c, valid_c = eval_stats_chunked(
                jnp.asarray(q), jnp.asarray(cand),
                jnp.asarray(pos_rp), jnp.asarray(pos_cp),
                jnp.asarray(row_valid), jnp.asarray(col_valid), jnp.float32(N_real),
                jnp.asarray(frp), jnp.asarray(fcp),
                jnp.asarray(grp), jnp.asarray(gmp),
                0.0, chunk=chunk,
            )
            np.testing.assert_array_equal(np.asarray(valid_c), np.asarray(valid_d))
            v = np.asarray(valid_d)
            np.testing.assert_array_equal(
                np.asarray(ranks_c)[v], np.asarray(ranks_d)[v], err_msg=f"chunk={chunk}"
            )
            assert float(loss_c) == pytest.approx(float(loss_d), rel=1e-5), chunk

        # --- KL objective: online-logsumexp accumulation == dense
        # KLDivLoss(sum) over log_softmax rows (reference:
        # openkge/trainer.py:99-111); ranks are loss-independent
        from open_knowledge_graph_embeddings_tpu.train.loss import (
            dense_labels,
            kl_div_sum,
        )

        labels = dense_labels(jnp.asarray(pos_rp), jnp.asarray(pos_cp), B, N)
        loss_kl_d = kl_div_sum(jnp.asarray(scores), labels, mask)
        for chunk in (16, 100, 33):
            loss_kl_c, ranks_c, valid_c = eval_stats_chunked(
                jnp.asarray(q), jnp.asarray(cand),
                jnp.asarray(pos_rp), jnp.asarray(pos_cp),
                jnp.asarray(row_valid), jnp.asarray(col_valid), jnp.float32(N_real),
                jnp.asarray(frp), jnp.asarray(fcp),
                jnp.asarray(grp), jnp.asarray(gmp),
                0.0, chunk=chunk, loss_type="kl",
            )
            assert float(loss_kl_c) == pytest.approx(
                float(loss_kl_d), rel=1e-5
            ), f"kl chunk={chunk}"
            v = np.asarray(valid_d)
            np.testing.assert_array_equal(
                np.asarray(ranks_c)[v], np.asarray(ranks_d)[v],
                err_msg=f"kl chunk={chunk}",
            )

        # --- filtered top-k: per-chunk top-k + merge == dense lax.top_k
        # over the filtered matrix, including FILTER_VALUE cells and ties
        from open_knowledge_graph_embeddings_tpu.train.evaluate import (
            filtered_topk,
            filtered_topk_chunked,
        )

        k = 7
        ts_d, tc_d = filtered_topk(
            jnp.asarray(scores), jnp.asarray(frp), jnp.asarray(fcp),
            jnp.asarray(col_valid), k,
        )
        for chunk in (16, 100, 33):
            ts_c, tc_c = filtered_topk_chunked(
                jnp.asarray(q), jnp.asarray(cand),
                jnp.asarray(frp), jnp.asarray(fcp), jnp.asarray(col_valid),
                k, chunk=chunk,
            )
            np.testing.assert_allclose(
                np.asarray(ts_c), np.asarray(ts_d), rtol=1e-6, atol=1e-6,
                err_msg=f"topk chunk={chunk}",
            )
            np.testing.assert_array_equal(
                np.asarray(tc_c), np.asarray(tc_d), err_msg=f"topk chunk={chunk}"
            )


class TestLSTMTucker3Parity:
    def test_scores(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 4
        ref = RefModels.LSTMTucker3RelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, init_std=0.1
        )
        our = build_model(
            "LSTMTucker3RelationModel", our_meta, entity_slot_size=d, relation_slot_size=d
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        for kind, lstm in (("entity", ref.entity_encoder_in), ("relation", ref.relation_encoder_in)):
            p[f"{kind}_lstm"] = {
                "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy()),
                "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy()),
                "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
                "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
            }
        # projection head: Linear d->d^2 + BatchNorm1d (port both)
        lin = [m for m in ref.relation_projection.modules() if isinstance(m, torch.nn.Linear)][0]
        bn = [m for m in ref.relation_projection.modules() if isinstance(m, torch.nn.BatchNorm1d)][0]
        p["relation_projection"]["w"] = jnp.asarray(lin.weight.detach().numpy())
        p["relation_projection"]["bn"]["scale"] = jnp.asarray(bn.weight.detach().numpy())
        p["relation_projection"]["bn"]["bias"] = jnp.asarray(bn.bias.detach().numpy())
        variables["state"]["relation_projection_bn"]["mean"] = jnp.asarray(
            bn.running_mean.numpy()
        )
        variables["state"]["relation_projection_bn"]["var"] = jnp.asarray(bn.running_var.numpy())
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj, atol=1e-4)


class TestBigramGatedParity:
    def test_gated_encode(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.BigramPoolingComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, gates=True,
        )
        our = build_model(
            "BigramPoolingComplexRelationModel", our_meta,
            entity_slot_size=d, relation_slot_size=d, gates=True,
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        for kind, enc in (("entity", ref.entity_encoder_in), ("relation", ref.relation_encoder_in)):
            conv = [m for m in enc.modules() if isinstance(m, torch.nn.Conv1d)][0]
            p[f"{kind}_conv"] = jnp.asarray(conv.weight.detach().numpy())
        subj, rel, obj = _inputs(rng)
        ref.eval()
        with torch.no_grad():
            ref_e = ref._encode(
                ref.entity_token_ids[torch.LongTensor(subj)].long(),
                ref.entity_embedding, ref.entity_encoder_in, None, 0.0,
            ).squeeze(1).numpy()
        our_e, _, _ = our.embedder.encode_entity(variables, jnp.asarray(subj), train=False)
        np.testing.assert_allclose(np.asarray(our_e), ref_e, rtol=1e-4, atol=1e-5)


class TestUnigramMaxParity:
    def test_max_pool(self, rng):
        ref_meta, our_meta = _metas(rng)
        d = 8
        ref = RefModels.UnigramPoolingComplexRelationModel(
            entity_slot_size=d, relation_slot_size=d, train_data=ref_meta, pool="max"
        )
        ref.entity_projection = None
        our = build_model(
            "UnigramPoolingComplexRelationModel", our_meta,
            entity_slot_size=d, relation_slot_size=d, pool="max",
        )
        variables = our.init(jax.random.key(0))
        p = variables["params"]
        p["entity_token_embedding"] = jnp.asarray(ref.entity_embedding.weight.detach().numpy())
        p["relation_token_embedding"] = jnp.asarray(
            ref.relation_embedding.weight.detach().numpy()
        )
        subj, rel, obj = _inputs(rng)
        _compare_prefix_scores(ref, our, variables, subj, rel, obj)
