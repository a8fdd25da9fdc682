"""Benchmark: training throughput + roofline accounting on one TPU chip.

Default invocation (the driver contract) prints ONE JSON line for the
OLPBench flagship configuration (LSTM-ComplEx, d=512, batch 4096 prefix
rows, 4096 batch-shared candidates — reference config/acl2020-openlink/
wikiopenlink-thorough-complex-lstm.yaml)::

    {"metric": ..., "value": N, "unit": "items/s", "vs_baseline": R, ...}

``items/s`` is the positives-normalized throughput the reference logs per
step (reference: openkge/trainer.py:308).  ``vs_baseline`` compares against
a torch-CPU implementation of the reference's computation pattern (cached in
BENCH_BASELINE.json — the only executable baseline, since the reference
repo publishes no numbers; see BASELINE.md).  Extra keys report the roofline
position: step_ms, modeled TFLOPs, MFU vs the chip's bf16 peak.

``python bench.py --report`` additionally measures:

* per-segment breakdown (forward / forward+backward / optimizer-only),
* the row-sparse update path (model_config sparse: true),
* full-vocab 1-vs-N lookup training (the FB15k-237-style path),
* full-vocab evaluation throughput with the candidate cache,
* host batch-construction throughput vs device step time (is the input
  pipeline fast enough to feed the chip?).

Report output format: stdout still carries exactly the one driver-contract
JSON line; each report section is then written to **stderr as its own JSON
object** (a stream of objects, one per section — parse with a streaming
decoder or per-section, not one json.loads over the whole stream).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# OLPBench workload at the TRUE paper shape: 2.47M mentions, 200k/50k token
# vocabularies.  Tables are token-indexed, so the mention count only sizes
# the [E, 10] id matrix (~100 MB); the sparse update path keeps optimizer
# traffic O(touched rows).  Token-id matrices and batch id draws follow the
# synthetic-OLPBench generator's Zipf distributions
# (tools/make_synth_olpbench.py: mention lengths ~ zipf 1.6, token ids ~
# zipf 1.2, mention popularity ~ zipf 1.3, relations ~ zipf 1.1) — the
# realistic operating point; --report also covers the adversarial
# uniform-token case.
ENTITIES = 2_470_000
RELATIONS = 50_000
ENT_TOKENS = 200_000
REL_TOKENS = 50_000
D = 512
BATCH = 4096
CANDS = 4096
MAX_LEN = 10
WARMUP = 3
ITERS = 20
SEGMENTS = 3

#: (bf16 peak TFLOP/s, HBM GB/s) per chip generation
CHIP_PEAKS = {
    "v4": (275.0, 1228.0),
    "v5 lite": (197.0, 819.0),
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v6 lite": (918.0, 1640.0),
    "v6e": (918.0, 1640.0),
}


def chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in kind:
            return kind, peaks
    return kind, (None, None)


def flagship_flops_per_step(ent_tokens: Optional[int] = None, rel_tokens: Optional[int] = None) -> float:
    """Modeled FLOPs of one flagship train step (fwd + bwd ~ 3x fwd).

    LSTM: 16*d^2 FLOPs/token (4 gates x two d*d matmuls, mul+add) over the
    EXECUTED (non-pad) token counts — the length-sorted fused kernels skip
    pad steps, so counting MAX_LEN positions would overstate useful work.
    Scoring is one [B,d]x[d,N] matmul (2*B*N*d).  Pass the batch's actual
    token counts; defaults assume full-length sequences (the padded upper
    bound, reported separately as mfu_padded)."""
    ent_tokens = (BATCH + CANDS) * MAX_LEN if ent_tokens is None else ent_tokens
    rel_tokens = BATCH * MAX_LEN if rel_tokens is None else rel_tokens
    lstm = (ent_tokens + rel_tokens) * 16 * D * D
    score = 2 * BATCH * CANDS * D
    forward = lstm + score
    return 3.0 * forward  # backward of matmul-dominated graphs ~ 2x forward


def zipf_tok_matrix(rng, n, vocab, max_len=MAX_LEN, len_s=1.6, tok_s=1.2):
    """Token-id matrix with the synthetic-OLPBench generator's Zipf length
    and token-frequency distributions (tools/make_synth_olpbench.py)."""
    lens = 1 + (rng.zipf(len_s, size=n) - 1) % (max_len - 2)
    body = (4 + ((rng.zipf(tok_s, size=(n, max_len)) - 1) % (vocab - 4))).astype(np.int32)
    pos = np.arange(max_len)[None, :]
    m = np.where(pos == 0, 2, body)  # BOS
    m = np.where(pos == lens[:, None] + 1, 3, m)  # EOS
    m = np.where(pos > lens[:, None] + 1, 0, m)  # PAD tail
    m[:2] = 0
    m[:2, 0] = 1  # specials -> UNK token
    return m.astype(np.int32)


def uniform_tok_matrix(rng, n, vocab, max_len=MAX_LEN):
    """Adversarial variant: per-position uniform token ids (~every position
    a distinct table row), uniform lengths."""
    lens = rng.integers(1, max_len - 1, size=n)
    body = rng.integers(4, vocab, size=(n, max_len)).astype(np.int32)
    pos = np.arange(max_len)[None, :]
    m = np.where(pos == 0, 2, body)
    m = np.where(pos == lens[:, None] + 1, 3, m)
    m = np.where(pos > lens[:, None] + 1, 0, m)
    m[:2] = 0
    m[:2, 0] = 1
    return m.astype(np.int32)


def build_batch(rng, positives_per_row=1.07, zipf_ids=True):
    """Flagship batch.  ``zipf_ids`` draws prefix entities / candidates /
    relations with the generator's popularity skew; candidates are unique
    first-seen + uniform no-replacement top-up, the builder contract
    (data/batching.py:_build_batch_shared)."""
    P_real = int(BATCH * positives_per_row)
    P = 8192
    pos_rows = np.full(P, -1, np.int32)
    pos_cols = np.full(P, -1, np.int32)
    pos_rows[:P_real] = rng.integers(0, BATCH, P_real)
    pos_cols[:P_real] = rng.integers(0, CANDS, P_real)
    if zipf_ids:
        ent = (2 + (rng.zipf(1.3, size=BATCH) - 1) % (ENTITIES - 2)).astype(np.int32)
        rel = (2 + (rng.zipf(1.1, size=BATCH) - 1) % (RELATIONS - 2)).astype(np.int32)
        pool = (2 + (rng.zipf(1.3, size=CANDS) - 1) % (ENTITIES - 2)).astype(np.int32)
        shared = pool[np.sort(np.unique(pool, return_index=True)[1])]
        neg = rng.choice(ENTITIES - 2, size=CANDS, replace=False).astype(np.int32) + 2
        neg = neg[~np.isin(neg, shared)]
        cand = np.concatenate([shared, neg])[:CANDS]
    else:
        ent = rng.integers(2, ENTITIES, BATCH).astype(np.int32)
        rel = rng.integers(2, RELATIONS, BATCH).astype(np.int32)
        cand = rng.integers(2, ENTITIES, CANDS).astype(np.int32)
    return {
        "ent_ids": ent,
        "rel_ids": rel,
        "is_sp": (np.arange(BATCH) % 2 == 0),
        "row_valid": np.ones(BATCH, bool),
        "candidate_ids": cand,
        "col_valid": np.ones(CANDS, bool),
        "pos_rows": pos_rows,
        "pos_cols": pos_cols,
        "normalizer_loss": np.float32(BATCH * CANDS),
        "n_real_cols": np.float32(CANDS),
    }, P_real


def _flagship_model(tok_dist: str = "zipf", sparse: bool = False):
    import jax

    from open_knowledge_graph_embeddings_tpu.data.dataset import DatasetMeta
    from open_knowledge_graph_embeddings_tpu.models.model import build_model

    rng = np.random.default_rng(7)
    mk = zipf_tok_matrix if tok_dist == "zipf" else uniform_tok_matrix
    meta = DatasetMeta(
        entities_size=ENTITIES, relations_size=RELATIONS,
        min_entities_size=2, min_relations_size=2,
        entity_tokens_size=ENT_TOKENS, relation_tokens_size=REL_TOKENS,
        max_length=(MAX_LEN, MAX_LEN),
        entity_token_ids=mk(rng, ENTITIES, ENT_TOKENS),
        relation_token_ids=mk(rng, RELATIONS, REL_TOKENS),
    )
    model = build_model(
        "LSTMComplexRelationModel", meta, entity_slot_size=D, relation_slot_size=D,
        dropout=0.1, normalize="batchnorm", init_std=0.1, sparse=sparse,
        dtype=os.environ.get("OKET_BENCH_DTYPE", "bfloat16"),
    )
    variables = model.init(jax.random.key(0))
    return meta, model, variables


def _regimes():
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes

    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2, "weight_decay": 1e-10})
    regimes.update(1, 0)
    return regimes


def _time_steps(
    step, variables, opt_state, hp, batch, iters=ITERS, warmup=WARMUP, segments=SEGMENTS
):
    """Time a (variables, opt_state, hp, batch, rng) -> ... step chain;
    returns (seconds/step, final stats).  A host fetch of the final loss is
    the only reliable fence over the axon tunnel.

    Runs ``segments`` independent timed segments of ``iters`` steps and
    reports the FASTEST segment's mean: device time is stable run-to-run
    (profiler: 10.32-10.39 ms on the flagship across rounds) while the
    axon-tunnel dispatch path adds external, bursty host noise (observed
    11.0-12.0 ms wall for the same program), so min-of-segments rejects
    tunnel noise without touching what the device executes."""
    import jax

    key = jax.random.key(1)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        variables, opt_state, stats = step(variables, opt_state, hp, batch, sub)
    float(stats["loss_sum"])
    best = float("inf")
    for _seg in range(segments):
        t0 = time.perf_counter()
        for _ in range(iters):
            key, sub = jax.random.split(key)
            variables, opt_state, stats = step(variables, opt_state, hp, batch, sub)
        float(stats["loss_sum"])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, stats


def bench_flagship(sparse: bool = False, tok_dist: str = "zipf", scan_steps: int = 0):
    """Returns (items_per_sec, step_seconds, info) — ``info`` carries the
    executed token counts (for honest MFU) and duplication stats.

    ``scan_steps`` > 1 times the shipped multi-step dispatch mode
    (train/step.make_scanned_step; flagship configs set train_scan_steps:
    32): K optimizer steps fold into one device program over a window of
    DISTINCT pre-staged batches, amortizing the fixed per-dispatch tunnel
    round trip that otherwise adds ~1.3 ms to every step here."""
    import jax
    import jax.numpy as jnp

    meta, model, variables = _flagship_model(tok_dist, sparse=sparse)
    regimes = _regimes()
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    rng = np.random.default_rng(0)
    raw, P_real = build_batch(rng, zipf_ids=tok_dist == "zipf")

    etoks = meta.entity_token_ids[np.concatenate([raw["candidate_ids"], raw["ent_ids"]])]
    rtoks = meta.relation_token_ids[raw["rel_ids"]]
    info = {
        # per-row token counts; overwritten below from the planned batch's
        # actual encode layout when query dedup shrinks it (sparse path) —
        # MFU must count the tokens the device EXECUTES, not the per-row
        # batch the step trains
        "ent_tokens_executed": int((etoks > 0).sum()),
        "rel_tokens_executed": int((rtoks > 0).sum()),
        "unique_entity_token_ratio": round(
            len(np.unique(etoks[etoks > 3])) / max(1, int((etoks > 3).sum())), 4
        ),
    }

    if sparse:
        from open_knowledge_graph_embeddings_tpu.data.batching import Batch
        from open_knowledge_graph_embeddings_tpu.train.sparse import (
            SparsePlanBuilder,
            make_sparse_train_step,
        )

        b = Batch(
            ent_ids=raw["ent_ids"], rel_ids=raw["rel_ids"], is_sp=raw["is_sp"],
            row_valid=raw["row_valid"], num_rows=BATCH,
            candidate_ids=raw["candidate_ids"], col_valid=raw["col_valid"],
            num_cols=CANDS, cand_offset=2,
            pos_rows=raw["pos_rows"], pos_cols=raw["pos_cols"],
            normalizer_loss=float(raw["normalizer_loss"]),
        )
        plan = SparsePlanBuilder(model.embedder, entity_sparse=True)
        planned = plan(b)
        info["sparse_tables"] = sorted(
            k.split("/")[1] for k in planned if k.endswith("/uids")
        )
        if "sparse/buffers/entity_token_ids" in planned:
            # query dedup shrinks the encode layout — count what the device
            # actually executes (the batch-local token matrices ARE the
            # encoder's input rows: unique queries + pad-fill + candidates)
            info["ent_tokens_executed"] = int(
                (planned["sparse/buffers/entity_token_ids"] > 0).sum()
            )
            info["rel_tokens_executed"] = int(
                (planned["sparse/buffers/relation_token_ids"] > 0).sum()
            )
            info["dedup_encode_rows"] = {
                "ent": int(len(planned["ent_ids"])),
                "rel": int(len(planned["rel_ids"])),
            }
        batch = {k: jnp.asarray(v) for k, v in planned.items()}
        step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
    else:
        from open_knowledge_graph_embeddings_tpu.train.step import make_train_step

        batch = {k: jnp.asarray(v) for k, v in raw.items()}
        step = make_train_step(model, regimes, variables["params"])

    if scan_steps > 1:
        from open_knowledge_graph_embeddings_tpu.train.step import make_scanned_step

        # window of DISTINCT batches: 4 independently drawn batches tiled to
        # K slots (every slot re-gathers fresh rows/candidates/tokens; no
        # step-to-step reuse for the device to exploit)
        raws = [raw] + [
            build_batch(np.random.default_rng(s), zipf_ids=tok_dist == "zipf")[0]
            for s in (1, 2, 3)
        ]
        if sparse:
            from open_knowledge_graph_embeddings_tpu.data.batching import Batch as _B
            from open_knowledge_graph_embeddings_tpu.train.sparse import (
                SparsePlanBuilder as _SPB,
            )

            pl = _SPB(model.embedder, entity_sparse=True)
            dicts = [
                {
                    k: np.asarray(v)
                    for k, v in pl(
                        _B(
                            ent_ids=r["ent_ids"], rel_ids=r["rel_ids"], is_sp=r["is_sp"],
                            row_valid=r["row_valid"], num_rows=BATCH,
                            candidate_ids=r["candidate_ids"], col_valid=r["col_valid"],
                            num_cols=CANDS, cand_offset=2,
                            pos_rows=r["pos_rows"], pos_cols=r["pos_cols"],
                            normalizer_loss=float(r["normalizer_loss"]),
                        )
                    ).items()
                }
                for r in raws
            ]
        else:
            dicts = [{k: np.asarray(v) for k, v in r.items()} for r in raws]
        sigs = {tuple(sorted(d)) for d in dicts}
        assert len(sigs) == 1, "window batches must share one signature"
        order = [i % len(dicts) for i in range(scan_steps)]
        window = {
            n: jnp.asarray(np.stack([dicts[i][n] for i in order])) for n in dicts[0]
        }
        keys = jnp.asarray(
            np.asarray(
                jax.random.key_data(jax.random.split(jax.random.key(1), scan_steps))
            )
        )
        scanned = make_scanned_step(step, scan_steps)
        v, o = variables, opt_state
        for _ in range(2):
            v, o, stats = scanned(v, o, hp, window, keys)
        float(stats["loss_sum"][-1])
        best = float("inf")
        wins_per_seg = max(2, ITERS // scan_steps + 1)
        for _seg in range(SEGMENTS):
            t0 = time.perf_counter()
            for _ in range(wins_per_seg):
                v, o, stats = scanned(v, o, hp, window, keys)
            float(stats["loss_sum"][-1])
            best = min(best, (time.perf_counter() - t0) / (wins_per_seg * scan_steps))
        info["scan_steps"] = scan_steps
        return P_real / best, best, info

    dt, _ = _time_steps(step, variables, opt_state, hp, batch)
    return P_real / dt, dt, info


def bench_torch_cpu_baseline() -> float:
    """Reference-pattern torch-CPU throughput (cached)."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["torch_cpu_items_per_sec"]

    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    B2 = BATCH // 2  # per direction
    ent_tok = torch.nn.Embedding(ENT_TOKENS, D)
    rel_tok = torch.nn.Embedding(REL_TOKENS, D)
    lstm_e = torch.nn.LSTM(D, D, batch_first=True)
    lstm_r = torch.nn.LSTM(D, D, batch_first=True)
    bce = torch.nn.BCEWithLogitsLoss(reduction="sum")
    opt = torch.optim.Adagrad(
        list(ent_tok.parameters()) + list(rel_tok.parameters())
        + list(lstm_e.parameters()) + list(lstm_r.parameters()),
        lr=0.2,
    )
    toks_e = torch.randint(4, ENT_TOKENS, (BATCH + CANDS, MAX_LEN))
    toks_r = torch.randint(4, REL_TOKENS, (BATCH, MAX_LEN))
    labels = torch.zeros(BATCH, CANDS)
    labels[torch.arange(BATCH), torch.randint(0, CANDS, (BATCH,))] = 1
    P_real = int(labels.sum())

    def step():
        opt.zero_grad()
        e_all, _ = lstm_e(ent_tok(toks_e))
        e_all = e_all[:, -1, :]
        r_all, _ = lstm_r(rel_tok(toks_r))
        r_all = r_all[:, -1, :]
        ents, cands = e_all[:BATCH], e_all[BATCH:]
        # reference 4-term ComplEx prefix scores, both directions
        s1, s2 = ents[:B2].chunk(2, 1)
        r1, r2 = r_all[:B2].chunk(2, 1)
        o1, o2 = cands.chunk(2, 1)
        sp = (s1 * r1).mm(o1.T) + (s2 * r1).mm(o2.T) + (s1 * r2).mm(o2.T) - (s2 * r2).mm(o1.T)
        q1, q2 = ents[B2:].chunk(2, 1)
        p1, p2 = r_all[B2:].chunk(2, 1)
        po = (q1 * p1).mm(o1.T) + (q2 * p1).mm(o2.T) + (q2 * p2).mm(o1.T) - (q1 * p2).mm(o2.T)
        out = torch.cat([po, sp])
        loss = bce(out.view(-1), labels.view(-1)) / (BATCH * CANDS)
        loss.backward()
        opt.step()

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    items = P_real * n / dt
    with open(cache, "w") as f:
        json.dump({"torch_cpu_items_per_sec": items, "note": "reference-pattern torch CPU"}, f)
    return items


# ------------------------------------------------------------ report mode


def bench_segments():
    """Forward-only / forward+backward / optimizer-only times (flagship).

    Segments are timed as separate jitted programs, so each carries its own
    dispatch/allocation overhead and the optimizer-only number lacks the
    buffer donation the real step has — the segments therefore sum to MORE
    than the fused step.  For exact in-step attribution use the profiler
    trace (RESULTS.md documents the per-op breakdown)."""
    import jax
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.train.loss import one_vs_n_loss

    meta, model, variables = _flagship_model()
    regimes = _regimes()
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    rng = np.random.default_rng(0)
    raw, _ = build_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    apply_updates = regimes.make_apply(variables["params"])

    def loss_fn(params, state, buffers, rngk):
        v = {"params": params, "state": state, "buffers": buffers}
        scores, new_state, reg = model.prefix_scores(
            v, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
            cand_ids=batch["candidate_ids"], train=True, rng=rngk,
        )
        loss_sum, _ = one_vs_n_loss(
            "bce", scores, batch["pos_rows"], batch["pos_cols"],
            batch["row_valid"], batch["col_valid"], batch["n_real_cols"], 0.0,
        )
        return (loss_sum + reg) / batch["normalizer_loss"]

    fwd = jax.jit(loss_fn)
    bwd = jax.jit(jax.grad(loss_fn))
    opt = jax.jit(lambda g, s, p, h: apply_updates(g, s, p, h))

    def timeit(fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters

    p, s, bufs = variables["params"], variables["state"], variables["buffers"]
    k = jax.random.key(1)
    t_fwd = timeit(fwd, p, s, bufs, k)
    t_bwd = timeit(bwd, p, s, bufs, k)
    grads = bwd(p, s, bufs, k)
    state0 = regimes.init_state(p)
    t_opt = timeit(lambda g: opt(g, state0, p, hp), grads, iters=5)
    return {"forward_ms": t_fwd * 1e3, "forward_backward_ms": t_bwd * 1e3,
            "optimizer_ms": t_opt * 1e3}


def bench_lookup_scaling():
    """Lookup-table training with row-sparse updates at two vocabulary
    scales: step time must NOT scale with the table height (the dense path
    does — its optimizer walks the whole table every step)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_meta
    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )
    from open_knowledge_graph_embeddings_tpu.train.step import make_train_step

    out = {}
    rng = np.random.default_rng(0)
    for label, E, sparse in (
        ("dense_500k", 500_000, False),
        ("sparse_500k", 500_000, True),
        ("sparse_2.47M", 2_470_000, True),
    ):
        meta = _synthetic_meta(E, RELATIONS, 64, 64, MAX_LEN)
        model = build_model(
            "LookupComplexRelationModel", meta, entity_slot_size=D, init_std=0.1,
            sparse=sparse, dtype=os.environ.get("OKET_BENCH_DTYPE", "bfloat16"),
        )
        variables = model.init(jax.random.key(0))
        regimes = _regimes()
        opt_state = regimes.init_state(variables["params"])
        hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
        raw, P_real = build_batch(rng)
        raw = dict(raw, ent_ids=rng.integers(2, E, BATCH).astype(np.int32),
                   candidate_ids=rng.integers(2, E, CANDS).astype(np.int32))
        b = Batch(
            ent_ids=raw["ent_ids"], rel_ids=raw["rel_ids"], is_sp=raw["is_sp"],
            row_valid=raw["row_valid"], num_rows=BATCH,
            candidate_ids=raw["candidate_ids"], col_valid=raw["col_valid"],
            num_cols=CANDS, cand_offset=2,
            pos_rows=raw["pos_rows"], pos_cols=raw["pos_cols"],
            normalizer_loss=float(raw["normalizer_loss"]),
        )
        if sparse:
            plan = SparsePlanBuilder(model.embedder, entity_sparse=True)
            batch = {k: jnp.asarray(v) for k, v in plan(b).items()}
            step = make_sparse_train_step(
                model, regimes, variables["params"], entity_sparse=True
            )
        else:
            batch = {k: jnp.asarray(v) for k, v in raw.items()}
            step = make_train_step(model, regimes, variables["params"])
        dt, _ = _time_steps(step, variables, opt_state, hp, batch, iters=10)
        out[label] = {"step_ms": round(dt * 1e3, 2), "items_per_sec": round(P_real / dt, 1)}
    return out


def bench_full_vocab_train():
    """Full-vocab 1-vs-N lookup training (FB15k-237-style path, scaled)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_meta
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.step import make_train_step

    E, d, B = 100_000, 256, 512
    meta = _synthetic_meta(E, 512, 256, 128, MAX_LEN)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=d,
                        input_dropout=0.4, init_std=0.1,
                        dtype=os.environ.get("OKET_BENCH_DTYPE", "bfloat16"))
    variables = model.init(jax.random.key(0))
    regimes = _regimes()
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    rng = np.random.default_rng(0)
    N = E - 2
    P_real = int(B * 1.07)
    pos_rows = np.full(1024, -1, np.int32)
    pos_cols = np.full(1024, -1, np.int32)
    pos_rows[:P_real] = rng.integers(0, B, P_real)
    pos_cols[:P_real] = rng.integers(0, N, P_real)
    batch = {
        "ent_ids": jnp.asarray(rng.integers(2, E, B).astype(np.int32)),
        "rel_ids": jnp.asarray(rng.integers(2, 512, B).astype(np.int32)),
        "is_sp": jnp.asarray(np.arange(B) % 2 == 0),
        "row_valid": jnp.ones(B, bool),
        "pos_rows": jnp.asarray(pos_rows),
        "pos_cols": jnp.asarray(pos_cols),
        "normalizer_loss": jnp.float32(B * N),
        "n_real_cols": jnp.float32(N),
    }
    step = make_train_step(model, regimes, variables["params"])
    dt, _ = _time_steps(step, variables, opt_state, hp, batch, iters=10)
    flops = 3 * 2 * B * N * d
    return {"items_per_sec": P_real / dt, "step_ms": dt * 1e3,
            "modeled_tflops": flops / 1e12, "E": E, "B": B, "d": d}


def bench_full_vocab_eval():
    """Full-vocab filtered-ranking eval with the candidate cache (test-set
    protocol: all entities as candidates).  B=32 is the reference protocol
    batch; the larger device blocks (eval_block_rows config) amortize the
    ~2.5 GB candidate-cache HBM sweep over more prefixes — per-prefix
    metrics are batch-size-invariant so the protocol accounting is
    unchanged (asserted in tests/test_train_e2e.py)."""
    import jax
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.train.step import make_eval_step

    meta, model, variables = _flagship_model()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    cache = model.encode_all_entities(variables)
    cache.block_until_ready()
    t_cache = time.perf_counter() - t0
    cand_emb = cache[meta.min_entities_size:]
    N = ENTITIES - meta.min_entities_size
    eval_step = make_eval_step(model)
    out = {"cache_precompute_s": t_cache}
    for B in (32, 128, 256):
        G = 2 * B
        batch = {
            "ent_ids": jnp.asarray(rng.integers(2, ENTITIES, B).astype(np.int32)),
            "rel_ids": jnp.asarray(rng.integers(2, RELATIONS, B).astype(np.int32)),
            "is_sp": jnp.asarray(np.arange(B) % 2 == 0),
            "row_valid": jnp.ones(B, bool),
            "pos_rows": jnp.asarray(rng.integers(0, B, 2 * B).astype(np.int32)),
            "pos_cols": jnp.asarray(rng.integers(0, N, 2 * B).astype(np.int32)),
            "normalizer_loss": jnp.float32(B * N),
            "n_real_cols": jnp.float32(N),
            "filter_rows": jnp.asarray(rng.integers(0, B, 8 * B).astype(np.int32)),
            "filter_cols": jnp.asarray(rng.integers(0, N, 8 * B).astype(np.int32)),
            "gold_rows": jnp.asarray(rng.integers(0, B, G).astype(np.int32)),
            "gold_mention_cols": jnp.asarray(rng.integers(0, N, (G, 2)).astype(np.int32)),
        }
        packed = eval_step(variables, batch, cand_emb)
        np.asarray(packed)
        iters = 10
        t0 = time.perf_counter()
        outs = [eval_step(variables, batch, cand_emb) for _ in range(iters)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        out[f"B{B}_prefixes_per_sec"] = round(B / dt, 1)
        out[f"B{B}_batch_ms"] = round(dt * 1e3, 2)
        if B == 256:
            # KL objective through the same chunk-scan formulation (round-5:
            # online-logsumexp pass A; reference KL eval protocol,
            # openkge/trainer.py:99-111)
            kl_step = make_eval_step(model, loss_type="kl")
            packed = kl_step(variables, batch, cand_emb)
            np.asarray(packed)
            t0 = time.perf_counter()
            outs = [kl_step(variables, batch, cand_emb) for _ in range(iters)]
            np.asarray(outs[-1])
            dt = (time.perf_counter() - t0) / iters
            out["B256_kl_prefixes_per_sec"] = round(B / dt, 1)
            out["B256_kl_batch_ms"] = round(dt * 1e3, 2)
    out["score_tflops_per_batch32"] = 2 * 32 * N * D / 1e12
    return out


def bench_token_grad_paths():
    """Isolated cost of the demb -> union-row gradient at flagship shapes:
    XLA scatter-add vs the gather-sum slot plan (the round-4 change)."""
    import jax
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.models.embedders import token_gather_tm
    from open_knowledge_graph_embeddings_tpu.train.sparse import build_token_grad_plan

    rng = np.random.default_rng(0)
    R, L, U = BATCH + CANDS, MAX_LEN, 8192  # entity-side flagship shape
    lens = 1 + (rng.zipf(1.6, R) - 1) % (L - 1)
    toks = np.zeros((R, L), np.int32)
    for r in range(R):
        toks[r, : lens[r]] = rng.zipf(1.2, lens[r]) % (U - 192) + 1
    plan_np = build_token_grad_plan(toks, U)
    plan = {k: jnp.asarray(v) for k, v in plan_np.items()}
    order = np.argsort(L - (toks > 0).sum(1), kind="stable")
    toks_tm = jnp.asarray(toks[order].T)
    table = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((L, R, D)).astype(np.float32).astype(jnp.bfloat16)
    )

    def grad_with(p):
        def loss(tbl):
            emb = token_gather_tm(tbl, toks_tm, jnp.bfloat16, time_major=True, grad_plan=p)
            return jnp.sum(emb.astype(jnp.float32) * ct.astype(jnp.float32))

        return jax.jit(jax.grad(loss))

    out = {}
    for name, p in (("scatter", None), ("gather_sum_plan", plan)):
        f = grad_with(p)
        g = f(table)
        float(g.ravel()[0])  # fence
        t0 = time.perf_counter()
        for _ in range(20):
            g = f(table)
        float(g.ravel()[0])
        out[f"{name}_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
    out["positions"] = int((toks > 0).sum())
    out["slots"] = int(plan_np["valid"].any(axis=1).sum())
    return out


def _synth_dataset_dir():
    """A cached on-disk synthetic OLPBench (tools/make_synth_olpbench.py) so
    the host-collate bench exercises the REAL dataset + builder constructors
    (a hand-assembled BatchBuilder shim drifted from the constructor once —
    commit 4f8190e; never again)."""
    import subprocess

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_cache", "synth_olpbench"
    )
    marker = os.path.join(cache, "mapped_to_ids", "train.txt")
    if not os.path.exists(marker):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "make_synth_olpbench.py"),
             os.path.join(cache, "mapped_to_ids"),
             "--mentions", "300000", "--relations", "20000",
             "--triples", "1500000", "--eval-size", "5000"],
            check=True,
        )
    return os.path.join(cache, "mapped_to_ids")


def _host_builder():
    from open_knowledge_graph_embeddings_tpu.data import (
        BatchBuilder,
        OneToNMentionRelationDataset,
    )

    ds = OneToNMentionRelationDataset(
        dataset_dir=_synth_dataset_dir(), input_file="train.txt",
        is_training_data=True, batch_size=BATCH,
        use_batch_shared_entities=True, min_size_batch_labels=CANDS,
    )
    return BatchBuilder(ds, seed=0)


def bench_host_collate():
    """Host-side batch construction throughput on a real synthetic-OLPBench
    dataset vs the device step: is prefetch keeping the chip fed?"""
    builder = _host_builder()
    n = len(builder.rec)
    ids = np.arange(BATCH)
    builder.build(ids)  # warm caches
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        builder.build((ids + i * BATCH) % (n - BATCH))
    dt = (time.perf_counter() - t0) / iters
    return {"batches_per_sec": 1.0 / dt, "build_ms": dt * 1e3}


def bench_replicated_collate_headroom():
    """Where does replicated collate stop scaling?  Every host builds the
    FULL global batch (parallel/distributed.py contract) while its chips
    compute 1/D of the rows — so per-host device time shrinks with the
    data-parallel width D but the host build cost does not.  This section
    measures the device step at per-host row counts B/D (one real chip,
    collectives excluded — an optimistic device time, hence a CONSERVATIVE
    headroom estimate) against the real host build time, and reports the
    crossover."""
    import jax
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.train.step import make_train_step

    build_ms = bench_host_collate()["build_ms"]
    meta, model, variables = _flagship_model("zipf", sparse=False)
    # the train step donates its variables, so each width needs a fresh
    # device copy — keep the pristine pytree on the host and rehydrate
    variables_host = jax.device_get(variables)
    regimes = _regimes()
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    rng = np.random.default_rng(0)
    raw, _ = build_batch(rng)
    out = {"host_build_ms": round(build_ms, 2), "per_host_step_ms": {}}
    crossover = None
    for d_par in (1, 4, 8, 16, 32):
        rows = BATCH // d_par
        small = dict(raw)
        for k in ("ent_ids", "rel_ids", "is_sp", "row_valid"):
            small[k] = raw[k][:rows]
        keep = raw["pos_rows"] < rows
        pr = np.where(keep, raw["pos_rows"], -1)
        pc = np.where(keep, raw["pos_cols"], -1)
        small["pos_rows"], small["pos_cols"] = pr, pc
        small["normalizer_loss"] = np.float32(rows * CANDS)
        batch = {k: jnp.asarray(v) for k, v in small.items()}
        variables = jax.device_put(variables_host)
        opt_state = regimes.init_state(variables["params"])
        step = make_train_step(model, regimes, variables["params"])
        dt, _ = _time_steps(step, variables, opt_state, hp, batch, iters=10)
        out["per_host_step_ms"][f"D={d_par}"] = round(dt * 1e3, 2)
        if crossover is None and dt * 1e3 < build_ms:
            crossover = d_par
    out["collate_bound_at_data_parallel"] = crossover  # None = never in range
    return out


def main():
    report = "--report" in sys.argv
    # persistent XLA compile cache (same location the CLI uses,
    # cli/train.py): the flagship programs compile in minutes over the axon
    # tunnel on a cold run and in seconds from cache.  Steady-state step
    # timing is unaffected (timed loops run post-warmup), but set
    # OKET_BENCH_COMPILE_CACHE=0 to measure cold compiles.
    import jax

    if os.environ.get("OKET_BENCH_COMPILE_CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/oket_xla")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    kind, (peak_tflops, peak_bw) = chip_peaks()

    # headline: the shipped flagship configuration — sparse: true (the
    # per-batch gate picks row-sparse token-table updates at realistic
    # duplication, dense when a batch is too unique), realistic Zipf token
    # statistics, the TRUE OLPBench 2.47M-mention shape, 64-step scan
    # dispatch (train_scan_steps: 64 in the flagship configs; set
    # OKET_BENCH_SCAN=0/K to measure single-step or another window)
    scan = int(os.environ.get("OKET_BENCH_SCAN", "64") or 0)
    items, step_s, info = bench_flagship(sparse=True, scan_steps=scan)
    flops = flagship_flops_per_step(
        info["ent_tokens_executed"], info["rel_tokens_executed"]
    )
    flops_padded = flagship_flops_per_step()
    achieved_tflops = flops / step_s / 1e12
    out = {
        "metric": "OLPBench LSTM-ComplEx train items/sec (1 chip, 2.47M mentions, d=512, batch 4096, 4096 batch-shared candidates, Zipf token stats, sparse tables)",
        "value": round(items, 1),
        "unit": "items/s",
        "device": kind,
        "step_ms": round(step_s * 1e3, 2),
        "modeled_tflops_per_step": round(flops / 1e12, 3),
        "achieved_tflops": round(achieved_tflops, 1),
        **info,
    }
    if peak_tflops:
        # mfu counts EXECUTED (non-pad) LSTM tokens; mfu_padded is the
        # round-1/2 convention (all MAX_LEN positions modeled as work)
        out["mfu"] = round(achieved_tflops / peak_tflops, 3)
        out["mfu_padded"] = round(flops_padded / step_s / 1e12 / peak_tflops, 3)
    try:
        baseline = bench_torch_cpu_baseline()
        out["vs_baseline"] = round(items / baseline, 2)
    except Exception:
        out["vs_baseline"] = 1.0

    # the driver-contract line goes out first (flushed) so report sections
    # that crash or hit a timeout can't eat it
    print(json.dumps(out), flush=True)

    if report:
        # each section flushes as it completes so a partial run (timeout,
        # interrupt) still leaves every finished measurement on stderr
        def section(name, fn):
            print(json.dumps({name: fn()}, indent=2), file=sys.stderr, flush=True)

        section("flagship_sparse_zipf", lambda: out)

        def _dense():
            items_d, step_d, info_d = bench_flagship(sparse=False)
            return {"items_per_sec": round(items_d, 1),
                    "step_ms": round(step_d * 1e3, 2), **info_d}

        section("flagship_dense_zipf", _dense)

        def _uniform():
            # adversarial per-position-uniform tokens: the gate must keep
            # the dense update (sparse loses when ~every position is unique)
            res = {}
            for label, sp in (("dense", False), ("sparse_gated", True)):
                it, st, inf = bench_flagship(sparse=sp, tok_dist="uniform")
                res[label] = {"items_per_sec": round(it, 1),
                              "step_ms": round(st * 1e3, 2), **inf}
            return res

        section("flagship_uniform_tokens", _uniform)
        section("segments", lambda: {k: round(v, 2) for k, v in bench_segments().items()})
        section("lookup_scaling", bench_lookup_scaling)
        section("full_vocab_train", lambda: {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in bench_full_vocab_train().items()
        })
        section("full_vocab_eval", lambda: {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in bench_full_vocab_eval().items()
        })

        def _host():
            host = bench_host_collate()
            host["keeps_chip_fed"] = bool(1.0 / host["batches_per_sec"] < step_s)
            return {k: (round(v, 3) if isinstance(v, float) else v) for k, v in host.items()}

        section("token_grad_paths", bench_token_grad_paths)
        section("host_collate", _host)
        section("replicated_collate_headroom", bench_replicated_collate_headroom)


if __name__ == "__main__":
    main()
