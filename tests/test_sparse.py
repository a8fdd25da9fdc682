"""Row-sparse training path: step-for-step equality with the dense path.

The sparse path (train/sparse.py) must produce exactly the same parameters
and loss as the dense step when weight_decay == 0 (and, for touched rows,
when weight_decay > 0 — lazy decay is the documented deviation for
untouched rows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_knowledge_graph_embeddings_tpu.data.batching import Batch
from open_knowledge_graph_embeddings_tpu.models.model import build_model
from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
from open_knowledge_graph_embeddings_tpu.train.sparse import (
    SparsePlanBuilder,
    make_sparse_train_step,
    sparse_table_names,
)
from open_knowledge_graph_embeddings_tpu.train.step import (
    make_train_step,
    train_batch_to_arrays,
)

from __graft_entry__ import _synthetic_meta


def _mk_batch(meta, rng, B=16, N=32, batch_shared=True):
    ent = rng.integers(2, meta.entities_size, B).astype(np.int32)
    rel = rng.integers(2, meta.relations_size, B).astype(np.int32)
    is_sp = (np.arange(B) % 2 == 0)
    if batch_shared:
        cand = rng.choice(
            np.arange(2, meta.entities_size, dtype=np.int32), N, replace=False
        )
        col_valid = np.ones(N, bool)
    else:
        cand, col_valid = None, None
        N = meta.entities_size - meta.min_entities_size
    P = 32
    pos_rows = np.full(P, -1, np.int32)
    pos_cols = np.full(P, -1, np.int32)
    pos_rows[:B] = np.arange(B)
    pos_cols[:B] = rng.integers(0, min(N, 16), B)
    return Batch(
        ent_ids=ent, rel_ids=rel, is_sp=is_sp, row_valid=np.ones(B, bool), num_rows=B,
        candidate_ids=cand, col_valid=col_valid, num_cols=N,
        cand_offset=meta.min_entities_size,
        pos_rows=pos_rows, pos_cols=pos_cols, normalizer_loss=float(B * N),
    )


def _run_steps(model, variables, batches, step, plan, n=3, hp_over=None):
    regimes = OptimizerRegimes(
        {"optimizer": "Adagrad", "lr": 0.2, "weight_decay": hp_over or 0.0}
    )
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    for i, b in enumerate(batches[:n]):
        variables, opt_state, stats = step(
            variables, opt_state, hp, plan(b), jax.random.key(100 + i)
        )
    return variables, float(stats["loss_sum"])


@pytest.mark.parametrize("model_name,batch_shared", [
    ("LookupComplexRelationModel", True),
    ("LookupComplexRelationModel", False),  # relation table only
    ("LSTMComplexRelationModel", True),
    ("UnigramPoolingComplexRelationModel", True),
])
@pytest.mark.parametrize("layout", ["compact", "block", "hybrid"])
def test_sparse_matches_dense(model_name, batch_shared, layout):
    rng = np.random.default_rng(0)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    cfg = dict(entity_slot_size=16, init_std=0.1, dropout=0.0)
    model = build_model(model_name, meta, **cfg)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)

    batches = [_mk_batch(meta, rng, batch_shared=batch_shared) for _ in range(3)]

    dense_step = make_train_step(model, regimes, variables["params"])
    v_dense, loss_dense = _run_steps(
        model, jax.tree_util.tree_map(jnp.copy, variables), batches,
        dense_step, train_batch_to_arrays,
    )

    plan = SparsePlanBuilder(model.embedder, entity_sparse=batch_shared,
                             min_rows_ratio=0.0, layout=layout)
    sparse_step = make_sparse_train_step(
        model, regimes, variables["params"], entity_sparse=batch_shared
    )
    v_sparse, loss_sparse = _run_steps(
        model, jax.tree_util.tree_map(jnp.copy, variables), batches, sparse_step, plan
    )

    assert abs(loss_dense - loss_sparse) < 1e-3 * max(1.0, abs(loss_dense))
    flat_d = jax.tree_util.tree_flatten_with_path(v_dense["params"])[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(v_sparse["params"])[0])
    for kp, leaf in flat_d:
        # atol floor: the sparse path's gather-sum token-table backward
        # (grad_plan) sums slot contributions in a different order than the
        # dense scatter — f32 rounding puts isolated elements at ~3e-6
        # after 3 Adagrad steps; a plan bug (missing/extra position) lands
        # at lr scale (~1e-2)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[kp]), rtol=2e-5, atol=5e-6,
            err_msg=str(kp),
        )


def test_host_length_sort_replicates_device_sort():
    """The gather-sum plan positions assume the host's counting sort equals
    the device's (ops/lstm.py length_sort_perm) — pin the replica."""
    from open_knowledge_graph_embeddings_tpu.ops.lstm import length_sort_perm
    from open_knowledge_graph_embeddings_tpu.train.sparse import host_length_sort_perm

    rng = np.random.default_rng(3)
    for trial in range(5):
        R, L = rng.integers(5, 60), int(rng.integers(2, 11))
        lens = rng.integers(0, L + 1, R)
        toks = np.zeros((R, L), np.int32)
        for r in range(R):
            toks[r, : lens[r]] = rng.integers(1, 99, lens[r])
        order_h = host_length_sort_perm(toks)
        order_d, _ = length_sort_perm(jnp.asarray((toks > 0).sum(1)), L)
        np.testing.assert_array_equal(order_h, np.asarray(order_d), err_msg=str(trial))


def test_token_grad_plan_matches_scatter():
    """build_token_grad_plan + the gather-sum VJP == the dense scatter VJP
    for random Zipf-duplicated token matrices (incl. all-pad rows and
    heavy-duplication tokens spanning multiple slots)."""
    from open_knowledge_graph_embeddings_tpu.models.embedders import token_gather_tm
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        build_token_grad_plan,
        host_length_sort_perm,
    )

    rng = np.random.default_rng(7)
    for trial in range(4):
        R, L, U, d = int(rng.integers(8, 50)), int(rng.integers(2, 9)), 23, 16
        lens = rng.integers(0, L + 1, R)
        toks = np.zeros((R, L), np.int32)
        for r in range(R):
            toks[r, : lens[r]] = rng.zipf(1.4, lens[r]) % (U - 1) + 1
        plan = {
            k: jnp.asarray(v)
            for k, v in build_token_grad_plan(toks, U, K=4, bucket_min=8).items()
        }
        table = jnp.asarray(rng.standard_normal((U, d)).astype(np.float32))
        toks_sorted = jnp.asarray(toks[host_length_sort_perm(toks)].T)  # [L, R]

        def loss(tbl, p):
            emb = token_gather_tm(tbl, toks_sorted, jnp.float32, time_major=True, grad_plan=p)
            return jnp.sum(jnp.sin(emb * 1.7) * emb)

        g_scatter = jax.grad(lambda t: loss(t, None))(table)
        g_plan = jax.grad(lambda t: loss(t, plan))(table)
        np.testing.assert_allclose(
            np.asarray(g_plan), np.asarray(g_scatter), rtol=1e-5, atol=1e-5,
            err_msg=str(trial),
        )


def test_native_plan_kernels_match_numpy():
    """The C plan kernels (native/oket_native.cpp) must agree with the
    numpy reference: unique/remap exactly; the grad plan in grouping
    semantics (the per-id position sets — within-run cell order is
    irrelevant to the slot sums)."""
    from open_knowledge_graph_embeddings_tpu.native.loader import (
        grad_plan_native,
        native_available,
        unique_remap_native,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for trial in range(4):
        R = int(rng.integers(4, 80))
        L = int(rng.integers(2, 11))
        V = int(rng.integers(40, 4000))
        lens = rng.integers(0, L + 1, R)
        toks = np.zeros((R, L), np.int32)
        for r in range(R):
            toks[r, : lens[r]] = rng.integers(1, V, lens[r])
        scratch = np.empty(V, np.int32)
        uids, remapped = unique_remap_native(toks, V, scratch)
        want = np.union1d(np.int32(0), toks)
        np.testing.assert_array_equal(uids, want, err_msg=str(trial))
        np.testing.assert_array_equal(
            remapped, np.searchsorted(want, toks).astype(np.int32), err_msg=str(trial)
        )

        U = len(uids)
        from open_knowledge_graph_embeddings_tpu.train.sparse import (
            build_token_grad_plan,
        )

        pn = build_token_grad_plan(remapped, U, K=4, bucket_min=8)
        pp = build_token_grad_plan(remapped, U, K=4, bucket_min=8, use_native=False)

        def groups(p):
            out = {}
            S, K = p["pos"].shape
            for s in range(S):
                for k in range(K):
                    if p["valid"][s, k]:
                        out.setdefault(int(p["uid"][s]), set()).add(int(p["pos"][s, k]))
            return out

        assert groups(pn) == groups(pp), trial
        assert int(pn["valid"].sum()) == int(pp["valid"].sum()), trial


def test_sparse_batches_carry_grad_plan_for_lstm():
    """The SparsePlanBuilder emits gather-sum plans for LSTM embedders (and
    only those), and the plan covers every non-pad position exactly once."""
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    rng = np.random.default_rng(0)
    batch = _mk_batch(meta, rng, batch_shared=True)

    lstm = build_model("LSTMComplexRelationModel", meta, entity_slot_size=16)
    plan_b = SparsePlanBuilder(lstm.embedder, entity_sparse=True, min_rows_ratio=0.0)
    d = plan_b(batch)
    assert "sparse/plan/entity_token/pos" in d
    assert "sparse/plan/relation_token/pos" in d
    # coverage: valid cells == non-pad positions, each position once
    toks = d["sparse/buffers/entity_token_ids"]
    n_nonpad = int((toks > 0).sum())
    pos = d["sparse/plan/entity_token/pos"]
    valid = d["sparse/plan/entity_token/valid"]
    assert int(valid.sum()) == n_nonpad
    assert len(np.unique(pos[valid])) == n_nonpad
    # uid rows are within the union layout or the out-of-range sentinel
    height = len(d["sparse/entity_token_embedding/uids"])
    uid = d["sparse/plan/entity_token/uid"]
    assert ((uid >= 0) & (uid <= height)).all()

    # non-LSTM token embedders keep the plain scatter path
    uni = build_model("UnigramPoolingComplexRelationModel", meta, entity_slot_size=16)
    d2 = SparsePlanBuilder(uni.embedder, entity_sparse=True, min_rows_ratio=0.0)(batch)
    assert not any(k.startswith("sparse/plan/") for k in d2)

    # grad_plan=False (data-sharded meshes) suppresses plans entirely
    d3 = SparsePlanBuilder(
        lstm.embedder, entity_sparse=True, min_rows_ratio=0.0, grad_plan=False
    )(batch)
    assert not any(k.startswith("sparse/plan/") for k in d3)


def test_sparse_lazy_weight_decay_touched_rows_match_dense():
    """With wd > 0 the touched rows must still match the dense update; only
    untouched rows deviate (lazy decay)."""
    rng = np.random.default_rng(1)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=16,
                        init_std=0.1, dropout=0.0)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2, "weight_decay": 0.01})
    regimes.update(1, 0)
    batch = _mk_batch(meta, rng)

    dense_step = make_train_step(model, regimes, variables["params"])
    v_d, _ = _run_steps(model, jax.tree_util.tree_map(jnp.copy, variables), [batch],
                        dense_step, train_batch_to_arrays, n=1, hp_over=0.01)
    plan = SparsePlanBuilder(model.embedder, entity_sparse=True, min_rows_ratio=0.0)
    sparse_step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
    v_s, _ = _run_steps(model, jax.tree_util.tree_map(jnp.copy, variables), [batch],
                        sparse_step, plan, n=1, hp_over=0.01)

    touched = np.unique(np.concatenate([batch.ent_ids, batch.candidate_ids]))
    d_tab = np.asarray(v_d["params"]["entity_embedding"])
    s_tab = np.asarray(v_s["params"]["entity_embedding"])
    np.testing.assert_allclose(d_tab[touched], s_tab[touched], rtol=2e-5, atol=2e-6)
    # untouched rows: dense decays them, sparse leaves them — they must differ
    untouched = np.setdiff1d(np.arange(meta.entities_size), touched)
    if len(untouched):
        assert not np.allclose(d_tab[untouched], s_tab[untouched])
        orig = np.asarray(variables["params"]["entity_embedding"])
        np.testing.assert_allclose(s_tab[untouched], orig[untouched])


def test_sparse_rejects_unsupported_optimizer():
    meta = _synthetic_meta(entities=32, relations=8, ent_tokens=24, rel_tokens=16, max_len=6)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=8)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adam", "lr": 1e-3})
    regimes.update(1, 0)
    with pytest.raises(ValueError, match="sparse"):
        make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)


def test_sparse_table_names_full_vocab_excludes_entity_tables():
    meta = _synthetic_meta(entities=32, relations=8, ent_tokens=24, rel_tokens=16, max_len=6)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=8)
    assert sparse_table_names(model.embedder, entity_sparse=False) == ("relation_embedding",)
    assert sparse_table_names(model.embedder, entity_sparse=True) == (
        "entity_embedding", "relation_embedding",
    )


def test_sparse_cli_trains_and_learns(toy_dataset_dir, tmp_path):
    from tests.test_trainer import _toy_args
    from open_knowledge_graph_embeddings_tpu.cli.train import main

    args = _toy_args(
        toy_dataset_dir, tmp_path, epochs=10, sparse_min_ratio=0.0,
        model_config={"entity_slot_size": 8, "init_std": 0.1, "sparse": True},
        train_data_config={"input_file": "train.txt", "batch_size": 4,
                           "use_batch_shared_entities": True, "min_size_batch_labels": 6},
    )
    trainer = main(args)
    assert trainer.sparse, "sparse path should be active"
    rows = trainer.results.to_dicts()
    losses = [r["training_loss"] for r in rows if "training_loss" in r]
    assert losses[-1] < losses[0], "sparse path must learn"


def test_small_tables_fall_back_to_dense_plan():
    """With the default min_rows_ratio, tiny tables get no sparse plan and
    the step updates them densely (same result, no layout overhead)."""
    rng = np.random.default_rng(2)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=16, init_std=0.1)
    plan = SparsePlanBuilder(model.embedder, entity_sparse=True, min_rows_ratio=1e9)
    batch = _mk_batch(meta, rng)
    d = plan(batch)
    assert not any(k.startswith("sparse/") for k in d)
    # the sparse step still trains correctly (all-dense split at trace time)
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)
    variables = model.init(jax.random.key(0))
    step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
    v, loss = _run_steps(model, variables, [batch], step, plan, n=1)
    assert np.isfinite(loss)


@pytest.mark.parametrize("model_name,batch_shared", [
    ("LookupComplexRelationModel", True),
    ("LSTMComplexRelationModel", True),
    ("LookupComplexRelationModel", False),  # relation table only
])
@pytest.mark.parametrize("layout", ["compact", "block", "hybrid"])
def test_sparse_accumulation_matches_dense_accumulation(model_name, batch_shared, layout):
    """Sparse updates composed with gradient accumulation (union-row
    windows, sparse.make_sparse_accum_steps) == the dense accumulation path
    (step.make_accum_steps), two windows of two micro-batches each.
    Reference analog: torch sparse grads accumulate across backward calls
    and coalesce at optimizer.step (openkge/trainer.py:229-246)."""
    from open_knowledge_graph_embeddings_tpu.train.sparse import make_sparse_accum_steps
    from open_knowledge_graph_embeddings_tpu.train.step import make_accum_steps

    rng = np.random.default_rng(3)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    model = build_model(model_name, meta, entity_slot_size=16, init_std=0.1, dropout=0.0)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    batches = [_mk_batch(meta, rng, batch_shared=batch_shared) for _ in range(4)]
    keys = [jax.random.key(50 + i) for i in range(4)]

    # dense accumulation: 2 windows of 2 micro-batches
    zero_d, gstep_d, astep_d = make_accum_steps(model, regimes, variables["params"])
    v = jax.tree_util.tree_map(jnp.copy, variables)
    opt = regimes.init_state(variables["params"])
    for w in range(2):
        acc = zero_d()
        for j in range(2):
            v, acc, _ = gstep_d(v, acc, train_batch_to_arrays(batches[2 * w + j]), keys[2 * w + j])
        v, opt = astep_d(v, opt, acc, hp)
    v_dense = v

    # sparse accumulation over the same windows
    plan = SparsePlanBuilder(model.embedder, entity_sparse=batch_shared,
                             min_rows_ratio=0.0, layout=layout)
    zero_s, gstep_s, astep_s = make_sparse_accum_steps(
        model, regimes, variables["params"], entity_sparse=batch_shared
    )
    v = jax.tree_util.tree_map(jnp.copy, variables)
    opt = regimes.init_state(variables["params"])
    for w in range(2):
        window = plan.plan_window(batches[2 * w : 2 * w + 2])
        # the union plan is shared across the window's micro-batches
        for t in ("entity_embedding", "relation_embedding",
                  "entity_token_embedding", "relation_token_embedding"):
            k = f"sparse/{t}/uids"
            if k in window[0]:
                assert window[0][k] is window[1][k]
        acc = zero_s(window[0])
        for j in range(2):
            v, acc, _ = gstep_s(v, acc, window[j], keys[2 * w + j])
        v, opt = astep_s(v, opt, acc, window[1], hp)
    v_sparse = v

    flat_d = jax.tree_util.tree_flatten_with_path(v_dense["params"])[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(v_sparse["params"])[0])
    for kp, leaf in flat_d:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[kp]), rtol=2e-5, atol=2e-6,
            err_msg=str(kp),
        )


def test_sparse_cli_with_accumulation_learns(toy_dataset_dir, tmp_path):
    """sparse: true + batch_size_for_backward > batch_size trains through
    the union-row window path (no dense fallback, the old warning is gone)."""
    from tests.test_trainer import _toy_args
    from open_knowledge_graph_embeddings_tpu.cli.train import main

    args = _toy_args(
        toy_dataset_dir, tmp_path, epochs=10, sparse_min_ratio=0.0,
        batch_size_for_backward=4,
        model_config={"entity_slot_size": 8, "init_std": 0.1, "sparse": True},
        train_data_config={"input_file": "train.txt", "batch_size": 2,
                           "use_batch_shared_entities": True, "min_size_batch_labels": 6},
    )
    trainer = main(args)
    assert trainer.sparse, "sparse path must stay active with accumulation"
    assert trainer.accum_steps == 2
    rows = trainer.results.to_dicts()
    losses = [r["training_loss"] for r in rows if "training_loss" in r]
    assert losses[-1] < losses[0], "sparse+accum path must learn"
