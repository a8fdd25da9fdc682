"""Query dedup (SparsePlanBuilder dedup_queries): the token-composition
stage runs once per UNIQUE query mention/relation, gathered back per-row
BEFORE batchnorm/dropout — so the planned step must match the undeduped
step exactly (same BN statistics, same dropout masks, same loss, same
gradients/updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
)
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
from open_knowledge_graph_embeddings_tpu.train.sparse import (
    SparsePlanBuilder,
    make_sparse_train_step,
)


def _hp(regimes):
    return [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]


def _setup(toy_dataset_dir, name, **mkw):
    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt",
        is_training_data=True, batch_size=4,
        use_batch_shared_entities=True, min_size_batch_labels=8,
    )
    model = build_model(name, ds.meta, **mkw)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "SGD", "lr": 0.5})
    regimes.update(1, 0)
    return ds, model, variables, regimes


def _dup_heavy_batch(bb):
    """A batch whose query entities/relations repeat (dedup must engage)."""
    b = next(iter(bb.batches()))
    # force duplicates: tile the first row's ids over the batch
    b.ent_ids = np.asarray(b.ent_ids).copy()
    b.rel_ids = np.asarray(b.rel_ids).copy()
    b.ent_ids[1:] = b.ent_ids[0]
    b.rel_ids[2:] = b.rel_ids[0]
    return b


@pytest.mark.parametrize(
    "name,mkw",
    [
        (
            "LSTMComplexRelationModel",
            {"entity_slot_size": 8, "init_std": 0.1, "dropout": 0.2,
             "normalize": "batchnorm", "sparse": True},
        ),
        (
            "UnigramPoolingComplexRelationModel",
            {"entity_slot_size": 8, "init_std": 0.1, "sparse": True},
        ),
    ],
)
def test_dedup_step_matches_undeduped(toy_dataset_dir, name, mkw):
    # SGD, not Adagrad: the dedup backward sums duplicate-row cotangents
    # before the recurrence transpose (vs per-duplicate backward + scatter
    # sum) — mathematically identical, fp-reassociated.  Adagrad's first
    # step normalizes by |g| (update ~ lr*sign(g)), so noise-scale entries
    # under dropout flip sign and diverge by 2*lr — the same fp-edge class
    # the torch head-to-head tests document.  SGD keeps updates
    # proportional to g, where the reassociation noise stays ~1e-7.
    ds, model, variables, regimes = _setup(toy_dataset_dir, name, **mkw)
    bb = BatchBuilder(ds, seed=3)
    batch = _dup_heavy_batch(bb)

    outs = {}
    for dedup in (False, True):
        # the toy batch is tiny, so the default 512 bucket floor would never
        # shrink it — drop the bucket to 1 for the test
        plan = SparsePlanBuilder(
            model.embedder, entity_sparse=True, min_rows_ratio=0.0,
            dedup_queries=dedup, dedup_bucket=1,
        )
        d = plan(batch)
        if dedup:
            assert "dedup/ent_inv" in d or "dedup/rel_inv" in d, (
                "dedup did not engage on a duplicate-heavy batch"
            )
            assert len(d["ent_ids"]) < len(batch.ent_ids)
        step = make_sparse_train_step(
            model, regimes, variables["params"], entity_sparse=True
        )
        v = jax.tree_util.tree_map(jnp.array, variables)
        o = regimes.init_state(variables["params"])
        key = np.asarray(
            jax.random.key_data(jax.random.key(11)), dtype=np.uint32
        )
        for _ in range(3):
            v, o, st = step(v, o, _hp(regimes), {k: jnp.asarray(x) for k, x in d.items()}, key)
        outs[dedup] = (
            jax.tree_util.tree_map(np.asarray, v),
            float(st["loss_sum"]),
        )

    v0, l0 = outs[False]
    v1, l1 = outs[True]
    assert l0 == pytest.approx(l1, rel=1e-6), (l0, l1)
    flat0, _ = jax.tree_util.tree_flatten_with_path(v0)
    flat1, _ = jax.tree_util.tree_flatten_with_path(v1)
    for (p0, a0), (_, a1) in zip(flat0, flat1):
        np.testing.assert_allclose(
            a0, a1, rtol=0, atol=2e-5,
            err_msg=f"dedup diverged at {jax.tree_util.keystr(p0)}",
        )


def test_dedup_engages_at_flagship_stats():
    """At Zipf duplication the planner should emit both inverse arrays and
    shrink the encode row count (the perf contract the headline rests on)."""
    rng = np.random.default_rng(0)
    ids = (2 + (rng.zipf(1.3, size=4096) - 1) % 100000).astype(np.int32)
    from open_knowledge_graph_embeddings_tpu.train.sparse import SparsePlanBuilder

    sp = SparsePlanBuilder.__new__(SparsePlanBuilder)
    sp.dedup_queries = True
    sp.dedup_bucket = 512
    sp.mesh = None
    enc, inv = SparsePlanBuilder._dedup_ids(sp, ids)
    assert inv is not None
    assert len(enc) < len(ids) // 2
    assert len(enc) % 512 == 0
    np.testing.assert_array_equal(enc[inv], ids)
