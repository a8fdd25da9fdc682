"""Explicit shard_map scoring path vs the single-device loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.parallel import make_mesh
from open_knowledge_graph_embeddings_tpu.parallel.shard_map_score import (
    make_sharded_lookup_score_fn,
    sharded_embedding_lookup,
)
from open_knowledge_graph_embeddings_tpu.train import train_batch_to_arrays
from open_knowledge_graph_embeddings_tpu.train.loss import one_vs_n_loss


def test_sharded_embedding_lookup_matches_gather():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=1, model=4)
    V, d = 16, 8
    table = jnp.asarray(np.random.default_rng(0).standard_normal((V, d)).astype(np.float32))
    ids = jnp.asarray([0, 5, 11, 15, 3])

    fn = jax.shard_map(
        lambda t, i: sharded_embedding_lookup(t, i),
        mesh=mesh, in_specs=(P("model", None), P()), out_specs=P(),
    )
    got = fn(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]), rtol=1e-6)


def test_sharded_loss_matches_single_device(toy_dataset_dir):
    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True, batch_size=4
    )
    model = build_model("LookupComplexRelationModel", ds.meta, entity_slot_size=8, init_std=0.1)
    variables = model.init(jax.random.key(0))
    batch = train_batch_to_arrays(next(BatchBuilder(ds, seed=2).batches()))

    # single-device reference loss (full-vocab candidates)
    scores, _, _ = model.prefix_scores(
        variables, batch["ent_ids"], batch["rel_ids"], batch["is_sp"], train=False
    )
    want, _ = one_vs_n_loss(
        "bce", scores, batch["pos_rows"], batch["pos_cols"],
        batch["row_valid"], None, batch["n_real_cols"],
    )

    mesh = make_mesh(data=2, model=4)
    fn = make_sharded_lookup_score_fn(model, mesh)
    got = fn(variables, batch)
    assert float(got) == pytest.approx(float(want), rel=1e-5)


def test_sharded_lookup_train_step_matches_dense():
    """The explicit-collective FULL train step (fwd + bwd via shard_map
    transpose + shard-local Adagrad) must match the single-device GSPMD
    step step-for-step."""
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.parallel import make_mesh
    from open_knowledge_graph_embeddings_tpu.parallel.shard_map_score import (
        make_sharded_lookup_train_step,
    )
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.step import (
        make_train_step,
        train_batch_to_arrays,
    )
    from __graft_entry__ import _synthetic_meta

    rng = np.random.default_rng(3)
    meta = _synthetic_meta(entities=66, relations=12, ent_tokens=32, rel_tokens=16, max_len=6)
    model = build_model("LookupComplexRelationModel", meta, entity_slot_size=8, init_std=0.1)
    variables = model.init(jax.random.key(0))
    mesh = make_mesh(data=4, model=2)

    B = 8
    N = meta.entities_size - meta.min_entities_size
    P_ = 16
    pos_rows = np.full(P_, -1, np.int32)
    pos_cols = np.full(P_, -1, np.int32)
    pos_rows[:B] = np.arange(B)
    pos_cols[:B] = rng.integers(0, N, B)
    batch = {
        "ent_ids": rng.integers(2, meta.entities_size, B).astype(np.int32),
        "rel_ids": rng.integers(2, meta.relations_size, B).astype(np.int32),
        "is_sp": (np.arange(B) % 2 == 0),
        "row_valid": np.ones(B, bool),
        "pos_rows": pos_rows,
        "pos_cols": pos_cols,
        "normalizer_loss": np.float32(B * N),
        "n_real_cols": np.float32(N),
    }

    hp = {k: jnp.float32(v) for k, v in dict(
        lr=0.3, weight_decay=0.0, lr_decay=0.0, eps=1e-10).items()}
    step, prepare, prepare_batch = make_sharded_lookup_train_step(model, mesh)
    # the step donates params; give it its own copy of the tables
    params, opt_state = prepare(jax.tree_util.tree_map(jnp.copy, variables))
    sb = prepare_batch(batch)
    losses_sharded = []
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, hp, sb)
        losses_sharded.append(float(loss))

    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.3})
    regimes.update(1, 0)
    dense_opt = regimes.init_state(variables["params"])
    dense_step = make_train_step(model, regimes, variables["params"])
    dhp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    v = variables
    losses_dense = []
    for i in range(3):
        v, dense_opt, stats = dense_step(v, dense_opt, dhp, dict(batch), jax.random.key(0))
        losses_dense.append(float(stats["loss_sum"]))

    np.testing.assert_allclose(losses_sharded, losses_dense, rtol=1e-5)
    E = meta.entities_size
    np.testing.assert_allclose(
        np.asarray(params["entity_embedding"])[:E],
        np.asarray(v["params"]["entity_embedding"]), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["relation_embedding"]),
        np.asarray(v["params"]["relation_embedding"]), rtol=1e-5, atol=1e-6,
    )
