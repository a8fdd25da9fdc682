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
