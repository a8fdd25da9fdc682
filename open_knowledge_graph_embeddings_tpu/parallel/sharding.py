"""Sharding specifications for parameters, optimizer state, and batches.

Layout strategy (see SURVEY.md §2.3 / §7):

* embedding tables (entity, relation, token tables): rows sharded over the
  ``model`` axis — each chip owns a contiguous slab of the vocabulary.
  Prefix-embedding gathers become XLA all-gather/collective-permute over
  ICI; candidate encodings stay fully sharded,
* the [B, N] score matrix: B over ``data``, N over ``model`` — every chip
  computes its local query block against its local candidate slab; the loss
  reduction is a psum over both axes,
* optimizer state shards exactly like its parameter (Adagrad accumulators
  for a sharded table are sharded the same way),
* batch index arrays: row-indexed arrays over ``data``; candidate-space
  arrays over ``model``; scalar normalizers replicated.

These are declarative `NamedSharding`s handed to `jax.jit`; XLA inserts the
collectives.  Matmul-local layouts never materialize a replicated candidate
matrix, which is what makes OLPBench-scale (2.5M mentions) full-vocab
scoring fit per chip.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_knowledge_graph_embeddings_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# parameter names whose leading (row) axis is sharded over the model axis
_ROW_SHARDED_TABLES = (
    "entity_embedding",
    "entity_token_embedding",
)


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def variables_shardings(variables: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a model's variables."""

    def shard_leaf(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = keys[-1] if keys else ""
        if any(k in _ROW_SHARDED_TABLES for k in keys):
            # [rows, d] table: rows over model axis
            return _ns(mesh, MODEL_AXIS)
        if name.endswith("_token_ids"):
            # buffers: [num_items, L] row-sharded alongside the entity tables
            return _ns(mesh, MODEL_AXIS) if "entity" in name else _ns(mesh)
        return _ns(mesh)  # replicated

    return jax.tree_util.tree_map_with_path(shard_leaf, variables)


def opt_state_shardings(opt_state: Any, variables_sharding: Any, mesh: Mesh) -> Any:
    """Optimizer accumulators follow their parameter's sharding; scalars
    (step counters) replicate."""
    param_shardings = variables_sharding["params"]

    def per_param(sharding, state_leaf_tree):
        def leaf(s):
            if hasattr(s, "ndim") and s.ndim == 0:
                return _ns(mesh)
            return sharding

        return jax.tree_util.tree_map(leaf, state_leaf_tree)

    return jax.tree_util.tree_map(
        per_param,
        param_shardings,
        opt_state,
        is_leaf=lambda x: isinstance(x, NamedSharding),
    )


def train_batch_shardings(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    data_n = mesh.shape[DATA_AXIS]
    model_n = mesh.shape[MODEL_AXIS]

    def rows(v):
        return getattr(v, "shape", ())[:1]

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        n = rows(v)
        if (
            k in ("ent_ids", "rel_ids", "is_sp", "row_valid", "dedup/ent_inv", "dedup/rel_inv")
            and n and n[0] % data_n == 0
        ):
            out[k] = _ns(mesh, DATA_AXIS)
        elif k in ("candidate_ids", "col_valid") and n:
            # candidate axis rides the model axis; on pure-DP meshes the
            # candidate ENCODE shards over data instead (the trainer pins it
            # with set_dp_candidate_sharding) so place the ids there
            if model_n > 1 and n[0] % model_n == 0:
                out[k] = _ns(mesh, MODEL_AXIS)
            elif model_n == 1 and n[0] % data_n == 0:
                out[k] = _ns(mesh, DATA_AXIS)
            else:
                out[k] = _ns(mesh)
        else:  # pos_rows/pos_cols (cross-shard scatter), scalars, eval fields,
            # sparse-plan arrays, and anything not evenly divisible
            out[k] = _ns(mesh)
    return out
