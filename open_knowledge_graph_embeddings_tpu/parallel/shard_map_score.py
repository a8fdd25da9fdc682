"""Explicit shard_map path with manual collectives (lookup/BCE core).

The default distributed path (`parallel/sharding.py`) hands `NamedSharding`
annotations to `jax.jit` and lets XLA insert collectives — that is the
PRODUCTION path, covering every model family and loss.  This module is the
hand-written equivalent for the core 1-vs-N computation, making the
communication pattern explicit and auditable:

* the entity table is row-sharded over the ``model`` axis: shard m owns
  rows ``[m*V/M, (m+1)*V/M)``,
* **boundary embedding gather**: each shard contributes its local rows for
  the requested ids and a `psum` over ``model`` assembles the full
  embeddings — the all-reduce-style exchange that rides ICI,
* batch rows are sharded over ``data``; every shard computes its local
  ``[B/D, d] x [d, N/M]`` score block against its *local* candidate slab —
  the full ``[B, N]`` score matrix never materializes on any chip,
* the loss is a local masked sum + `psum` over both axes,
* the backward is the shard_map transpose of the above (the psum gathers
  transpose to broadcasts; each shard receives exactly its slab's gradient),
  and :func:`make_sharded_lookup_train_step` completes it into a FULL
  training step — Adagrad runs shard-locally on the slab and its
  equally-sharded accumulator, with zero additional communication.

Scope (deliberate): lookup embedder x {ComplEx, DistMult} x BCE full-vocab —
the FB15k-237 headline path.  Token encoders and KL train on the GSPMD
path; this module exists as the auditable communication-pattern oracle the
GSPMD programs are validated against (tests/test_shard_map.py asserts
loss/step equality with the single-device step on a CPU mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_knowledge_graph_embeddings_tpu.models.model import KGEModel, QUERY_FNS
from open_knowledge_graph_embeddings_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sharded_embedding_lookup(table_local: jax.Array, ids: jax.Array, axis: str = MODEL_AXIS):
    """Gather rows of a row-sharded table inside shard_map.

    ``table_local`` is this shard's slab; ``ids`` are global row ids
    (replicated over ``axis``).  Each shard gathers the ids that fall in its
    range, zero-fills the rest, and a psum over ``axis`` assembles the full
    embeddings — the explicit boundary gather.
    """
    m = jax.lax.axis_index(axis)
    rows_per_shard = table_local.shape[0]
    lo = m * rows_per_shard
    local_ids = jnp.clip(ids - lo, 0, rows_per_shard - 1)
    mine = (ids >= lo) & (ids < lo + rows_per_shard)
    gathered = jnp.where(mine[:, None], table_local[local_ids], 0)
    return jax.lax.psum(gathered, axis)


def make_sharded_lookup_score_fn(model: KGEModel, mesh: Mesh, loss_type: str = "bce"):
    """Explicit-collective (scores-free) loss for a lookup model.

    Returns jitted ``fn(variables, batch) -> loss_sum`` where the entity
    table arrives sharded P(model), batch rows P(data).  Pads the entity
    table to a multiple of the model-axis size before sharding.
    """
    assert loss_type == "bce"
    M = mesh.shape[MODEL_AXIS]
    E = model.meta.entities_size
    E_pad = -(-E // M) * M
    off = model.meta.min_entities_size
    query_fn = QUERY_FNS[model.scorer]

    def local_fn(ent_table, rel_table, ent_ids, rel_ids, is_sp, pos_rows, pos_cols, row_valid):
        # boundary gather over ICI (psum over the model axis); the relation
        # table is small and replicated, so its gather is local
        e = sharded_embedding_lookup(ent_table, ent_ids)
        r = rel_table[rel_ids]
        q = query_fn(e, r, is_sp)

        # local candidate slab: this shard's table rows ARE its candidates
        m = jax.lax.axis_index(MODEL_AXIS)
        rows_per_shard = ent_table.shape[0]
        lo = m * rows_per_shard
        cand_local = ent_table  # [V/M, d]
        scores_local = jax.lax.dot_general(
            q, cand_local, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B/D, V/M]

        # labels for the local column range [lo, lo+rows) in entity-id space
        col_global = pos_cols + off  # candidate col -> entity id
        in_range = (col_global >= lo) & (col_global < lo + rows_per_shard) & (pos_rows >= 0)
        l_rows = jnp.where(in_range, pos_rows, 0)
        l_cols = jnp.where(in_range, col_global - lo, 0)
        labels = jnp.zeros_like(scores_local)
        labels = labels.at[l_rows, l_cols].max(in_range.astype(jnp.float32))

        # mask: valid rows x real entity columns (ids >= off, < E)
        col_ids = lo + jax.lax.broadcasted_iota(jnp.int32, scores_local.shape, 1)
        mask = row_valid[:, None] & (col_ids >= off) & (col_ids < E)

        x = scores_local
        per_cell = jnp.maximum(x, 0.0) - x * labels + jnp.log1p(jnp.exp(-jnp.abs(x)))
        loss_local = jnp.sum(jnp.where(mask, per_cell, 0.0))
        return jax.lax.psum(loss_local, (DATA_AXIS, MODEL_AXIS))

    shard_fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),  # entity table rows
            P(),                  # relation table replicated
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),  # prefix arrays
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),  # positives + row mask
        ),
        out_specs=P(),
    )

    jitted = jax.jit(shard_fn)

    def fn(variables, batch: Dict) -> jax.Array:
        ent = variables["params"]["entity_embedding"]
        if E_pad != E:
            ent = jnp.pad(ent, ((0, E_pad - E), (0, 0)))
        rel = variables["params"]["relation_embedding"]
        pos_r, pos_c = _shard_positives_by_row(batch, mesh)  # host re-bucketing
        return jitted(
            ent, rel,
            batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
            pos_r, pos_c,
            batch["row_valid"],
        )

    fn.shard_fn = shard_fn  # raw shard_map function for jit-composed callers
    return fn


def make_sharded_lookup_train_step(model: KGEModel, mesh: Mesh, loss_type: str = "bce"):
    """Full explicit-collective training step for a full-vocab lookup model.

    Forward/backward run through the shard_map loss above (the psum gathers
    transpose into broadcasts, so each model shard receives exactly its
    table slab's gradient); the Adagrad update then runs shard-locally on
    the slab + its identically-sharded accumulator — no further collectives.

    Returns ``step(params, opt_state, hp, batch) -> (params, opt_state,
    loss_sum)`` where ``params = {"entity_embedding" [E_pad sharded P(model)],
    "relation_embedding" [R, d] replicated}`` and opt_state holds matching
    Adagrad accumulators plus a step counter.  Use :func:`prepare_sharded_params`
    to build them from a model's variables.
    """
    M = mesh.shape[MODEL_AXIS]
    E = model.meta.entities_size
    E_pad = -(-E // M) * M
    shard_fn = make_sharded_lookup_score_fn(model, mesh, loss_type).shard_fn

    ent_sh = NamedSharding(mesh, P(MODEL_AXIS))
    rep = NamedSharding(mesh, P())

    def prepare_batch(batch: Dict) -> Dict:
        """Host side: re-bucket positives per data shard once per batch."""
        pos_r, pos_c = _shard_positives_by_row(batch, mesh)
        return {
            "ent_ids": batch["ent_ids"], "rel_ids": batch["rel_ids"],
            "is_sp": batch["is_sp"], "row_valid": batch["row_valid"],
            "pos_rows": pos_r, "pos_cols": pos_c,
            "normalizer_loss": batch["normalizer_loss"],
        }

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, hp, batch):
        def backward(ent, rel):
            loss_sum = shard_fn(
                ent, rel, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
                batch["pos_rows"], batch["pos_cols"], batch["row_valid"],
            )
            return loss_sum / batch["normalizer_loss"], loss_sum

        (_, loss_sum), (g_ent, g_rel) = jax.value_and_grad(
            backward, argnums=(0, 1), has_aux=True
        )(params["entity_embedding"], params["relation_embedding"])

        def adagrad(p, g, acc):
            g = g + hp["weight_decay"] * p
            acc = acc + g * g
            clr = hp["lr"] / (1.0 + (opt_state["step"]) * hp["lr_decay"])
            return p - clr * g / (jnp.sqrt(acc) + hp["eps"]), acc

        new_ent, acc_ent = adagrad(params["entity_embedding"], g_ent, opt_state["ent"])
        new_rel, acc_rel = adagrad(params["relation_embedding"], g_rel, opt_state["rel"])
        new_params = {"entity_embedding": new_ent, "relation_embedding": new_rel}
        new_opt = {"ent": acc_ent, "rel": acc_rel, "step": opt_state["step"] + 1.0}
        return new_params, new_opt, loss_sum

    def prepare(variables):
        ent = variables["params"]["entity_embedding"]
        if E_pad != E:
            ent = jnp.pad(ent, ((0, E_pad - ent.shape[0]), (0, 0)))
        params = {
            "entity_embedding": jax.device_put(ent, ent_sh),
            "relation_embedding": jax.device_put(
                variables["params"]["relation_embedding"], rep
            ),
        }
        opt_state = {
            "ent": jax.device_put(jnp.zeros_like(params["entity_embedding"]), ent_sh),
            "rel": jax.device_put(
                jnp.zeros_like(params["relation_embedding"]), rep
            ),
            "step": jnp.zeros((), jnp.float32),
        }
        return params, opt_state

    return step, prepare, prepare_batch


def _shard_positives_by_row(batch: Dict, mesh: Mesh):
    """Re-bucket (pos_rows, pos_cols) so each data shard receives the
    positives of its own row block, padded to a common per-shard size."""
    import numpy as np

    D = mesh.shape[DATA_AXIS]
    B = batch["ent_ids"].shape[0]
    rows_per = B // D
    pos_rows = np.asarray(batch["pos_rows"])
    pos_cols = np.asarray(batch["pos_cols"])
    valid = pos_rows >= 0
    owner = np.where(valid, pos_rows // rows_per, -1)
    cap = 0
    for d in range(D):
        cap = max(cap, int((owner == d).sum()))
    cap = max(cap, 1)
    out_r = np.full((D, cap), -1, np.int32)
    out_c = np.full((D, cap), -1, np.int32)
    for d in range(D):
        sel = owner == d
        n = int(sel.sum())
        out_r[d, :n] = pos_rows[sel] - d * rows_per  # local row index
        out_c[d, :n] = pos_cols[sel]
    return jnp.asarray(out_r.reshape(D * cap)), jnp.asarray(out_c.reshape(D * cap))
