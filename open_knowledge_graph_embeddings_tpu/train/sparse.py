"""Row-sparse embedding-table training path (``sparse: true``).

Capability equivalent of the reference's ``sparse=True`` embedding gradients
(reference: openkge/model.py:390-391, 597-608 — torch emits sparse COO grads
and torch.optim.Adagrad updates only the touched rows).  The TPU-native
shape is different: instead of a sparse gradient *format*, the train step is
restructured so dense row gradients are only ever materialized for the rows
a batch touches:

1. the host computes, per batch, the unique table rows it will touch
   (entity/relation ids for lookup tables; the union of token ids for token
   tables) and remaps the batch's index arrays into that compact row space,
2. the step gathers those rows (``rows = table[uids]``), differentiates the
   loss w.r.t. the gathered ``[U, d]`` rows instead of the ``[V, d]`` table,
3. a scatter-Adagrad kernel (ops/pallas/scatter_adagrad_kernel.py) updates
   only the touched rows of the parameter + accumulator tables.

HBM traffic per step drops from O(V*d) x 5 arrays (dense grad scatter, dense
optimizer read-modify-write) to O(U*d) — at OLPBench lookup scale
(V=2.47M, U<=8.2k) a ~300x reduction; step time stops scaling with the
table height.

Semantics vs the dense path: identical when weight_decay == 0 (tested
step-for-step).  With weight_decay > 0, decay is applied *lazily* to touched
rows only — a deliberate, documented extension (torch raises on
sparse + weight_decay; dense decays every row every step).

Supported optimizers for sparse tables: Adagrad and SGD(momentum=0) —
the same set torch supports for sparse grads (modulo SparseAdam).
Token-table sparsity additionally replaces the device-resident token-id
buffers with batch-local remapped token matrices shipped from the host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.batching import Batch
from open_knowledge_graph_embeddings_tpu.models.embedders import (
    LookupEmbedder,
    TokenEmbedderBase,
)
from open_knowledge_graph_embeddings_tpu.models.model import KGEModel
from open_knowledge_graph_embeddings_tpu.ops.pallas.scatter_adagrad_kernel import (
    scatter_adagrad,
)
from open_knowledge_graph_embeddings_tpu.train.loss import one_vs_n_loss
from open_knowledge_graph_embeddings_tpu.train.optim import (
    OptimizerRegimes,
    assign_regimes,
)
from open_knowledge_graph_embeddings_tpu.train.step import train_batch_to_arrays
from open_knowledge_graph_embeddings_tpu.utils.misc import next_bucket

SPARSE_CAPABLE_OPTIMIZERS = ("Adagrad", "SGD")


def sparse_table_names(embedder, entity_sparse: bool) -> Tuple[str, ...]:
    """Tables eligible for row-sparse updates.  Entity-side tables are only
    sparse under batch-shared candidates — full-vocab training touches every
    entity row anyway, so the dense path is already optimal there."""
    if isinstance(embedder, LookupEmbedder):
        names = ["relation_embedding"]
        if entity_sparse:
            names.insert(0, "entity_embedding")
        return tuple(names)
    if isinstance(embedder, TokenEmbedderBase):
        names = ["relation_token_embedding"]
        if entity_sparse:
            names.insert(0, "entity_token_embedding")
        return tuple(names)
    return ()


class SparsePlanBuilder:
    """Host-side: batch -> jit-ready array dict with unique-row plans.

    The returned dict is ``train_batch_to_arrays(batch)`` plus, per sparse
    table T, ``sparse/T/uids`` ([U] int32, bucket-padded) and
    ``sparse/T/valid`` ([U] bool); batch index arrays are remapped into the
    compact row space, and for token embedders the token-id buffers are
    replaced by batch-local matrices under ``sparse/buffers/*``.
    """

    def __init__(self, embedder, entity_sparse: bool, uid_bucket_min: int = 256):
        self.embedder = embedder
        self.entity_sparse = entity_sparse
        self.uid_bucket_min = uid_bucket_min
        self.tables = sparse_table_names(embedder, entity_sparse)
        self.is_token = isinstance(embedder, TokenEmbedderBase)
        if entity_sparse and not self.tables:
            raise ValueError(f"no sparse tables for embedder {type(embedder).__name__}")

    def _pack_uids(self, d: Dict[str, Any], table: str, uids: np.ndarray) -> None:
        U = next_bucket(len(uids), minimum=self.uid_bucket_min)
        padded = np.zeros(U, np.int32)
        padded[: len(uids)] = uids
        valid = np.zeros(U, bool)
        valid[: len(uids)] = True
        d[f"sparse/{table}/uids"] = padded
        d[f"sparse/{table}/valid"] = valid

    def __call__(self, batch: Batch) -> Dict[str, Any]:
        d = train_batch_to_arrays(batch)
        if self.is_token:
            self._plan_token(d, batch)
        else:
            self._plan_lookup(d, batch)
        return d

    def _plan_lookup(self, d: Dict[str, Any], batch: Batch) -> None:
        if self.entity_sparse:
            assert batch.candidate_ids is not None, (
                "entity-table sparsity requires batch-shared candidates"
            )
            used = np.concatenate([batch.ent_ids, batch.candidate_ids])
            ue = np.unique(used)  # sorted; includes PAD id 0 from padding rows
            d["ent_ids"] = np.searchsorted(ue, batch.ent_ids).astype(np.int32)
            d["candidate_ids"] = np.searchsorted(ue, batch.candidate_ids).astype(np.int32)
            self._pack_uids(d, "entity_embedding", ue)
        ur = np.unique(batch.rel_ids)
        d["rel_ids"] = np.searchsorted(ur, batch.rel_ids).astype(np.int32)
        self._pack_uids(d, "relation_embedding", ur)

    def _plan_token(self, d: Dict[str, Any], batch: Batch) -> None:
        meta = self.embedder.meta
        if self.entity_sparse:
            assert batch.candidate_ids is not None, (
                "entity-token-table sparsity requires batch-shared candidates"
            )
            used = np.concatenate([batch.ent_ids, batch.candidate_ids])
            toks = meta.entity_token_ids[used]  # [B+N, L]
            ut = np.unique(toks)  # sorted; PAD token 0 maps to position 0
            local = np.searchsorted(ut, toks).astype(np.int32)
            B = len(batch.ent_ids)
            d["ent_ids"] = np.arange(B, dtype=np.int32)
            d["candidate_ids"] = np.arange(B, B + len(batch.candidate_ids), dtype=np.int32)
            d["sparse/buffers/entity_token_ids"] = local
            self._pack_uids(d, "entity_token_embedding", ut)
        rtoks = meta.relation_token_ids[batch.rel_ids]  # [B, L]
        urt = np.unique(rtoks)
        d["rel_ids"] = np.arange(len(batch.rel_ids), dtype=np.int32)
        d["sparse/buffers/relation_token_ids"] = np.searchsorted(urt, rtoks).astype(np.int32)
        self._pack_uids(d, "relation_token_embedding", urt)


# ------------------------------------------------------------- row updates


def _sparse_adagrad_rows(g_rows, uids, valid, p, s, hp):
    step = s["step"] + 1.0
    clr = hp["lr"] / (1.0 + (step - 1.0) * hp["lr_decay"])
    new_p, new_acc = scatter_adagrad(
        g_rows, uids, valid, p, s["sum"], clr, hp["weight_decay"], hp["eps"]
    )
    return new_p, {"sum": new_acc, "step": step}


def _sparse_sgd_rows(g_rows, uids, valid, p, s, hp):
    vm = valid[:, None].astype(jnp.float32)
    p_rows = p[uids]
    g = (g_rows.astype(jnp.float32) + hp["weight_decay"] * p_rows) * vm
    new_p = p.at[uids].add(-hp["lr"] * g)
    return new_p, {"momentum": s["momentum"], "step": s["step"] + 1.0}


_SPARSE_RULES = {"Adagrad": _sparse_adagrad_rows, "SGD": _sparse_sgd_rows}


# ------------------------------------------------------------------- step


def make_sparse_train_step(
    model: KGEModel,
    regimes: OptimizerRegimes,
    params_example,
    entity_sparse: bool,
    loss_type: str = "bce",
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Sparse analog of step.make_train_step; batches must come from a
    :class:`SparsePlanBuilder` built with the same ``entity_sparse``."""
    names = sparse_table_names(model.embedder, entity_sparse)
    labels = assign_regimes(params_example, regimes.matches, regimes.frozen_patterns)
    opt_names = regimes.opt_names()
    # frozen sparse tables (label -1) stay on the dense side: no update runs
    table_label = {t: labels[t] for t in names if t in params_example and labels[t] >= 0}
    for t, lbl in table_label.items():
        name = opt_names[lbl]
        if name not in _SPARSE_RULES:
            raise ValueError(
                f"sparse updates for table {t!r} need one of "
                f"{SPARSE_CAPABLE_OPTIMIZERS}, got {name} (torch has the same "
                "restriction for sparse gradients)"
            )
        if name == "SGD":
            merged: Dict = {}
            for ph in regimes.regimes[lbl]:
                merged.update(ph)
            if float(merged.get("momentum", 0.0)) != 0.0:
                raise ValueError("sparse SGD requires momentum == 0")
    sparse_tables = tuple(table_label)
    dense_example = {k: v for k, v in params_example.items() if k not in sparse_tables}
    dense_apply = regimes.make_apply(dense_example, grad_clip=None)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, hparams, batch, rng):
        params, state = variables["params"], variables["state"]
        buffers = dict(variables["buffers"])
        for bk in ("entity_token_ids", "relation_token_ids"):
            key = f"sparse/buffers/{bk}"
            if key in batch:
                buffers[bk] = batch[key]
        uids = {t: batch[f"sparse/{t}/uids"] for t in sparse_tables}
        valid = {t: batch[f"sparse/{t}/valid"] for t in sparse_tables}
        rows = {t: params[t][uids[t]] for t in sparse_tables}
        dense = {k: v for k, v in params.items() if k not in sparse_tables}
        cand_ids = batch.get("candidate_ids")
        col_valid = batch.get("col_valid")

        def loss_fn(rows, dense):
            v = {"params": {**dense, **rows}, "state": state, "buffers": buffers}
            scores, new_state, reg = model.prefix_scores(
                v, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
                cand_ids=cand_ids, train=True, rng=rng,
            )
            loss_sum, norm_metric = one_vs_n_loss(
                loss_type, scores, batch["pos_rows"], batch["pos_cols"],
                batch["row_valid"], col_valid, batch["n_real_cols"], label_smoothing,
            )
            backward = (loss_sum + reg) / batch["normalizer_loss"]
            return backward, (new_state, loss_sum, norm_metric)

        (g_rows, g_dense), (new_state, loss_sum, norm_metric) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, dense)

        if grad_clip is not None and grad_clip > 0:
            leaves = jax.tree_util.tree_leaves(g_dense) + jax.tree_util.tree_leaves(g_rows)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            g_dense = jax.tree_util.tree_map(lambda g: g * scale, g_dense)
            g_rows = jax.tree_util.tree_map(lambda g: g * scale, g_rows)

        dense_opt = {k: v for k, v in opt_state.items() if k not in sparse_tables}
        new_dense, new_dense_opt = dense_apply(g_dense, dense_opt, dense, hparams)
        new_params = dict(new_dense)
        new_opt = dict(new_dense_opt)
        for t in sparse_tables:
            hp = hparams[table_label[t]]
            rule = _SPARSE_RULES[opt_names[table_label[t]]]
            new_params[t], new_opt[t] = rule(
                g_rows[t], uids[t], valid[t], params[t], opt_state[t], hp
            )
        new_variables = {
            "params": new_params,
            "state": new_state,
            "buffers": variables["buffers"],
        }
        stats = {"loss_sum": loss_sum, "normalizer_metric": norm_metric}
        return new_variables, new_opt, stats

    return step
