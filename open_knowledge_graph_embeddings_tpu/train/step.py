"""Jitted train/eval step builders.

One training step = candidate encode + query encode + one [B,d]x[d,N]
score matmul + on-device label scatter + loss + backward + optimizer
update, compiled as a single XLA program.  The reference spreads this over
python (collate workers building dense labels, AddLossModule, autograd,
torch optimizers; reference: openkge/trainer.py:181-257); here the host
only ships index arrays and scalars.

Static-shape policy: batches arrive pre-bucketed (see data/batching.py), so
each distinct shape signature compiles once.  Data-dependent scalars
(loss normalizer, real candidate count) are traced values — they never
trigger recompilation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.batching import Batch
from open_knowledge_graph_embeddings_tpu.models.model import KGEModel
from open_knowledge_graph_embeddings_tpu.train.evaluate import (
    metric_sums_from_ranks,
    ranks_from_scores,
)
from open_knowledge_graph_embeddings_tpu.train.loss import bce_over_scores, one_vs_n_loss
from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes


def prefix_loss(
    model: KGEModel,
    variables,
    batch,
    loss_type: str,
    label_smoothing: float,
    rng,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """(loss_sum, normalizer_metric, new_state, reg) for a train batch.

    BCE uses the fused score+loss VJP (loss.bce_over_scores) so the dense
    [B, N] score gradient is never scattered into; KL falls back to the
    explicit scores + dense-label path."""
    cand_ids = batch.get("candidate_ids")
    col_valid = batch.get("col_valid")
    # query dedup (train/sparse.py SparsePlanBuilder dedup_queries): when
    # present, ent_ids/rel_ids hold unique ids and these inverse arrays
    # gather the encoded rows back to per-row inside the model
    ent_inv = batch.get("dedup/ent_inv")
    rel_inv = batch.get("dedup/rel_inv")
    if loss_type == "bce":
        q, cand_emb, new_state, reg = model.prefix_queries_and_candidates(
            variables, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
            cand_ids=cand_ids, train=True, rng=rng,
            ent_inv=ent_inv, rel_inv=rel_inv,
        )
        loss_sum = bce_over_scores(
            q, cand_emb, batch["pos_rows"], batch["pos_cols"],
            batch["row_valid"], col_valid, batch["n_real_cols"], label_smoothing,
        )
        norm_metric = jnp.sum((batch["pos_rows"] >= 0).astype(jnp.float32))
        return loss_sum, norm_metric, new_state, reg
    scores, new_state, reg = model.prefix_scores(
        variables, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
        cand_ids=cand_ids, train=True, rng=rng,
        ent_inv=ent_inv, rel_inv=rel_inv,
    )
    loss_sum, norm_metric = one_vs_n_loss(
        loss_type, scores, batch["pos_rows"], batch["pos_cols"],
        batch["row_valid"], col_valid, batch["n_real_cols"], label_smoothing,
    )
    return loss_sum, norm_metric, new_state, reg


def train_batch_to_arrays(batch: Batch) -> Dict[str, Any]:
    """Convert a host Batch to the jit-ready array dict (train fields)."""
    d = {
        "ent_ids": batch.ent_ids,
        "rel_ids": batch.rel_ids,
        "is_sp": batch.is_sp,
        "row_valid": batch.row_valid,
        "pos_rows": batch.pos_rows,
        "pos_cols": batch.pos_cols,
        "normalizer_loss": np.float32(batch.normalizer_loss),
        "n_real_cols": np.float32(batch.num_cols),
    }
    if batch.candidate_ids is not None:
        d["candidate_ids"] = batch.candidate_ids
        d["col_valid"] = batch.col_valid
    return d


def eval_batch_to_arrays(batch: Batch) -> Dict[str, Any]:
    d = train_batch_to_arrays(batch)
    d["filter_rows"] = batch.filter_rows
    d["filter_cols"] = batch.filter_cols
    d["gold_rows"] = batch.gold_rows
    d["gold_mention_cols"] = batch.gold_mention_cols
    return d


def make_train_step(
    model: KGEModel,
    regimes: OptimizerRegimes,
    params_example,
    loss_type: str = "bce",
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Returns jitted ``step(variables, opt_state, hparams, batch, rng)``
    -> (variables, opt_state, stats dict)."""
    apply_updates = regimes.make_apply(params_example, grad_clip)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, hparams, batch, rng):
        state, buffers = variables["state"], variables["buffers"]

        def loss_fn(params):
            v = {"params": params, "state": state, "buffers": buffers}
            loss_sum, norm_metric, new_state, reg = prefix_loss(
                model, v, batch, loss_type, label_smoothing, rng
            )
            backward = (loss_sum + reg) / batch["normalizer_loss"]
            return backward, (new_state, loss_sum, norm_metric)

        # PAD-row gradients are structurally zero (see embedders._pad_stop_gradient)
        grads, (new_state, loss_sum, norm_metric) = jax.grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        new_params, new_opt_state = apply_updates(
            grads, opt_state, variables["params"], hparams
        )
        new_variables = {"params": new_params, "state": new_state, "buffers": buffers}
        stats = {"loss_sum": loss_sum, "normalizer_metric": norm_metric}
        return new_variables, new_opt_state, stats

    return step


def make_scanned_step(step, scan_steps: int):
    """Fold ``scan_steps`` consecutive optimizer steps into ONE executable:
    ``scanned(variables, opt_state, hparams, batches, rngs)`` where every
    leaf of ``batches`` carries a leading ``[K]`` axis (K stacked batches)
    and ``rngs`` is the stacked ``[K, 2]`` uint32 key block the per-epoch
    key schedule would have fed to K single steps.

    Why this exists: on remote-attached TPUs every program dispatch pays a
    fixed scheduling round trip that does NOT pipeline across executions
    (measured ~1.3 ms/step on this environment's tunnel: 20 async single
    -step dispatches drain at ~11.7 ms/step against a 10.35 ms profiler
    device time).  ``lax.scan`` over a window of prefetched batches
    amortizes that cost to RTT/K — a standard device-loop technique for
    host-dispatch-bound training (the reference has no analog; its per
    -step Python optimizer loop is host-bound by design,
    openkge/trainer.py:181-257).

    The math is identical to K sequential ``step`` calls: same per-step
    batch, same per-step rng row, same update order (pinned by
    tests/test_scan_steps.py for the dense and row-sparse steps).  Works
    for any step with the ``(variables, opt_state, hparams, batch, rng) ->
    (variables, opt_state, stats)`` contract; stats come back stacked
    ``[K]`` per leaf.
    """

    @partial(jax.jit, donate_argnums=(0, 1))
    def scanned(variables, opt_state, hparams, batches, rngs):
        def body(carry, xs):
            v, o = carry
            b, r = xs
            v, o, stats = step(v, o, hparams, b, r)
            return (v, o), stats

        (v, o), stats = jax.lax.scan(body, (variables, opt_state), (batches, rngs))
        return v, o, stats

    return scanned


def make_accum_steps(
    model: KGEModel,
    regimes: OptimizerRegimes,
    params_example,
    loss_type: str = "bce",
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Gradient-accumulation variant of the train step (reference
    ``batch_size_for_backward``, openkge/trainer.py:229-246): each
    micro-batch adds its normalizer-scaled gradients to an accumulator;
    ``apply_step`` performs one optimizer update from the sum.

    Returns (zero_grads, grad_step, apply_step)."""
    apply_updates = regimes.make_apply(params_example, grad_clip)

    def zero_grads():
        return jax.tree_util.tree_map(jnp.zeros_like, params_example)

    @partial(jax.jit, donate_argnums=(0, 1))
    def grad_step(variables, acc_grads, batch, rng):
        state, buffers = variables["state"], variables["buffers"]

        def loss_fn(params):
            v = {"params": params, "state": state, "buffers": buffers}
            loss_sum, norm_metric, new_state, reg = prefix_loss(
                model, v, batch, loss_type, label_smoothing, rng
            )
            backward = (loss_sum + reg) / batch["normalizer_loss"]
            return backward, (new_state, loss_sum, norm_metric)

        grads, (new_state, loss_sum, norm_metric) = jax.grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
        new_variables = {"params": variables["params"], "state": new_state, "buffers": buffers}
        stats = {"loss_sum": loss_sum, "normalizer_metric": norm_metric}
        return new_variables, acc_grads, stats

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_step(variables, opt_state, acc_grads, hparams):
        new_params, new_opt_state = apply_updates(
            acc_grads, opt_state, variables["params"], hparams
        )
        return {**variables, "params": new_params}, new_opt_state

    return zero_grads, grad_step, apply_step


def make_eval_step(
    model: KGEModel, loss_type: str = "bce", label_smoothing: float = 0.0, topk: int = 0
):
    """Returns jitted ``eval_step(variables, batch, cand_emb=None)`` ->
    stats dict with loss_sum, normalizer_metric and summed rank metrics.

    ``cand_emb`` (optional) is a precomputed [N, d] candidate matrix — the
    token-embedder eval cache (reference: openkge/model.py:670-712); when
    absent candidates are encoded from ids / the full vocabulary.

    ``topk > 0`` additionally returns the filtered per-prefix top-k
    (scores, columns) for prediction logging."""
    from open_knowledge_graph_embeddings_tpu.train.evaluate import (
        eval_stats_chunked,
        filtered_topk,
        filtered_topk_chunked,
    )

    @jax.jit
    def eval_step(variables, batch, cand_emb=None):
        cand_ids = batch.get("candidate_ids")
        col_valid = batch.get("col_valid")
        if (
            cand_emb is not None
            and cand_ids is None
            and cand_emb.shape[0] > 100_000
        ):
            # full-vocab eval against the precomputed cache: chunked-scan
            # formulation — no [B, N] score matrix, no [G, N] row gather
            # (train/evaluate.py eval_stats_chunked); covers BCE, KL
            # (online logsumexp) and the filtered top-k prediction dump
            q, _, _ = model.queries(
                variables, batch["ent_ids"], batch["rel_ids"], batch["is_sp"],
                train=False,
            )
            loss_sum, ranks, gold_valid = eval_stats_chunked(
                q, cand_emb,
                batch["pos_rows"], batch["pos_cols"],
                batch["row_valid"], col_valid, batch["n_real_cols"],
                batch["filter_rows"], batch["filter_cols"],
                batch["gold_rows"], batch["gold_mention_cols"],
                label_smoothing, loss_type=loss_type,
            )
            stats = metric_sums_from_ranks(ranks, gold_valid)
            stats["loss_sum"] = loss_sum
            stats["normalizer_metric"] = jnp.sum(
                (batch["pos_rows"] >= 0).astype(jnp.float32)
            )
            packed = jnp.stack(
                [stats[k].astype(jnp.float32) for k in EVAL_STAT_KEYS]
            )
            if topk > 0:
                top_scores, top_cols = filtered_topk_chunked(
                    q, cand_emb, batch["filter_rows"], batch["filter_cols"],
                    col_valid, topk,
                )
                return packed, top_scores, top_cols
            return packed
        scores, _, _ = model.prefix_scores(
            variables,
            batch["ent_ids"],
            batch["rel_ids"],
            batch["is_sp"],
            cand_ids=cand_ids,
            cand_emb=cand_emb,
            train=False,
        )
        loss_sum, norm_metric = one_vs_n_loss(
            loss_type,
            scores,
            batch["pos_rows"],
            batch["pos_cols"],
            batch["row_valid"],
            col_valid,
            batch["n_real_cols"],
            label_smoothing,
        )
        ranks, gold_valid = ranks_from_scores(
            scores,
            batch["filter_rows"],
            batch["filter_cols"],
            batch["gold_rows"],
            batch["gold_mention_cols"],
            col_valid,
        )
        stats = metric_sums_from_ranks(ranks, gold_valid)
        stats["loss_sum"] = loss_sum
        stats["normalizer_metric"] = norm_metric
        # single packed vector: one device->host transfer per batch (the
        # axon tunnel charges a full RTT per fetched scalar)
        packed = jnp.stack(
            [stats[k].astype(jnp.float32) for k in EVAL_STAT_KEYS]
        )
        if topk > 0:
            top_scores, top_cols = filtered_topk(
                scores, batch["filter_rows"], batch["filter_cols"], col_valid, topk
            )
            return packed, top_scores, top_cols
        return packed

    return eval_step


EVAL_STAT_KEYS = ("count", "mrr", "mr", "h50", "h10", "h3", "h1", "loss_sum", "normalizer_metric")


def unpack_eval_stats(packed) -> Dict[str, float]:
    import numpy as _np

    vals = _np.asarray(packed)
    return {k: float(v) for k, v in zip(EVAL_STAT_KEYS, vals)}
