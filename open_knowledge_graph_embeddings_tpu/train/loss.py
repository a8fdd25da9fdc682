"""1-vs-N multi-label losses with on-device label construction.

The reference builds dense [B, N] float label tensors and sums
BCE-with-logits / KL over every cell (reference: openkge/trainer.py:93-111,
loss reduction='sum', scripts/train.py:108-111).  Here the dense label
tensor is scattered *on device* from (row, col) index pairs, padding rows
and columns are masked out of the sum, and the data-dependent normalizer
(real_rows * real_cols) arrives as a scalar — preserving the reference's
arithmetic exactly while keeping every shape static.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dense_labels(
    pos_rows: jax.Array,  # [P] int32, -1 padded
    pos_cols: jax.Array,  # [P] int32, -1 padded
    num_rows: int,
    num_cols: int,
) -> jax.Array:
    """Scatter a [B, N] multi-hot label matrix (duplicates collapse to 1)."""
    valid = pos_rows >= 0
    rows = jnp.where(valid, pos_rows, 0)
    cols = jnp.where(valid, pos_cols, 0)
    labels = jnp.zeros((num_rows, num_cols), jnp.float32)
    return labels.at[rows, cols].max(valid.astype(jnp.float32))


def cell_mask(row_valid: jax.Array, col_valid: Optional[jax.Array], num_cols: int) -> jax.Array:
    """[B, N] mask of real (non-padding) label cells."""
    rm = row_valid[:, None]
    if col_valid is None:
        return jnp.broadcast_to(rm, (row_valid.shape[0], num_cols))
    return rm & col_valid[None, :]


def apply_label_smoothing(labels: jax.Array, n_real_cols: jax.Array, smoothing: float) -> jax.Array:
    """labels <- (labels + 1/N) * (1 - smoothing), applied to every cell
    (reference: openkge/trainer.py:103-105)."""
    if smoothing <= 0:
        return labels
    return (labels + 1.0 / n_real_cols) * (1.0 - smoothing)


def bce_with_logits_sum(scores: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """sum over real cells of BCE-with-logits (torch reduction='sum')."""
    per_cell = (
        jnp.maximum(scores, 0.0) - scores * labels + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    return jnp.sum(jnp.where(mask, per_cell, 0.0))


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def bce_with_logits_sum_indexed(
    scores: jax.Array,
    pos_rows: jax.Array,
    pos_cols: jax.Array,
    mask: jax.Array,
    n_real_cols: jax.Array,
    smoothing: float,
) -> jax.Array:
    """BCE-with-logits sum without materializing the dense label matrix.

    With deduplicated positive pairs (BatchBuilder guarantees this), the
    label of a cell is ``multi_hot * a + b`` where ``a = 1 - smoothing`` and
    ``b = (1 - smoothing) / N`` (``a=1, b=0`` when smoothing is off), so

        loss = sum_mask[ max(s,0) + log1p(e^-|s|) - b*s ] - a * sum_pos s.

    Saves the [B, N] f32 label scatter + relayout in the forward (~1 ms/step
    at flagship 4096x4096).  The backward is hand-written (custom_vjp):
    autograd would differentiate the positive-score gather into a scatter
    that forces a physical relayout copy of the [B, N] gradient when XLA
    keeps the scores column-major (measured 0.9 ms/step at B=512 N=100k);
    here it is one elementwise expression plus an in-place scatter-add."""
    return _bce_indexed_fwd(scores, pos_rows, pos_cols, mask, n_real_cols, smoothing)[0]


def _bce_indexed_fwd(scores, pos_rows, pos_cols, mask, n_real_cols, smoothing):
    if smoothing > 0:
        a = 1.0 - smoothing
        b = (1.0 - smoothing) / n_real_cols
        per_cell = (
            jnp.maximum(scores, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(scores))) - scores * b
        )
    else:
        a = 1.0
        per_cell = jnp.maximum(scores, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    base = jnp.sum(jnp.where(mask, per_cell, 0.0))
    valid = pos_rows >= 0
    r = jnp.where(valid, pos_rows, 0)
    c = jnp.where(valid, pos_cols, 0)
    s_pos = jnp.where(valid, scores[r, c], 0.0)
    loss = base - a * jnp.sum(s_pos)
    return loss, (scores, pos_rows, pos_cols, mask, n_real_cols)


def _bce_indexed_bwd(smoothing, res, ct):
    scores, pos_rows, pos_cols, mask, n_real_cols = res
    if smoothing > 0:
        a = 1.0 - smoothing
        b = (1.0 - smoothing) / n_real_cols
    else:
        a = 1.0
        b = 0.0
    # d/ds [max(s,0) + log1p(e^-|s|) - b*s] = sigmoid(s) - b
    ds = jnp.where(mask, ct * (jax.nn.sigmoid(scores) - b), 0.0)
    valid = pos_rows >= 0
    r = jnp.where(valid, pos_rows, 0)
    c = jnp.where(valid, pos_cols, 0)
    ds = ds.at[r, c].add(jnp.where(valid, -a * ct, 0.0))
    zf = jnp.zeros((), jnp.float32)
    return ds, None, None, None, zf


bce_with_logits_sum_indexed.defvjp(
    lambda scores, pr, pc, mask, n, smoothing: _bce_indexed_fwd(
        scores, pr, pc, mask, n, smoothing
    ),
    _bce_indexed_bwd,
)


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def bce_over_scores(
    q: jax.Array,            # [B, d] query vectors (bf16 or f32)
    cand: jax.Array,         # [N, d] candidate matrix
    pos_rows: jax.Array,     # [P] int32, -1 padded
    pos_cols: jax.Array,     # [P] int32, -1 padded
    row_valid: jax.Array,    # [B] bool
    col_valid: Optional[jax.Array],  # [N] bool or None (all real)
    n_real_cols: jax.Array,  # f32 scalar
    smoothing: float,
) -> jax.Array:
    """Fused ``loss = BCE_sum(q @ candᵀ)`` with a hand-written VJP.

    Identical math to ``score_against_candidates`` + indexed BCE, but the
    backward never scatters into the dense [B, N] score gradient: the
    elementwise part ``ct·(σ(s) − b)·mask`` fuses straight into the two
    gradient matmuls, and the positive-label term lands on dq/dcand as a
    [P, d] gather/scatter-add in f32 (dq[r] -= a·ct·cand[c],
    dcand[c] -= a·ct·q[r]).  Profile-driven: at B=512, N=100k the dense
    route spent 1.2 ms/step on layout copies around a 1k-element scatter."""
    return _bce_over_scores_fwd(
        q, cand, pos_rows, pos_cols, row_valid, col_valid, n_real_cols, smoothing
    )[0]


def _bce_over_scores_fwd(q, cand, pos_rows, pos_cols, row_valid, col_valid, n_real_cols, smoothing):
    from open_knowledge_graph_embeddings_tpu.ops.scoring import score_against_candidates

    scores = score_against_candidates(q, cand)
    mask = cell_mask(row_valid, col_valid, scores.shape[1])
    loss, _ = _bce_indexed_fwd(scores, pos_rows, pos_cols, mask, n_real_cols, smoothing)
    res = (q, cand, scores, pos_rows, pos_cols, row_valid, col_valid, n_real_cols)
    return loss, res


def _bce_over_scores_bwd(smoothing, res, ct):
    q, cand, scores, pos_rows, pos_cols, row_valid, col_valid, n_real_cols = res
    if smoothing > 0:
        a = 1.0 - smoothing
        b = (1.0 - smoothing) / n_real_cols
    else:
        a = 1.0
        b = 0.0
    mask = cell_mask(row_valid, col_valid, scores.shape[1])
    # elementwise part of dscores — consumed only by the two dots below, so
    # XLA fuses it into their operand reads and never materializes it
    base = jnp.where(mask, ct * (jax.nn.sigmoid(scores) - b), 0.0)
    dq = jax.lax.dot_general(
        base, cand,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dcand = jax.lax.dot_general(
        base, q,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    valid = pos_rows >= 0
    r = jnp.where(valid, pos_rows, 0)
    c = jnp.where(valid, pos_cols, 0)
    w = jnp.where(valid, -a * ct, 0.0)[:, None]
    dq = dq.at[r].add(w * cand[c].astype(jnp.float32))
    dcand = dcand.at[c].add(w * q[r].astype(jnp.float32))
    zf = jnp.zeros((), jnp.float32)
    return (dq.astype(q.dtype), dcand.astype(cand.dtype), None, None, None, None, zf)


bce_over_scores.defvjp(_bce_over_scores_fwd, _bce_over_scores_bwd)


def kl_div_sum(scores: jax.Array, labels: jax.Array, mask: jax.Array) -> jax.Array:
    """torch KLDivLoss(reduction='sum')(log_softmax(scores), labels):
    sum labels * (log labels - log_softmax(scores)), with 0*log0 = 0.
    Softmax runs over real columns only."""
    neg_inf = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(mask, scores, neg_inf)
    logp = jax.nn.log_softmax(masked_scores, axis=-1)
    safe_labels = jnp.where(labels > 0, labels, 1.0)
    per_cell = labels * (jnp.log(safe_labels) - logp)
    return jnp.sum(jnp.where(mask & (labels > 0), per_cell, 0.0))


def one_vs_n_loss(
    loss_type: str,
    scores: jax.Array,
    pos_rows: jax.Array,
    pos_cols: jax.Array,
    row_valid: jax.Array,
    col_valid: Optional[jax.Array],
    n_real_cols: jax.Array,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss_sum, normalizer_metric = number of positive cells)."""
    B, N = scores.shape
    mask = cell_mask(row_valid, col_valid, N)
    # BatchBuilder dedups (row, col) pairs, so the multi-hot count is the
    # valid-pair count and the label matrix never needs materializing for BCE
    normalizer_metric = jnp.sum((pos_rows >= 0).astype(jnp.float32))
    if loss_type == "bce":
        loss = bce_with_logits_sum_indexed(
            scores, pos_rows, pos_cols, mask, n_real_cols, label_smoothing
        )
    elif loss_type == "kl":
        labels = dense_labels(pos_rows, pos_cols, B, N)
        loss = kl_div_sum(scores, labels, mask)
    else:
        raise NotImplementedError(
            f"loss '{loss_type}' not supported; choose 'bce' or 'kl' (reference parity)"
        )
    return loss, normalizer_metric
