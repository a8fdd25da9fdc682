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
    at flagship 4096x4096) and replaces the dense label read in the backward
    with an in-place 8k-element scatter into the elementwise gradient."""
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
    return base - a * jnp.sum(s_pos)


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
