"""Vectorized filtered ranking — the eval half of the step library.

The reference computes ranks in a python loop over prefixes, repeating and
masking [num_golds, N] tensors per prefix (reference: openkge/dataset.py:423-453).
Here the whole batch ranks in-graph:

* ``true[g]`` = max over the gold's mention-alternative columns of the raw
  scores (credit the best alternative; reference :436-438),
* filtered scores = scores with every known-true cell set to -1e8
  (reference :440) and padding cells to -inf,
* ``rank[g]`` = #(filtered > true) + #(filtered == true) // 2
  (reference tie handling :441-445),

all as one gather + two masked row-reductions.  Per-prefix averaging in the
reference's meters cancels algebraically to a mean over golds (update with
value S_p/G_p and weight G_p accumulates S_p and G_p), so the host only
needs per-gold ranks and the gold count.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

FILTER_VALUE = -1e8  # reference filter mask value (openkge/dataset.py:440)


def scatter_mask(rows: jax.Array, cols: jax.Array, num_rows: int, num_cols: int) -> jax.Array:
    """[B, N] boolean mask from (row, col) pairs (-1 padded)."""
    valid = rows >= 0
    r = jnp.where(valid, rows, 0)
    c = jnp.where(valid, cols, 0)
    mask = jnp.zeros((num_rows, num_cols), bool)
    return mask.at[r, c].max(valid)


def ranks_from_scores(
    scores: jax.Array,  # [B, N] raw prediction scores
    filter_rows: jax.Array,  # [F] int32 (-1 pad)
    filter_cols: jax.Array,  # [F]
    gold_rows: jax.Array,  # [G] int32 (-1 pad)
    gold_mention_cols: jax.Array,  # [G, A] int32 (-1 pad)
    col_valid: Optional[jax.Array],  # [N] bool or None
) -> Tuple[jax.Array, jax.Array]:
    """Returns (ranks [G] int32, gold_valid [G] bool).

    The filter is applied as SPARSE corrections rather than a dense mask:
    counting over ``where(fmask, FILTER_VALUE, scores)`` equals counting
    over the raw scores, then — for each filter pair in the gold's row —
    removing that cell's raw contribution and adding FILTER_VALUE's.  This
    is exact because the builder's per-row filter sets are deduplicated
    (data/dataset.py attach_filter_index builds them as python sets) and
    batch rows are distinct prefixes.  It removes the [B, N] mask
    materialization, the [B, N] filtered copy and the [G, N] row-gather
    copy — at the full-vocabulary OLPBench shape (N = 2.47M) those were
    ~1.6 GB of HBM traffic per 32-row eval batch; what remains is one
    fused compare-reduce pass over the gathered gold rows plus O(G·F)
    scalar work."""
    B, N = scores.shape
    m_valid = gold_mention_cols >= 0
    # a gold with no valid mention column has true = -inf; the sparse
    # formulation below would give it a formulation-dependent rank (the
    # dense path counted every invalid column as a tie), so exclude such
    # degenerate golds explicitly instead
    gold_valid = (gold_rows >= 0) & jnp.any(m_valid, axis=1)
    g_rows = jnp.where(gold_valid, gold_rows, 0)

    # best alternative-mention score per gold (raw, unfiltered; -inf padding)
    m_cols = jnp.where(m_valid, gold_mention_cols, 0)
    gscores = scores[g_rows[:, None], m_cols]  # [G, A]
    true = jnp.max(jnp.where(m_valid, gscores, -jnp.inf), axis=1)  # [G]
    t = true[:, None]

    # one fused pass over the gold rows: gt/eq counts on RAW scores over
    # valid columns (invalid columns are -inf in the dense formulation:
    # never > t and never == t for the finite t of a real gold)
    srow = scores[g_rows]  # [G, N] — fuses into the two reductions
    ok = jnp.bool_(True) if col_valid is None else col_valid[None, :]
    false_pos = jnp.sum(((srow > t) & ok).astype(jnp.int32), axis=1)
    equals = jnp.sum(((srow == t) & ok).astype(jnp.int32), axis=1)

    # sparse filter corrections: a filtered cell's value is FILTER_VALUE,
    # so swap its raw contribution for FILTER_VALUE's in the gold's row
    f_valid = (filter_rows >= 0) & (filter_cols >= 0)
    fr = jnp.where(f_valid, filter_rows, 0)
    fc = jnp.where(f_valid, filter_cols, 0)
    fs = scores[fr, fc]  # [F]
    f_ok = f_valid if col_valid is None else f_valid & col_valid[fc]
    match = (fr[None, :] == g_rows[:, None]) & f_ok[None, :] & gold_valid[:, None]
    count = lambda cond: jnp.sum((match & cond).astype(jnp.int32), axis=1)
    false_pos = false_pos - count(fs[None, :] > t) + count(FILTER_VALUE > t)
    equals = equals - count(fs[None, :] == t) + count(FILTER_VALUE == t)

    ranks = false_pos + equals // 2
    return ranks.astype(jnp.int32), gold_valid


def filtered_topk(
    scores: jax.Array,  # [B, N]
    filter_rows: jax.Array,
    filter_cols: jax.Array,
    col_valid: Optional[jax.Array],
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k candidate columns per prefix under the same filtering as the
    ranking (known-true cells suppressed) — the ``log_predictions`` payload.
    The reference declares the flag but never implements it
    (reference: openkge/options.py:62, unused); here it is a real per-prefix
    prediction dump.  Returns (top_scores [B,k], top_cols [B,k])."""
    B, N = scores.shape
    fmask = scatter_mask(filter_rows, filter_cols, B, N)
    filtered = jnp.where(fmask, FILTER_VALUE, scores)
    if col_valid is not None:
        filtered = jnp.where(col_valid[None, :], filtered, -jnp.inf)
    top_scores, top_cols = jax.lax.top_k(filtered, min(k, N))
    return top_scores, top_cols.astype(jnp.int32)


def metric_sums_from_ranks(ranks: jax.Array, gold_valid: jax.Array) -> Dict[str, jax.Array]:
    """Summed metric contributions over valid golds (host divides by count)."""
    v = gold_valid
    r = ranks
    z = lambda x: jnp.sum(jnp.where(v, x, 0.0))
    return {
        "count": jnp.sum(v.astype(jnp.int32)),
        "mrr": z(1.0 / (r + 1.0)),
        "mr": z(r.astype(jnp.float32)),
        "h50": z((r < 50).astype(jnp.float32)),
        "h10": z((r < 10).astype(jnp.float32)),
        "h3": z((r < 3).astype(jnp.float32)),
        "h1": z((r < 1).astype(jnp.float32)),
    }
