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


def eval_stats_chunked(
    q: jax.Array,  # [B, d] query vectors
    cand_emb: jax.Array,  # [N, d] candidate matrix (the eval cache)
    pos_rows: jax.Array,
    pos_cols: jax.Array,
    row_valid: jax.Array,
    col_valid: Optional[jax.Array],
    n_real_cols: jax.Array,
    filter_rows: jax.Array,
    filter_cols: jax.Array,
    gold_rows: jax.Array,
    gold_mention_cols: jax.Array,
    label_smoothing: float = 0.0,
    chunk: int = 131072,
    loss_type: str = "bce",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Loss (BCE or KL) + filtered ranks WITHOUT materializing [B, N] scores.

    At full-vocabulary scale (N = 2.47M) the dense formulation writes the
    [B, N] score matrix and gathers [G, N] gold rows — at eval block 256
    that is ~7 GB of HBM intermediates per batch and measured 3-8x off
    roofline.  Here everything is two `lax.scan` passes over candidate
    chunks (scores recomputed rather than stored — FLOPs are far cheaper
    than HBM at this shape):

    * pass A accumulates the loss terms (BCE per-cell terms, or a running
      online logsumexp per row for KL — reference KL objective:
      openkge/trainer.py:99-111), each gold's best-mention score
      (``true``) and the filter-cell values,
    * pass B counts ``>``/``==`` against the final ``true``.

    Exactness notes: pass A extracts ``true`` and the filter values from a
    [B, C] chunk matmul while pass B compares using a [G, C] matmul over
    duplicated q rows.  XLA does not *guarantee* identical accumulation
    order across differently-shaped dots, but each output element of both
    dots is an independent length-d contraction and on every supported
    backend the two programs produce bitwise-identical values for
    identical rows — asserted with engineered exact-tie cells in the
    CPU parity test AND the device-marked variant
    (tests/test_reference_parity.py::test_chunked_eval_matches_dense,
    tests/test_pallas_lstm.py::test_chunked_eval_tie_cells_tpu).  The
    alternative — gathering gold rows out of the [B, C] chunk result so
    both passes share one program shape — was measured 3.2x slower at the
    2.47M-candidate shape (the gather breaks the compare-reduce fusion and
    materializes [G, C] per chunk), so the cross-shape invariant is
    verified rather than designed away.  The sparse filter corrections are
    the same arithmetic as :func:`ranks_from_scores`.

    Returns ``(loss_sum, ranks [G], gold_valid [G])``.
    """
    B, d = q.shape
    N = cand_emb.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)

    m_valid = gold_mention_cols >= 0
    gold_valid = (gold_rows >= 0) & jnp.any(m_valid, axis=1)
    g_rows = jnp.where(gold_valid, gold_rows, 0)
    q_g = q[g_rows]  # [G, d] — rows duplicated per gold (see docstring)

    p_valid = pos_rows >= 0
    pr = jnp.where(p_valid, pos_rows, 0)
    pc_cols = jnp.where(p_valid, pos_cols, 0)

    f_valid = (filter_rows >= 0) & (filter_cols >= 0)
    fr = jnp.where(f_valid, filter_rows, 0)
    fc = jnp.where(f_valid, filter_cols, 0)

    if label_smoothing > 0:
        a = 1.0 - label_smoothing
        b = (1.0 - label_smoothing) / n_real_cols
    else:
        a, b = 1.0, 0.0

    col_arange = jnp.arange(C)

    def chunk_scores(i, qq):
        c0 = i * C
        s0 = jnp.minimum(c0, N - C)  # dynamic_slice clamp, made explicit
        blk = jax.lax.dynamic_slice_in_dim(cand_emb, s0, C)
        col_ids = s0 + col_arange
        okc = (col_ids >= c0) & (col_ids < N)  # clamp overlap processed once
        if col_valid is not None:
            okc &= jax.lax.dynamic_slice_in_dim(col_valid, s0, C)
        s = jax.lax.dot_general(
            qq, blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s, s0, c0, col_ids, okc

    def body_a(carry, i):
        # one [B, C] matmul per chunk: loss terms plus SCALAR extraction of
        # the gold-mention and filter-cell values (pass B re-runs the SAME
        # program and compares against these — see the docstring)
        loss_acc, true_acc, fs_acc = carry
        s, s0, c0, col_ids, okc = chunk_scores(i, q)
        if loss_type == "kl":
            # online logsumexp over valid cells of each valid row;
            # loss = sum_positives (logsumexp_row - s_pos), the KLDivLoss
            # (sum) of log_softmax vs 0/1 multi-hot labels
            m_run, se_run, pos_acc = loss_acc
            ok_cell = row_valid[:, None] & okc[None, :]
            cm = jnp.max(jnp.where(ok_cell, s, -jnp.inf), axis=1)
            m_new = jnp.maximum(m_run, cm)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            se_run = se_run * jnp.exp(
                jnp.where(jnp.isfinite(m_run), m_run - m_safe, -jnp.inf)
            ) + jnp.sum(
                jnp.where(ok_cell, jnp.exp(s - m_safe[:, None]), 0.0), axis=1
            )
            in_p = p_valid & (pc_cols >= c0) & (pc_cols < c0 + C) & (pc_cols < N)
            v_pos = s[pr, jnp.clip(pc_cols - s0, 0, C - 1)]
            pos_acc += jnp.sum(jnp.where(in_p, v_pos, 0.0))
            loss_acc = (m_new, se_run, pos_acc)
        else:
            per_cell = jnp.maximum(s, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(s))) - s * b
            loss_acc += jnp.sum(
                jnp.where(row_valid[:, None] & okc[None, :], per_cell, 0.0)
            )
            in_p = p_valid & (pc_cols >= c0) & (pc_cols < c0 + C) & (pc_cols < N)
            v_pos = s[pr, jnp.clip(pc_cols - s0, 0, C - 1)]
            loss_acc -= a * jnp.sum(jnp.where(in_p, v_pos, 0.0))

        in_m = m_valid & (gold_mention_cols >= c0) & (gold_mention_cols < c0 + C) & (
            gold_mention_cols < N
        )
        vm = s[g_rows[:, None], jnp.clip(gold_mention_cols - s0, 0, C - 1)]  # [G, A]
        true_acc = jnp.maximum(
            true_acc, jnp.max(jnp.where(in_m, vm, -jnp.inf), axis=1)
        )
        in_f = f_valid & (fc >= c0) & (fc < c0 + C) & (fc < N)
        vf = s[fr, jnp.clip(fc - s0, 0, C - 1)]
        fs_acc = jnp.where(in_f, vf, fs_acc)
        return (loss_acc, true_acc, fs_acc), None

    G = g_rows.shape[0]
    F = fr.shape[0]
    if loss_type == "kl":
        loss_init = (
            jnp.full((B,), -jnp.inf),  # running row max
            jnp.zeros((B,), jnp.float32),  # running sum-exp
            jnp.zeros((), jnp.float32),  # sum of positive-cell scores
        )
    else:
        loss_init = jnp.zeros((), jnp.float32)
    (loss_acc, true, fs), _ = jax.lax.scan(
        body_a,
        (loss_init, jnp.full((G,), -jnp.inf), jnp.zeros((F,))),
        jnp.arange(n_chunks),
    )
    if loss_type == "kl":
        m_run, se_run, pos_acc = loss_acc
        lse = jnp.where(
            jnp.isfinite(m_run), m_run + jnp.log(jnp.maximum(se_run, 1e-38)), 0.0
        )
        # each positive contributes (logsumexp of its row - its score)
        loss_sum = jnp.sum(jnp.where(p_valid, lse[pr], 0.0)) - pos_acc
    else:
        loss_sum = loss_acc

    t = true[:, None]

    def body_b(carry, i):
        fp, eq = carry
        sg, s0, c0, col_ids, okc = chunk_scores(i, q_g)
        fp += jnp.sum(((sg > t) & okc[None, :]).astype(jnp.int32), axis=1)
        eq += jnp.sum(((sg == t) & okc[None, :]).astype(jnp.int32), axis=1)
        return (fp, eq), None

    (false_pos, equals), _ = jax.lax.scan(
        body_b,
        (jnp.zeros((G,), jnp.int32), jnp.zeros((G,), jnp.int32)),
        jnp.arange(n_chunks),
    )

    # sparse filter corrections — same arithmetic as ranks_from_scores
    f_ok = f_valid if col_valid is None else f_valid & col_valid[fc]
    match = (fr[None, :] == g_rows[:, None]) & f_ok[None, :] & gold_valid[:, None]
    count = lambda cond: jnp.sum((match & cond).astype(jnp.int32), axis=1)
    false_pos = false_pos - count(fs[None, :] > t) + count(FILTER_VALUE > t)
    equals = equals - count(fs[None, :] == t) + count(FILTER_VALUE == t)

    ranks = false_pos + equals // 2
    return loss_sum, ranks.astype(jnp.int32), gold_valid


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


def filtered_topk_chunked(
    q: jax.Array,  # [B, d] query vectors
    cand_emb: jax.Array,  # [N, d] candidate matrix (the eval cache)
    filter_rows: jax.Array,
    filter_cols: jax.Array,
    col_valid: Optional[jax.Array],
    k: int,
    chunk: int = 131072,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`filtered_topk` without the [B, N] score matrix: per-chunk
    top-k merged with the running top-k via one ``lax.top_k`` over the
    [B, 2k] concatenation — exact, because every column's filtered value
    enters exactly one chunk's candidate set and top-k/merge is
    associative.  Same chunk-scan skeleton as :func:`eval_stats_chunked`."""
    B, d = q.shape
    N = cand_emb.shape[0]
    C = min(chunk, N)
    n_chunks = -(-N // C)
    kk = min(k, N)

    f_valid = (filter_rows >= 0) & (filter_cols >= 0)
    fr = jnp.where(f_valid, filter_rows, 0)
    fc = jnp.where(f_valid, filter_cols, 0)
    col_arange = jnp.arange(C)

    def body(carry, i):
        ts, tc = carry
        c0 = i * C
        s0 = jnp.minimum(c0, N - C)
        blk = jax.lax.dynamic_slice_in_dim(cand_emb, s0, C)
        col_ids = s0 + col_arange
        okc = (col_ids >= c0) & (col_ids < N)
        if col_valid is not None:
            okc &= jax.lax.dynamic_slice_in_dim(col_valid, s0, C)
        s = jax.lax.dot_general(
            q, blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # known-true suppression inside the chunk
        in_f = f_valid & (fc >= c0) & (fc < c0 + C) & (fc < N)
        fmask = jnp.zeros((B, C), bool).at[
            jnp.where(in_f, fr, 0), jnp.where(in_f, fc - s0, 0)
        ].max(in_f)
        s = jnp.where(fmask, FILTER_VALUE, s)
        s = jnp.where(okc[None, :], s, -jnp.inf)
        cs, cc = jax.lax.top_k(s, kk)
        merged_s, pos = jax.lax.top_k(
            jnp.concatenate([ts, cs], axis=1), kk
        )
        merged_c = jnp.take_along_axis(
            jnp.concatenate([tc, (col_ids[cc]).astype(jnp.int32)], axis=1), pos, axis=1
        )
        return (merged_s, merged_c), None

    (top_scores, top_cols), _ = jax.lax.scan(
        body,
        (jnp.full((B, kk), -jnp.inf), jnp.zeros((B, kk), jnp.int32)),
        jnp.arange(n_chunks),
    )
    return top_scores, top_cols


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
