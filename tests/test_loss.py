"""Loss functions vs torch semantics (BCE-with-logits sum, KLDiv sum,
label smoothing arithmetic)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from open_knowledge_graph_embeddings_tpu.train.loss import (
    apply_label_smoothing,
    bce_with_logits_sum,
    cell_mask,
    dense_labels,
    kl_div_sum,
    one_vs_n_loss,
)


def test_bce_matches_torch(rng):
    B, N = 4, 9
    scores = rng.standard_normal((B, N)).astype(np.float32) * 3
    labels = (rng.random((B, N)) < 0.3).astype(np.float32)
    mask = jnp.ones((B, N), bool)
    got = float(bce_with_logits_sum(jnp.asarray(scores), jnp.asarray(labels), mask))
    want = torch.nn.BCEWithLogitsLoss(reduction="sum")(
        torch.tensor(scores), torch.tensor(labels)
    ).item()
    assert got == np.float32(want) or abs(got - want) < 1e-3


def test_kl_matches_torch(rng):
    B, N = 3, 7
    scores = rng.standard_normal((B, N)).astype(np.float32)
    labels = (rng.random((B, N)) < 0.4).astype(np.float32)
    mask = jnp.ones((B, N), bool)
    got = float(kl_div_sum(jnp.asarray(scores), jnp.asarray(labels), mask))
    logp = torch.log_softmax(torch.tensor(scores), dim=1)
    want = torch.nn.KLDivLoss(reduction="sum")(logp, torch.tensor(labels)).item()
    assert abs(got - want) < 1e-3


def test_label_smoothing_matches_reference_arithmetic(rng):
    # reference: labels = (labels + 1/N) * (1 - smoothing), trainer.py:103-105
    B, N, s = 2, 5, 0.1
    labels = (rng.random((B, N)) < 0.5).astype(np.float32)
    got = np.asarray(apply_label_smoothing(jnp.asarray(labels), jnp.float32(N), s))
    want = (labels + 1.0 / N) * (1.0 - s)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_cells_excluded(rng):
    B, N = 3, 8
    scores = rng.standard_normal((B, N)).astype(np.float32)
    pos_rows = jnp.asarray([0, 1, -1, -1])
    pos_cols = jnp.asarray([2, 5, -1, -1])
    row_valid = jnp.asarray([True, True, False])
    col_valid = jnp.asarray([True] * 6 + [False] * 2)
    loss, nm = one_vs_n_loss(
        "bce", jnp.asarray(scores), pos_rows, pos_cols, row_valid, col_valid,
        jnp.float32(6),
    )
    # manual over the real 2x6 sub-block
    labels = np.zeros((B, N), np.float32)
    labels[0, 2] = 1
    labels[1, 5] = 1
    sub_scores = torch.tensor(scores[:2, :6])
    sub_labels = torch.tensor(labels[:2, :6])
    want = torch.nn.BCEWithLogitsLoss(reduction="sum")(sub_scores, sub_labels).item()
    assert abs(float(loss) - want) < 1e-3
    assert float(nm) == 2.0


def test_dense_labels_collapse_duplicates():
    lab = dense_labels(jnp.asarray([0, 0, 1]), jnp.asarray([3, 3, 2]), 2, 5)
    assert float(lab.sum()) == 2.0
    assert lab[0, 3] == 1.0 and lab[1, 2] == 1.0


class TestFusedBceOverScores:
    """bce_over_scores (fused score+loss custom VJP) must match the explicit
    score_against_candidates + one_vs_n_loss path in value and gradients."""

    @pytest.mark.parametrize("smoothing", [0.0, 0.1])
    @pytest.mark.parametrize("with_col_valid", [False, True])
    def test_value_and_grads_match(self, smoothing, with_col_valid):
        from open_knowledge_graph_embeddings_tpu.ops.scoring import (
            score_against_candidates,
        )
        from open_knowledge_graph_embeddings_tpu.train.loss import (
            bce_over_scores,
            one_vs_n_loss,
        )

        rng = np.random.default_rng(3)
        B, N, d, P = 6, 11, 8, 9
        q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
        cand = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
        pos_rows = np.full(P, -1, np.int32)
        pos_cols = np.full(P, -1, np.int32)
        pos_rows[:7] = rng.integers(0, B, 7)
        pos_cols[:7] = rng.integers(0, N - 2, 7)
        # dedup pairs (BatchBuilder contract)
        pairs = sorted(set(zip(pos_rows[:7], pos_cols[:7])))
        pos_rows[:] = -1; pos_cols[:] = -1
        for k, (r, c) in enumerate(pairs):
            pos_rows[k], pos_cols[k] = r, c
        row_valid = np.ones(B, bool); row_valid[-1] = False
        col_valid = None
        n_real = np.float32(N)
        if with_col_valid:
            col_valid = np.ones(N, bool); col_valid[-2:] = False
            n_real = np.float32(N - 2)
        pr, pc = jnp.asarray(pos_rows), jnp.asarray(pos_cols)
        rv = jnp.asarray(row_valid)
        cv = jnp.asarray(col_valid) if col_valid is not None else None
        nrc = jnp.float32(n_real)

        def explicit(q, cand):
            scores = score_against_candidates(q, cand)
            loss, _ = one_vs_n_loss("bce", scores, pr, pc, rv, cv, nrc, smoothing)
            return loss

        def fused(q, cand):
            return bce_over_scores(q, cand, pr, pc, rv, cv, nrc, smoothing)

        l0, (gq0, gc0) = jax.value_and_grad(explicit, argnums=(0, 1))(q, cand)
        l1, (gq1, gc1) = jax.value_and_grad(fused, argnums=(0, 1))(q, cand)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0), rtol=1e-5, atol=1e-6)
