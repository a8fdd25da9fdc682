"""Pallas LSTM kernel vs the lax.scan reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from open_knowledge_graph_embeddings_tpu.ops import lstm as lstm_mod
from open_knowledge_graph_embeddings_tpu.ops.pallas import lstm_kernel


@pytest.fixture
def shapes():
    B, L, H = 16, 5, 128
    rng = np.random.default_rng(0)
    # time-major [L, B, 4H]
    x_proj = rng.standard_normal((L, B, 4 * H)).astype(np.float32) * 0.3
    w_hh_t = rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.1
    return jnp.asarray(x_proj), jnp.asarray(w_hh_t)


def _scan_reference(x_proj_tm, w_hh_t):
    L, B, H4 = x_proj_tm.shape
    H = H4 // 4

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, H), jnp.float32)
    (_, _), hs = jax.lax.scan(step, (h0, h0), x_proj_tm)
    return hs


def test_forward_matches_scan(shapes):
    x_proj, w_hh_t = shapes
    with pltpu.force_tpu_interpret_mode():
        hs = lstm_kernel.lstm_scan_pallas(x_proj, w_hh_t)
    want = _scan_reference(x_proj, w_hh_t)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_backward_matches_scan(shapes):
    x_proj, w_hh_t = shapes

    def loss_pallas(xp, w):
        with pltpu.force_tpu_interpret_mode():
            hs = lstm_kernel.lstm_scan_pallas(xp, w)
        return jnp.sum(hs * jnp.cos(hs))

    def loss_scan(xp, w):
        hs = _scan_reference(xp, w)
        return jnp.sum(hs * jnp.cos(hs))

    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x_proj, w_hh_t)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(x_proj, w_hh_t)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s), rtol=1e-4, atol=1e-4)


def test_supported_shapes():
    assert lstm_kernel._pick_tile(4096) == 256
    assert lstm_kernel._pick_tile(24) == 8
    assert lstm_kernel._pick_tile(7) == 0


class TestPallasAdagrad:
    def test_kernel_matches_xla_rule(self):
        from jax.experimental.pallas import tpu as pltpu
        from open_knowledge_graph_embeddings_tpu.ops.pallas.adagrad_kernel import (
            adagrad_update_pallas,
        )

        rng = np.random.default_rng(0)
        V, d = 1024, 128
        g = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
        p = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
        acc = jnp.asarray(np.abs(rng.standard_normal((V, d))).astype(np.float32))
        clr, wd, eps = jnp.float32(0.3), jnp.float32(1e-10), jnp.float32(1e-10)
        with pltpu.force_tpu_interpret_mode():
            new_p, new_acc = adagrad_update_pallas(g, p, acc, clr, wd, eps)
        g2 = g + wd * p
        want_acc = acc + g2 * g2
        want_p = p - clr * g2 / (jnp.sqrt(want_acc) + eps)
        np.testing.assert_allclose(np.asarray(new_acc), np.asarray(want_acc), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_p), np.asarray(want_p), rtol=1e-5, atol=1e-6)

    @pytest.mark.tpu
    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="ragged final blocks need real Mosaic lowering (the "
        "interpreter pads output shapes); run with "
        "OKET_TPU_TESTS=1 python -m pytest -m tpu tests/",
    )
    def test_kernel_ragged_height(self):
        """Non-512-divisible table heights (FB15k-237: 14541 rows; relation
        token vocabs): the ceil grid's masked final block must update the
        tail rows exactly."""
        from open_knowledge_graph_embeddings_tpu.ops.pallas.adagrad_kernel import (
            adagrad_update_pallas,
        )

        rng = np.random.default_rng(1)
        V, d = 1234, 128  # 1234 = 2*512 + 210
        g = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
        p = jnp.asarray(rng.standard_normal((V, d)).astype(np.float32))
        acc = jnp.asarray(np.abs(rng.standard_normal((V, d))).astype(np.float32))
        clr, wd, eps = jnp.float32(0.3), jnp.float32(1e-10), jnp.float32(1e-10)
        new_p, new_acc = adagrad_update_pallas(g, p, acc, clr, wd, eps)
        g2 = g + wd * p
        want_acc = acc + g2 * g2
        want_p = p - clr * g2 / (jnp.sqrt(want_acc) + eps)
        assert new_p.shape == (V, d)
        np.testing.assert_allclose(np.asarray(new_acc), np.asarray(want_acc), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_p), np.asarray(want_p), rtol=1e-5, atol=1e-6)


class TestFusedLengthAwareLSTM:
    """Length-aware fused encoder (interpreter mode on CPU): fwd value and
    all gradients must match the plain scan + hoisted projection at active
    positions; pad positions are garbage-by-design and excluded."""

    def _setup(self):
        rng = np.random.default_rng(1)
        L, B, D = 5, 32, 128
        params = lstm_mod.init_lstm_params(jax.random.key(0), D, D)
        lens = np.sort(rng.integers(0, L + 1, B))[::-1].copy().astype(np.int32)
        emb = jnp.asarray(rng.standard_normal((L, B, D)).astype(np.float32) * 0.3)
        return L, B, D, params, jnp.asarray(lens), lens, emb

    @staticmethod
    def _select(out_tm, lens_j, L):
        idx = jnp.clip(lens_j - 1, 0, L - 1)
        return jnp.take_along_axis(out_tm, idx[None, :, None], axis=0)[0]

    def test_fused_matches_scan(self):
        L, B, D, params, lens_j, lens, emb = self._setup()

        def loss_fused(p, x):
            out = lstm_mod.lstm_forward_tm_sorted(p, x, lens_j)
            return jnp.sum(self._select(out, lens_j, L) ** 2)

        def loss_ref(p, x):
            return jnp.sum(self._select(lstm_mod.lstm_forward_tm(p, x), lens_j, L) ** 2)

        with pltpu.force_tpu_interpret_mode():
            v1, (gp1, gx1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, emb)
        v2, (gp2, gx2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, emb)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for k in gp1:
            np.testing.assert_allclose(
                np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )
        # demb: only positions < max(len, 1) are defined in the fused path
        active = np.arange(L)[:, None] < np.maximum(lens, 1)[None, :]
        a, b = np.asarray(gx1), np.asarray(gx2)
        np.testing.assert_allclose(a[active], b[active], rtol=1e-4, atol=1e-5)

    def test_last_fused_matches_scan(self):
        """lstm_last_fused (in-kernel last-state select + dlast injection)
        must match scan + take_along_axis in value AND all gradients."""
        L, B, D, params, lens_j, lens, emb = self._setup()

        def loss_fused(p, x):
            last = lstm_mod.lstm_last_fused(p, x, lens_j)
            return jnp.sum(last ** 2)

        def loss_ref(p, x):
            return jnp.sum(self._select(lstm_mod.lstm_forward_tm(p, x), lens_j, L) ** 2)

        with pltpu.force_tpu_interpret_mode():
            v1, (gp1, gx1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, emb)
        v2, (gp2, gx2) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, emb)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for k in gp1:
            np.testing.assert_allclose(
                np.asarray(gp1[k]), np.asarray(gp2[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )
        active = np.arange(L)[:, None] < np.maximum(lens, 1)[None, :]
        a, b = np.asarray(gx1), np.asarray(gx2)
        np.testing.assert_allclose(a[active], b[active], rtol=1e-4, atol=1e-5)

    def test_last_fused_value_matches_full_fused(self):
        """The new last-state kernel and the full-sequence kernel agree."""
        L, B, D, params, lens_j, lens, emb = self._setup()
        with pltpu.force_tpu_interpret_mode():
            last = lstm_mod.lstm_last_fused(params, emb, lens_j)
            full = self._select(
                lstm_mod.lstm_forward_tm_sorted(params, emb, lens_j), lens_j, L
            )
        np.testing.assert_allclose(np.asarray(last), np.asarray(full), rtol=1e-5, atol=1e-6)

    @pytest.mark.tpu
    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="scoped-VMEM budgeting is a real Mosaic compile property; "
        "run with OKET_TPU_TESTS=1 python -m pytest -m tpu tests/",
    )
    def test_bwd_compiles_at_vmem_marginal_batch(self):
        """B=4352 (a data-parallel per-host slice: 256 rows + 4096 shared
        candidates), H=512: the backward's working set sits at ~15-16.7 MB
        and tipped over Mosaic's default 16 MB scoped-vmem cap — the
        pallas_call now raises the cap (lstm_kernel._fused_bwd).  This test
        is the compile-and-run regression for that class of shape."""
        L, B, D = 10, 4352, 512
        rng = np.random.default_rng(2)
        params = lstm_mod.init_lstm_params(jax.random.key(0), D, D)
        lens = np.sort(rng.integers(1, L + 1, B))[::-1].copy().astype(np.int32)
        emb = jnp.asarray(rng.standard_normal((L, B, D)).astype(np.float32) * 0.1)

        def loss(p, x):
            out = lstm_mod.lstm_forward_tm_sorted(p, x, jnp.asarray(lens))
            return jnp.sum(self._select(out, jnp.asarray(lens), L) ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(params, emb)
        assert np.isfinite(float(val))
        for k, g in grads.items():
            assert np.isfinite(np.asarray(g)).all(), k

    @pytest.mark.tpu
    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="scoped-VMEM budgeting is a real Mosaic compile property; "
        "run with OKET_TPU_TESTS=1 python -m pytest -m tpu tests/",
    )
    def test_last_fused_bwd_compiles_at_vmem_marginal_batch(self):
        """Same VMEM-marginal shape for the round-4 last-state kernels
        (lstm_encode_last_fused): dlast is tile-constant where dhs was
        per-step, so the working set is slightly smaller — this pins the
        compile-and-run regression for the new kernel pair."""
        L, B, D = 10, 4352, 512
        rng = np.random.default_rng(3)
        params = lstm_mod.init_lstm_params(jax.random.key(0), D, D)
        lens = np.sort(rng.integers(1, L + 1, B))[::-1].copy().astype(np.int32)
        emb = jnp.asarray(rng.standard_normal((L, B, D)).astype(np.float32) * 0.1)

        def loss(p, x):
            last = lstm_mod.lstm_last_fused(p, x, jnp.asarray(lens))
            return jnp.sum(last ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss))(params, emb)
        assert np.isfinite(float(val))
        for k, g in grads.items():
            assert np.isfinite(np.asarray(g)).all(), k

    def test_compose_sort_is_invisible(self, toy_dataset_dir):
        """The length sort inside LSTM _compose must not change encoder
        outputs (forced fused path in interpreter mode vs plain path)."""
        import os
        from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
        from open_knowledge_graph_embeddings_tpu.models import build_model

        tds = OneToNMentionRelationDataset(
            dataset_dir=toy_dataset_dir, input_file="train.txt",
            is_training_data=True, batch_size=4,
        )
        model = build_model(
            "LSTMComplexRelationModel", tds.meta, entity_slot_size=128,
        )
        variables = model.init(jax.random.key(0))
        ids = jnp.asarray((np.arange(8) % 6 + 2).astype(np.int32))
        plain, _, _ = model.embedder.encode_entity(variables, ids)
        import open_knowledge_graph_embeddings_tpu.models.embedders as emb_mod
        orig = emb_mod.lstm_fused_supported
        emb_mod.lstm_fused_supported = lambda *a: True
        try:
            with pltpu.force_tpu_interpret_mode():
                fused, _, _ = model.embedder.encode_entity(variables, ids)
        finally:
            emb_mod.lstm_fused_supported = orig
        np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=1e-5, atol=1e-6)

    def test_encode_entity_pair_matches_two_calls(self, toy_dataset_dir):
        """encode_entity_pair (one fused LSTM pass over concat rows) must be
        numerically identical to two sequential encode_entity calls —
        including BN batch statistics and dropout draws."""
        from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
        from open_knowledge_graph_embeddings_tpu.models import build_model

        tds = OneToNMentionRelationDataset(
            dataset_dir=toy_dataset_dir, input_file="train.txt",
            is_training_data=True, batch_size=4,
        )
        model = build_model(
            "LSTMComplexRelationModel", tds.meta, entity_slot_size=128,
            dropout=0.25, normalize="batchnorm",
        )
        variables = model.init(jax.random.key(0))
        ids_a = jnp.asarray((np.arange(8) % 6 + 2).astype(np.int32))
        ids_b = jnp.asarray((np.arange(6)[::-1] % 6 + 2).astype(np.int32))
        ra, rb = jax.random.split(jax.random.key(7))

        xa0, state0, _ = model.embedder.encode_entity(
            variables, ids_a, train=True, rng=ra
        )
        v1 = {**variables, "state": state0}
        xb0, state1, _ = model.embedder.encode_entity(v1, ids_b, train=True, rng=rb)

        xa, xb, state, _ = model.embedder.encode_entity_pair(
            variables, ids_a, ids_b, train=True, rng_a=ra, rng_b=rb
        )
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xa0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xb0), rtol=1e-5, atol=1e-6)
        for k in ("mean", "var", "count"):
            np.testing.assert_allclose(
                np.asarray(state["entity_bn"][k]),
                np.asarray(state1["entity_bn"][k]),
                rtol=1e-5, atol=1e-7, err_msg=k,
            )

    def test_encode_entity_pair_eval_mode(self, toy_dataset_dir):
        """Eval-mode (running-stats BN, no dropout) pair == two calls."""
        from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
        from open_knowledge_graph_embeddings_tpu.models import build_model

        tds = OneToNMentionRelationDataset(
            dataset_dir=toy_dataset_dir, input_file="train.txt",
            is_training_data=True, batch_size=4,
        )
        model = build_model(
            "LSTMComplexRelationModel", tds.meta, entity_slot_size=128,
            dropout=0.25, normalize="batchnorm",
        )
        variables = model.init(jax.random.key(0))
        ids_a = jnp.asarray((np.arange(8) % 6 + 2).astype(np.int32))
        ids_b = jnp.asarray((np.arange(6)[::-1] % 6 + 2).astype(np.int32))
        xa0, _, _ = model.embedder.encode_entity(variables, ids_a, train=False)
        xb0, _, _ = model.embedder.encode_entity(variables, ids_b, train=False)
        xa, xb, _, _ = model.embedder.encode_entity_pair(
            variables, ids_a, ids_b, train=False
        )
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xa0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xb0), rtol=1e-5, atol=1e-6)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="verifies the cross-shape dot invariant on the real backend; "
    "run with OKET_TPU_TESTS=1 python -m pytest -m tpu tests/",
)
def test_chunked_eval_tie_cells_tpu():
    """On-device check of the eval_stats_chunked exactness assumption: the
    [B, C] extraction matmul (pass A) and the [G, C] comparison matmul
    (pass B) produce bitwise-identical values for identical rows, so
    engineered tie cells (duplicate candidate embeddings) rank exactly as
    in the dense formulation.  XLA does not guarantee this across
    differently-shaped dots — this pins it per backend (see the
    train/evaluate.py docstring; ADVICE r4)."""
    from open_knowledge_graph_embeddings_tpu.train.evaluate import (
        eval_stats_chunked,
        ranks_from_scores,
    )

    rng = np.random.default_rng(3)
    B, N, d = 8, 4096, 128
    q = rng.standard_normal((B, d)).astype(np.float32)
    cand = rng.standard_normal((N, d)).astype(np.float32)
    # many exact-tie cells: clusters of duplicated candidate rows
    for base in range(0, 64, 4):
        cand[base + 1] = cand[base]
        cand[base + 2] = cand[base]
    scores = jnp.asarray(q) @ jnp.asarray(cand).T

    G = 16
    g_rows = np.repeat(np.arange(B), 2)[:G].astype(np.int32)
    # gold mentions point INTO the duplicate clusters -> 'true' ties
    # against the other copies of the same embedding
    g_ments = (np.arange(G)[:, None] * 4 % 64).astype(np.int32)
    fr = np.full(8, -1, np.int32)
    fc = np.full(8, -1, np.int32)
    pos_r = np.full(4, -1, np.int32)
    pos_c = np.full(4, -1, np.int32)

    ranks_d, valid_d = ranks_from_scores(
        scores, jnp.asarray(fr), jnp.asarray(fc),
        jnp.asarray(g_rows), jnp.asarray(g_ments), None,
    )
    _, ranks_c, valid_c = eval_stats_chunked(
        jnp.asarray(q), jnp.asarray(cand),
        jnp.asarray(pos_r), jnp.asarray(pos_c),
        jnp.ones(B, bool), None, jnp.float32(N),
        jnp.asarray(fr), jnp.asarray(fc),
        jnp.asarray(g_rows), jnp.asarray(g_ments),
        0.0, chunk=1024,
    )
    np.testing.assert_array_equal(np.asarray(valid_c), np.asarray(valid_d))
    np.testing.assert_array_equal(np.asarray(ranks_c), np.asarray(ranks_d))
