"""Fused LSTM recurrence as Pallas TPU kernels.

The XLA `lax.scan` LSTM (ops/lstm.py) round-trips the [B, 4H] gate tensor
and the f32 cell state through HBM on every time step — measured
HBM-bound at ~3x the roofline on v5e.  These kernels keep h and c resident
in VMEM across the whole sequence and fuse the gate math into the
recurrent matmul:

* forward: grid (batch_tiles, L); per step one [TB, H] x [H, 4H] MXU
  matmul + VPU gate math; writes hs/cs per step (bwd residuals),
* backward: same grid with time reversed; recomputes the gate activations
  from residuals, accumulates dW_hh in VMEM scratch per batch tile, and
  emits dx_proj (from which bias/W_ih/input grads follow as plain matmuls
  outside the kernel).

All sequence tensors are **time-major** [L, B, ·] so every block is
(1, TB, feature) — the TPU tiling constraint applies to the last two dims
only.  The input projection x_proj = x @ W_ih^T + b stays outside: it is
one large static matmul XLA already runs at peak MXU utilization.

Used automatically by ops/lstm.py on TPU for aligned shapes; the scan
fallback remains for CPU tests and odd shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(B: int) -> int:
    # 256 keeps the working set (double-buffered x_proj blocks + weights +
    # h/c scratch) under the 16MB VMEM budget at H=512
    for tb in (256, 128, 64, 32, 16, 8):
        if B % tb == 0:
            return tb
    return 0


# ----------------------------------------------------------------- forward


def _fwd_kernel(xp_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
    )
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    h_scr[:] = h
    c_scr[:] = c
    hs_ref[0] = h.astype(hs_ref.dtype)
    cs_ref[0] = c.astype(cs_ref.dtype)


def _lstm_fwd_pallas(x_proj_tm: jax.Array, w_hh_t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x_proj_tm [L, B, 4H], w_hh_t [H, 4H] -> (hs, cs) [L, B, H].

    Sequence tensors (x_proj, hs, cs) stay in x_proj's dtype — bf16 in the
    mixed-precision path — while the recurrent state and gate math are f32
    in VMEM scratch."""
    L, B, H4 = x_proj_tm.shape
    H = H4 // 4
    dt = x_proj_tm.dtype
    TB = _pick_tile(B)
    grid = (B // TB, L)
    hs, cs = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB, H4), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda b, t: (t, b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, H), dt),
            jax.ShapeDtypeStruct((L, B, H), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )(x_proj_tm, w_hh_t)
    return hs, cs


# ---------------------------------------------------------------- backward


def _bwd_kernel(
    xp_ref, whh_ref, cs_ref, hprev_ref, cprev_ref, dhs_ref,
    dxp_ref,
    dh_scr, dc_scr,
):
    t_rev = pl.program_id(1)
    L = pl.num_programs(1)

    @pl.when(t_rev == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    # hprev/cprev are views of hs/cs one step back in time (their BlockSpecs
    # clamp t-1 to 0); at forward t == 0 the true previous state is zeros
    first = (t_rev == L - 1).astype(jnp.float32)
    h_prev = hprev_ref[0] * (1.0 - first).astype(hprev_ref.dtype)
    c_prev = cprev_ref[0].astype(jnp.float32) * (1.0 - first)
    c_t = cs_ref[0].astype(jnp.float32)

    # recompute gate activations
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_prev.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
    )
    H = c_t.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])

    dh = dh_scr[:] + dhs_ref[0].astype(jnp.float32)
    tc = jnp.tanh(c_t)
    do = dh * tc
    dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dc_prev = dc * f

    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    dxp_ref[0] = dgates.astype(dxp_ref.dtype)
    # dh_prev = dgates @ w_hh^T   ([TB,4H] x [4H,H])
    dh_scr[:] = jax.lax.dot_general(
        dgates.astype(whh_ref.dtype), whh_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dc_scr[:] = dc_prev


def _lstm_bwd_pallas(
    x_proj_tm: jax.Array, w_hh_t: jax.Array, hs: jax.Array, cs: jax.Array, dhs: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Time-major residuals; returns (dx_proj [L, B, 4H], dw_hh_t [H, 4H])."""
    L, B, H4 = x_proj_tm.shape
    H = H4 // 4
    dt = x_proj_tm.dtype
    TB = min(_pick_tile(B), 128)  # smaller tile: bwd streams 6 seq tensors
    grid = (B // TB, L)

    # h_prev/c_prev are the same hs/cs arrays viewed one step back in time
    # (block index clamped at the sequence start; the kernel zero-masks the
    # forward-t==0 step) — no shifted copies are materialized
    rev = lambda b, t: (L - 1 - t, b, 0)
    rev_prev = lambda b, t: (jnp.maximum(L - 2 - t, 0), b, 0)
    dxp = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TB, H4), rev, memory_space=pltpu.VMEM),  # x_proj
            pl.BlockSpec((H, H4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),  # cs
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # hs[t-1]
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # cs[t-1]
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),  # dhs
        ],
        out_specs=pl.BlockSpec((1, TB, H4), rev, memory_space=pltpu.VMEM),  # dx_proj
        out_shape=jax.ShapeDtypeStruct((L, B, H4), dt),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )(x_proj_tm, w_hh_t, cs, hs, cs, dhs)
    # dW_hh = sum_{t>=1} hs[t-1]^T dgates[t] — dx_proj IS dgates, so the
    # weight gradient is one large static matmul XLA runs at peak off the
    # kernel (the t==0 term vanishes because h_prev there is zeros)
    dw = jnp.einsum(
        "lbh,lbg->hg", hs[:-1], dxp[1:], preferred_element_type=jnp.float32
    )
    return dxp, dw


# -------------------------------------------------------------- custom vjp


@jax.custom_vjp
def lstm_scan_pallas(x_proj_tm: jax.Array, w_hh_t: jax.Array) -> jax.Array:
    """Time-major LSTM recurrence: [L, B, 4H] x [H, 4H] -> hs [L, B, H]."""
    hs, _ = _lstm_fwd_pallas(x_proj_tm, w_hh_t)
    return hs


def _vjp_fwd(x_proj_tm, w_hh_t):
    hs, cs = _lstm_fwd_pallas(x_proj_tm, w_hh_t)
    return hs, (x_proj_tm, w_hh_t, hs, cs)


def _vjp_bwd(res, dhs):
    x_proj_tm, w_hh_t, hs, cs = res
    dxp, dw = _lstm_bwd_pallas(x_proj_tm, w_hh_t, hs, cs, dhs)
    return dxp, dw.astype(w_hh_t.dtype)


lstm_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_supported(B: int, L: int, H: int) -> bool:
    import os

    if os.environ.get("OKET_DISABLE_PALLAS"):
        return False
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return False
        except Exception:
            return False
    return H % 128 == 0 and _pick_tile(B) >= 8


# --------------------------------------- fused, length-aware encoder kernels
#
# The scan kernels above compute every (t, row) position — for padded token
# sequences (mentions average far fewer tokens than max_length) roughly half
# the LSTM FLOPs land on pads whose outputs are never read.  The fused
# encoder exploits that: the caller sorts sequences by length (descending),
# so the rows active at time t are a prefix of the batch, and a
# scalar-prefetched per-step tile count lets whole (t, batch-tile) grid
# steps skip both compute and DMA (block index maps clamp to the last
# active step, which Pallas's pipeline recognizes as a revisit).
#
# The input projection (x @ W_ih^T + b) and the weight/bias gradients are
# fused into the kernels too, so x_proj / dgates never round-trip HBM and
# the dW matmuls also skip pad positions.  Gradient layout notes:
#   dW accumulates in f32 VMEM across the whole grid (constant-index
#   outputs), db accumulates per-row partial sums summed outside.
#
# Correctness of skipping: rows with length <= t have PAD tokens at
# position t (tokens lead, pads trail — reference: openkge/model.py:969),
# zero output cotangent there, and zero dgates; skipped demb blocks hold
# garbage only at pad positions, which the token-table scatter drops by id.


def _fused_fwd_kernel(ntl_ref, tmax_ref, bias_ref, emb_ref, wih_ref, whh_ref,
                      hs_ref, cs_ref, h_scr, c_scr):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    @pl.when(b < ntl_ref[t])
    def _():
        h = h_scr[:]
        c = c_scr[:]
        x = emb_ref[0]
        gates = (
            jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[0]
            + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
        )
        H = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hs_ref[0] = h.astype(hs_ref.dtype)
        cs_ref[0] = c.astype(cs_ref.dtype)


def _fused_fwd(emb_tm, w_ih_t, w_hh_t, bias_row, ntiles, tmax):
    L, B, D = emb_tm.shape
    H4 = w_ih_t.shape[1]
    H = H4 // 4
    dt = emb_tm.dtype
    TB = _pick_tile(B)
    clamp = lambda b, t, ntl, tmx: (jnp.minimum(t, tmx[b] - 1), b, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, H4), lambda b, t, ntl, tmx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, D), clamp, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H4), lambda b, t, ntl, tmx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda b, t, ntl, tmx: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, H), clamp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), clamp, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )
    hs, cs = pl.pallas_call(
        _fused_fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, H), dt),
            jax.ShapeDtypeStruct((L, B, H), dt),
        ],
    )(ntiles, tmax, bias_row, emb_tm, w_ih_t, w_hh_t)
    return hs, cs


def _fused_bwd_kernel(ntl_ref, tmax_ref, bias_ref, emb_ref, wih_ref, whh_ref,
                      cs_ref, hprev_ref, cprev_ref, dhs_ref,
                      demb_ref, dwih_ref, dwhh_ref, db_ref, dh_scr, dc_scr):
    b = pl.program_id(0)
    t_rev = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - t_rev

    @pl.when((b == 0) & (t_rev == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(t == tmax_ref[b] - 1)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when(b < ntl_ref[t])
    def _():
        # at forward t == 0 the true previous state is zeros (the prev-view
        # BlockSpecs clamp the block index to 0 there)
        not_first = (t > 0).astype(jnp.float32)
        x = emb_ref[0]
        h_prev = hprev_ref[0] * not_first.astype(hprev_ref.dtype)
        c_prev = cprev_ref[0].astype(jnp.float32) * not_first
        c_t = cs_ref[0].astype(jnp.float32)

        gates = (
            jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[0]
            + jnp.dot(h_prev.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
        )
        H = c_t.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])

        dh = dh_scr[:] + dhs_ref[0].astype(jnp.float32)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_prev = dc * f

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dg_lo = dgates.astype(wih_ref.dtype)
        # demb = dgates @ W_ih^T   ([TB,4H] x [4H,D])
        demb_ref[0] = jax.lax.dot_general(
            dg_lo, wih_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(demb_ref.dtype)
        # dh_prev = dgates @ W_hh^T
        dh_scr[:] = jax.lax.dot_general(
            dg_lo, whh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_scr[:] = dc_prev
        # weight grads accumulate in f32 across the whole grid
        dwih_ref[:] += jax.lax.dot_general(
            x, dg_lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev, dg_lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:] += dgates


def _fused_bwd(emb_tm, w_ih_t, w_hh_t, bias_row, hs, cs, dhs, ntiles, tmax):
    L, B, D = emb_tm.shape
    H4 = w_ih_t.shape[1]
    H = H4 // 4
    dt = emb_tm.dtype
    TB = min(_pick_tile(B), 128)
    t_eff = lambda t, tmx, b: jnp.minimum(L - 1 - t, tmx[b] - 1)
    rev = lambda b, t, ntl, tmx: (t_eff(t, tmx, b), b, 0)
    rev_prev = lambda b, t, ntl, tmx: (jnp.maximum(t_eff(t, tmx, b) - 1, 0), b, 0)
    const = lambda b, t, ntl, tmx: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec((D, H4), const, memory_space=pltpu.VMEM),   # w_ih
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),   # w_hh
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),  # cs
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # hs[t-1]
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # cs[t-1]
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),  # dhs
        ],
        out_specs=[
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),  # demb
            pl.BlockSpec((D, H4), const, memory_space=pltpu.VMEM),   # dW_ih
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),   # dW_hh
            pl.BlockSpec((TB, H4), lambda b, t, ntl, tmx: (0, 0), memory_space=pltpu.VMEM),  # db rows
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )
    demb, dwih, dwhh, db_rows = pl.pallas_call(
        _fused_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, D), dt),
            jax.ShapeDtypeStruct((D, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((TB, H4), jnp.float32),
        ],
        # the working set (6 streamed [TB,·] sequence blocks + 2 weight
        # matrices + 2 f32 weight-grad accumulators + db) sits at ~15 MB for
        # TB=128, H=512 — right at Mosaic's default 16 MB scoped-vmem cap,
        # and some batch sizes (e.g. B=4352: grid 34 x 10) tip it over at
        # compile time.  Raise the cap; v5e has 128 MB of VMEM and the
        # kernel's double-buffering needs are already in the figure above.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )(ntiles, tmax, bias_row, emb_tm, w_ih_t, w_hh_t, cs, hs, cs, dhs)
    return demb, dwih, dwhh, jnp.sum(db_rows, axis=0)


def _fused_fwd_last_kernel(ntl_ref, tmax_ref, bias_ref, lens_ref, emb_ref,
                           wih_ref, whh_ref, hs_ref, cs_ref, last_ref,
                           h_scr, c_scr):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)
        last_ref[:] = jnp.zeros_like(last_ref)

    @pl.when(b < ntl_ref[t])
    def _():
        h = h_scr[:]
        c = c_scr[:]
        x = emb_ref[0]
        gates = (
            jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[0]
            + jnp.dot(h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
        )
        H = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        h_scr[:] = h
        c_scr[:] = c
        hs_ref[0] = h.astype(hs_ref.dtype)
        cs_ref[0] = c.astype(cs_ref.dtype)
        # the last-state select, fused: row r's representation is h at its
        # last non-pad step (reference: openkge/model.py:969-978).  The
        # [B, H] output block is constant over t, so it stays VMEM-resident
        # for the whole tile and flushes once — the [L, B, H] gather the
        # caller used to do disappears.  Arithmetic blend instead of a
        # boolean where: Mosaic cannot insert a minor dim on an i1 vector
        # (only 32-bit types), so the mask is built as f32 and reshaped.
        sel = (lens_ref[0, 0] == t + 1).astype(jnp.float32)[:, None]
        last_ref[:] = (
            h * sel + last_ref[:].astype(jnp.float32) * (1.0 - sel)
        ).astype(last_ref.dtype)


def _fused_fwd_last(emb_tm, w_ih_t, w_hh_t, bias_row, lens_row, ntiles, tmax):
    L, B, D = emb_tm.shape
    H4 = w_ih_t.shape[1]
    H = H4 // 4
    dt = emb_tm.dtype
    TB = _pick_tile(B)
    # [B//TB, 1, TB] layout: the block's last two dims EQUAL the array's
    # last two dims, which Mosaic accepts for any TB (a (1, TB) block over
    # a (1, B) row is only legal when TB % 128 == 0 — B=288/TB=32 fails)
    lens_row = lens_row.reshape(B // TB, 1, TB)
    clamp = lambda b, t, ntl, tmx: (jnp.minimum(t, tmx[b] - 1), b, 0)
    const = lambda b, t, ntl, tmx: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),       # bias
            pl.BlockSpec((1, 1, TB), lambda b, t, ntl, tmx: (b, 0, 0), memory_space=pltpu.VMEM),  # lens
            pl.BlockSpec((1, TB, D), clamp, memory_space=pltpu.VMEM),    # emb
            pl.BlockSpec((D, H4), const, memory_space=pltpu.VMEM),       # w_ih
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),       # w_hh
        ],
        out_specs=[
            pl.BlockSpec((1, TB, H), clamp, memory_space=pltpu.VMEM),    # hs
            pl.BlockSpec((1, TB, H), clamp, memory_space=pltpu.VMEM),    # cs
            pl.BlockSpec((TB, H), lambda b, t, ntl, tmx: (b, 0), memory_space=pltpu.VMEM),  # last
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )
    hs, cs, last = pl.pallas_call(
        _fused_fwd_last_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, H), dt),
            jax.ShapeDtypeStruct((L, B, H), dt),
            jax.ShapeDtypeStruct((B, H), dt),
        ],
    )(ntiles, tmax, bias_row, lens_row, emb_tm, w_ih_t, w_hh_t)
    return hs, cs, last


def _fused_bwd_last_kernel(ntl_ref, tmax_ref, bias_ref, lens_ref, emb_ref,
                           wih_ref, whh_ref, cs_ref, hprev_ref, cprev_ref,
                           dlast_ref, demb_ref, dwih_ref, dwhh_ref, db_ref,
                           dh_scr, dc_scr):
    b = pl.program_id(0)
    t_rev = pl.program_id(1)
    L = pl.num_programs(1)
    t = L - 1 - t_rev

    @pl.when((b == 0) & (t_rev == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when(t == tmax_ref[b] - 1)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when(b < ntl_ref[t])
    def _():
        not_first = (t > 0).astype(jnp.float32)
        x = emb_ref[0]
        h_prev = hprev_ref[0] * not_first.astype(hprev_ref.dtype)
        c_prev = cprev_ref[0].astype(jnp.float32) * not_first
        c_t = cs_ref[0].astype(jnp.float32)

        gates = (
            jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[0]
            + jnp.dot(h_prev.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32)
        )
        H = c_t.shape[-1]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])

        # the output cotangent enters ONLY at each row's last non-pad step
        # — the caller never materializes a [L, B, H] dhs; the [B, H] dlast
        # block is VMEM-resident for the whole tile.  f32 mask: see the
        # forward kernel's Mosaic minor-dim note.
        inject = (lens_ref[0, 0] == t + 1).astype(jnp.float32)[:, None]
        dh = dh_scr[:] + dlast_ref[:].astype(jnp.float32) * inject
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_scr[:] + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_prev = dc * f

        dgates = jnp.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=-1,
        )
        dg_lo = dgates.astype(wih_ref.dtype)
        demb_ref[0] = jax.lax.dot_general(
            dg_lo, wih_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(demb_ref.dtype)
        dh_scr[:] = jax.lax.dot_general(
            dg_lo, whh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_scr[:] = dc_prev
        dwih_ref[:] += jax.lax.dot_general(
            x, dg_lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev, dg_lo, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db_ref[:] += dgates


def _fused_bwd_last(emb_tm, w_ih_t, w_hh_t, bias_row, lens_row, hs, cs, dlast,
                    ntiles, tmax):
    L, B, D = emb_tm.shape
    H4 = w_ih_t.shape[1]
    H = H4 // 4
    dt = emb_tm.dtype
    TB = min(_pick_tile(B), 128)
    # see _fused_fwd_last: the last two block dims must equal the array's
    lens_row = lens_row.reshape(B // TB, 1, TB)
    t_eff = lambda t, tmx, b: jnp.minimum(L - 1 - t, tmx[b] - 1)
    rev = lambda b, t, ntl, tmx: (t_eff(t, tmx, b), b, 0)
    rev_prev = lambda b, t, ntl, tmx: (jnp.maximum(t_eff(t, tmx, b) - 1, 0), b, 0)
    const = lambda b, t, ntl, tmx: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, H4), const, memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec((1, 1, TB), lambda b, t, ntl, tmx: (b, 0, 0), memory_space=pltpu.VMEM),  # lens
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),  # emb
            pl.BlockSpec((D, H4), const, memory_space=pltpu.VMEM),   # w_ih
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),   # w_hh
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),  # cs
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # hs[t-1]
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),  # cs[t-1]
            pl.BlockSpec((TB, H), lambda b, t, ntl, tmx: (b, 0), memory_space=pltpu.VMEM),  # dlast
        ],
        out_specs=[
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),  # demb
            pl.BlockSpec((D, H4), const, memory_space=pltpu.VMEM),   # dW_ih
            pl.BlockSpec((H, H4), const, memory_space=pltpu.VMEM),   # dW_hh
            pl.BlockSpec((TB, H4), lambda b, t, ntl, tmx: (0, 0), memory_space=pltpu.VMEM),  # db rows
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
    )
    demb, dwih, dwhh, db_rows = pl.pallas_call(
        _fused_bwd_last_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, D), dt),
            jax.ShapeDtypeStruct((D, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
            jax.ShapeDtypeStruct((TB, H4), jnp.float32),
        ],
        # same working-set arithmetic as _fused_bwd (one streamed sequence
        # block fewer: dlast [TB, H] is tile-constant where dhs was per-step)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
    )(ntiles, tmax, bias_row, lens_row, emb_tm, w_ih_t, w_hh_t, cs, hs, cs, dlast)
    return demb, dwih, dwhh, jnp.sum(db_rows, axis=0)


def lstm_encode_last_fused(emb_tm, w_ih_t, w_hh_t, bias, lengths_sorted):
    """Length-aware fused LSTM returning ONLY each row's last non-pad
    state: [L, B, D] (rows sorted by descending length) -> [B, H].

    Versus :func:`lstm_encode_fused` + a host-side gather this removes the
    [L, B, H] output round-trip in the forward (the caller's
    ``take_along_axis``) and — the larger win — the backward's [L, B, H]
    dhs cotangent assembly (a scatter of the [B, H] cotangent into a zero
    tensor, measured 0.67 ms/step at the flagship shape): the [B, H]
    cotangent is injected inside the kernel at each row's last step.
    hs/cs are still written as backward residuals.
    """
    L, B, D = emb_tm.shape

    def plan(TB):
        lens = jnp.maximum(lengths_sorted, 1)
        n_t = jnp.sum(lens[None, :] > jnp.arange(L)[:, None], axis=1)
        ntiles = -(-n_t // TB)
        tmax = jnp.sum(
            ntiles[None, :] > jnp.arange(B // TB)[:, None], axis=1, dtype=jnp.int32
        )
        return ntiles.astype(jnp.int32), jnp.maximum(tmax, 1)

    bias_row = bias.astype(jnp.float32).reshape(1, -1)
    lens_row = jnp.maximum(lengths_sorted, 1).astype(jnp.int32).reshape(1, -1)

    # lens_row is closed over (not a primal): integer inputs have no
    # cotangent and the plan/lengths are functions of the token ids only
    @jax.custom_vjp
    def run(emb, wih, whh, brow):
        ntl, tmx = plan(_pick_tile(B))
        _, _, last = _fused_fwd_last(emb, wih, whh, brow, lens_row, ntl, tmx)
        return last

    def fwd(emb, wih, whh, brow):
        ntl, tmx = plan(_pick_tile(B))
        hs, cs, last = _fused_fwd_last(emb, wih, whh, brow, lens_row, ntl, tmx)
        return last, (emb, wih, whh, brow, hs, cs)

    def bwd(res, dlast):
        emb, wih, whh, brow, hs, cs = res
        ntl, tmx = plan(min(_pick_tile(B), 128))
        demb, dwih, dwhh, db = _fused_bwd_last(
            emb, wih, whh, brow, lens_row, hs, cs, dlast.astype(emb.dtype), ntl, tmx
        )
        return (
            demb, dwih.astype(wih.dtype), dwhh.astype(whh.dtype),
            db.reshape(1, -1),
        )

    run.defvjp(fwd, bwd)
    return run(emb_tm, w_ih_t, w_hh_t, bias_row)


def lstm_encode_fused(emb_tm, w_ih_t, w_hh_t, bias, lengths_sorted):
    """Length-aware fused LSTM over descending-length-sorted sequences.

    emb_tm [L, B, D] time-major token embeddings (rows sorted by descending
    non-pad length), w_ih_t [D, 4H], w_hh_t [H, 4H], bias [4H] f32,
    lengths_sorted [B] int32 -> hs [L, B, H] (positions at/after a row's
    length hold unread garbage).
    """
    L, B, D = emb_tm.shape

    def plan(TB):
        lens = jnp.maximum(lengths_sorted, 1)
        n_t = jnp.sum(lens[None, :] > jnp.arange(L)[:, None], axis=1)
        ntiles = -(-n_t // TB)
        tmax = jnp.sum(
            ntiles[None, :] > jnp.arange(B // TB)[:, None], axis=1, dtype=jnp.int32
        )
        return ntiles.astype(jnp.int32), jnp.maximum(tmax, 1)

    bias_row = bias.astype(jnp.float32).reshape(1, -1)

    @jax.custom_vjp
    def run(emb, wih, whh, brow):
        ntl, tmx = plan(_pick_tile(B))
        hs, _ = _fused_fwd(emb, wih, whh, brow, ntl, tmx)
        return hs

    def fwd(emb, wih, whh, brow):
        ntl, tmx = plan(_pick_tile(B))
        hs, cs = _fused_fwd(emb, wih, whh, brow, ntl, tmx)
        return hs, (emb, wih, whh, brow, hs, cs)

    def bwd(res, dhs):
        emb, wih, whh, brow, hs, cs = res
        ntl, tmx = plan(min(_pick_tile(B), 128))
        demb, dwih, dwhh, db = _fused_bwd(emb, wih, whh, brow, hs, cs, dhs, ntl, tmx)
        return demb, dwih.astype(wih.dtype), dwhh.astype(whh.dtype), db.reshape(1, -1)

    run.defvjp(fwd, bwd)
    return run(emb_tm, w_ih_t, w_hh_t, bias_row)
