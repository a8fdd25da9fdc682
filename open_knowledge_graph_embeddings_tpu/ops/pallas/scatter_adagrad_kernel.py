"""Row-scatter Adagrad as a Pallas TPU kernel.

The sparse-gradient training path (train/sparse.py) reduces each embedding
table's gradient to the rows actually touched by the batch: ``g_rows [U, d]``
plus the row ids ``uids [U]``.  The optimizer update then only needs to
read-modify-write those U rows of the parameter and accumulator tables —
HBM traffic O(U*d) instead of O(V*d), which at OLPBench lookup scale
(2.47M x 512 + accumulator) is a ~300x reduction per step.

This kernel performs, per touched row (torch sparse-Adagrad semantics,
reference: openkge/model.py:390-391 + torch.optim.Adagrad, with the one
documented extension that weight decay is applied *lazily* to touched rows —
torch raises on sparse+weight_decay):

    g'    = (g + weight_decay * p[uid]) * valid
    acc'  = acc[uid] + g'^2
    p'    = p[uid] - clr * g' / (sqrt(acc') + eps)

as a scalar-prefetch grid over U rows: the row id stream lives in SMEM and
drives the HBM block index maps, so each grid step DMAs exactly one (1, d)
row of p and acc in and out (double-buffered by the pallas pipeline).
Invalid (bucket-padding) entries have valid=0: their update is exactly zero,
so duplicate padding ids are harmless (the TPU grid is sequential).

The XLA fallback (gather -> fused math -> two scatter-adds) has the same
semantics and runs everywhere, including the CPU test mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROWS_PER_STEP = 256  # uid buckets are powers of two >= 256 (train/sparse.py)


def _make_kernel(R: int, d: int):
    def kernel(uids_ref, valid_ref, hp_ref, g_ref, vmask_ref, p_hbm, acc_hbm,
               p_out, acc_out, sp, sacc, sems):
        # p_hbm/p_out (and acc) alias the same HBM buffer; rows are staged
        # through VMEM scratch via explicit DMAs because the row ids are
        # arbitrary (block index maps can only address block-aligned rows).
        # Invalid (bucket-padding) entries carry duplicate ids, so their DMAs
        # are skipped entirely — a padding write-back could otherwise clobber
        # the real update of the duplicated row.
        j = pl.program_id(0)
        base = j * R

        def in_dma(r, which):
            uid = uids_ref[base + r]
            src, dst = ((p_hbm, sp), (acc_hbm, sacc))[which]
            return pltpu.make_async_copy(src.at[uid], dst.at[r], sems.at[which, r])

        def out_dma(r, which):
            uid = uids_ref[base + r]
            dst, src = ((p_out, sp), (acc_out, sacc))[which]
            return pltpu.make_async_copy(src.at[r], dst.at[uid], sems.at[2 + which, r])

        def each_valid_row(fn):
            def body(r, _):
                @pl.when(valid_ref[base + r] != 0)
                def _():
                    fn(r)

                return _

            jax.lax.fori_loop(0, R, body, None)

        each_valid_row(lambda r: (in_dma(r, 0).start(), in_dma(r, 1).start()))
        each_valid_row(lambda r: (in_dma(r, 0).wait(), in_dma(r, 1).wait()))

        clr, wd, eps = hp_ref[0], hp_ref[1], hp_ref[2]
        v = vmask_ref[:]  # [R, 1] float32 0/1; stale scratch rows are masked
        g = (g_ref[:].astype(jnp.float32) + wd * sp[:]) * v
        acc = sacc[:] + g * g
        sacc[:] = acc
        sp[:] = sp[:] - clr * g / (jnp.sqrt(acc) + eps)

        each_valid_row(lambda r: (out_dma(r, 0).start(), out_dma(r, 1).start()))
        each_valid_row(lambda r: (out_dma(r, 0).wait(), out_dma(r, 1).wait()))

    return kernel


def scatter_adagrad_pallas(
    g_rows: jax.Array,  # [U, d] row gradients (float32)
    uids: jax.Array,  # [U] int32 row ids (duplicates only among invalid)
    valid: jax.Array,  # [U] bool
    p: jax.Array,  # [V, d] parameter table
    acc: jax.Array,  # [V, d] adagrad accumulator
    clr: jax.Array,
    weight_decay: jax.Array,
    eps: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    U, d = g_rows.shape
    V = p.shape[0]
    R = min(_ROWS_PER_STEP, U)
    hp = jnp.stack([clr, weight_decay, eps]).astype(jnp.float32)
    vmask = valid.astype(jnp.float32)[:, None]  # [U, 1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # uids drive the row DMAs; valid gates them
        grid=(U // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # hp
            pl.BlockSpec((R, d), lambda j, uids, valid: (j, 0)),  # g rows
            pl.BlockSpec((R, 1), lambda j, uids, valid: (j, 0)),  # valid mask
            pl.BlockSpec(memory_space=pltpu.ANY),  # p table stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # acc table stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, d), jnp.float32),  # staged p rows
            pltpu.VMEM((R, d), jnp.float32),  # staged acc rows
            pltpu.SemaphoreType.DMA((4, R)),  # in/out x (p, acc)
        ],
    )
    new_p, new_acc = pl.pallas_call(
        _make_kernel(R, d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, d), p.dtype),
            jax.ShapeDtypeStruct((V, d), acc.dtype),
        ],
        # alias indices count the scalar-prefetch operands (uids, valid):
        # (0 uids, 1 valid, 2 hp, 3 g, 4 vmask, 5 p, 6 acc)
        input_output_aliases={5: 0, 6: 1},  # p, acc updated in place
    )(uids.astype(jnp.int32), valid.astype(jnp.int32), hp, g_rows, vmask, p, acc)
    return new_p, new_acc


def scatter_adagrad_xla(
    g_rows: jax.Array,
    uids: jax.Array,
    valid: jax.Array,
    p: jax.Array,
    acc: jax.Array,
    clr: jax.Array,
    weight_decay: jax.Array,
    eps: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Same update via XLA gather + scatter-add (CPU/GPU fallback)."""
    vm = valid[:, None].astype(jnp.float32)
    p_rows = p[uids]
    g = (g_rows.astype(jnp.float32) + weight_decay * p_rows) * vm
    g2 = g * g
    acc_rows = acc[uids] + g2
    delta = -clr * g / (jnp.sqrt(acc_rows) + eps)
    # invalid entries contribute exactly zero, so duplicate padding ids are safe
    new_acc = acc.at[uids].add(g2)
    new_p = p.at[uids].add(delta * vm)
    return new_p, new_acc


def scatter_adagrad(
    g_rows, uids, valid, p, acc, clr, weight_decay, eps
) -> Tuple[jax.Array, jax.Array]:
    U, _ = g_rows.shape
    R = min(_ROWS_PER_STEP, U)
    if (
        pallas_scatter_supported(p)
        and U % R == 0
        and R % 8 == 0
        and p.dtype == jnp.float32
        and acc.dtype == jnp.float32
    ):
        return scatter_adagrad_pallas(g_rows, uids, valid, p, acc, clr, weight_decay, eps)
    return scatter_adagrad_xla(g_rows, uids, valid, p, acc, clr, weight_decay, eps)


def pallas_scatter_supported(p: jax.Array) -> bool:
    import os

    if os.environ.get("OKET_DISABLE_PALLAS"):
        return False
    if p.ndim != 2 or p.shape[1] % 128 != 0:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
