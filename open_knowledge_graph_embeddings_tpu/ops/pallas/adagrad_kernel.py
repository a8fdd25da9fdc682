"""Fused Adagrad update as a Pallas TPU kernel.

For the large embedding tables the optimizer is pure HBM traffic:
read grad/param/accumulator, write param/accumulator (5 passes).  XLA
runs the unfused update chain at ~50% of roofline on v5e; this kernel
performs the whole torch-semantics update

    g'    = g + weight_decay * p
    acc'  = acc + g'^2
    p'    = p - (lr / (1 + (step-1) * lr_decay)) * g' / (sqrt(acc') + eps)

in one pass over row blocks, with hyperparameters in SMEM.  Applied to
parameters above a size threshold (train/optim.py wires it in); small
leaves stay on the XLA path.  In-place semantics via input_output_aliases
(param and accumulator buffers are donated).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hp_ref, g_ref, p_ref, acc_ref, p_out, acc_out):
    clr = hp_ref[0]  # lr / (1 + (step-1)*lr_decay), computed on device
    wd = hp_ref[1]
    eps = hp_ref[2]
    g = g_ref[:] + wd * p_ref[:]
    acc = acc_ref[:] + g * g
    acc_out[:] = acc
    p_out[:] = p_ref[:] - clr * g / (jnp.sqrt(acc) + eps)


def adagrad_update_pallas(
    g: jax.Array, p: jax.Array, acc: jax.Array, clr: jax.Array,
    weight_decay: jax.Array, eps: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Fused (param', acc') update for a [V, d] table; clr is the effective
    learning rate (lr with lr_decay already applied).

    Non-divisible heights (FB15k-237's 14,541 entities, the 50k relation
    token vocab) use a ceil grid: Pallas TPU pads the final block's reads
    and masks its writes (verified on-device)."""
    V, d = p.shape
    rows = _row_block(V)
    grid = (-(-V // rows),)
    hp = jnp.stack([clr, weight_decay, eps]).astype(jnp.float32)
    new_p, new_acc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, d), p.dtype),
            jax.ShapeDtypeStruct((V, d), acc.dtype),
        ],
        input_output_aliases={2: 0, 3: 1},  # p->p_out, acc->acc_out in place
    )(hp, g, p, acc)
    return new_p, new_acc


def _row_block(V: int) -> int:
    return min(512, V)


def pallas_adagrad_supported(p: jax.Array, min_size: int = 1 << 20) -> bool:
    import os

    if os.environ.get("OKET_DISABLE_PALLAS"):
        return False
    if p.ndim != 2 or p.size < min_size:
        return False
    if p.shape[1] % 128 != 0:
        return False
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return False
        except Exception:
            return False
    return True
