"""Single-layer LSTM as a `lax.scan`, numerically matching torch.nn.LSTM.

The reference encodes mention token sequences (length <= 10) with
torch.nn.LSTM and takes the output at the last non-pad position
(reference: openkge/model.py:952-978).  On TPU a cuDNN-style fused kernel
is unnecessary: sequences are tiny, so the right shape is a `lax.scan`
over time whose per-step work is two MXU matmuls over the whole batch.
XLA unrolls/pipelines the scan; for L<=10 this is compute-bound on the
gate matmuls exactly like a fused implementation would be.

Gate layout matches torch (input, forget, cell, output concatenated along
the 4H axis; two bias vectors b_ih and b_hh) so torch-trained checkpoints
map 1:1 and unit tests can assert allclose against torch.nn.LSTM.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def init_lstm_params(rng: jax.Array, input_size: int, hidden_size: int) -> Dict[str, jax.Array]:
    """Torch-default initialization: U(-1/sqrt(H), 1/sqrt(H)) for all weights."""
    k = 1.0 / np.sqrt(hidden_size)
    ks = jax.random.split(rng, 4)
    u = lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -k, k)
    return {
        "w_ih": u(ks[0], (4 * hidden_size, input_size)),
        "w_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm_forward_tm(params: Dict[str, jax.Array], x_tm: jax.Array) -> jax.Array:
    """Run the LSTM over time-major ``x_tm`` [L, B, D] -> outputs [L, B, H].

    The whole sequence path (token gather -> input projection -> recurrence
    -> last-state select) runs time-major: every tensor is [L, B, ·]
    contiguous, so no batch-major relayout copies appear anywhere in the
    forward or backward graph.

    Zero initial state, single layer (the reference always uses one layer,
    where torch's inter-layer dropout is a no-op).

    Mixed precision: matmul operands are cast to ``x.dtype`` (bf16 when the
    embedder runs in bf16 — one MXU pass instead of the 3-pass f32 emulation),
    gate math and the cell state stay float32.
    """
    L, B, _ = x_tm.shape
    H = params["w_hh"].shape[1]
    dtype = x_tm.dtype
    w_ih_t = params["w_ih"].T.astype(dtype)  # [D, 4H]
    w_hh_t = params["w_hh"].T.astype(dtype)  # [H, 4H]
    bias = (params["b_ih"] + params["b_hh"]).astype(jnp.float32)

    from open_knowledge_graph_embeddings_tpu.ops.pallas.lstm_kernel import (
        lstm_scan_pallas,
        pallas_supported,
    )

    # Hoist the input projection out of the recurrence: one big
    # [L*B, D]x[D, 4H] MXU matmul instead of L small ones.
    x_proj_tm = (
        jnp.einsum("lbd,dh->lbh", x_tm, w_ih_t, preferred_element_type=jnp.float32) + bias
    ).astype(dtype)

    if pallas_supported(B, L, H):
        return lstm_scan_pallas(x_proj_tm, w_hh_t).astype(dtype)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t.astype(jnp.float32) + jnp.dot(
            h.astype(dtype), w_hh_t, preferred_element_type=jnp.float32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h.astype(dtype)

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    (_, _), hs = jax.lax.scan(step, (h0, c0), x_proj_tm)
    return hs


def lstm_forward(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Batch-major wrapper: ``x`` [B, L, D] -> outputs [B, L, H]."""
    return jnp.swapaxes(lstm_forward_tm(params, jnp.swapaxes(x, 0, 1)), 0, 1)


def lstm_fused_supported(B: int, L: int, D: int, H: int) -> bool:
    """Whether the length-aware fused Pallas encoder applies (TPU only)."""
    import os

    from open_knowledge_graph_embeddings_tpu.ops.pallas.lstm_kernel import (
        pallas_supported,
    )

    if os.environ.get("OKET_DISABLE_LSTM_FUSED"):
        return False
    return D % 128 == 0 and pallas_supported(B, L, H)


def length_sort_perm(lengths: jax.Array, max_len: int):
    """Stable descending-length permutation via counting sort.

    Equivalent to ``order = jnp.argsort(-lengths)`` (JAX's sort is stable)
    plus its inverse permutation, but built from one-hot + cumsum + one
    B-element scatter — O(B·L) vector work instead of a bitonic sort
    network.  Mention lengths are bounded by the token budget (<= 10,
    reference: openkge/default.yaml:40), which makes the bucket count tiny;
    XLA's generic sort was the single most expensive non-matmul op left in
    the fused encode path (two argsorts per 8192-row entity pass).

    Returns ``(order, inv)`` with ``sorted_x = x[order]`` and
    ``x == sorted_x[inv]``.
    """
    B = lengths.shape[0]
    idx = jnp.arange(B, dtype=jnp.int32)
    bucket = (max_len - lengths).astype(jnp.int32)  # 0 <-> longest
    oh = jax.nn.one_hot(bucket, max_len + 1, dtype=jnp.int32)  # [B, L+1]
    counts = jnp.sum(oh, axis=0)
    start = jnp.cumsum(counts) - counts  # exclusive bucket offsets
    running = jnp.cumsum(oh, axis=0) - oh  # earlier rows in same bucket
    pos = start[bucket] + jnp.sum(running * oh, axis=1)  # row i -> sorted slot
    order = jnp.zeros((B,), jnp.int32).at[pos].set(idx)
    return order, pos


def lstm_forward_tm_sorted(
    params: Dict[str, jax.Array], emb_tm: jax.Array, lengths_sorted: jax.Array
) -> jax.Array:
    """Length-aware fused LSTM: ``emb_tm`` [L, B, D] rows sorted by
    *descending* non-pad length -> outputs [L, B, H].

    Skips whole (time, batch-tile) grid steps beyond each row's length —
    positions a sequence never reaches hold unread garbage, which is exact
    because their output cotangents are zero and their tokens are PAD
    (see ops/pallas/lstm_kernel.py fused-kernel notes).  The input
    projection and weight gradients are fused into the kernels, so pad
    positions cost nothing anywhere in the LSTM.
    """
    from open_knowledge_graph_embeddings_tpu.ops.pallas.lstm_kernel import (
        lstm_encode_fused,
    )

    dtype = emb_tm.dtype
    w_ih_t = params["w_ih"].T.astype(dtype)
    w_hh_t = params["w_hh"].T.astype(dtype)
    bias = (params["b_ih"] + params["b_hh"]).astype(jnp.float32)
    return lstm_encode_fused(emb_tm, w_ih_t, w_hh_t, bias, lengths_sorted).astype(dtype)


def lstm_last_fused(
    params: Dict[str, jax.Array], emb_tm: jax.Array, lengths_sorted: jax.Array
) -> jax.Array:
    """Length-aware fused LSTM returning each row's last non-pad state
    directly: ``emb_tm`` [L, B, D] (descending-length-sorted rows) ->
    [B, H].  Fuses the last-state select into the kernels (no [L, B, H]
    output gather in the forward, no dhs scatter-assembly in the backward
    — see ops/pallas/lstm_kernel.py lstm_encode_last_fused)."""
    from open_knowledge_graph_embeddings_tpu.ops.pallas.lstm_kernel import (
        lstm_encode_last_fused,
    )

    dtype = emb_tm.dtype
    w_ih_t = params["w_ih"].T.astype(dtype)
    w_hh_t = params["w_hh"].T.astype(dtype)
    bias = (params["b_ih"] + params["b_hh"]).astype(jnp.float32)
    return lstm_encode_last_fused(emb_tm, w_ih_t, w_hh_t, bias, lengths_sorted).astype(dtype)


def lstm_last_state(params: Dict[str, jax.Array], x: jax.Array, lengths: jax.Array) -> jax.Array:
    """Output at the last non-pad position per sequence.

    ``lengths`` [B] counts non-pad tokens; position taken is ``lengths - 1``
    (reference semantics: ``(input > 0).sum(1) - 1``, openkge/model.py:969).
    """
    out = lstm_forward(params, x)
    idx = jnp.clip(lengths - 1, 0, x.shape[1] - 1)
    return jnp.take_along_axis(out, idx[:, None, None], axis=1)[:, 0, :]
