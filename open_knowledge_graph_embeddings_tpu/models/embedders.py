"""Entity/relation embedders: lookup tables and token-composition encoders.

Four families, capability-matched to the reference
(reference: openkge/model.py:353-998) but written as pure functions over a
``variables = {"params", "state", "buffers"}`` pytree:

* :class:`LookupEmbedder` — per-id tables with the reference's encode
  pipeline (input-dropout -> batchnorm -> projection -> l2-norm -> dropout)
  and the cubic-abs L2 regularizer hook,
* :class:`UnigramPoolingEmbedder` — sum/mean/max over token embeddings,
* :class:`BigramPoolingEmbedder` — width-2 conv over token embeddings with
  residual or sigmoid-gated mixing, masked pooling,
* :class:`LSTMEmbedder` — scan LSTM, output at last non-pad position.

Design notes (TPU):

* token-id matrices are [num_items, max_len] int32 device buffers
  (``variables["buffers"]``); an encode is gather -> token-table gather ->
  batched compose, all static shapes,
* PAD (id 0) rows of every table are initialized like torch
  (random values surviving ``init.normal_``) but receive zero gradient;
  sum-pooling therefore includes pad vectors exactly as the reference does,
* every encode returns ``(emb, new_state, reg)`` where ``reg`` is this
  call's contribution to the cubic-abs regularizer
  (reference: openkge/model.py:471-479) and ``new_state`` carries updated
  batch-norm statistics.

Deliberate fixes of reference quirks (documented, not silently copied):

* reference ``UnigramPoolingRelationEmbedder.encode_subj/obj`` reads the
  never-assigned ``self.entity_projection`` (AttributeError at
  openkge/model.py:789,792); here entity projection is None for unigram.
* reference initializes token-encoder relation projections by passing
  ``init_core_tensor_std`` as the *mean* of a std-1 normal
  (openkge/model.py:747-748 — ``normal_(w, std_val)`` binds the mean
  positionally); here it is used as the standard deviation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.dataset import DatasetMeta
from open_knowledge_graph_embeddings_tpu.data.vocab import PAD
from open_knowledge_graph_embeddings_tpu.ops.lstm import (
    init_lstm_params,
    length_sort_perm,
    lstm_forward_tm,
    lstm_fused_supported,
    lstm_last_fused,
)
from open_knowledge_graph_embeddings_tpu.ops.norm import apply_batchnorm, init_batchnorm

Variables = Dict[str, Any]


# --------------------------------------------------------------------- utils


def _dropout(x: jax.Array, rate: float, train: bool, rng: Optional[jax.Array]) -> jax.Array:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch.nn.functional.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def _xavier_normal(rng: jax.Array, shape_out_in: Tuple[int, int]) -> jax.Array:
    fan_out, fan_in = shape_out_in
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return jax.random.normal(rng, shape_out_in, jnp.float32) * std


def _cubic_abs_reg(x: jax.Array, l2_reg: float, dropout: float) -> jax.Array:
    """l2_reg * sum(|x'|^3) with the reference's dropout rescale quirk
    (x' = x / dropout_rate when dropout_rate > 0; openkge/model.py:471-475)."""
    if dropout > 0:
        x = x / dropout
    return l2_reg * jnp.sum(jnp.abs(x) ** 3)


def zero_pad_row_grads(grads: Variables, table_names=()) -> Variables:
    """Zero the PAD-row gradient of embedding tables (torch padding_idx).

    NOTE: no longer used in the train step — it costs a full dense copy per
    table.  PAD-row gradients are structurally zero for lookup/LSTM/bigram
    encoders (pad positions are masked or unused), and the unigram sum-pool
    path blocks them at the source with a stop_gradient mask
    (:func:`_pad_stop_gradient`).  Kept for external callers/tests."""
    params = grads
    for name in table_names:
        node = params
        *path, leaf = name.split("/")
        for p in path:
            node = node[p]
        node[leaf] = node[leaf].at[PAD].set(0.0)
    return grads


def _table_rows(n: int, sparse: bool) -> int:
    """Table height; row-sparse tables are padded to a multiple of 8 (the
    TPU float32 HBM tile height) so the block-layout scatter-Adagrad kernel
    can address whole tiles.  The pad rows are never referenced by any id."""
    return -(-n // 8) * 8 if sparse else n


def _pad_stop_gradient(emb: jax.Array, toks: jax.Array) -> jax.Array:
    """Keep pad-token embedding *values* in the forward (reference semantics:
    random PAD rows participate in sum pooling) but drop their gradient —
    the functional equivalent of torch's padding_idx without a dense
    PAD-row fixup on the gradient tensor."""
    is_pad = (toks == PAD)[..., None]
    return jnp.where(is_pad, jax.lax.stop_gradient(emb), emb)


def token_gather_tm(
    table: jax.Array, toks: jax.Array, cdtype,
    stop_pad_grad: bool = False, time_major: bool = False,
    grad_plan=None,
) -> jax.Array:
    """``table[toks].astype(cdtype)`` with a layout-aware backward.

    The value equals a plain gather, but the VJP scatters the cotangent in
    *time-major* order: the sequence encoders (LSTM kernels, the hoisted
    input-projection einsum) produce/consume [L, B, d]-contiguous tensors,
    so the cotangent of a batch-major gather arrives time-major and XLA's
    default batch-major scatter forces a full relayout copy of the
    [B*L, d] gradient first (measured 1.3 ms/step at flagship shapes —
    copy+reshape of f32[8192,10,512]).  Scattering ``swapaxes(ct, 0, 1)``
    with time-major-flattened ids is a pure bitcast instead: a scatter-add
    is order-independent.  With ``time_major=True`` ``toks`` is already
    [L, B] and the cotangent flattens with no axis swap at all.

    PAD handling: pad ids are remapped out of range and dropped by the
    scatter (torch padding_idx semantics, same effect as
    :func:`_pad_stop_gradient`).  ``stop_pad_grad`` additionally blocks the
    pad rows in the *forward* value's gradient path — only meaningful for
    encoders where pad values reach the loss (sum-pool + batchnorm).

    ``grad_plan`` (optional): a host-built slot plan that turns the
    backward scatter-add into a two-level gather-sum.  The XLA scatter
    costs ~15 ns per update row (per-row DMA issue) and processes every
    position including pads; gathers stream at ~3 ns/row.  The plan groups
    the non-pad positions of ``toks`` by token id into slots of K
    positions: ``pos`` [S, K] int32 flat time-major position indices,
    ``valid`` [S, K] bool, ``uid`` [S] int32 target row per slot (invalid
    slots point out of range).  Level 1 is a fused gather + masked f32 sum
    over K (one streaming read of the cotangent, bf16->f32 conversion
    folded in); level 2 scatter-adds only the ~P/K slot rows.  Exactness:
    every non-pad position appears in exactly one (slot, k) cell — the
    host builder is tested against the dense scatter.

    ``toks`` and the plan are PRIMAL arguments of the custom-VJP functions
    (float0 cotangents), never closure captures: a closed-over tracer
    leaks when the gather runs inside an inner transform (shard_map
    regions, models/embedders._lstm_states).
    """
    if grad_plan is None:
        return _tg_scatter(table, toks, str(jnp.dtype(cdtype)), stop_pad_grad, time_major)
    return _tg_plan(
        table, toks, grad_plan["pos"], grad_plan["valid"], grad_plan["uid"],
        str(jnp.dtype(cdtype)), stop_pad_grad, time_major,
    )


def _f0(x):
    import numpy as _np

    return _np.zeros(x.shape, dtype=jax.dtypes.float0)


def _ct_time_major(ct, toks, time_major):
    d = ct.shape[-1]
    if time_major:
        return ct.reshape(-1, d), toks.reshape(-1), d
    return (
        jnp.swapaxes(ct, 0, 1).reshape(-1, d),
        jnp.swapaxes(toks, 0, 1).reshape(-1),
        d,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tg_scatter(table, toks, cdtype, stop_pad_grad, time_major):
    emb = table[toks].astype(cdtype)
    return _pad_stop_gradient(emb, toks) if stop_pad_grad else emb


def _tg_scatter_fwd(table, toks, cdtype, stop_pad_grad, time_major):
    return _tg_scatter(table, toks, cdtype, stop_pad_grad, time_major), (
        toks, table.shape[0],
    )


def _tg_scatter_bwd(cdtype, stop_pad_grad, time_major, res, ct):
    toks, V = res
    ct_tm, ids, d = _ct_time_major(ct, toks, time_major)
    ids = jnp.where(ids == PAD, jnp.int32(V), ids)  # out of range -> dropped
    dtable = (
        jnp.zeros((V, d), jnp.float32).at[ids].add(ct_tm.astype(jnp.float32), mode="drop")
    )
    return (dtable, _f0(toks))


_tg_scatter.defvjp(_tg_scatter_fwd, _tg_scatter_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _tg_plan(table, toks, pos, valid, uid, cdtype, stop_pad_grad, time_major):
    emb = table[toks].astype(cdtype)
    return _pad_stop_gradient(emb, toks) if stop_pad_grad else emb


def _tg_plan_fwd(table, toks, pos, valid, uid, cdtype, stop_pad_grad, time_major):
    out = _tg_plan(table, toks, pos, valid, uid, cdtype, stop_pad_grad, time_major)
    return out, (toks, pos, valid, uid, table.shape[0])


def _tg_plan_bwd(cdtype, stop_pad_grad, time_major, res, ct):
    toks, pos, valid, uid, V = res
    ct_tm, _ids, d = _ct_time_major(ct, toks, time_major)
    g = jnp.take(ct_tm, pos.reshape(-1), axis=0)
    g = g.reshape(*pos.shape, d)  # [S, K, d]
    slot_sums = jnp.sum(
        jnp.where(valid[..., None], g.astype(jnp.float32), 0.0), axis=1
    )
    dtable = jnp.zeros((V, d), jnp.float32).at[uid].add(slot_sums, mode="drop")
    return (dtable, _f0(toks), _f0(pos), _f0(valid), _f0(uid))


_tg_plan.defvjp(_tg_plan_fwd, _tg_plan_bwd)


class Embedder:
    """Interface shared by all embedder families."""

    entity_dim: int
    relation_dim: int
    meta: DatasetMeta
    #: parameter paths (slash-separated) of tables whose PAD row is frozen
    pad_frozen_tables: Tuple[str, ...] = ()

    def set_row_shard_ctx(self, mesh, axis, plan_key: Optional[str] = None) -> None:
        """Mesh-region context for sequence encoders (set by the model
        around each encode region, models/model.py set_mesh): when a mesh
        and axis are given, row-encode cores run inside shard_map over that
        axis; ``plan_key`` overrides which gather-sum grad plan the region
        consumes (candidate vs query plans are separate in mesh mode).
        A no-op for embedders without a sequence core."""
        self._row_shard_ctx = None if mesh is None else (mesh, axis)
        self._plan_key_override = plan_key

    def init(self, rng: jax.Array) -> Variables:
        raise NotImplementedError

    def encode_entity(
        self,
        variables: Variables,
        ids: jax.Array,
        *,
        is_sp: Optional[jax.Array] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        raise NotImplementedError

    def encode_relation(
        self, variables: Variables, ids: jax.Array, *, train: bool = False, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        raise NotImplementedError


# ------------------------------------------------------------------- lookup


@dataclass
class LookupEmbedder(Embedder):
    """Per-id embedding tables (reference: LookupBaseRelationEmbedder,
    openkge/model.py:353-558).

    ``project_relation`` projects the relation embedding to
    ``entity_slot_size ** 2`` (the Tucker3 core); ``project_entity`` adds
    separate subject/object linear maps, selected per row by ``is_sp`` for
    mixed-direction batches (candidate encodings always use the object map,
    mirroring the reference's encode_obj-for-candidates convention,
    openkge/model.py:76-77).
    """

    meta: DatasetMeta = None
    entity_slot_size: int = 128
    relation_slot_size: Optional[int] = None
    entity_embedding_size: Optional[int] = None
    relation_embedding_size: Optional[int] = None
    normalize: str = ""
    dropout: float = 0.0
    input_dropout: float = 0.0
    relation_dropout: Optional[float] = None
    relation_input_dropout: Optional[float] = None
    project_entity: bool = False
    project_entity_activation: Optional[str] = "ReLU"
    project_relation: bool = False
    project_relation_activation: Optional[str] = None
    sparse: bool = False  # accepted for config parity; grads are handled by optimizer
    init_std: float = 0.01
    batch_norm: bool = False
    l2_reg: float = 0.0
    dtype: str = "float32"  # compute dtype for gathers/matmuls (params stay f32)

    def __post_init__(self):
        self._cdtype = jnp.dtype(self.dtype)
        if self.relation_slot_size is None or self.relation_slot_size <= 0:
            self.relation_slot_size = self.entity_slot_size
        self._entity_emb_size = self.entity_embedding_size or self.entity_slot_size
        self._relation_emb_size = self.relation_embedding_size or self.relation_slot_size
        if self.relation_dropout is None:
            self.relation_dropout = self.dropout
        if self.relation_input_dropout is None:
            self.relation_input_dropout = self.input_dropout
        self.entity_dim = self.entity_slot_size
        self.relation_dim = (
            self.entity_slot_size ** 2 if self.project_relation else self._relation_emb_size
        )
        self.pad_frozen_tables = ("entity_embedding", "relation_embedding")

    def init(self, rng: jax.Array) -> Variables:
        ks = iter(jax.random.split(rng, 8))
        params: Dict[str, Any] = {
            "entity_embedding": jax.random.normal(
                next(ks),
                (_table_rows(self.meta.entities_size, self.sparse), self._entity_emb_size),
                jnp.float32,
            )
            * self.init_std,
            "relation_embedding": jax.random.normal(
                next(ks),
                (_table_rows(self.meta.relations_size, self.sparse), self._relation_emb_size),
                jnp.float32,
            )
            * self.init_std,
        }
        state: Dict[str, Any] = {}
        if self.project_relation:
            params["relation_projection"] = {
                "w": _xavier_normal(next(ks), (self.entity_slot_size ** 2, self._relation_emb_size))
            }
        if self.project_entity:
            params["subj_projection"] = {
                "w": _xavier_normal(next(ks), (self.entity_slot_size, self.entity_slot_size))
            }
            params["obj_projection"] = {
                "w": _xavier_normal(next(ks), (self.entity_slot_size, self.entity_slot_size))
            }
        if self.batch_norm:
            params["bn_e"], state["bn_e"] = init_batchnorm(self._entity_emb_size)
            params["bn_r"], state["bn_r"] = init_batchnorm(self._relation_emb_size)
        return {"params": params, "state": state, "buffers": {}}

    # -- pipeline (reference order: openkge/model.py:455-480)

    def _activation(self, name: Optional[str]):
        if not name:
            return None
        return getattr(jax.nn, {"ReLU": "relu", "Tanh": "tanh", "Sigmoid": "sigmoid",
                                "GELU": "gelu", "ELU": "elu", "LeakyReLU": "leaky_relu"}.get(name, name.lower()))

    def _encode(
        self, variables, x, bn_name, proj_names, proj_act, input_dropout, dropout, train, rng
    ):
        params, state = variables["params"], variables["state"]
        new_state = dict(state)
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        x = _dropout(x, input_dropout, train, r1)
        if self.batch_norm and bn_name is not None:
            y32, new_state[bn_name] = apply_batchnorm(
                params[bn_name], state[bn_name], x.astype(jnp.float32), train
            )
            x = y32.astype(x.dtype)
        if proj_names:
            act = self._activation(proj_act)
            projected = []
            for pn in proj_names:
                y = jnp.dot(x, params[pn]["w"].T.astype(x.dtype),
                            preferred_element_type=jnp.float32).astype(x.dtype)
                projected.append(act(y) if act else y)
            x = projected[0] if len(projected) == 1 else projected
        if self.normalize == "norm":
            x = _l2_normalize(x) if not isinstance(x, list) else [_l2_normalize(v) for v in x]
        if isinstance(x, list):
            x = [_dropout(v, dropout, train, r2) for v in x]
        else:
            x = _dropout(x, dropout, train, r2)
        reg = jnp.zeros((), jnp.float32)
        if train and self.l2_reg > 0:
            xs = x if isinstance(x, list) else [x]
            for v in xs:
                reg = reg + _cubic_abs_reg(v, self.l2_reg, self.dropout)
        return x, new_state, reg

    def encode_entity(self, variables, ids, *, is_sp=None, train=False, rng=None):
        x = variables["params"]["entity_embedding"][ids].astype(self._cdtype)
        return self._encode_entity_repr(variables, x, is_sp=is_sp, train=train, rng=rng)

    def encode_entity_rows(self, variables, rows, *, is_sp=None, train=False, rng=None):
        """Encode raw table rows (the reference's ``lookup=False`` path used
        by get_all_*; openkge/model.py:512-523)."""
        return self._encode_entity_repr(variables, rows, is_sp=is_sp, train=train, rng=rng)

    def encode_entity_range(self, variables, start, stop, *, train=False, rng=None):
        """Full-vocab candidate encode as a static table slice.

        Equivalent to ``encode_entity(arange(start, stop))`` but the VJP is a
        zero-pad instead of a (stop-start)-row scatter — profile-driven: at
        E=100k the arange-gather's backward scatter alone cost 2.1 ms/step
        (28%% of the 1-vs-all train step)."""
        x = jax.lax.slice_in_dim(
            variables["params"]["entity_embedding"], start, stop
        ).astype(self._cdtype)
        return self._encode_entity_repr(variables, x, is_sp=None, train=train, rng=rng)

    def _encode_entity_repr(self, variables, x, *, is_sp, train, rng):
        if self.project_entity:
            out, new_state, reg = self._encode(
                variables, x, "bn_e" if self.batch_norm else None,
                ["subj_projection", "obj_projection"], self.project_entity_activation,
                self.input_dropout, self.dropout, train, rng,
            )
            subj_out, obj_out = out
            if is_sp is None:
                x = obj_out
            else:
                x = jnp.where(is_sp[:, None], subj_out, obj_out)
            return x, new_state, reg
        return self._encode(
            variables, x, "bn_e" if self.batch_norm else None, [], None,
            self.input_dropout, self.dropout, train, rng,
        )

    def encode_relation(self, variables, ids, *, train=False, rng=None):
        x = variables["params"]["relation_embedding"][ids].astype(self._cdtype)
        return self._encode(
            variables, x, "bn_r" if self.batch_norm else None,
            ["relation_projection"] if self.project_relation else [],
            self.project_relation_activation,
            self.relation_input_dropout, self.relation_dropout, train, rng,
        )


# --------------------------------------------------------- token-based base


@dataclass
class TokenEmbedderBase(Embedder):
    """Shared machinery of token-composition embedders
    (reference: TokenBasedRelationEmbedder, openkge/model.py:561-712)."""

    meta: DatasetMeta = None
    entity_slot_size: int = 128
    relation_slot_size: Optional[int] = None
    sparse: bool = False
    init_std: float = 0.01
    normalize: Optional[str] = None
    dropout: float = 0.0
    entity_dropout: Optional[float] = None
    relation_dropout: Optional[float] = None
    project_relation: bool = False
    l2_reg: float = 0.0  # accepted for config parity; token models don't use it
    dtype: str = "float32"  # compute dtype for gathers/matmuls (params stay f32)

    def __post_init__(self):
        self._cdtype = jnp.dtype(self.dtype)
        if self.relation_slot_size is None or self.relation_slot_size <= 0:
            self.relation_slot_size = self.entity_slot_size
        # reference: falsy entity_dropout falls back to dropout (model.py:755-756)
        self.entity_dropout = self.entity_dropout if self.entity_dropout else self.dropout
        self.relation_dropout = self.relation_dropout if self.relation_dropout else self.dropout
        self.entity_dim = self.entity_slot_size
        self.relation_dim = (
            self.entity_slot_size ** 2 if self.project_relation else self.relation_slot_size
        )
        self.pad_frozen_tables = ("entity_token_embedding", "relation_token_embedding")
        assert self.meta.entity_token_ids is not None, "dataset has no entity token map"

    # -- shared init pieces

    def _init_base(self, ks) -> Tuple[Dict, Dict, Dict]:
        params: Dict[str, Any] = {
            "entity_token_embedding": jax.random.normal(
                next(ks),
                (_table_rows(self.meta.entity_tokens_size, self.sparse), self.entity_slot_size),
                jnp.float32,
            )
            * self.init_std,
            "relation_token_embedding": jax.random.normal(
                next(ks),
                (_table_rows(self.meta.relation_tokens_size, self.sparse), self.relation_slot_size),
                jnp.float32,
            )
            * self.init_std,
        }
        state: Dict[str, Any] = {}
        buffers = {
            "entity_token_ids": jnp.asarray(self.meta.entity_token_ids),
            "relation_token_ids": jnp.asarray(self.meta.relation_token_ids),
        }
        if self.normalize == "batchnorm":
            params["entity_bn"], state["entity_bn"] = init_batchnorm(
                self.entity_slot_size, uniform_weight=True, rng=next(ks)
            )
            params["relation_bn"], state["relation_bn"] = init_batchnorm(
                self.relation_slot_size, uniform_weight=True, rng=next(ks)
            )
        if self.project_relation:
            d2 = self.entity_slot_size ** 2
            std = 1.0 / (d2 * self.relation_slot_size * self.init_std ** 3)
            w = jax.random.normal(next(ks), (d2, self.relation_slot_size), jnp.float32) * std
            bn_p, bn_s = init_batchnorm(d2)
            params["relation_projection"] = {"w": w, "bn": bn_p}
            state["relation_projection_bn"] = bn_s
        return params, state, buffers

    def _tokens(self, variables, ids, kind: str) -> jax.Array:
        return variables["buffers"][f"{kind}_token_ids"][ids]

    def _apply_relation_projection(self, variables, x, train):
        """Linear d_r -> d_e^2 followed by BatchNorm1d (reference token-encoder
        projection head, openkge/model.py:944-947)."""
        params, state = variables["params"], variables["state"]
        y = jnp.dot(x, params["relation_projection"]["w"].T.astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y, new_bn = apply_batchnorm(
            params["relation_projection"]["bn"], state["relation_projection_bn"], y, train
        )
        return y.astype(x.dtype), new_bn


# ------------------------------------------------------------------ unigram


@dataclass
class UnigramPoolingEmbedder(TokenEmbedderBase):
    """Entity/relation embedding = pooled token embeddings
    (reference: UnigramPoolingRelationEmbedder, openkge/model.py:716-798)."""

    pool: str = "sum"
    activation: Optional[str] = None

    def init(self, rng: jax.Array) -> Variables:
        ks = iter(jax.random.split(rng, 8))
        params, state, buffers = self._init_base(ks)
        return {"params": params, "state": state, "buffers": buffers}

    def _pool_states(self, variables, ids, kind, table_name):
        """Token gather + masked pool + activation: the per-row stage."""
        toks = self._tokens(variables, ids, kind)  # [B, L]
        emb = variables["params"][table_name][toks].astype(self._cdtype)  # [B, L, d]
        emb = _pad_stop_gradient(emb, toks)
        if self.pool == "max":
            x = jnp.max(emb, axis=1)
        elif self.pool == "mean":
            lengths = jnp.sum((toks > 0).astype(jnp.float32), axis=1, keepdims=True)
            x = jnp.sum(emb, axis=1) / (lengths + 1e-12)
        else:  # sum — includes pad vectors exactly like the reference
            x = jnp.sum(emb, axis=1)
        if self.activation:
            x = getattr(jax.nn, {"ReLU": "relu", "Tanh": "tanh"}.get(self.activation, self.activation.lower()))(x)
        return x

    def _finish(self, variables, x, bn_name, proj, dropout, train, rng):
        new_state = dict(variables["state"])
        if self.normalize == "norm":
            x = _l2_normalize(x)
        elif self.normalize == "batchnorm":
            y32, new_state[bn_name] = apply_batchnorm(
                variables["params"][bn_name], variables["state"][bn_name],
                x.astype(jnp.float32), train,
            )
            x = y32.astype(self._cdtype)
        if proj:
            x, new_state["relation_projection_bn"] = self._apply_relation_projection(
                variables, x, train
            )
        x = _dropout(x, dropout, train, rng)
        return x, new_state, jnp.zeros((), jnp.float32)

    def _compose(self, variables, ids, kind, table_name, bn_name, proj, dropout, train, rng, inv=None):
        # query dedup (train/sparse.py SparsePlanBuilder dedup_queries): the
        # deterministic per-row pooling stage runs over UNIQUE ids only;
        # ``inv`` gathers back to per-row BEFORE batchnorm/dropout, so batch
        # statistics and noise see exactly the rows the undeduped encode
        # would — numerics are bitwise-identical, only the pooled row count
        # shrinks (Zipf batches repeat popular mentions heavily)
        x = self._pool_states(variables, ids, kind, table_name)
        if inv is not None:
            x = x[inv]
        return self._finish(variables, x, bn_name, proj, dropout, train, rng)

    def encode_entity(self, variables, ids, *, is_sp=None, train=False, rng=None, inv=None):
        return self._compose(
            variables, ids, "entity", "entity_token_embedding", "entity_bn",
            False, self.entity_dropout, train, rng, inv=inv,
        )

    def encode_entity_pair(
        self, variables, ids_a, ids_b, *, train=False, rng_a=None, rng_b=None, inv_b=None
    ):
        """One token gather + pool over the concatenated id batches; BN and
        dropout still run per group in order (same contract as
        LSTMEmbedder.encode_entity_pair — numerics identical to two calls).
        ``inv_b`` gathers group b's pooled rows back to per-row before its
        BN/dropout (query dedup — see _compose)."""
        na = ids_a.shape[0]
        x = self._pool_states(
            variables, jnp.concatenate([ids_a, ids_b]), "entity", "entity_token_embedding"
        )
        xa, state_a, reg_a = self._finish(
            variables, x[:na], "entity_bn", False, self.entity_dropout, train, rng_a
        )
        vb = {**variables, "state": state_a}
        xb = x[na:]
        if inv_b is not None:
            xb = xb[inv_b]
        xb, state_b, reg_b = self._finish(
            vb, xb, "entity_bn", False, self.entity_dropout, train, rng_b
        )
        return xa, xb, state_b, reg_a + reg_b

    def encode_relation(self, variables, ids, *, train=False, rng=None, inv=None):
        return self._compose(
            variables, ids, "relation", "relation_token_embedding", "relation_bn",
            self.project_relation, self.relation_dropout, train, rng, inv=inv,
        )


# ------------------------------------------------------------------- bigram


@dataclass
class BigramPoolingEmbedder(TokenEmbedderBase):
    """Width-2 convolution over token embeddings with residual or gated mix,
    masked pooling (reference: BigramPoolingRelationEmbedder,
    openkge/model.py:801-909).

    The reference's BN here is a BatchNorm1d over the channel axis of the
    [B, C, L-1] conv output with ``momentum=None`` (cumulative stats) applied
    *inside* the encoder, before the residual; replicated.  The reference
    never applies its relation projection in this family (encode_rel passes
    proj=None, openkge/model.py:905-906), so ``project_relation`` is rejected.
    """

    pool: str = ""
    gates: bool = False
    encoder_activation: Optional[str] = None

    def __post_init__(self):
        super().__post_init__()
        assert not self.project_relation, (
            "project_relation is unsupported for the bigram embedder "
            "(the reference defines but never applies it; openkge/model.py:905)"
        )

    def init(self, rng: jax.Array) -> Variables:
        ks = iter(jax.random.split(rng, 10))
        params, state, buffers = self._init_base(ks)
        # conv kernels [out_ch, in_ch, 2], torch default U(-k, k), k=1/sqrt(in*2)
        for kind, d in (("entity", self.entity_slot_size), ("relation", self.relation_slot_size)):
            out_ch = d + 1 if self.gates else d
            k = 1.0 / np.sqrt(d * 2)
            params[f"{kind}_conv"] = jax.random.uniform(
                next(ks), (out_ch, d, 2), jnp.float32, -k, k
            )
            bn_p, bn_s = init_batchnorm(out_ch)
            params[f"{kind}_conv_bn"] = bn_p
            state[f"{kind}_conv_bn"] = bn_s
        return {"params": params, "state": state, "buffers": buffers}

    def _conv_bn_momentum(self):
        return None  # reference: BatchNorm1d(..., momentum=None), model.py:859-860

    def _compose(self, variables, ids, kind, table_name, dropout, train, rng):
        toks = self._tokens(variables, ids, kind)  # [B, L]
        emb = variables["params"][table_name][toks].astype(self._cdtype)  # [B, L, d]
        # batch-norm over conv positions couples pad outputs into the loss;
        # block their gradient at the gather (torch padding_idx semantics)
        emb = _pad_stop_gradient(emb, toks)
        w = variables["params"][f"{kind}_conv"].astype(self._cdtype)  # [out_ch, d, 2]
        # conv1d kernel=2 over length: out[:, t, c] = sum_d (emb[:,t,d] w[c,d,0] + emb[:,t+1,d] w[c,d,1])
        y = (
            jnp.einsum("bld,cd->blc", emb[:, :-1, :], w[:, :, 0], preferred_element_type=jnp.float32)
            + jnp.einsum("bld,cd->blc", emb[:, 1:, :], w[:, :, 1], preferred_element_type=jnp.float32)
        ).astype(self._cdtype)  # [B, L-1, out_ch]
        if self.encoder_activation:
            y = getattr(jax.nn, {"ReLU": "relu", "Tanh": "tanh"}.get(
                self.encoder_activation, self.encoder_activation.lower()))(y)
        new_state = dict(variables["state"])
        if self.normalize == "batchnorm":
            B, Lm1, C = y.shape
            y2, new_state[f"{kind}_conv_bn"] = apply_batchnorm(
                variables["params"][f"{kind}_conv_bn"],
                variables["state"][f"{kind}_conv_bn"],
                y.reshape(B * Lm1, C).astype(jnp.float32),
                train,
                momentum=self._conv_bn_momentum(),
            )
            y = y2.astype(self._cdtype).reshape(B, Lm1, C)
        if self.gates:
            g = jax.nn.sigmoid(y[..., -1:])
            y = y[..., :-1] * g + emb[:, 1:, :] * (1 - g)
        else:
            y = y + emb[:, 1:, :]
        mask = (toks > 0).astype(y.dtype)[:, 1:, None]  # [B, L-1, 1]
        if self.pool == "max":
            x = jnp.max(y * mask, axis=1)
        else:
            x = jnp.sum(y * mask, axis=1)
        if self.normalize == "mean":
            lens = jnp.sum(mask, axis=1)
            x = x / (lens + 1e-12)
        if self.normalize == "norm":
            x = _l2_normalize(x)
        x = _dropout(x, dropout, train, rng)
        return x, new_state, jnp.zeros((), jnp.float32)

    def encode_entity(self, variables, ids, *, is_sp=None, train=False, rng=None):
        return self._compose(
            variables, ids, "entity", "entity_token_embedding", self.entity_dropout, train, rng
        )

    def encode_relation(self, variables, ids, *, train=False, rng=None):
        return self._compose(
            variables, ids, "relation", "relation_token_embedding", self.relation_dropout, train, rng
        )


# --------------------------------------------------------------------- lstm


@dataclass
class LSTMEmbedder(TokenEmbedderBase):
    """LSTM over token embeddings; representation = output at the last
    non-pad position (reference: LSTMRelationEmbedder, openkge/model.py:912-998)."""

    encoder_activation: Optional[str] = None

    def init(self, rng: jax.Array) -> Variables:
        ks = iter(jax.random.split(rng, 10))
        params, state, buffers = self._init_base(ks)
        params["entity_lstm"] = init_lstm_params(next(ks), self.entity_slot_size, self.entity_slot_size)
        params["relation_lstm"] = init_lstm_params(
            next(ks), self.relation_slot_size, self.relation_slot_size
        )
        return {"params": params, "state": state, "buffers": buffers}

    def _lstm_states_core(self, table, lstm, toks, plan):
        """Pure row-encode core: token gather + LSTM recurrence +
        last-non-pad-state select on a [R, L] token block -> [R, H].

        Runs either globally (single device / GSPMD) or as the per-shard
        body of a ``shard_map`` region (:meth:`_lstm_states`): the length
        sort, the fused Pallas kernels and the gather-sum plan are all
        row-block-local, so inside a region they operate on the shard's
        rows only."""
        # the whole sequence path is time-major [L, R, .]: gather, input
        # projection, recurrence and last-state select all consume/produce
        # [L, R]-contiguous tensors, so no batch-major relayout copies appear
        # in the forward or backward graph
        toks_tm = toks.T  # [L, R]
        L, B = toks_tm.shape
        d_in = table.shape[1]
        H = lstm["w_hh"].shape[1]
        fused = lstm_fused_supported(B, L, d_in, H)
        use_sorted = fused or plan is not None
        if use_sorted:
            # sort rows by descending length so the rows active at time t
            # are a batch prefix and the fused kernel can skip pad steps;
            # the final states are unsorted back below (all ops after the
            # LSTM are per-row, so the order is invisible downstream)
            lengths_all = jnp.sum((toks_tm > 0).astype(jnp.int32), axis=0)
            order, unsort = length_sort_perm(lengths_all, L)
            toks_tm = toks_tm[:, order]
        emb_tm = token_gather_tm(
            table, toks_tm, self._cdtype, time_major=True, grad_plan=plan,
        )  # [L, R, d]
        lengths = jnp.sum((toks_tm > 0).astype(jnp.int32), axis=0)
        if fused:
            # last-state select fused into the kernels: [R, H] out directly
            x = lstm_last_fused(lstm, emb_tm, lengths)
            return x[unsort]
        out_tm = lstm_forward_tm(lstm, emb_tm)  # [L, R, H]
        idx = jnp.clip(lengths - 1, 0, toks_tm.shape[0] - 1)
        x = jnp.take_along_axis(out_tm, idx[None, :, None], axis=0)[0]
        if use_sorted:
            x = x[unsort]  # undo the length sort (counting-sort inverse)
        return x

    def _lstm_states(self, variables, ids, kind, table_name, lstm_name, train=False):
        """Token gather + LSTM recurrence + last-non-pad-state select for a
        row batch; returns the raw [B, H] states (pre-norm/dropout).

        When a row-shard context is set (:meth:`set_row_shard_ctx` — the
        model sets it per encode region on device meshes), the core runs
        inside a ``jax.shard_map`` over the context's mesh axis: each shard
        sorts, gathers and runs the recurrence kernels on ITS row block
        only.  Without the region, the in-jit global length sort (and, on
        real TPUs, the unpartitionable Pallas custom-call) forces GSPMD to
        REPLICATE the whole encode on every device — measured by
        tools/scaling_model.py --hlo-sweep.  Replicated inputs (token
        table / rows, LSTM weights) get their per-shard cotangents psum'd
        by shard_map's AD, reproducing the global gradient exactly (pinned
        by tests/test_multichip.py::test_sparse_grad_plan_on_mesh)."""
        # gather-sum backward plan for the token table (train/sparse.py
        # SparsePlanBuilder): host-built, keyed to the SORTED time-major
        # layout, so its presence also forces the sorted path; only the
        # sparse train step ships it (train=True), eval buffers never do.
        # In a shard context the model may override the plan key (separate
        # candidate / query plans for the split encodes).
        ctx = getattr(self, "_row_shard_ctx", None)
        plan_key = getattr(self, "_plan_key_override", None) or f"{kind}_token_grad_plan"
        plan = variables["buffers"].get(plan_key) if train else None
        toks = self._tokens(variables, ids, kind)  # [B, L]
        table = variables["params"][table_name]
        lstm = variables["params"][lstm_name]
        B = toks.shape[0]
        if ctx is not None:
            mesh, axis = ctx
            A = int(mesh.shape[axis])
            # a 2-D (unstacked, global-layout) plan cannot be consumed
            # per-shard — fall back to the global path for that call
            stacked_ok = plan is None or plan["pos"].ndim == 3
            if A > 1 and B % A == 0 and stacked_ok:
                from jax.sharding import PartitionSpec as P

                def region(table, lstm, toks_blk, plan_blk):
                    if plan_blk is not None:
                        plan_blk = {k: v[0] for k, v in plan_blk.items()}
                    return self._lstm_states_core(table, lstm, toks_blk, plan_blk)

                plan_spec = (
                    None if plan is None
                    else jax.tree_util.tree_map(lambda _: P(axis), plan)
                )
                return jax.shard_map(
                    region,
                    mesh=mesh,
                    in_specs=(
                        jax.tree_util.tree_map(lambda _: P(), table),
                        jax.tree_util.tree_map(lambda _: P(), lstm),
                        P(axis),
                        plan_spec,
                    ),
                    out_specs=P(axis),
                    # the recurrence scan's zero carry is typed unvarying
                    # while the body makes it varying over the region axis;
                    # skip the vma analysis (the spec-driven AD transpose —
                    # psum of replicated inputs' cotangents — is unaffected,
                    # pinned by the mesh equality test)
                    check_vma=False,
                )(table, lstm, toks, plan)
        return self._lstm_states_core(table, lstm, toks, plan)

    def _finish(self, variables, x, bn_name, proj, dropout, train, rng):
        """Activation -> batchnorm -> (relation projection) -> dropout on
        raw LSTM states; batch statistics see exactly the rows in ``x``."""
        if self.encoder_activation:
            x = getattr(jax.nn, {"ReLU": "relu", "Tanh": "tanh"}.get(
                self.encoder_activation, self.encoder_activation.lower()))(x)
        new_state = dict(variables["state"])
        if self.normalize == "batchnorm":
            y32, new_state[bn_name] = apply_batchnorm(
                variables["params"][bn_name], variables["state"][bn_name],
                x.astype(jnp.float32), train,
            )
            x = y32.astype(self._cdtype)
        if proj:
            x, new_state["relation_projection_bn"] = self._apply_relation_projection(
                variables, x.astype(self._cdtype), train
            )
        x = _dropout(x, dropout, train, rng)
        return x.astype(self._cdtype), new_state, jnp.zeros((), jnp.float32)

    def _compose(self, variables, ids, kind, table_name, lstm_name, bn_name, proj, dropout, train, rng, inv=None):
        # query dedup: recurrence runs over unique rows; ``inv`` gathers back
        # to per-row BEFORE batchnorm/dropout (bitwise-identical numerics,
        # see TokenEmbedderBase._compose)
        x = self._lstm_states(variables, ids, kind, table_name, lstm_name, train=train)
        if inv is not None:
            x = x[inv]
        return self._finish(variables, x, bn_name, proj, dropout, train, rng)

    def encode_entity_pair(
        self, variables, ids_a, ids_b, *, train=False, rng_a=None, rng_b=None, inv_b=None
    ):
        """Encode two entity id batches through ONE token-gather + LSTM pass.

        Numerically identical to ``encode_entity(ids_a)`` followed by
        ``encode_entity(ids_b)`` — the LSTM is per-row, and batchnorm /
        dropout still run per group in that order (matching the reference's
        two separate forward calls, openkge/trainer.py:76-82) — but the
        gather, length sort and recurrence kernels launch once over the
        concatenated rows.  Profile-driven: at flagship shapes the two
        4096-row kernel pipelines cost ~1 ms/step more than one 8192-row
        pipeline (see RESULTS.md round-2 roofline).
        """
        na = ids_a.shape[0]
        x = self._lstm_states(
            variables,
            jnp.concatenate([ids_a, ids_b]),
            "entity", "entity_token_embedding", "entity_lstm",
            train=train,
        )
        xa, state_a, reg_a = self._finish(
            variables, x[:na], "entity_bn", False, self.entity_dropout, train, rng_a
        )
        vb = {**variables, "state": state_a}
        xb = x[na:]
        if inv_b is not None:
            # query dedup: group b holds UNIQUE query mentions; gather back
            # to per-row before its BN/dropout (see TokenEmbedderBase._compose)
            xb = xb[inv_b]
        xb, state_b, reg_b = self._finish(
            vb, xb, "entity_bn", False, self.entity_dropout, train, rng_b
        )
        return xa, xb, state_b, reg_a + reg_b

    def encode_entity(self, variables, ids, *, is_sp=None, train=False, rng=None, inv=None):
        return self._compose(
            variables, ids, "entity", "entity_token_embedding", "entity_lstm", "entity_bn",
            False, self.entity_dropout, train, rng, inv=inv,
        )

    def encode_relation(self, variables, ids, *, train=False, rng=None, inv=None):
        return self._compose(
            variables, ids, "relation", "relation_token_embedding", "relation_lstm", "relation_bn",
            self.project_relation, self.relation_dropout, train, rng, inv=inv,
        )
