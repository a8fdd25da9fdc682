"""Row-sparse embedding-table training path (``sparse: true``).

Capability equivalent of the reference's ``sparse=True`` embedding gradients
(reference: openkge/model.py:390-391, 597-608 — torch emits sparse COO grads
and torch.optim.Adagrad updates only the touched rows).  The TPU-native
shape is different: instead of a sparse gradient *format*, the train step is
restructured so dense row gradients are only ever materialized for the rows
a batch touches:

1. the host computes, per batch, the unique table rows it will touch
   (entity/relation ids for lookup tables; the union of token ids for token
   tables) and remaps the batch's index arrays into that compact row space,
2. the step gathers those rows (``rows = table[uids]``), differentiates the
   loss w.r.t. the gathered ``[U, d]`` rows instead of the ``[V, d]`` table,
3. a scatter-Adagrad kernel (ops/pallas/scatter_adagrad_kernel.py) updates
   only the touched rows of the parameter + accumulator tables.

HBM traffic per step drops from O(V*d) x 5 arrays (dense grad scatter, dense
optimizer read-modify-write) to O(U*d) — at OLPBench lookup scale
(V=2.47M, U<=8.2k) a ~300x reduction; step time stops scaling with the
table height.

Semantics vs the dense path: identical when weight_decay == 0 (tested
step-for-step).  With weight_decay > 0, decay is applied *lazily* to touched
rows only — a deliberate, documented extension (torch raises on
sparse + weight_decay; dense decays every row every step).

Supported optimizers for sparse tables: Adagrad and SGD(momentum=0) —
the same set torch supports for sparse grads (modulo SparseAdam).
Token-table sparsity additionally replaces the device-resident token-id
buffers with batch-local remapped token matrices shipped from the host.

Gradient accumulation composes with the sparse path
(:func:`make_sparse_accum_steps`): the window's micro-batches share one
union row space planned on the host (:meth:`SparsePlanBuilder.plan_window`),
row gradients accumulate compactly, and the scatter update applies once —
mirroring torch's accumulate-then-coalesce sparse-grad semantics
(reference: openkge/trainer.py:229-246).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.batching import Batch
from open_knowledge_graph_embeddings_tpu.models.embedders import (
    LookupEmbedder,
    TokenEmbedderBase,
)
from open_knowledge_graph_embeddings_tpu.models.model import KGEModel
from open_knowledge_graph_embeddings_tpu.ops.pallas.scatter_adagrad_kernel import (
    scatter_adagrad,
)
from open_knowledge_graph_embeddings_tpu.train.optim import (
    OptimizerRegimes,
    assign_regimes,
)
from open_knowledge_graph_embeddings_tpu.train.step import prefix_loss, train_batch_to_arrays
from open_knowledge_graph_embeddings_tpu.utils.misc import next_bucket

SPARSE_CAPABLE_OPTIMIZERS = ("Adagrad", "SGD")


def host_length_sort_perm(toks: np.ndarray) -> np.ndarray:
    """Host replica of the device's stable descending-length counting sort
    (ops/lstm.py length_sort_perm): ``order`` such that ``toks[order]`` is
    the row order the fused LSTM encoder sees.  Both sides sort stably on
    the same key (max_len - length), so the permutations are identical —
    pinned by a unit test against the device implementation."""
    L = toks.shape[1]
    lengths = (toks > 0).sum(axis=1)
    return np.argsort(L - lengths, kind="stable").astype(np.int32)


def build_token_grad_plan(
    toks: np.ndarray, layout_height: int, K: int = 8, bucket_min: int = 256,
    use_native: bool = True,
) -> Dict[str, np.ndarray]:
    """Slot plan for the gather-sum token-table backward
    (models/embedders.py token_gather_tm ``grad_plan``).

    ``toks`` [R, L] are the (remapped) token ids exactly as the batch's
    row-encoder will see them; positions are flat *time-major* indices into
    the length-sorted layout (p = t * R + sorted_row), matching the
    [L, R, d] cotangent the LSTM path produces.  Non-pad positions are
    grouped by token id into slots of ``K``; a token with c occurrences
    uses ceil(c / K) slots, so the device-side level-2 scatter touches
    ~P/K rows instead of P.  Pad positions are simply absent (their
    cotangents are exactly zero in the scan path and unread garbage in the
    fused path — either way they must not be accumulated).
    """
    R, L = toks.shape
    if use_native:
        # GIL-free C kernel (native/oket_native.cpp oket_grad_plan):
        # counting passes instead of argsorts, ~10x the numpy path and it
        # lets the prefetch workers actually overlap the device step.
        # Numpy-vs-native equality is pinned by a unit test.
        from open_knowledge_graph_embeddings_tpu.native.loader import (
            grad_plan_native,
        )

        res = grad_plan_native(toks, layout_height, K, layout_height)
        if res is not None:
            pos, valid, uid, s_real = res
            S = next_bucket(max(s_real, 1), minimum=bucket_min)
            cap = pos.shape[0]
            if S <= cap:
                return {"pos": pos[:S], "valid": valid[:S], "uid": uid[:S]}
            out = {
                "pos": np.zeros((S, K), np.int32),
                "valid": np.zeros((S, K), bool),
                "uid": np.full(S, layout_height, np.int32),
            }
            out["pos"][:cap] = pos
            out["valid"][:cap] = valid
            out["uid"][:cap] = uid
            return out
    order = host_length_sort_perm(toks)
    ids_flat = toks[order].T.reshape(-1)  # time-major [L*R]
    keep = np.flatnonzero(ids_flat != 0)
    # grouping only needs SOME deterministic order within each id run (slot
    # sums are order-independent), so introsort beats kind="stable"
    # (numpy's stable int32 sort is timsort — measured 3x slower here)
    o = np.argsort(ids_flat[keep])
    ids_s = ids_flat[keep][o]
    pos_s = keep[o].astype(np.int32)
    n = len(ids_s)
    if n == 0:
        S = next_bucket(1, minimum=bucket_min)
        return {
            "pos": np.zeros((S, K), np.int32),
            "valid": np.zeros((S, K), bool),
            "uid": np.full(S, layout_height, np.int32),
        }
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = ids_s[1:] != ids_s[:-1]
    run_id = np.cumsum(change) - 1
    run_start = np.flatnonzero(change)
    off = np.arange(n) - run_start[run_id]
    run_len = np.diff(np.append(run_start, n))
    slots_per_run = -(-run_len // K)
    slot_base = np.concatenate(([0], np.cumsum(slots_per_run)[:-1]))
    slot_of = (slot_base[run_id] + off // K).astype(np.int64)
    S_real = int(slots_per_run.sum())
    S = next_bucket(S_real, minimum=bucket_min)
    pos_m = np.zeros((S, K), np.int32)
    valid = np.zeros((S, K), bool)
    uid = np.full(S, layout_height, np.int32)  # out of range -> dropped
    pos_m[slot_of, off % K] = pos_s
    valid[slot_of, off % K] = True
    uid[slot_of] = ids_s
    return {"pos": pos_m, "valid": valid, "uid": uid}


def sparse_table_names(embedder, entity_sparse: bool) -> Tuple[str, ...]:
    """Tables eligible for row-sparse updates.  Entity-side tables are only
    sparse under batch-shared candidates — full-vocab training touches every
    entity row anyway, so the dense path is already optimal there."""
    if isinstance(embedder, LookupEmbedder):
        names = ["relation_embedding"]
        if entity_sparse:
            names.insert(0, "entity_embedding")
        return tuple(names)
    if isinstance(embedder, TokenEmbedderBase):
        names = ["relation_token_embedding"]
        if entity_sparse:
            names.insert(0, "entity_token_embedding")
        return tuple(names)
    return ()


class SparsePlanBuilder:
    """Host-side: batch -> jit-ready array dict with unique-row plans.

    The returned dict is ``train_batch_to_arrays(batch)`` plus, per sparse
    table T, ``sparse/T/uids`` ([U] int32, bucket-padded) and
    ``sparse/T/valid`` ([U] bool); batch index arrays are remapped into the
    compact row space, and for token embedders the token-id buffers are
    replaced by batch-local matrices under ``sparse/buffers/*``.
    """

    BLOCK = 8  # TPU float32 HBM tile height (see scatter_adagrad_kernel.py)

    def __init__(
        self,
        embedder,
        entity_sparse: bool,
        uid_bucket_min: int = 256,
        min_rows_ratio: float = 12.0,
        layout: Optional[str] = None,
        grad_plan: bool = True,
        mesh=None,
        dedup_queries: bool = True,
        dedup_bucket: int = 512,
    ):
        """``min_rows_ratio``: a table is only sparsified for a batch when
        its height exceeds ``ratio x touched-rows`` — below that the dense
        update's O(V) passes are cheaper.  The default 12 is the measured
        v5e crossover: the dense fused update walks the table at ~24 ns/row
        while XLA row scatter costs ~0.35 us/row (flagship token tables at
        V/U~3 measured 5.4 ms SLOWER sparse; the 2.47M-entity lookup table
        at V/U~300 measured 20x faster).

        ``layout``:

        * 'compact' (default): unique row ids only — the XLA gather/scatter
          path.  Measured fastest IN-STEP on v5e (flagship: 10.98 ms vs
          hybrid's 11.11 — XLA overlaps its scatters with the step tail
          better than the custom-call can),
        * 'hybrid' (OKET_SPARSE_HYBRID=1): compact ids for the loss /
          gradient path PLUS the 8-row-block update plan (``block_ids``,
          ``slot_src``, ``bvalid``) for the Pallas RMW kernel — the
          gradient stays [U, d] (no 8x block inflation in the backward) and
          the update batches 4 block DMAs per touched tile.  Faster
          ISOLATED (pair 2.14 ms vs 2.36) and on locally-attached chips it
          may win; in this environment the in-step difference is noise,
        * 'block' (OKET_SPARSE_PALLAS=1): rows grouped into 8-row HBM tiles
          with the gradient itself block-laid-out; the 8x row-space
          inflation in the backward makes it strictly worse in-step (kept
          for the kernel's direct tests)."""
        self.embedder = embedder
        self.entity_sparse = entity_sparse
        self.uid_bucket_min = uid_bucket_min
        self.min_rows_ratio = min_rows_ratio
        if layout is None:
            import os

            if os.environ.get("OKET_SPARSE_PALLAS"):
                layout = "block"
            elif os.environ.get("OKET_SPARSE_HYBRID"):
                layout = "hybrid"
            else:
                layout = "compact"
        assert layout in ("compact", "block", "hybrid"), layout
        self.layout = layout
        self.tables = sparse_table_names(embedder, entity_sparse)
        self.is_token = isinstance(embedder, TokenEmbedderBase)
        import threading

        self._tl = threading.local()  # per-worker-thread native scratch
        # the gather-sum backward plan is consumed by the LSTM embedder's
        # time-major sorted layout; its position indices reference the
        # GLOBAL batch, which stays valid on device meshes too: GSPMD
        # programs are written globally, so the in-jit length sort orders
        # the global batch and the host replica of that sort sees the same
        # rows (replicated collate).  Mesh equality is pinned by
        # tests/test_multichip.py::test_sparse_grad_plan_on_mesh.
        from open_knowledge_graph_embeddings_tpu.models.embedders import LSTMEmbedder

        self.grad_plan = bool(grad_plan) and isinstance(embedder, LSTMEmbedder)
        #: device mesh (or None).  With a mesh the model splits the
        #: candidate / query encodes into shard_map regions
        #: (models/model.py set_mesh), so plans are built PER SHARD over
        #: each region's local row block and stacked [A, S, K] — separate
        #: "cand" and "entity" (query) plans replace the single
        #: concatenated pair-encode plan.
        self.mesh = mesh
        #: encode each UNIQUE query mention/relation once and gather back
        #: per-row before BN/dropout — numerics are bitwise-identical to
        #: the undeduped encode (models/embedders._compose ``inv``), only
        #: the token-composition row count shrinks (Zipf batches repeat
        #: popular mentions ~5x).  Token embedders with encoder-internal
        #: BN (bigram: stats over conv positions of the encode batch)
        #: would change statistics, so they are excluded.  On meshes the
        #: unique lists are built PER DATA-SHARD (each shard_map region
        #: block dedups its own rows; inverse indices are globalized as
        #: shard*S + local), so per-chip encode work still shrinks as N/D.
        from open_knowledge_graph_embeddings_tpu.models.embedders import (
            BigramPoolingEmbedder,
        )

        self.dedup_queries = (
            bool(dedup_queries)
            and self.is_token
            and not isinstance(embedder, BigramPoolingEmbedder)
        )
        self.dedup_bucket = int(dedup_bucket)
        if entity_sparse and not self.tables:
            raise ValueError(f"no sparse tables for embedder {type(embedder).__name__}")

    def _pack_rows(self, d: Dict[str, Any], table: str, uids: np.ndarray, height: int):
        """Emit the sparse plan for one table and return the uid ->
        layout-position remapper, or None when the table is too small for
        sparsification to pay off (then no plan keys are emitted and the
        caller must keep original ids)."""
        B = self.BLOCK
        if self.layout in ("compact", "hybrid"):
            U = next_bucket(len(uids), minimum=self.uid_bucket_min)
            if height < self.min_rows_ratio * U:
                return None
            padded = np.zeros(U, np.int32)
            padded[: len(uids)] = uids
            valid = np.zeros(U, bool)
            valid[: len(uids)] = True
            d[f"sparse/{table}/uids"] = padded
            d[f"sparse/{table}/valid"] = valid
            if self.layout == "hybrid" and height % B == 0:
                # update-side block plan: compact row i lives at block-layout
                # slot pos[i]; the step converts g with ONE streaming gather
                # (slot_src, fill past-U -> 0) and the Pallas kernel RMWs
                # only the touched 8-row tiles
                blocks = np.unique(uids >> 3)
                Kb = next_bucket(
                    len(blocks), minimum=max(self.uid_bucket_min // B, 8)
                )
                block_ids = np.zeros(Kb, np.int32)
                block_ids[: len(blocks)] = blocks
                pos = (
                    np.searchsorted(blocks, uids >> 3).astype(np.int32) * B
                    + (uids & (B - 1))
                )
                slot_src = np.full(Kb * B, U, np.int32)
                slot_src[pos] = np.arange(len(uids), dtype=np.int32)
                bvalid = np.zeros(Kb * B, bool)
                bvalid[pos] = True
                d[f"sparse/{table}/block_ids"] = block_ids
                d[f"sparse/{table}/slot_src"] = slot_src
                d[f"sparse/{table}/bvalid"] = bvalid
            return lambda x: np.searchsorted(uids, x).astype(np.int32)
        # block-aligned layout: sorted unique row ids grouped into their
        # enclosing 8-row HBM tiles (unique block ids drive the Pallas kernel)
        blocks = np.unique(uids >> 3)
        Kb = next_bucket(len(blocks), minimum=max(self.uid_bucket_min // B, 8))
        if height < self.min_rows_ratio * Kb * B:
            return None
        block_ids = np.zeros(Kb, np.int32)
        block_ids[: len(blocks)] = blocks
        layout_uids = (block_ids[:, None] * B + np.arange(B, dtype=np.int32)).reshape(-1)
        pos = np.searchsorted(blocks, uids >> 3).astype(np.int32) * B + (uids & (B - 1))
        valid = np.zeros(Kb * B, bool)
        valid[pos] = True
        d[f"sparse/{table}/block_ids"] = block_ids
        d[f"sparse/{table}/uids"] = layout_uids
        d[f"sparse/{table}/valid"] = valid

        def remap(x: np.ndarray) -> np.ndarray:
            return (
                np.searchsorted(blocks, x >> 3).astype(np.int32) * B + (x & (B - 1))
            ).astype(np.int32)

        return remap

    def __call__(self, batch: Batch) -> Dict[str, Any]:
        d = train_batch_to_arrays(batch)
        if self.is_token:
            self._plan_token(d, batch)
        else:
            self._plan_lookup(d, batch)
        return d

    def _native_unique_remap(self, toks: np.ndarray, vocab: int):
        """(sorted unique ids incl 0, remapped matrix) via the GIL-free C
        kernel, or None (non-compact layout / library unavailable) — then
        the numpy union1d + searchsorted path runs instead."""
        if self.layout != "compact":
            return None
        from open_knowledge_graph_embeddings_tpu.native.loader import (
            unique_remap_native,
        )

        buf = getattr(self._tl, "buf", None)
        if buf is None or buf.size < vocab:
            self._tl.buf = buf = np.empty(vocab, np.int32)
        return unique_remap_native(toks, vocab, buf)

    def _emit_grad_plan(self, d: Dict[str, Any], kind: str, table: str) -> None:
        """Attach the gather-sum backward plan for one token table (see
        :func:`build_token_grad_plan`); keyed so the sparse step can route
        it into the model buffers as ``{kind}_token_grad_plan``."""
        if not self.grad_plan:
            return
        toks = d[f"sparse/buffers/{kind}_token_ids"]
        height = len(d[f"sparse/{table}/uids"])
        if self.mesh is not None:
            from open_knowledge_graph_embeddings_tpu.parallel.mesh import (
                DATA_AXIS,
                MODEL_AXIS,
            )

            shape = dict(self.mesh.shape)
            data_n = shape.get(DATA_AXIS, 1)
            model_n = shape.get(MODEL_AXIS, 1)
            cand_n = model_n if model_n > 1 else data_n
            if kind == "entity":
                # mesh mode splits the pair encode: candidate rows go
                # through their own region (sharded over cand_n), query
                # rows over data_n — separate per-shard plans for each
                B = len(d["ent_ids"])
                self._emit_sharded_plan(d, "cand", toks[B:], cand_n, height)
                self._emit_sharded_plan(d, "entity", toks[:B], data_n, height)
            else:
                self._emit_sharded_plan(d, kind, toks, data_n, height)
            return
        if kind == "entity":
            # the model encodes candidates and query entities in ONE LSTM
            # pass with candidates FIRST (models/model.py
            # prefix_queries_and_candidates -> encode_entity_pair(cand_ids,
            # ent_ids)), so the plan's row order must match that
            # concatenation, not the buffer order.  Pinned by the
            # plan-vs-scatter gradient equality test.
            B = len(d["ent_ids"])
            toks = np.concatenate([toks[B:], toks[:B]])
        for k, v in build_token_grad_plan(toks, height).items():
            d[f"sparse/plan/{kind}_token/{k}"] = v

    def _emit_sharded_plan(
        self, d: Dict[str, Any], key: str, toks: np.ndarray, A: int, height: int
    ) -> None:
        """Per-shard plans for a mesh-region row block: GSPMD splits dim 0
        into ``A`` equal contiguous blocks, each shard sorts ITS block
        locally inside shard_map, so shard i's plan is built over rows
        [i*R/A, (i+1)*R/A) and the plans stack to [A, S, K] (common S, pad
        slots point uid out of range -> dropped).  Undivisible row counts
        fall back to one global (unstacked) plan — the embedder then skips
        the region for that call."""
        R = len(toks)
        if A <= 1 or R % A != 0:
            for k, v in build_token_grad_plan(toks, height).items():
                d[f"sparse/plan/{key}_token/{k}"] = v
            return
        blk = R // A
        plans = [
            build_token_grad_plan(toks[i * blk : (i + 1) * blk], height)
            for i in range(A)
        ]
        S = max(p["pos"].shape[0] for p in plans)
        K = plans[0]["pos"].shape[1]
        pos = np.zeros((A, S, K), np.int32)
        valid = np.zeros((A, S, K), bool)
        uid = np.full((A, S), height, np.int32)
        for i, p in enumerate(plans):
            s = p["pos"].shape[0]
            pos[i, :s] = p["pos"]
            valid[i, :s] = p["valid"]
            uid[i, :s] = p["uid"]
        d[f"sparse/plan/{key}_token/pos"] = pos
        d[f"sparse/plan/{key}_token/valid"] = valid
        d[f"sparse/plan/{key}_token/uid"] = uid

    # ------------------------------------------------ accumulation windows

    def plan_window(self, batches) -> list:
        """Plan a gradient-accumulation window: one UNION row space over all
        micro-batches (reference analog: torch sparse grads accumulate
        across backward calls and coalesce at optimizer.step,
        openkge/trainer.py:229-246 + model.py:390-391).

        Every returned array dict shares the identical ``sparse/T/uids`` /
        ``valid`` (/``block_ids``) plan, so [U, d] row-gradient accumulators
        allocated from the first micro-batch stay valid for the whole
        window; each micro-batch's index arrays are remapped into the union
        layout."""
        ds = [train_batch_to_arrays(b) for b in batches]
        if self.is_token:
            self._window_token(ds, batches)
        else:
            self._window_lookup(ds, batches)
        return ds

    def _window_lookup(self, ds, batches) -> None:
        meta = self.embedder.meta
        if self.entity_sparse:
            used = []
            for b in batches:
                assert b.candidate_ids is not None, (
                    "entity-table sparsity requires batch-shared candidates"
                )
                used += [b.ent_ids, b.candidate_ids]
            plan: Dict[str, Any] = {}
            remap = self._pack_rows(
                plan, "entity_embedding", np.unique(np.concatenate(used)),
                meta.entities_size,
            )
            for d, b in zip(ds, batches):
                d.update(plan)
                if remap is not None:
                    d["ent_ids"] = remap(b.ent_ids)
                    d["candidate_ids"] = remap(b.candidate_ids)
        plan = {}
        remap = self._pack_rows(
            plan, "relation_embedding",
            np.unique(np.concatenate([b.rel_ids for b in batches])),
            meta.relations_size,
        )
        for d, b in zip(ds, batches):
            d.update(plan)
            if remap is not None:
                d["rel_ids"] = remap(b.rel_ids)

    def _window_token(self, ds, batches) -> None:
        meta = self.embedder.meta
        if self.entity_sparse:
            toks_list = []
            for b in batches:
                assert b.candidate_ids is not None, (
                    "entity-token-table sparsity requires batch-shared candidates"
                )
                used = np.concatenate([b.ent_ids, b.candidate_ids])
                toks_list.append(meta.entity_token_ids[used])
            ut = np.union1d(
                np.int32(0), np.concatenate([t.ravel() for t in toks_list])
            )
            plan: Dict[str, Any] = {}
            remap = self._pack_rows(
                plan, "entity_token_embedding", ut, meta.entity_tokens_size
            )
            for d, b, toks in zip(ds, batches, toks_list):
                d.update(plan)
                if remap is not None:
                    B = len(b.ent_ids)
                    d["ent_ids"] = np.arange(B, dtype=np.int32)
                    d["candidate_ids"] = np.arange(
                        B, B + len(b.candidate_ids), dtype=np.int32
                    )
                    d["sparse/buffers/entity_token_ids"] = remap(toks)
                    self._emit_grad_plan(d, "entity", "entity_token_embedding")
        rtoks_list = [meta.relation_token_ids[b.rel_ids] for b in batches]
        plan = {}
        remap = self._pack_rows(
            plan, "relation_token_embedding",
            np.union1d(np.int32(0), np.concatenate([t.ravel() for t in rtoks_list])),
            meta.relation_tokens_size,
        )
        for d, b, rtoks in zip(ds, batches, rtoks_list):
            d.update(plan)
            if remap is not None:
                d["rel_ids"] = np.arange(len(b.rel_ids), dtype=np.int32)
                d["sparse/buffers/relation_token_ids"] = remap(rtoks)
                self._emit_grad_plan(d, "relation", "relation_token_embedding")

    def _plan_lookup(self, d: Dict[str, Any], batch: Batch) -> None:
        meta = self.embedder.meta
        if self.entity_sparse:
            assert batch.candidate_ids is not None, (
                "entity-table sparsity requires batch-shared candidates"
            )
            used = np.concatenate([batch.ent_ids, batch.candidate_ids])
            remap = self._pack_rows(d, "entity_embedding", np.unique(used), meta.entities_size)
            if remap is not None:
                d["ent_ids"] = remap(batch.ent_ids)
                d["candidate_ids"] = remap(batch.candidate_ids)
        remap = self._pack_rows(
            d, "relation_embedding", np.unique(batch.rel_ids), meta.relations_size
        )
        if remap is not None:
            d["rel_ids"] = remap(batch.rel_ids)

    def _dedup_shards(self) -> int:
        if self.mesh is None:
            return 1
        from open_knowledge_graph_embeddings_tpu.parallel.mesh import DATA_AXIS

        return int(dict(self.mesh.shape).get(DATA_AXIS, 1))

    def _dedup_ids(self, ids: np.ndarray):
        """(encode_ids, inv_or_None): unique ids padded to a multiple of
        ``dedup_bucket`` (few static shapes; padding repeats uid 0 — those
        rows encode but are never gathered, so their cotangent is zero).
        Returns the original ids unchanged when dedup is off or wouldn't
        shrink.

        On a mesh, the batch's rows are split into the ``data``-axis
        shard blocks GSPMD will assign, each block dedups independently to
        a COMMON bucket S, and the inverse indices are globalized as
        ``shard * S + local`` — so the encode region (embedders
        ``_lstm_states`` shard_map) still sees per-shard-local unique
        rows, and the per-row gather crosses no shard boundary."""
        if not self.dedup_queries:
            return ids, None
        A = self._dedup_shards()
        if A > 1 and len(ids) % A != 0:
            return ids, None
        blk = len(ids) // A
        parts = [
            np.unique(ids[i * blk : (i + 1) * blk], return_inverse=True)
            for i in range(A)
        ]
        bump = self.dedup_bucket
        S = max(bump, -(-max(len(u) for u, _ in parts) // bump) * bump)
        if A * S >= len(ids):
            return ids, None
        enc = np.concatenate(
            [np.concatenate([u, np.full(S - len(u), u[0], u.dtype)]) for u, _ in parts]
        )
        inv = np.concatenate([i * S + iv for i, (_, iv) in enumerate(parts)])
        return enc.astype(np.int32), inv.astype(np.int32)

    def _plan_token(self, d: Dict[str, Any], batch: Batch) -> None:
        meta = self.embedder.meta
        if self.entity_sparse:
            assert batch.candidate_ids is not None, (
                "entity-token-table sparsity requires batch-shared candidates"
            )
            ents_enc, ent_inv = self._dedup_ids(batch.ent_ids)
            used = np.concatenate([ents_enc, batch.candidate_ids])
            toks = meta.entity_token_ids[used]  # [S_e+N, L]
            # PAD (token 0) must map to layout position 0 even when no pad
            # token appears in the batch: _pad_stop_gradient and the length
            # masks key off remapped id 0
            nat = self._native_unique_remap(toks, meta.entity_tokens_size)
            ut, remapped = nat if nat is not None else (
                np.union1d(np.int32(0), toks), None
            )
            remap = self._pack_rows(d, "entity_token_embedding", ut, meta.entity_tokens_size)
            if remap is not None:
                B = len(ents_enc)
                d["ent_ids"] = np.arange(B, dtype=np.int32)
                d["candidate_ids"] = np.arange(
                    B, B + len(batch.candidate_ids), dtype=np.int32
                )
                if ent_inv is not None:
                    d["dedup/ent_inv"] = ent_inv
                d["sparse/buffers/entity_token_ids"] = (
                    remapped if remapped is not None else remap(toks)
                )
                self._emit_grad_plan(d, "entity", "entity_token_embedding")
        rels_enc, rel_inv = self._dedup_ids(batch.rel_ids)
        rtoks = meta.relation_token_ids[rels_enc]  # [S_r, L]
        nat = self._native_unique_remap(rtoks, meta.relation_tokens_size)
        rut, rremapped = nat if nat is not None else (
            np.union1d(np.int32(0), rtoks), None
        )
        remap = self._pack_rows(
            d, "relation_token_embedding", rut, meta.relation_tokens_size
        )
        if remap is not None:
            d["rel_ids"] = np.arange(len(rels_enc), dtype=np.int32)
            if rel_inv is not None:
                d["dedup/rel_inv"] = rel_inv
            d["sparse/buffers/relation_token_ids"] = (
                rremapped if rremapped is not None else remap(rtoks)
            )
            self._emit_grad_plan(d, "relation", "relation_token_embedding")


# ------------------------------------------------------------- row updates


def _sparse_adagrad_rows(g_rows, uids, valid, p, s, hp, block_ids=None,
                         slot_src=None, block_valid=None):
    step = s["step"] + 1.0
    clr = hp["lr"] / (1.0 + (step - 1.0) * hp["lr_decay"])
    new_p, new_acc = scatter_adagrad(
        g_rows, uids, valid, p, s["sum"], clr, hp["weight_decay"], hp["eps"],
        block_ids=block_ids, slot_src=slot_src, block_valid=block_valid,
    )
    return new_p, {"sum": new_acc, "step": step}


def _sparse_sgd_rows(g_rows, uids, valid, p, s, hp, block_ids=None,
                     slot_src=None, block_valid=None):
    vm = valid[:, None].astype(jnp.float32)
    p_rows = p[uids]
    g = (g_rows.astype(jnp.float32) + hp["weight_decay"] * p_rows) * vm
    new_p = p.at[uids].add(-hp["lr"] * g)
    return new_p, {"momentum": s["momentum"], "step": s["step"] + 1.0}


_SPARSE_RULES = {"Adagrad": _sparse_adagrad_rows, "SGD": _sparse_sgd_rows}


def _batch_buffers(variables, batch) -> Dict[str, Any]:
    """Model buffers for a sparse batch: batch-local token matrices replace
    the device-resident buffers, and gather-sum backward plans (if the
    builder emitted them) ride along as ``{kind}_token_grad_plan``."""
    buffers = dict(variables["buffers"])
    for bk in ("entity_token_ids", "relation_token_ids"):
        key = f"sparse/buffers/{bk}"
        if key in batch:
            buffers[bk] = batch[key]
    for kind in ("entity", "relation", "cand"):
        pk = f"sparse/plan/{kind}_token/pos"
        if pk in batch:
            buffers[f"{kind}_token_grad_plan"] = {
                "pos": batch[pk],
                "valid": batch[f"sparse/plan/{kind}_token/valid"],
                "uid": batch[f"sparse/plan/{kind}_token/uid"],
            }
    return buffers


# ------------------------------------------------------------------- step


def _resolve_sparse_tables(model, regimes, params_example, entity_sparse) -> Dict[str, int]:
    """{table name -> regime label} for the sparse-eligible tables, with the
    torch-parity optimizer restrictions enforced."""
    names = sparse_table_names(model.embedder, entity_sparse)
    labels = assign_regimes(params_example, regimes.matches, regimes.frozen_patterns)
    opt_names = regimes.opt_names()
    # frozen sparse tables (label -1) stay on the dense side: no update runs
    table_label = {t: labels[t] for t in names if t in params_example and labels[t] >= 0}
    for t, lbl in table_label.items():
        name = opt_names[lbl]
        if name not in _SPARSE_RULES:
            raise ValueError(
                f"sparse updates for table {t!r} need one of "
                f"{SPARSE_CAPABLE_OPTIMIZERS}, got {name} (torch has the same "
                "restriction for sparse gradients)"
            )
        if name == "SGD":
            merged: Dict = {}
            for ph in regimes.regimes[lbl]:
                merged.update(ph)
            if float(merged.get("momentum", 0.0)) != 0.0:
                raise ValueError("sparse SGD requires momentum == 0")
    return table_label


def make_sparse_train_step(
    model: KGEModel,
    regimes: OptimizerRegimes,
    params_example,
    entity_sparse: bool,
    loss_type: str = "bce",
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Sparse analog of step.make_train_step; batches must come from a
    :class:`SparsePlanBuilder` built with the same ``entity_sparse``."""
    table_label = _resolve_sparse_tables(model, regimes, params_example, entity_sparse)
    opt_names = regimes.opt_names()

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, hparams, batch, rng):
        params, state = variables["params"], variables["state"]
        buffers = _batch_buffers(variables, batch)
        # which tables actually carry a sparse plan is decided per batch by
        # the SparsePlanBuilder (small tables fall back to dense updates);
        # resolved here at trace time from the batch's key set
        sparse_tables = tuple(
            t for t in table_label if f"sparse/{t}/uids" in batch
        )
        dense_apply = regimes.make_apply(
            {k: v for k, v in params.items() if k not in sparse_tables}, grad_clip=None
        )
        uids = {t: batch[f"sparse/{t}/uids"] for t in sparse_tables}
        valid = {t: batch[f"sparse/{t}/valid"] for t in sparse_tables}
        rows = {t: params[t][uids[t]] for t in sparse_tables}
        dense = {k: v for k, v in params.items() if k not in sparse_tables}

        def loss_fn(rows, dense):
            v = {"params": {**dense, **rows}, "state": state, "buffers": buffers}
            loss_sum, norm_metric, new_state, reg = prefix_loss(
                model, v, batch, loss_type, label_smoothing, rng
            )
            backward = (loss_sum + reg) / batch["normalizer_loss"]
            return backward, (new_state, loss_sum, norm_metric)

        (g_rows, g_dense), (new_state, loss_sum, norm_metric) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, dense)

        if grad_clip is not None and grad_clip > 0:
            leaves = jax.tree_util.tree_leaves(g_dense) + jax.tree_util.tree_leaves(g_rows)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            g_dense = jax.tree_util.tree_map(lambda g: g * scale, g_dense)
            g_rows = jax.tree_util.tree_map(lambda g: g * scale, g_rows)

        dense_opt = {k: v for k, v in opt_state.items() if k not in sparse_tables}
        new_dense, new_dense_opt = dense_apply(g_dense, dense_opt, dense, hparams)
        new_params = dict(new_dense)
        new_opt = dict(new_dense_opt)
        for t in sparse_tables:
            hp = hparams[table_label[t]]
            rule = _SPARSE_RULES[opt_names[table_label[t]]]
            new_params[t], new_opt[t] = rule(
                g_rows[t], uids[t], valid[t], params[t], opt_state[t], hp,
                block_ids=batch.get(f"sparse/{t}/block_ids"),
                slot_src=batch.get(f"sparse/{t}/slot_src"),
                block_valid=batch.get(f"sparse/{t}/bvalid"),
            )
        new_variables = {
            "params": new_params,
            "state": new_state,
            "buffers": variables["buffers"],
        }
        stats = {"loss_sum": loss_sum, "normalizer_metric": norm_metric}
        return new_variables, new_opt, stats

    return step


def make_sparse_accum_steps(
    model: KGEModel,
    regimes: OptimizerRegimes,
    params_example,
    entity_sparse: bool,
    loss_type: str = "bce",
    label_smoothing: float = 0.0,
    grad_clip: Optional[float] = None,
):
    """Gradient accumulation composed with row-sparse updates.

    The reference composes these naturally: torch sparse grads accumulate
    across ``backward`` calls and coalesce at ``optimizer.step``
    (reference: openkge/trainer.py:229-246, model.py:390-391).  Here the
    window's micro-batches share one UNION row space
    (:meth:`SparsePlanBuilder.plan_window`): ``grad_step`` adds each
    micro-batch's compact [U, d] row gradients into a window accumulator,
    and ``apply_step`` runs the scatter-update rules once on the summed
    rows — HBM traffic stays O(U_union * d) per window instead of O(V * d).

    Returns ``(zero_acc, grad_step, apply_step)``:

    * ``zero_acc(arrays)`` — fresh accumulator ``{"rows", "dense"}`` shaped
      from a window micro-batch's plan,
    * ``grad_step(variables, acc, arrays, rng) -> (variables, acc, stats)``,
    * ``apply_step(variables, opt_state, acc, arrays, hparams)`` — ``arrays``
      is any micro-batch of the SAME window (they share the plan).
    """
    table_label = _resolve_sparse_tables(model, regimes, params_example, entity_sparse)
    opt_names = regimes.opt_names()

    def _window_tables(arrays) -> Tuple[str, ...]:
        return tuple(t for t in table_label if f"sparse/{t}/uids" in arrays)

    def zero_acc(arrays):
        sparse_tables = _window_tables(arrays)
        rows = {
            t: jnp.zeros(
                (np.shape(arrays[f"sparse/{t}/uids"])[0], params_example[t].shape[1]),
                jnp.float32,
            )
            for t in sparse_tables
        }
        dense = {
            k: jax.tree_util.tree_map(jnp.zeros_like, v)
            for k, v in params_example.items()
            if k not in sparse_tables
        }
        return {"rows": rows, "dense": dense}

    @partial(jax.jit, donate_argnums=(0, 1))
    def grad_step(variables, acc, batch, rng):
        params, state = variables["params"], variables["state"]
        buffers = _batch_buffers(variables, batch)
        sparse_tables = _window_tables(batch)
        uids = {t: batch[f"sparse/{t}/uids"] for t in sparse_tables}
        rows = {t: params[t][uids[t]] for t in sparse_tables}
        dense = {k: v for k, v in params.items() if k not in sparse_tables}

        def loss_fn(rows, dense):
            v = {"params": {**dense, **rows}, "state": state, "buffers": buffers}
            loss_sum, norm_metric, new_state, reg = prefix_loss(
                model, v, batch, loss_type, label_smoothing, rng
            )
            backward = (loss_sum + reg) / batch["normalizer_loss"]
            return backward, (new_state, loss_sum, norm_metric)

        (g_rows, g_dense), (new_state, loss_sum, norm_metric) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rows, dense)
        acc = {
            "rows": {
                t: acc["rows"][t] + g_rows[t].astype(jnp.float32) for t in sparse_tables
            },
            "dense": jax.tree_util.tree_map(jnp.add, acc["dense"], g_dense),
        }
        new_variables = {"params": params, "state": new_state, "buffers": variables["buffers"]}
        stats = {"loss_sum": loss_sum, "normalizer_metric": norm_metric}
        return new_variables, acc, stats

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_step(variables, opt_state, acc, batch, hparams):
        params = variables["params"]
        sparse_tables = _window_tables(batch)
        g_rows = acc["rows"]
        g_dense = acc["dense"]
        if grad_clip is not None and grad_clip > 0:
            # clip the SUMMED window gradient, matching the dense
            # accumulation path (step.make_accum_steps applies the regime's
            # clip at apply time)
            leaves = jax.tree_util.tree_leaves(g_dense) + jax.tree_util.tree_leaves(g_rows)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            g_dense = jax.tree_util.tree_map(lambda g: g * scale, g_dense)
            g_rows = {t: g * scale for t, g in g_rows.items()}
        dense_apply = regimes.make_apply(
            {k: v for k, v in params.items() if k not in sparse_tables}, grad_clip=None
        )
        dense = {k: v for k, v in params.items() if k not in sparse_tables}
        dense_opt = {k: v for k, v in opt_state.items() if k not in sparse_tables}
        new_dense, new_dense_opt = dense_apply(g_dense, dense_opt, dense, hparams)
        new_params = dict(new_dense)
        new_opt = dict(new_dense_opt)
        for t in sparse_tables:
            hp = hparams[table_label[t]]
            rule = _SPARSE_RULES[opt_names[table_label[t]]]
            new_params[t], new_opt[t] = rule(
                g_rows[t],
                batch[f"sparse/{t}/uids"],
                batch[f"sparse/{t}/valid"],
                params[t],
                opt_state[t],
                hp,
                block_ids=batch.get(f"sparse/{t}/block_ids"),
                slot_src=batch.get(f"sparse/{t}/slot_src"),
                block_valid=batch.get(f"sparse/{t}/bvalid"),
            )
        return {**variables, "params": new_params}, new_opt

    return zero_acc, grad_step, apply_step
