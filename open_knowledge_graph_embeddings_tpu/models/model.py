"""Scorer x embedder combination and the model registry.

The reference combines scorers and embedders by multiple inheritance into
named classes (reference: openkge/model.py:1001-1066).  Here a
:class:`KGEModel` is a plain composition: an :class:`Embedder` producing
entity/relation representations and a scorer *query function* that folds the
prefix direction into a per-row query vector, after which sp and po rows of
a batch share a single candidate matmul (see ops/scoring.py).

State threading order inside a step matches the reference's encode order
(candidates first, then prefix entities, then relations;
reference: openkge/trainer.py:75-88) so batch-norm statistics evolve
equivalently.  One deliberate deviation: the reference runs po-slot and
sp-slot rows through the encoders as two separate sub-batches, so its BN
batch statistics are per-direction; here the mixed batch is encoded jointly
(one gather, one BN) — statistically equivalent and one kernel instead of
two.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from open_knowledge_graph_embeddings_tpu.data.dataset import DatasetMeta
from open_knowledge_graph_embeddings_tpu.models.embedders import (
    BigramPoolingEmbedder,
    Embedder,
    LookupEmbedder,
    LSTMEmbedder,
    UnigramPoolingEmbedder,
    Variables,
)
from open_knowledge_graph_embeddings_tpu.ops import scoring

QUERY_FNS: Dict[str, Callable] = {
    "complex": scoring.complex_query,
    "distmult": scoring.distmult_query,
    "rescal": scoring.rescal_query,
    "bias_relation": scoring.bias_relation_query,
    "bias_entity": scoring.bias_entity_query,
}

#: scorers whose triple_score is defined (bias diagnostics raise, as in the
#: reference, openkge/model.py:311-312, 347-348)
TRIPLE_CAPABLE = {"complex", "distmult", "rescal"}


@dataclass
class KGEModel:
    scorer: str
    embedder: Embedder

    def __post_init__(self):
        assert self.scorer in QUERY_FNS, f"unknown scorer {self.scorer}"
        if self.scorer == "complex":
            assert self.embedder.entity_dim % 2 == 0, "ComplEx needs an even embedding size"
        if self.scorer in ("complex", "distmult"):
            # fail at construction, not mid-trace: the reference ships a
            # unigram config pairing entity 64 with relation 512 and no
            # projection (config/fb15k237/fb15k237-complex-unigrampool.yaml)
            # which cannot score — its own encode path also raises
            # (openkge/model.py:789,792 latent AttributeError), so the
            # pairing was never runnable upstream either
            assert self.embedder.relation_dim == self.embedder.entity_dim, (
                f"{self.scorer} scoring is elementwise over the embedding dim: "
                f"relation_slot_size ({self.embedder.relation_dim}) must equal "
                f"entity_slot_size ({self.embedder.entity_dim})"
            )
        if self.scorer == "rescal":
            assert self.embedder.relation_dim == self.embedder.entity_dim ** 2, (
                "RESCAL/Tucker3 needs relation_dim == entity_dim^2 "
                "(set project_relation=True on the embedder)"
            )

    @property
    def meta(self) -> DatasetMeta:
        return self.embedder.meta

    def init(self, rng: jax.Array) -> Variables:
        return self.embedder.init(rng)

    def set_dp_candidate_sharding(self, mesh) -> None:
        """Shard the candidate ENCODE over the data axis on pure-DP meshes.

        With ``model_parallel == 1`` nothing else shards the batch-shared
        candidate set, so every data shard redundantly encodes all N
        candidates and the per-host step floors instead of strong-scaling
        (RESULTS.md "Replicated-collate headroom").  When a mesh is set
        here, ``prefix_queries_and_candidates`` encodes candidates in a
        separately-constrained region: candidate ids sharded over ``data``
        (each shard encodes N/D rows), result all-gathered to the
        replicated [N, d] matrix the per-shard score blocks need (~N*d*2
        bytes over ICI — cheap next to the encode FLOPs saved).  ``None``
        disables (single device / model-parallel meshes, where the
        candidate axis shards over ``model`` instead)."""
        self._dp_cand_mesh = mesh

    def set_mesh(self, mesh) -> None:
        """Register the device mesh for mesh-aware encode regions.

        Sequence embedders (LSTM) run their row-encode core inside
        ``shard_map`` regions when a mesh is set: the in-jit global length
        sort and the Pallas recurrence kernels do not partition under
        GSPMD (the sort is a global permutation; custom calls replicate),
        so without regions every device encodes the FULL row set — per-
        shard HLO evidence in ``tools/scaling_model.py --hlo-sweep``.  With
        a mesh set, candidate rows shard over the ``model`` axis (or
        ``data`` on pure-DP meshes, composing with
        :meth:`set_dp_candidate_sharding`) and query/relation rows over
        ``data``; the single-pass candidate+query pair fusion is skipped —
        the two row sets live on different mesh axes."""
        self._mesh = mesh

    # ------------------------------------------------------------------ fwd

    def _relation_for_query(self, r: jax.Array) -> jax.Array:
        if self.scorer == "rescal":
            d = self.embedder.entity_dim
            return r.reshape(-1, d, d)
        return r

    def queries(
        self,
        variables: Variables,
        ent_ids: jax.Array,
        rel_ids: jax.Array,
        is_sp: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        ent_inv: Optional[jax.Array] = None,
        rel_inv: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        """Per-row query vectors for a mixed sp/po prefix batch.

        ``ent_inv``/``rel_inv`` (query dedup, train/sparse.py
        SparsePlanBuilder dedup_queries): when given, ``ent_ids``/``rel_ids``
        hold UNIQUE ids and the inverse arrays gather the encoded rows back
        to per-row — the expensive token composition runs once per unique
        mention while BN/dropout/scoring see the per-row batch unchanged."""
        r_ent = r_rel = None
        if rng is not None:
            r_ent, r_rel = jax.random.split(rng)
        e, state, reg_e = self.embedder.encode_entity(
            variables, ent_ids, is_sp=is_sp, train=train, rng=r_ent,
            **({"inv": ent_inv} if ent_inv is not None else {}),
        )
        variables = {**variables, "state": state}
        r, state, reg_r = self.embedder.encode_relation(
            variables, rel_ids, train=train, rng=r_rel,
            **({"inv": rel_inv} if rel_inv is not None else {}),
        )
        q = QUERY_FNS[self.scorer](e, self._relation_for_query(r), is_sp)
        return q, state, reg_e + reg_r

    def encode_candidates(
        self,
        variables: Variables,
        cand_ids: Optional[jax.Array],
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        """Encode the candidate label space.

        ``cand_ids None`` means the full entity vocabulary minus specials
        (ids >= meta.min_entities_size).  Candidates always use the object
        encoding, mirroring the reference's precompute_batch_shared_inputs
        == encode_obj convention (openkge/model.py:76-77).
        """
        if cand_ids is None:
            if hasattr(self.embedder, "encode_entity_range"):
                return self.embedder.encode_entity_range(
                    variables, self.meta.min_entities_size, self.meta.entities_size,
                    train=train, rng=rng,
                )
            cand_ids = jnp.arange(self.meta.min_entities_size, self.meta.entities_size)
        return self.embedder.encode_entity(variables, cand_ids, is_sp=None, train=train, rng=rng)

    def prefix_scores(
        self,
        variables: Variables,
        ent_ids: jax.Array,
        rel_ids: jax.Array,
        is_sp: jax.Array,
        cand_ids: Optional[jax.Array] = None,
        cand_emb: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        ent_inv: Optional[jax.Array] = None,
        rel_inv: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        """[B, N] scores; encodes candidates unless ``cand_emb`` is given."""
        q, cand_emb, state, reg = self.prefix_queries_and_candidates(
            variables, ent_ids, rel_ids, is_sp, cand_ids, cand_emb,
            train=train, rng=rng, ent_inv=ent_inv, rel_inv=rel_inv,
        )
        scores = scoring.score_against_candidates(q, cand_emb)
        return scores, state, reg

    def prefix_queries_and_candidates(
        self,
        variables: Variables,
        ent_ids: jax.Array,
        rel_ids: jax.Array,
        is_sp: jax.Array,
        cand_ids: Optional[jax.Array] = None,
        cand_emb: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        ent_inv: Optional[jax.Array] = None,
        rel_inv: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, Dict, jax.Array]:
        """Encode stage of :meth:`prefix_scores`: returns
        ``(q [B, d], cand_emb [N, d], state, reg)`` without the score matmul,
        so the train step can fuse scoring into the loss VJP
        (train/loss.py bce_over_scores)."""
        reg = jnp.zeros((), jnp.float32)
        r_cand = r_q = None
        if rng is not None:
            r_cand, r_q = jax.random.split(rng)
        dp_mesh = getattr(self, "_dp_cand_mesh", None)
        mesh = getattr(self, "_mesh", None) or dp_mesh
        if mesh is not None and cand_emb is None and cand_ids is not None:
            # mesh-mode split encodes (see set_mesh / set_dp_candidate_sharding):
            # skip the single-chip pair fusion so each encode is its own
            # region — candidate ids pinned over their axis (`model`, or
            # `data` on pure-DP meshes, where the [N, d] result is then
            # pinned replicated and XLA inserts the all-gather); sequence
            # embedders additionally run each region's row core inside
            # shard_map (embedders._lstm_states) so the length sort and the
            # recurrence kernels stay per-shard.  rng streams are identical
            # to the pair path by construction
            # (embedders.encode_entity_pair docstring).
            from jax.sharding import NamedSharding, PartitionSpec

            from open_knowledge_graph_embeddings_tpu.parallel.mesh import (
                DATA_AXIS,
                MODEL_AXIS,
            )

            cand_axis = (
                MODEL_AXIS if dict(mesh.shape).get(MODEL_AXIS, 1) > 1 else DATA_AXIS
            )
            wsc = jax.lax.with_sharding_constraint
            set_ctx = getattr(self.embedder, "set_row_shard_ctx", None)
            cand_sharded = wsc(
                cand_ids, NamedSharding(mesh, PartitionSpec(cand_axis))
            )
            if set_ctx:
                set_ctx(mesh, cand_axis, plan_key="cand_token_grad_plan")
            try:
                cand_emb, state, reg_c = self.encode_candidates(
                    variables, cand_sharded, train=train, rng=r_cand
                )
            finally:
                if set_ctx:
                    set_ctx(None, None)
            if cand_axis == DATA_AXIS:
                cand_emb = wsc(cand_emb, NamedSharding(mesh, PartitionSpec()))
            variables = {**variables, "state": state}
            if set_ctx:
                set_ctx(mesh, DATA_AXIS)
            try:
                q, state, reg_q = self.queries(
                    variables, ent_ids, rel_ids, is_sp, train=train, rng=r_q,
                    ent_inv=ent_inv, rel_inv=rel_inv,
                )
            finally:
                if set_ctx:
                    set_ctx(None, None)
            return q, cand_emb, state, reg + reg_c + reg_q
        if (
            cand_emb is None
            and cand_ids is not None
            and hasattr(self.embedder, "encode_entity_pair")
        ):
            # fuse the candidate and query-entity encodes into one LSTM pass
            # (numerics unchanged: BN/dropout still run per group — see
            # embedders.encode_entity_pair)
            r_ent = r_rel = None
            if r_q is not None:
                r_ent, r_rel = jax.random.split(r_q)
            cand_emb, e, state, reg_c = self.embedder.encode_entity_pair(
                variables, cand_ids, ent_ids, train=train, rng_a=r_cand, rng_b=r_ent,
                **({"inv_b": ent_inv} if ent_inv is not None else {}),
            )
            variables = {**variables, "state": state}
            r, state, reg_r = self.embedder.encode_relation(
                variables, rel_ids, train=train, rng=r_rel,
                **({"inv": rel_inv} if rel_inv is not None else {}),
            )
            q = QUERY_FNS[self.scorer](e, self._relation_for_query(r), is_sp)
            return q, cand_emb, state, reg + reg_c + reg_r
        if cand_emb is None:
            cand_emb, state, reg_c = self.encode_candidates(
                variables, cand_ids, train=train, rng=r_cand
            )
            variables = {**variables, "state": state}
            reg = reg + reg_c
        q, state, reg_q = self.queries(
            variables, ent_ids, rel_ids, is_sp, train=train, rng=r_q,
            ent_inv=ent_inv, rel_inv=rel_inv,
        )
        return q, cand_emb, state, reg + reg_q

    def triple_score(
        self,
        variables: Variables,
        s_ids: jax.Array,
        r_ids: jax.Array,
        o_ids: jax.Array,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, jax.Array]:
        """Scores of explicit (s, r, o) triples — the SDDMM special case."""
        if self.scorer not in TRIPLE_CAPABLE:
            raise NotImplementedError(
                f"triple_score undefined for diagnostic scorer {self.scorer} "
                "(matches reference behaviour)"
            )
        r_s = r_r = r_o = None
        if rng is not None:
            r_s, r_r, r_o = jax.random.split(rng, 3)
        is_sp = jnp.ones(s_ids.shape[0], dtype=bool)
        s, state, reg_s = self.embedder.encode_entity(
            variables, s_ids, is_sp=is_sp, train=train, rng=r_s
        )
        variables = {**variables, "state": state}
        r, state, reg_r = self.embedder.encode_relation(variables, r_ids, train=train, rng=r_r)
        variables = {**variables, "state": state}
        o, state, reg_o = self.embedder.encode_entity(
            variables, o_ids, is_sp=None, train=train, rng=r_o
        )
        q = QUERY_FNS[self.scorer](s, self._relation_for_query(r), is_sp)
        return scoring.triple_scores(q, o), state, reg_s + reg_r + reg_o

    # ---------------------------------------------------------- precompute

    def encode_all_entities(
        self, variables: Variables, chunk_size: int = 32768, mesh=None
    ) -> jax.Array:
        """Materialize candidate embeddings for every entity id (eval-time
        cache for token-composition embedders; reference:
        openkge/model.py:670-712).

        One jitted program: a sequential `lax.map` over id chunks, so the
        2.5M-mention OLPBench vocabulary encodes in a single device dispatch
        with bounded per-chunk activation memory.  The cache is kept in the
        embedder's compute dtype (bf16 halves its HBM footprint).  With a
        ``mesh`` the [E, d] cache is row-sharded over the model axis — never
        replicated per chip (the whole point of the candidate-axis sharding,
        parallel/sharding.py).

        Keep ``chunk_size`` large: remote-TPU compile time grows with the
        number of map iterations (measured 390s at 37 chunks vs 14s at 5
        chunks for the same workload), while execution is sub-second either
        way.  32768 bounds per-chunk activations to ~1.4GB at d=512."""
        # key on mesh *identity data*, not id(mesh): id() of a dead mesh can
        # be reused by a new object, silently serving a stale-mesh program
        mesh_key = None
        if mesh is not None:
            mesh_key = (
                tuple(mesh.shape.items()),
                tuple(d.id for d in mesh.devices.flat),
            )
        cache_key = ("enc_all", chunk_size, mesh_key)
        cached = self.__dict__.setdefault("_jit_cache", {}).get(cache_key)
        if cached is not None:
            return cached(variables)
        E = self.meta.entities_size
        n_chunks = -(-E // chunk_size)
        E_pad = n_chunks * chunk_size

        def enc_all(variables):
            ids = jnp.arange(E_pad, dtype=jnp.int32).clip(0, E - 1)
            ids = ids.reshape(n_chunks, chunk_size)

            def enc(chunk_ids):
                emb, _, _ = self.embedder.encode_entity(
                    variables, chunk_ids, is_sp=None, train=False
                )
                return emb

            # per-shard encode regions on meshes: without the shard_map ctx
            # the per-chunk encode REPLICATES on every device (global length
            # sort / custom-call — see set_mesh); with it each model shard
            # encodes chunk_size / M rows
            set_ctx = getattr(self.embedder, "set_row_shard_ctx", None)
            if mesh is not None and set_ctx is not None:
                from open_knowledge_graph_embeddings_tpu.parallel.mesh import (
                    MODEL_AXIS as _MA,
                )

                set_ctx(mesh, _MA)
            try:
                out = jax.lax.map(enc, ids)
            finally:
                if mesh is not None and set_ctx is not None:
                    set_ctx(None, None)
            return out.reshape(E_pad, -1)[:E]

        if mesh is None:
            jitted = jax.jit(enc_all)
        else:
            from jax.sharding import NamedSharding, PartitionSpec
            from open_knowledge_graph_embeddings_tpu.parallel.mesh import MODEL_AXIS

            jitted = jax.jit(
                enc_all, out_shardings=NamedSharding(mesh, PartitionSpec(MODEL_AXIS))
            )
        self._jit_cache[cache_key] = jitted
        return jitted(variables)


# ----------------------------------------------------------------- registry


def _lookup(meta: DatasetMeta, scorer: str, project_relation: bool = False, **cfg) -> KGEModel:
    cfg.pop("project_relation", None)
    if not project_relation:
        # LookupSimpleRelationEmbedder forces relation_slot = entity_slot and
        # no projection (reference: openkge/model.py:545-558)
        cfg.pop("relation_slot_size", None)
    emb = LookupEmbedder(meta=meta, project_relation=project_relation, **cfg)
    return KGEModel(scorer, emb)


def _token(meta: DatasetMeta, scorer: str, family, project_relation: bool = False, **cfg) -> KGEModel:
    cfg.pop("project_relation", None)
    cfg.pop("input_dropout", None)  # token embedders have no input dropout stage
    emb = family(meta=meta, project_relation=project_relation, **cfg)
    return KGEModel(scorer, emb)


MODELS: Dict[str, Callable[..., KGEModel]] = {
    # lookup family (reference: openkge/model.py:1001-1014)
    "LookupComplexRelationModel": lambda meta, **cfg: _lookup(meta, "complex", **cfg),
    "LookupDistmultRelationModel": lambda meta, **cfg: _lookup(meta, "distmult", **cfg),
    "LookupTucker3RelationModel": lambda meta, **cfg: _lookup(
        meta, "rescal", project_relation=True, **cfg
    ),
    # token families (reference: openkge/model.py:1016-1049)
    "UnigramPoolingComplexRelationModel": lambda meta, **cfg: _token(
        meta, "complex", UnigramPoolingEmbedder, **cfg
    ),
    "BigramPoolingComplexRelationModel": lambda meta, **cfg: _token(
        meta, "complex", BigramPoolingEmbedder, **cfg
    ),
    "LSTMComplexRelationModel": lambda meta, **cfg: _token(meta, "complex", LSTMEmbedder, **cfg),
    "LSTMDistmultRelationModel": lambda meta, **cfg: _token(meta, "distmult", LSTMEmbedder, **cfg),
    "LSTMTucker3RelationModel": lambda meta, **cfg: _token(
        meta, "rescal", LSTMEmbedder, project_relation=True, **cfg
    ),
    # data-bias diagnostics (reference: openkge/model.py:1036-1044)
    "DataBiasOnlyEntityModel": lambda meta, **cfg: _token(meta, "bias_entity", LSTMEmbedder, **cfg),
    "DataBiasOnlyRelationModel": lambda meta, **cfg: _token(
        meta, "bias_relation", LSTMEmbedder, **cfg
    ),
}


def build_model(name: str, meta: DatasetMeta, **model_config) -> KGEModel:
    if name not in MODELS:
        raise KeyError(f"unknown model {name}; available: {sorted(MODELS)}")
    return MODELS[name](meta, **model_config)
