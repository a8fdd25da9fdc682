"""Top-k link-prediction inference.

The reference has no serving path — "inference" is rerunning the evaluator
(reference: README.md:96-107, scripts/train.py:153-220).  This module adds
one: a :class:`Predictor` that precomputes the candidate-embedding cache
once and answers ``(s, r, ?)`` / ``(?, r, o)`` queries with the top-k
entities in a single jitted gather+matmul, optionally translating ids
through the on-disk vocabulary maps.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data.dataset import DatasetMeta, _read_id_map
from open_knowledge_graph_embeddings_tpu.models.embedders import TokenEmbedderBase
from open_knowledge_graph_embeddings_tpu.models.model import KGEModel
from open_knowledge_graph_embeddings_tpu.ops.scoring import score_against_candidates

logger = logging.getLogger(__name__)


class Predictor:
    def __init__(self, model: KGEModel, variables, dataset_dir: Optional[str] = None):
        self.model = model
        self.variables = variables
        self.meta: DatasetMeta = model.meta
        self.offset = self.meta.min_entities_size
        # candidate cache: token models materialize from tokens; lookup
        # models read the table through the eval-mode encode pipeline
        if isinstance(model.embedder, TokenEmbedderBase):
            cache = model.encode_all_entities(variables)
        else:
            cache, _, _ = model.encode_candidates(variables, None, train=False)
            pad = jnp.zeros((self.offset, cache.shape[1]), cache.dtype)
            cache = jnp.concatenate([pad, cache], axis=0)
        self.cand_emb = cache[self.offset :]

        self.entity_names: Dict[int, str] = {}
        self.relation_names: Dict[int, str] = {}
        if dataset_dir:
            import os

            e_map, _, _ = _read_id_map(os.path.join(dataset_dir, "entity_id_map.txt"))
            r_map, _, _ = _read_id_map(os.path.join(dataset_dir, "relation_id_map.txt"))
            self.entity_names = {v: k for k, v in e_map.items()}
            self.relation_names = {v: k for k, v in r_map.items()}
            self._entity_ids = e_map
            self._relation_ids = r_map

        @jax.jit
        def _topk(variables, cand_emb, ent_ids, rel_ids, is_sp, k_arr):
            q, _, _ = self.model.queries(variables, ent_ids, rel_ids, is_sp, train=False)
            if cand_emb.shape[0] > 100_000:
                # full-vocab scoring via the chunk-scan top-k — the dense
                # [B, N] formulation is the same pattern the chunked eval
                # rewrite measured 3-8x off roofline at 2.47M candidates
                from open_knowledge_graph_embeddings_tpu.train.evaluate import (
                    filtered_topk_chunked,
                )

                none = jnp.full((1,), -1, jnp.int32)  # no filtering at predict time
                return filtered_topk_chunked(
                    q, cand_emb, none, none, None, k_arr.shape[0]
                )
            scores = score_against_candidates(q, cand_emb)
            return jax.lax.top_k(scores, k_arr.shape[0])

        self._topk = _topk

    # ------------------------------------------------------------------ api

    def predict(
        self,
        subj: Optional[Sequence[int]] = None,
        rel: Sequence[int] = (),
        obj: Optional[Sequence[int]] = None,
        k: int = 10,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched completion.  Provide ``subj`` for (s, r, ?) queries or
        ``obj`` for (?, r, o); returns (scores [B, k], entity_ids [B, k])."""
        assert (subj is None) != (obj is None), "provide exactly one of subj/obj"
        ent = np.asarray(subj if subj is not None else obj, dtype=np.int32)
        rel = np.asarray(rel, dtype=np.int32)
        is_sp = np.full(ent.shape, subj is not None, dtype=bool)
        scores, idx = self._topk(
            self.variables, self.cand_emb, jnp.asarray(ent), jnp.asarray(rel),
            jnp.asarray(is_sp), jnp.zeros(k),
        )
        return np.asarray(scores), np.asarray(idx) + self.offset

    def predict_text(self, subj: Optional[str], rel: str, obj: Optional[str], k: int = 10):
        """Text-level completion through the vocabulary maps."""
        assert self.entity_names, "Predictor needs dataset_dir for text queries"
        rid = self._relation_ids.get(rel)
        if rid is None:
            raise KeyError(f"unknown relation {rel!r}")
        ent_text = subj if subj is not None else obj
        eid = self._entity_ids.get(ent_text)
        if eid is None:
            raise KeyError(f"unknown entity {ent_text!r}")
        scores, ids = self.predict(
            subj=[eid] if subj is not None else None,
            rel=[rid],
            obj=[eid] if obj is not None else None,
            k=k,
        )
        return [
            (self.entity_names.get(int(i), str(int(i))), float(s))
            for s, i in zip(scores[0], ids[0])
        ]
