"""Unified 1-vs-N scoring: one [B, d] x [d, N] MXU matmul for a mixed sp/po batch.

The reference scores the two prefix directions separately, each as four
chunked matmuls for ComplEx with a 16k candidate chunk size
(reference: openkge/model.py:198-229).  The TPU-native formulation folds the
direction into the *query*:

* ComplEx:  q_sp = s ⊛ r            (complex Hadamard product)
            q_po = o ⊛ conj(r)
* DistMult: q    = e ⊙ r             (direction-symmetric)
* RESCAL:   q_sp = sᵀR,  q_po = R o  (batched vector-matrix products)

after which *every* row of the batch — sp and po alike — scores against the
shared candidate matrix in a single ``q @ Cᵀ`` contraction that XLA tiles
onto the MXU.  No candidate chunking: the N axis is either resident (small
vocabularies) or sharded over the device mesh (OLPBench-scale vocabularies).

Triple scoring (one candidate per row) is the SDDMM special case
``sum(q_sp * o, -1)`` and reuses the same query computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def score_against_candidates(q: jax.Array, cand: jax.Array) -> jax.Array:
    """``[B, d] x [N, d] -> [B, N]`` candidate scores (fp32 accumulation)."""
    return jax.lax.dot_general(
        q,
        cand,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def triple_scores(q: jax.Array, o: jax.Array) -> jax.Array:
    """Per-row scores ``sum(q * o, -1)`` -> [B]."""
    return jnp.sum(q * o, axis=-1)


def complex_query(e: jax.Array, r: jax.Array, is_sp: jax.Array) -> jax.Array:
    """ComplEx query vectors for a mixed batch.

    ``e`` is the prefix entity (subject for sp rows, object for po rows),
    ``is_sp`` [B] bool selects the direction.  Matches the reference's 4-term
    real decomposition (reference: openkge/model.py:205-216): for sp the
    candidate-side coefficients are (s1r1 - s2r2, s2r1 + s1r2) = s ⊛ r; for
    po they are (o1r1 + o2r2, o2r1 - o1r2) = o ⊛ conj(r).  The only
    direction-dependent term is the sign of the imaginary relation half, so
    the select is a cheap VPU op and the matmul is shared.
    """
    e1, e2 = jnp.split(e, 2, axis=-1)
    r1, r2 = jnp.split(r, 2, axis=-1)
    sign = jnp.where(is_sp, 1.0, -1.0)[:, None].astype(r2.dtype)
    r2s = r2 * sign
    return jnp.concatenate([e1 * r1 - e2 * r2s, e2 * r1 + e1 * r2s], axis=-1)


def distmult_query(e: jax.Array, r: jax.Array, is_sp: jax.Array) -> jax.Array:
    """DistMult is direction-symmetric: q = e ⊙ r (reference: openkge/model.py:268-272)."""
    del is_sp
    return e * r


def rescal_query(e: jax.Array, r_mat: jax.Array, is_sp: jax.Array) -> jax.Array:
    """RESCAL/Tucker3 query: q_sp[j] = sum_i s_i R_ij ; q_po[i] = sum_j R_ij o_j.

    ``r_mat`` is [B, d, d] (relation embedding projected to d^2 and reshaped,
    reference: openkge/model.py:160-164).  Both directions are computed as one
    batched mat-vec each and selected per row; for d<=512 the bmm FLOPs are
    negligible next to the candidate matmul.
    """
    q_sp = jnp.einsum("bi,bij->bj", e, r_mat, preferred_element_type=jnp.float32)
    q_po = jnp.einsum("bij,bj->bi", r_mat, e, preferred_element_type=jnp.float32)
    return jnp.where(is_sp[:, None], q_sp, q_po).astype(e.dtype)


def bias_relation_query(e: jax.Array, r: jax.Array, is_sp: jax.Array) -> jax.Array:
    """Relation-frequency diagnostic: score depends only on the relation
    (reference: openkge/model.py:304-310)."""
    del e, is_sp
    return r


def bias_entity_query(e: jax.Array, r: jax.Array, is_sp: jax.Array) -> jax.Array:
    """Entity-similarity diagnostic: score = e · candidate
    (reference: openkge/model.py:340-346)."""
    del r, is_sp
    return e
