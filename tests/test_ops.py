"""Numerical parity of core ops against torch reference semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from open_knowledge_graph_embeddings_tpu.ops import scoring
from open_knowledge_graph_embeddings_tpu.ops.lstm import lstm_forward, lstm_last_state
from open_knowledge_graph_embeddings_tpu.ops.norm import apply_batchnorm, init_batchnorm


def _np(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestComplexQuery:
    def test_sp_matches_four_term_decomposition(self, rng):
        B, N, d = 5, 7, 8
        s, r, o = _np(rng, B, d), _np(rng, B, d), _np(rng, N, d)
        q = scoring.complex_query(jnp.asarray(s), jnp.asarray(r), jnp.ones(B, bool))
        got = scoring.score_against_candidates(q, jnp.asarray(o))
        # independent torch implementation of the ComplEx sp 4-term form
        st, rt, ot = map(torch.tensor, (s, r, o))
        s1, s2 = st.chunk(2, 1)
        r1, r2 = rt.chunk(2, 1)
        o1, o2 = ot.chunk(2, 1)
        want = (
            (s1 * r1).mm(o1.T) + (s2 * r1).mm(o2.T) + (s1 * r2).mm(o2.T) - (s2 * r2).mm(o1.T)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    def test_po_matches_four_term_decomposition(self, rng):
        B, N, d = 5, 7, 8
        o, r, s = _np(rng, B, d), _np(rng, B, d), _np(rng, N, d)
        q = scoring.complex_query(jnp.asarray(o), jnp.asarray(r), jnp.zeros(B, bool))
        got = scoring.score_against_candidates(q, jnp.asarray(s))
        ot, rt, st = map(torch.tensor, (o, r, s))
        o1, o2 = ot.chunk(2, 1)
        r1, r2 = rt.chunk(2, 1)
        s1, s2 = st.chunk(2, 1)
        want = (
            (o1 * r1).mm(s1.T) + (o2 * r1).mm(s2.T) + (o2 * r2).mm(s1.T) - (o1 * r2).mm(s2.T)
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    def test_triple_equals_hadamard_form(self, rng):
        B, d = 6, 8
        s, r, o = _np(rng, B, d), _np(rng, B, d), _np(rng, B, d)
        q = scoring.complex_query(jnp.asarray(s), jnp.asarray(r), jnp.ones(B, bool))
        got = scoring.triple_scores(q, jnp.asarray(o))
        # torch Hadamard-trick form (reference: openkge/model.py:231-238)
        st, rt, ot = map(torch.tensor, (s, r, o))
        r1, r2 = rt.chunk(2, 1)
        o1, o2 = ot.chunk(2, 1)
        subj_all = torch.cat((st, st), 1)
        rel_all = torch.cat((r1, rt, -r2), 1)
        obj_all = torch.cat((ot, o2, o1), 1)
        want = (subj_all * obj_all * rel_all).sum(1)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)

    def test_mixed_batch_direction_select(self, rng):
        B, d = 4, 8
        e, r = _np(rng, B, d), _np(rng, B, d)
        is_sp = jnp.asarray([True, False, True, False])
        q = scoring.complex_query(jnp.asarray(e), jnp.asarray(r), is_sp)
        q_sp = scoring.complex_query(jnp.asarray(e), jnp.asarray(r), jnp.ones(B, bool))
        q_po = scoring.complex_query(jnp.asarray(e), jnp.asarray(r), jnp.zeros(B, bool))
        np.testing.assert_allclose(q[0], q_sp[0])
        np.testing.assert_allclose(q[1], q_po[1])


class TestRescalQuery:
    def test_sp_po(self, rng):
        B, N, d = 3, 5, 4
        e = _np(rng, B, d)
        R = _np(rng, B, d, d)
        cand = _np(rng, N, d)
        q_sp = scoring.rescal_query(jnp.asarray(e), jnp.asarray(R), jnp.ones(B, bool))
        q_po = scoring.rescal_query(jnp.asarray(e), jnp.asarray(R), jnp.zeros(B, bool))
        got_sp = scoring.score_against_candidates(q_sp, jnp.asarray(cand))
        got_po = scoring.score_against_candidates(q_po, jnp.asarray(cand))
        et, Rt, ct = map(torch.tensor, (e, R, cand))
        want_sp = et.view(B, 1, d).bmm(Rt).view(B, d).mm(ct.T)
        want_po = Rt.bmm(et.view(B, d, 1)).view(B, d).mm(ct.T)
        np.testing.assert_allclose(np.asarray(got_sp), want_sp.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_po), want_po.numpy(), rtol=1e-4, atol=1e-4)


class TestDistmult:
    def test_prefix(self, rng):
        B, N, d = 4, 6, 8
        e, r, c = _np(rng, B, d), _np(rng, B, d), _np(rng, N, d)
        q = scoring.distmult_query(jnp.asarray(e), jnp.asarray(r), jnp.ones(B, bool))
        got = scoring.score_against_candidates(q, jnp.asarray(c))
        want = (torch.tensor(e) * torch.tensor(r)).mm(torch.tensor(c).T)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


class TestLSTM:
    def test_matches_torch_lstm(self, rng):
        B, L, D = 4, 7, 12
        x = _np(rng, B, L, D)
        t_lstm = torch.nn.LSTM(D, D, batch_first=True)
        params = {
            "w_ih": jnp.asarray(t_lstm.weight_ih_l0.detach().numpy()),
            "w_hh": jnp.asarray(t_lstm.weight_hh_l0.detach().numpy()),
            "b_ih": jnp.asarray(t_lstm.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(t_lstm.bias_hh_l0.detach().numpy()),
        }
        got = lstm_forward(params, jnp.asarray(x))
        with torch.no_grad():
            want, _ = t_lstm(torch.tensor(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    def test_last_state(self, rng):
        B, L, D = 3, 5, 6
        x = _np(rng, B, L, D)
        t_lstm = torch.nn.LSTM(D, D, batch_first=True)
        params = {
            "w_ih": jnp.asarray(t_lstm.weight_ih_l0.detach().numpy()),
            "w_hh": jnp.asarray(t_lstm.weight_hh_l0.detach().numpy()),
            "b_ih": jnp.asarray(t_lstm.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(t_lstm.bias_hh_l0.detach().numpy()),
        }
        lengths = jnp.asarray([5, 3, 1])
        got = lstm_last_state(params, jnp.asarray(x), lengths)
        with torch.no_grad():
            out, _ = t_lstm(torch.tensor(x))
        want = out[range(B), [4, 2, 0], :]
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("B,L", [(17, 10), (256, 10), (8, 3), (1, 10)])
    def test_length_sort_perm_matches_stable_argsort(self, rng, B, L):
        from open_knowledge_graph_embeddings_tpu.ops.lstm import length_sort_perm

        lengths = jnp.asarray(rng.integers(0, L + 1, size=B), jnp.int32)
        order, inv = jax.jit(length_sort_perm, static_argnums=1)(lengths, L)
        want = np.argsort(-np.asarray(lengths), kind="stable")
        np.testing.assert_array_equal(np.asarray(order), want)
        # inv really inverts: x == x[order][inv]
        x = np.asarray(rng.normal(size=(B, 4)), np.float32)
        np.testing.assert_array_equal(x[np.asarray(order)][np.asarray(inv)], x)


class TestBatchNorm:
    def test_train_and_eval_match_torch(self, rng):
        C = 6
        params, state = init_batchnorm(C)
        tbn = torch.nn.BatchNorm1d(C)
        for i in range(3):
            x = _np(rng, 8, C)
            got, state = apply_batchnorm(params, state, jnp.asarray(x), train=True)
            want = tbn(torch.tensor(x))
            np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6
        )
        tbn.eval()
        x = _np(rng, 8, C)
        got, _ = apply_batchnorm(params, state, jnp.asarray(x), train=False)
        with torch.no_grad():
            want = tbn(torch.tensor(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    def test_cumulative_momentum_none(self, rng):
        C = 4
        params, state = init_batchnorm(C)
        tbn = torch.nn.BatchNorm1d(C, momentum=None)
        for i in range(4):
            x = _np(rng, 10, C)
            got, state = apply_batchnorm(params, state, jnp.asarray(x), train=True, momentum=None)
            want = tbn(torch.tensor(x))
            np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6
        )


class TestUnigramPairEncode:
    def test_pair_matches_two_calls(self, rng):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        import tempfile
        from conftest import write_toy_dataset
        from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
        from open_knowledge_graph_embeddings_tpu.models import build_model

        d = tempfile.mkdtemp()
        write_toy_dataset(d)
        tds = OneToNMentionRelationDataset(
            dataset_dir=d, input_file="train.txt", is_training_data=True, batch_size=4
        )
        model = build_model(
            "UnigramPoolingComplexRelationModel", tds.meta, entity_slot_size=16,
            dropout=0.3, normalize="batchnorm",
        )
        variables = model.init(jax.random.key(0))
        ids_a = jnp.asarray(np.array([2, 3, 4, 5], np.int32))
        ids_b = jnp.asarray(np.array([6, 7, 8], np.int32))
        ra, rb = jax.random.split(jax.random.key(9))
        xa0, st0, _ = model.embedder.encode_entity(variables, ids_a, train=True, rng=ra)
        xb0, st1, _ = model.embedder.encode_entity(
            {**variables, "state": st0}, ids_b, train=True, rng=rb
        )
        xa, xb, st, _ = model.embedder.encode_entity_pair(
            variables, ids_a, ids_b, train=True, rng_a=ra, rng_b=rb
        )
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xa0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xb0), rtol=1e-5, atol=1e-6)
        for k in ("mean", "var", "count"):
            np.testing.assert_allclose(
                np.asarray(st["entity_bn"][k]), np.asarray(st1["entity_bn"][k]),
                rtol=1e-5, atol=1e-7,
            )
