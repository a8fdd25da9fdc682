"""End-to-end: train on the toy dataset, loss drops, eval metrics sane."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train.step import unpack_eval_stats
from open_knowledge_graph_embeddings_tpu.train import (
    OptimizerRegimes,
    eval_batch_to_arrays,
    make_eval_step,
    make_train_step,
    train_batch_to_arrays,
)


def _hp(regimes):
    return [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]


def _train(model, tds, epochs=20, lr=0.3, seed=0):
    variables = model.init(jax.random.key(seed))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": lr, "weight_decay": 1e-10})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    bb = BatchBuilder(tds, seed=seed)
    key = jax.random.key(seed + 1)
    first = last = None
    for _ in range(epochs):
        for b in bb.batches(shuffle=True):
            key, sub = jax.random.split(key)
            variables, opt_state, st = step(
                variables, opt_state, _hp(regimes), train_batch_to_arrays(b), sub
            )
            l = float(st["loss_sum"]) / b.normalizer_loss
            first = l if first is None else first
            last = l
    return variables, first, last


def test_full_vocab_training_and_eval(toy_dataset_dir):
    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True, batch_size=4
    )
    vds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="valid.txt", is_training_data=False, batch_size=4
    )
    vds.attach_filter_index("train.txt", "valid.txt", "test.txt")
    model = build_model(
        "LookupComplexRelationModel", tds.meta, entity_slot_size=16, init_std=0.1
    )
    variables, first, last = _train(model, tds, epochs=25)
    assert last < first * 0.3, f"loss did not drop: {first} -> {last}"

    eval_step = make_eval_step(model)
    mrr_sum = cnt = 0.0
    for b in BatchBuilder(vds).batches():
        st = unpack_eval_stats(eval_step(variables, eval_batch_to_arrays(b)))
        mrr_sum += st["mrr"]
        cnt += st["count"]
    assert cnt == 4  # 2 valid triples x 2 directions, 1 gold each
    assert mrr_sum / cnt > 0.3

    # eval_block_rows contract: full-vocab metric SUMS are invariant to the
    # device batch size (per-prefix metrics never see batch composition), so
    # larger eval blocks amortize the candidate-cache sweep with the exact
    # same protocol results
    sums_by_bs = {}
    for bs in (1, 4):
        sums = np.zeros(3)
        for b in BatchBuilder(vds, batch_size=bs).batches():
            st = unpack_eval_stats(eval_step(variables, eval_batch_to_arrays(b)))
            sums += [st["mrr"], st["h10"], st["count"]]
        sums_by_bs[bs] = sums
    np.testing.assert_allclose(sums_by_bs[1], sums_by_bs[4], rtol=1e-6)


def test_batch_shared_training(toy_dataset_dir):
    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4, use_batch_shared_entities=True, min_size_batch_labels=6,
        max_size_prefix_label=2,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8)
    variables, first, last = _train(model, tds, epochs=15, lr=0.2)
    assert last < first, f"loss did not drop: {first} -> {last}"


def test_eval_step_ranks_perfect_model(toy_dataset_dir):
    """A model whose scores are rigged so golds always win must get mrr 1."""
    vds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="valid.txt", is_training_data=False, batch_size=4
    )
    vds.attach_filter_index("train.txt", "valid.txt", "test.txt")
    from open_knowledge_graph_embeddings_tpu.train.evaluate import (
        metric_sums_from_ranks,
        ranks_from_scores,
    )

    for b in BatchBuilder(vds).batches():
        B, N = b.batch_size, b.num_cols
        scores = np.random.default_rng(0).standard_normal((B, N)).astype(np.float32)
        # push every gold mention to the top
        gv = b.gold_rows >= 0
        for g in np.flatnonzero(gv):
            cols = b.gold_mention_cols[g]
            scores[b.gold_rows[g], cols[cols >= 0]] = 100.0
        ranks, gold_valid = ranks_from_scores(
            jnp.asarray(scores),
            jnp.asarray(b.filter_rows), jnp.asarray(b.filter_cols),
            jnp.asarray(b.gold_rows), jnp.asarray(b.gold_mention_cols),
            None if b.col_valid is None else jnp.asarray(b.col_valid),
        )
        sums = metric_sums_from_ranks(ranks, gold_valid)
        assert float(sums["mrr"]) == pytest.approx(float(sums["count"]))
        assert float(sums["h1"]) == pytest.approx(float(sums["count"]))


def test_rank_tie_handling():
    """rank = #(filtered > true) + #(filtered == true)//2 (reference
    openkge/dataset.py:441-445)."""
    from open_knowledge_graph_embeddings_tpu.train.evaluate import ranks_from_scores

    scores = jnp.asarray([[1.0, 5.0, 3.0, 3.0, 3.0]])
    # gold is col 2 (score 3); cols 3,4 tie at 3; col 1 (5.0) beats it;
    # no filtering
    ranks, valid = ranks_from_scores(
        scores,
        jnp.asarray([-1]), jnp.asarray([-1]),
        jnp.asarray([0]), jnp.asarray([[2]]),
        None,
    )
    # false_pos = 1 (the 5.0), equals = 3 (cols 2,3,4) -> rank = 1 + 3//2 = 2
    assert ranks[0] == 2

    # with cols 3,4 filtered: false_pos=1, equals=1 -> rank 1
    ranks2, _ = ranks_from_scores(
        scores,
        jnp.asarray([0, 0]), jnp.asarray([3, 4]),
        jnp.asarray([0]), jnp.asarray([[2]]),
        None,
    )
    assert ranks2[0] == 1


def test_bigram_batchnorm_pad_row_frozen(toy_dataset_dir):
    """Bigram + batchnorm leaked gradient into the PAD token row before the
    stop-gradient fix; the PAD row must stay bit-identical under training."""
    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True, batch_size=4
    )
    model = build_model(
        "BigramPoolingComplexRelationModel", tds.meta,
        entity_slot_size=8, relation_slot_size=8, normalize="batchnorm",
    )
    variables = model.init(jax.random.key(0))
    pad_before = np.asarray(variables["params"]["entity_token_embedding"][0]).copy()
    variables, first, last = _train_from(model, variables, tds, epochs=5, lr=0.2)
    pad_after = np.asarray(variables["params"]["entity_token_embedding"][0])
    np.testing.assert_array_equal(pad_before, pad_after)


def _train_from(model, variables, tds, epochs=5, lr=0.2, seed=0):
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": lr})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    key = jax.random.key(seed + 1)
    first = last = None
    for _ in range(epochs):
        for b in BatchBuilder(tds, seed=seed).batches(shuffle=True):
            key, sub = jax.random.split(key)
            variables, opt_state, st = step(
                variables, opt_state, _hp(regimes), train_batch_to_arrays(b), sub
            )
            l = float(st["loss_sum"]) / b.normalizer_loss
            first = l if first is None else first
            last = l
    return variables, first, last
