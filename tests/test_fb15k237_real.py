"""Integration against the real FB15k-237 files shipped with the reference
(valid/test splits + all six vocabulary maps; train.txt is stripped from the
reference checkout, so the valid split stands in as training data for the
smoke run)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FB = "/root/reference/data/fb15k237/mapped_to_ids"
if not os.path.isdir(FB):
    pytest.skip("FB15k-237 data not available", allow_module_level=True)

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
    load_meta,
)
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train.step import unpack_eval_stats
from open_knowledge_graph_embeddings_tpu.train import (
    OptimizerRegimes,
    eval_batch_to_arrays,
    make_eval_step,
    make_train_step,
    train_batch_to_arrays,
)


@pytest.fixture(scope="module")
def meta():
    return load_meta(FB)


def test_real_vocab_sizes(meta):
    # 14,541 entities + 2 specials = ids up to 14542 (README/SURVEY counts)
    assert meta.entities_size == 14543
    assert meta.relations_size == 239
    assert meta.entity_token_ids.shape[0] == meta.entities_size


def test_real_dataset_and_one_train_step(meta):
    ds = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True, batch_size=256,
    )
    assert len(ds.records) > 15000  # 17.5k triples x 2 directions, merged by prefix
    model = build_model(
        "LookupComplexRelationModel", ds.meta, entity_slot_size=64, init_std=0.1,
        input_dropout=0.4,
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.3, "weight_decay": 1e-10})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    bb = BatchBuilder(ds, seed=0)
    losses = []
    key = jax.random.key(1)
    for i, b in enumerate(bb.batches(shuffle=True)):
        if i >= 20:
            break
        key, sub = jax.random.split(key)
        variables, opt_state, st = step(variables, opt_state, hp, train_batch_to_arrays(b), sub)
        losses.append(float(st["loss_sum"]) / b.normalizer_loss)
    assert losses[-1] < losses[0], f"loss not dropping on real data: {losses[0]} -> {losses[-1]}"


def test_real_eval_filtered_ranking(meta):
    train = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True, batch_size=128,
    )
    ev = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="test.txt", is_training_data=False, batch_size=64,
    )
    ev.attach_filter_index("valid.txt", "valid.txt", "test.txt")
    model = build_model("LookupComplexRelationModel", ev.meta, entity_slot_size=32)
    variables = model.init(jax.random.key(0))
    eval_step = make_eval_step(model)
    bb = BatchBuilder(ev)
    mrr_sum = cnt = 0.0
    for i, b in enumerate(bb.batches()):
        if i >= 5:
            break
        st = unpack_eval_stats(eval_step(variables, eval_batch_to_arrays(b)))
        mrr_sum += st["mrr"]
        cnt += st["count"]
    assert cnt > 0
    # untrained model: MRR should be near random (1/N ~ 7e-5), far below 0.01
    assert 0 < mrr_sum / cnt < 0.01
