"""Full benchmark-creation pipeline end-to-end on a synthetic corpus, then
train a model on its output — corpus jsonl -> splits -> mapped ids -> jitted
training (the prototype-scale integration test the reference approximates
with config/preprocessing/prototype.yaml)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.preprocessing.jobs import run_pipeline


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(0)
    people = [f"person{i}" for i in range(20)]
    cities = [f"city{i}" for i in range(10)]
    rels = [["lives", "in"], ["works", "in"], ["was", "born", "in"], ["moved", "to"]]
    rows = []
    for _ in range(400):
        p = rng.choice(people)
        c = rng.choice(cities)
        r = rels[rng.integers(len(rels))]
        # two surface forms per person entity
        surface = [p] if rng.random() < 0.6 else ["mr", p]
        rows.append(
            {
                "subject": surface,
                "relation": list(r),
                "object": [c],
                "subject_link": p.capitalize(),
                "object_link": c.capitalize(),
                "confidence": 0.9,
            }
        )
    corpus = d / "corpus.jsonl"
    corpus.write_text("\n".join(json.dumps(r) for r in rows))
    opts = {
        "work_dir": str(d / "version1"),
        "corpus_files": [str(corpus)],
        "eval_data_size": 5,
        "min_count": 1,
        "mention_vocab_size": 1000,
        "relation_vocab_size": 1000,
        "seed": 0,
    }
    run_pipeline(opts)
    return d / "version1"


def test_pipeline_outputs(pipeline_dir):
    import os

    for f in (
        "train_data_simple.txt", "train_data_basic.txt", "train_data_thorough.txt",
        "validation_data.txt", "validation_data_linked.txt", "test_data.txt",
        "mapped_to_ids/entity_id_map.txt", "mapped_to_ids/train_data_thorough.txt",
    ):
        assert os.path.exists(pipeline_dir / f), f

    n_simple = len(open(pipeline_dir / "train_data_simple.txt").readlines())
    n_basic = len(open(pipeline_dir / "train_data_basic.txt").readlines())
    n_thorough = len(open(pipeline_dir / "train_data_thorough.txt").readlines())
    assert n_thorough <= n_basic
    assert n_thorough > 0

    # eval files carry ||| mention alternatives
    test_lines = open(pipeline_dir / "test_data.txt").readlines()
    assert len(test_lines) == 5


def test_leakage_thorough_excludes_eval_pairs(pipeline_dir):
    """No thorough-train triple shares a (subject-link, object-link) pair
    with a test triple — the whole point of the thorough split."""
    def pairs(path):
        out = set()
        for line in open(path):
            s, r, o, _, _ = line.rstrip("\n").split("\t")
            out.add((s, o))
        return out

    test_pairs = set()
    for line in open(pipeline_dir / "test_data.txt"):
        s, r, o, s_alts, o_alts = line.rstrip("\n").split("\t")
        for sa in s_alts.split("|||"):
            for oa in o_alts.split("|||"):
                test_pairs.add((sa, oa))
                test_pairs.add((oa, sa))
    thorough_pairs = pairs(pipeline_dir / "train_data_thorough.txt")
    assert not (test_pairs & thorough_pairs)


def test_train_on_pipeline_output(pipeline_dir):
    from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.train import (
        OptimizerRegimes,
        make_train_step,
        train_batch_to_arrays,
    )

    mapped = str(pipeline_dir / "mapped_to_ids")
    tds = OneToNMentionRelationDataset(
        dataset_dir=mapped, input_file="train_data_thorough.txt",
        is_training_data=True, batch_size=8,
        use_batch_shared_entities=True, min_size_batch_labels=16,
    )
    model = build_model(
        "LSTMComplexRelationModel", tds.meta, entity_slot_size=8, relation_slot_size=8
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    key = jax.random.key(1)
    first = last = None
    for _ in range(5):
        for b in BatchBuilder(tds, seed=0).batches(shuffle=True):
            key, sub = jax.random.split(key)
            hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
            variables, opt_state, st = step(
                variables, opt_state, hp, train_batch_to_arrays(b), sub
            )
            l = float(st["loss_sum"]) / b.normalizer_loss
            first = l if first is None else first
            last = l
    assert last < first
