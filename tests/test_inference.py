"""Top-k prediction API: trained model ranks gold completions first."""

import jax
import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.inference import Predictor
from open_knowledge_graph_embeddings_tpu.models import build_model


@pytest.fixture(scope="module")
def trained(toy_dataset_dir):
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.data import BatchBuilder
    from open_knowledge_graph_embeddings_tpu.train import (
        OptimizerRegimes,
        make_train_step,
        train_batch_to_arrays,
    )

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True, batch_size=4
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=16, init_std=0.1)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.3})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    key = jax.random.key(1)
    for _ in range(30):
        for b in BatchBuilder(tds, seed=0).batches(shuffle=True):
            key, sub = jax.random.split(key)
            hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
            variables, opt_state, _ = step(variables, opt_state, hp, train_batch_to_arrays(b), sub)
    return model, variables


def test_predict_ids(trained, toy_dataset_dir):
    model, variables = trained
    p = Predictor(model, variables, dataset_dir=toy_dataset_dir)
    # train triple: (2, 2, 4) with obj alternatives {4, 5}
    scores, ids = p.predict(subj=[2], rel=[2], k=3)
    assert ids.shape == (1, 3)
    assert {4, 5} & set(ids[0].tolist()), f"gold not in top-3: {ids[0]}"
    # (?, r, o) direction: subject 2 should rank highly for (2, 4)
    scores_po, ids_po = p.predict(obj=[4], rel=[2], k=3)
    assert {2, 3} & set(ids_po[0].tolist())


def test_predict_text(trained, toy_dataset_dir):
    model, variables = trained
    p = Predictor(model, variables, dataset_dir=toy_dataset_dir)
    results = p.predict_text("B O", "works in", None, k=3)
    names = [n for n, _ in results]
    assert {"N Y", "New York"} & set(names), names
    with pytest.raises(KeyError):
        p.predict_text("nobody", "works in", None)


def test_predict_cli(trained, toy_dataset_dir, tmp_path, capsys):
    """Drive the CLI path end to end with a saved checkpoint."""
    model, variables = trained
    from open_knowledge_graph_embeddings_tpu.cli.predict import main as predict_main
    from open_knowledge_graph_embeddings_tpu.train.checkpoint import save_checkpoint

    ck = save_checkpoint(str(tmp_path), "ck", variables, {}, {"training_steps": 1})
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
dataset_dir: {toy_dataset_dir}
model: LookupComplexRelationModel
model_config: {{entity_slot_size: 16, init_std: 0.1}}
train_data_config: {{input_file: train.txt, batch_size: 4}}
"""
    )
    predict_main([str(cfg), "--resume", ck, "--query", "B O|works in|?", "-k", "3"])
    out = capsys.readouterr().out
    assert "N Y" in out or "New York" in out
