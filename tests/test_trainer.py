"""Trainer host loop, checkpointing, and CLI entry point."""

import json
import os

import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.config.options import load_config
from open_knowledge_graph_embeddings_tpu.cli.train import main


def _toy_args(toy_dataset_dir, tmp_path, **over):
    args = load_config()
    args.update(
        dataset_dir=toy_dataset_dir,
        experiment_dir=str(tmp_path / "exp"),
        epochs=6,
        batch_size=4,
        eval_epoch_freq=2,
        eval_freq=-1,
        save_epoch_freq=2,
        print_freq=1,
        model="LookupComplexRelationModel",
        model_config={"entity_slot_size": 8, "init_std": 0.1},
        optimization_config={"optimizer": "Adagrad", "epoch": 0, "lr": 0.3,
                             "weight_decay": 1e-10},
        train_data_config={"input_file": "train.txt", "batch_size": 4,
                           "use_batch_shared_entities": False},
        val_data_config={"input_file": "valid.txt", "batch_size": 4,
                         "use_batch_shared_entities": False},
        test_data_config={"input_file": "test.txt", "batch_size": 4,
                          "use_batch_shared_entities": False},
    )
    args.update(over)
    return args


def test_cli_train_and_results(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path))
    assert trainer.training_steps > 0
    # results.csv written with validation rows
    rows = trainer.results.to_dicts()
    assert any("validation_mrr" in r for r in rows)
    assert os.path.exists(tmp_path / "exp" / "results.csv")
    # checkpoint written by save_epoch_freq
    ckpts = [p for p in os.listdir(tmp_path / "exp") if p.startswith("checkpoint")]
    assert ckpts


def test_checkpoint_roundtrip(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=3))
    path = trainer.save()
    val_before = trainer.evaluate()

    # fresh trainer, load checkpoint, eval matches
    args2 = _toy_args(toy_dataset_dir, tmp_path, experiment_dir=str(tmp_path / "exp2"),
                      train=False, evaluate=False, epochs=0)
    trainer2 = main(args2)
    trainer2.load(path)
    assert trainer2.training_steps == trainer.training_steps
    val_after = trainer2.evaluate()
    assert val_after["mrr"].avg == pytest.approx(val_before["mrr"].avg, abs=1e-6)

    # partial load: only relation embedding
    trainer3 = main(args2)
    before = np.asarray(trainer3.variables["params"]["entity_embedding"]).copy()
    trainer3.load(path, resume_filter=["relation_embedding"], reset_optimizer=True)
    after = np.asarray(trainer3.variables["params"]["entity_embedding"])
    np.testing.assert_array_equal(before, after)  # entity table untouched
    np.testing.assert_array_equal(
        np.asarray(trainer3.variables["params"]["relation_embedding"]),
        np.asarray(trainer.variables["params"]["relation_embedding"]),
    )


def test_evaluate_only_mode(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=3))
    path = trainer.save()
    scores_file = str(tmp_path / "scores.csv")
    args = _toy_args(
        toy_dataset_dir, tmp_path,
        experiment_dir=str(tmp_path / "exp3"),
        evaluate=True, evaluate_on_validation=False,
        resume=path, evaluate_scores_file=scores_file,
    )
    main(args)
    assert os.path.exists(scores_file)
    with open(scores_file) as f:
        content = f.read()
    assert "mrr" in content
    # sweep-row schema carries the reference's hyperparameter columns
    # (reference: scripts/train.py:157-220) alongside the metrics
    header = content.splitlines()[0].split(",")
    for col in ("checkpoint", "batch_size", "dropout", "model",
                "train_data", "lr", "weight_decay", "epoch", "mrr", "h10"):
        assert col in header, col


def test_early_stopping_fires(toy_dataset_dir, tmp_path):
    args = _toy_args(
        toy_dataset_dir, tmp_path,
        experiment_dir=str(tmp_path / "exp4"),
        epochs=50, patience_epochs=1, eval_epoch_freq=1,
        # lr 0 -> no improvement -> patience should fire quickly
        optimization_config={"optimizer": "SGD", "epoch": 0, "lr": 0.0},
    )
    trainer = main(args)
    assert trainer.terminate
    assert trainer.epoch < 50


def test_config_cli_overrides(toy_dataset_dir):
    args = load_config(None, ["--epochs", "7", "--model", "LookupDistmultRelationModel"])
    assert args["epochs"] == 7
    assert args["model"] == "LookupDistmultRelationModel"
    with pytest.raises(SystemExit):
        load_config(None, ["--not_a_key", "1"])


def test_resume_freeze_keeps_params_fixed(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=2))
    path = trainer.save()
    args = _toy_args(
        toy_dataset_dir, tmp_path,
        experiment_dir=str(tmp_path / "expf"),
        resume=path, resume_freeze=["relation_embedding"], epochs=4,
    )
    trainer2 = main(args)
    np.testing.assert_array_equal(
        np.asarray(trainer2.variables["params"]["relation_embedding"]),
        np.asarray(trainer.variables["params"]["relation_embedding"]),
    )
    # entity table trained on
    assert not np.array_equal(
        np.asarray(trainer2.variables["params"]["entity_embedding"]),
        np.asarray(trainer.variables["params"]["entity_embedding"]),
    )


def test_resume_freeze_preserves_loaded_optimizer_state(toy_dataset_dir, tmp_path):
    """Freezing one table on resume must NOT zero the loaded Adagrad
    accumulators of the still-trainable tables."""
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=3))
    path = trainer.save()
    acc_before = np.asarray(trainer.opt_state["entity_embedding"]["sum"]).copy()
    assert acc_before.sum() > 0

    args = _toy_args(toy_dataset_dir, tmp_path, experiment_dir=str(tmp_path / "expfz"),
                     resume=path, resume_freeze=["relation_embedding"],
                     train=False, epochs=0)
    trainer2 = main(args)
    np.testing.assert_array_equal(
        np.asarray(trainer2.opt_state["entity_embedding"]["sum"]), acc_before
    )
    assert trainer2.opt_state["relation_embedding"] == {}


def test_results_restored_on_resume(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=5))
    rows_before = len(trainer.results.to_dicts())
    assert rows_before > 0
    path = trainer.save()
    args2 = _toy_args(toy_dataset_dir, tmp_path, experiment_dir=str(tmp_path / "exp_r"),
                      train=False, epochs=0)
    trainer2 = main(args2)
    trainer2.load(path)
    assert len(trainer2.results.to_dicts()) == rows_before


def test_kl_loss_trains_via_cli(toy_dataset_dir, tmp_path):
    args = _toy_args(toy_dataset_dir, tmp_path, experiment_dir=str(tmp_path / "expkl"))
    args["experiment_settings"] = dict(args["experiment_settings"], loss="kl")
    trainer = main(args)
    rows = [r for r in trainer.results.to_dicts() if r.get("training_loss")]
    assert float(rows[-1]["training_loss"]) < float(rows[0]["training_loss"])


def test_log_predictions_writes_topk_dump(toy_dataset_dir, tmp_path):
    trainer = main(_toy_args(toy_dataset_dir, tmp_path, epochs=3,
                             log_predictions=True, log_predictions_topk=3))
    pred_files = [p for p in os.listdir(tmp_path / "exp") if p.startswith("predictions_step")]
    assert pred_files, "log_predictions should write a per-eval TSV dump"
    lines = open(tmp_path / "exp" / sorted(pred_files)[-1]).read().strip().split("\n")
    assert lines[0].startswith("direction\tent_id")
    assert len(lines) > 1
    # each row: direction, prefix ids, k entity ids, k scores
    parts = lines[1].split("\t")
    assert parts[0] in ("sp", "po")
    assert len(parts[3].split()) == 3
    assert len(parts[4].split()) == 3
