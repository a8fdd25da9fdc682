"""Train/evaluate entry point.

Usage (mirrors the reference, reference: scripts/train.py / README.md:96-107)::

    python -m open_knowledge_graph_embeddings_tpu.cli.train CONFIG.yaml [--key value ...]
    python -m open_knowledge_graph_embeddings_tpu.cli.train CONFIG.yaml \
        --evaluate True --evaluate_on_validation False --resume PATH

Orchestration: parse -> dirs/logging/seed -> three datasets -> filter-index
merge -> model build (dataset meta injected) -> Trainer -> epoch loop with
early stopping, or evaluate-only with a score-row append for sweeps.
"""

from __future__ import annotations

import csv
import logging
import os
import sys
from datetime import datetime
from typing import Any, Dict

import jax

from open_knowledge_graph_embeddings_tpu.config.options import parse_cli
from open_knowledge_graph_embeddings_tpu.data.dataset import Datasets
from open_knowledge_graph_embeddings_tpu.models.model import build_model
from open_knowledge_graph_embeddings_tpu.train.checkpoint import (
    load_checkpoint_meta,
    merge_resume_config,
)
from open_knowledge_graph_embeddings_tpu.train.trainer import Trainer
from open_knowledge_graph_embeddings_tpu.utils.logging_utils import setup_logging
from open_knowledge_graph_embeddings_tpu.utils.misc import set_global_seeds

logger = logging.getLogger(__name__)


def setup_dirs(args: Dict[str, Any], time_stamp: str) -> str:
    if args.get("experiment_dir"):
        save_path = args["experiment_dir"]
    else:
        config_name = os.path.splitext(os.path.basename(args.get("config_file") or "default"))[0]
        save_path = os.path.join(
            args.get("results_dir") or "experiments", f"{config_name}-{time_stamp}"
        )
    os.makedirs(save_path, exist_ok=True)
    return save_path


def setup_dataset(args: Dict[str, Any], data_config: Dict[str, Any], is_training_data: bool):
    cls_key = (
        "training_dataset_class" if is_training_data else
        ("validation_dataset_class" if data_config is args.get("val_data_config")
         else "test_dataset_class")
    )
    cls_name = args.get(cls_key) or args.get("dataset_class")
    cls = getattr(Datasets, cls_name)
    cfg = dict(data_config)
    es = args.get("experiment_settings", {})
    cfg.setdefault("batch_size", args.get("batch_size", 512))
    cfg.setdefault("loss", es.get("loss", "bce"))
    cfg.setdefault("max_lengths_tuple", tuple(es.get("max_lengths_tuple", (10, 10))))
    for k in ("replace_entities_by_tokens", "replace_relations_by_tokens"):
        cfg.setdefault(k, es.get(k, False))
    return cls(dataset_dir=args["dataset_dir"], is_training_data=is_training_data, **cfg)


def main(args: Dict[str, Any]) -> Trainer:
    time_stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")

    # multi-host: connect to the JAX distributed runtime before any device
    # work so jax.devices() is the global list (config keys
    # coordinator_address / num_processes / process_id, or OKET_* env vars)
    from open_knowledge_graph_embeddings_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed(args)

    ckpt_meta = None
    if args.get("resume"):
        ckpt_meta = load_checkpoint_meta(args["resume"])
        if args.get("resume_load_args", True) and "config" in ckpt_meta:
            args = merge_resume_config(args, ckpt_meta["config"])

    save_path = setup_dirs(args, time_stamp)
    # ranks share one experiment_dir: each gets its own log file (rank 0
    # keeps the plain name), while results.csv/checkpoints are rank-0-only
    rank_suffix = f".p{jax.process_index()}" if jax.process_count() > 1 else ""
    setup_logging(os.path.join(save_path, f"log_{time_stamp}{rank_suffix}.txt"))
    logger.info("saving to %s", save_path)

    seed = int(args.get("seed") or 0)
    if seed > 0:
        set_global_seeds(seed)

    precision = args.get("matmul_precision")
    if precision and precision != "default":
        jax.config.update("jax_default_matmul_precision", precision)

    # persistent XLA compilation cache: first flagship compile is 20-40 s on
    # TPU; cached restarts (resume, sweeps over the same shapes) skip it.
    # Set compilation_cache_dir: "" to disable.
    cache_dir = args.get("compilation_cache_dir", "~/.cache/oket_xla")
    if cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    train_data = setup_dataset(args, args["train_data_config"], is_training_data=True)
    valid_data = setup_dataset(args, args["val_data_config"], is_training_data=False)
    test_data = setup_dataset(args, args["test_data_config"], is_training_data=False)

    if args.get("evaluate"):
        args["train"] = False
    evaluation_data = valid_data if args.get("evaluate_on_validation", True) else test_data
    evaluation_data.attach_filter_index(
        train_data.input_file_name, valid_data.input_file_name, test_data.input_file_name
    )

    model_config = dict(args.get("model_config") or {})
    model = build_model(args["model"], train_data.meta, **model_config)
    logger.info("model: %s | embedder: %s", args["model"], type(model.embedder).__name__)

    trainer = Trainer(
        args=args,
        model=model,
        train_dataset=train_data,
        validation_dataset=evaluation_data,
        save_path=save_path,
    )
    n_params = sum(
        leaf.size for leaf in jax.tree_util.tree_leaves(trainer.variables["params"])
    )
    logger.info("number of parameters: %d", n_params)

    if args.get("resume"):
        trainer.load(
            args["resume"],
            reset_optimizer=args.get("reset_optimizer", False),
            resume_filter=args.get("resume_filter"),
            freeze_param=args.get("resume_freeze"),
            dont_load_optimizer=bool(args.get("evaluate")),
        )

    if args.get("train", True):
        try:
            trainer.run()
        except KeyboardInterrupt:
            logger.info("interrupted; flushing results")
            trainer.save_results()
    elif args.get("evaluate"):
        results = trainer.evaluate()
        logger.info("TEST RESULTS: %s", results.averages)
        scores_file = args.get("evaluate_scores_file")
        if scores_file and jax.process_index() == 0:
            # sweep-row schema mirrors the reference's hyperparameter+score
            # columns (reference: scripts/train.py:157-220) so downstream
            # sweep aggregation works on either framework's csv
            mc = dict(args.get("model_config") or {})
            oc = args.get("optimization_config") or {}
            oc0 = oc[0] if isinstance(oc, list) and oc else (
                oc if isinstance(oc, dict) else {}
            )
            resume = args.get("resume") or ""
            row = {
                "config": args.get("config_file"),
                "checkpoint_path": os.path.basename(os.path.dirname(resume)) if resume else "-",
                "checkpoint": os.path.basename(resume) if resume else "-",
                "batch_size": args.get("batch_size", "-"),
                "entity_slot_size": mc.get("entity_slot_size", "-"),
                "relation_slot_size": mc.get("relation_slot_size", "-"),
                "dropout": mc.get("dropout", "-"),
                "input_dropout": mc.get("input_dropout", "-"),
                "relation_dropout": mc.get("relation_dropout", "-"),
                "relation_input_dropout": mc.get("relation_input_dropout", "-"),
                "model": args.get("model"),
                "train_data": (args.get("train_data_config") or {}).get("input_file", "-"),
                "valid_data": (args.get("val_data_config") or {}).get("input_file", "-"),
                "sparse": mc.get("sparse", "-"),
                "lr": oc0.get("lr", "-"),
                "weight_decay": oc0.get("weight_decay", "-"),
                "epoch": trainer.epoch,
                "resume": resume,
                **{k: v for k, v in results.averages_dict.items()},
            }
            exists = os.path.exists(scores_file)
            with open(scores_file, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(row))
                if not exists:
                    w.writeheader()
                w.writerow(row)
    return trainer


def cli_main():
    main(parse_cli(sys.argv[1:]))


if __name__ == "__main__":
    cli_main()
