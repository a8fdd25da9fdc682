"""Run every shipped FB15k-237 config end-to-end on the current device.

For each config in configs/fb15k237/: train via the CLI surface on
valid-as-train (the reference checkout ships no mapped train split —
/root/reference/data/fb15k237/.MISSING_LARGE_BLOBS), then run the CLI's
evaluate-only mode on the test split from the best-MRR checkpoint,
appending a hyperparameter+score sweep row (reference:
scripts/train.py:157-220) to one shared csv.

Usage::

    python tools/run_fb237_suite.py OUTDIR [--epochs N] [--configs a,b]

Writes OUTDIR/sweep_scores.csv and prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_FB = "/root/reference/data/fb15k237/mapped_to_ids"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--epochs", type=int, default=0, help="override config epochs (0 = keep)")
    ap.add_argument("--configs", default="", help="comma-separated config basenames to run")
    ap.add_argument("--dataset-dir", default=REF_FB)
    ns = ap.parse_args(argv)

    from open_knowledge_graph_embeddings_tpu.cli.train import main as cli_main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    os.makedirs(ns.outdir, exist_ok=True)
    scores_csv = os.path.join(ns.outdir, "sweep_scores.csv")

    cfg_paths = sorted(glob.glob(os.path.join(REPO, "configs", "fb15k237", "*.yaml")))
    if ns.configs:
        want = set(ns.configs.split(","))
        cfg_paths = [p for p in cfg_paths if os.path.splitext(os.path.basename(p))[0] in want]

    for cfg_path in cfg_paths:
        name = os.path.splitext(os.path.basename(cfg_path))[0]
        exp = os.path.join(ns.outdir, name)
        t0 = time.time()
        args = load_config(cfg_path, [])
        args.update(
            dataset_dir=ns.dataset_dir,
            experiment_dir=exp,
            train_data_config={**args["train_data_config"], "input_file": "valid.txt"},
        )
        if ns.epochs:
            args["epochs"] = ns.epochs
        trainer = cli_main(args)
        train_s = time.time() - t0

        best = os.path.join(exp, "model_best-mrr")
        if os.path.exists(best):
            resume = best
        else:  # no eval improved during training: use the newest rotation
            resume = os.path.join(exp, max(
                (d for d in os.listdir(exp) if d.startswith("checkpoint")),
                key=lambda d: os.path.getmtime(os.path.join(exp, d)),
            ))
        args2 = load_config(cfg_path, [])
        args2.update(
            dataset_dir=ns.dataset_dir,
            experiment_dir=os.path.join(ns.outdir, name + "-eval"),
            train_data_config={**args2["train_data_config"], "input_file": "valid.txt"},
            evaluate=True,
            evaluate_on_validation=False,
            resume=resume,
            evaluate_scores_file=scores_csv,
        )
        t1 = time.time()
        cli_main(args2)
        # pull the metrics from the csv row just appended
        import csv as _csv

        with open(scores_csv) as f:
            row = list(_csv.DictReader(f))[-1]
        print(json.dumps({
            "config": name,
            "epochs_trained": trainer.epoch,
            "train_wall_s": round(train_s, 1),
            "eval_wall_s": round(time.time() - t1, 1),
            "test_mrr": float(row["mrr"]),
            "test_h10": float(row["h10"]),
            "test_h1": float(row["h1"]),
        }), flush=True)


if __name__ == "__main__":
    main()
