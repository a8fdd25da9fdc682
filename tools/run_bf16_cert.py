"""bf16 production-path certification, on-chip leg (VERDICT round-4 #1b).

Runs the 2.47M-mention demo config twice — dtype float32 and bfloat16 —
seed-matched, then evaluates BOTH protocols (32768-candidate batch-shared
validation; full-vocab test) from each run's final checkpoint and prints
a JSON comparison line.  Results land in RESULTS.md with a tolerance
verdict; the CPU leg (tests/test_bf16.py) is the in-suite gate.

Usage::

    python tools/run_bf16_cert.py OUTDIR [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = os.path.join(REPO, "configs", "olpbench", "synth-olpbench-2m47-demo.yaml")


def run_one(dtype: str, outdir: str, epochs: int, cfg: str = CFG,
            eval_dtype: str = "bfloat16", seed: int = 0):
    from open_knowledge_graph_embeddings_tpu.cli.train import main as cli_main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    exp = os.path.join(outdir, f"cert-{dtype}")
    args = load_config(cfg, [])
    args["dataset_dir"] = os.path.join(REPO, args["dataset_dir"])
    args.update(
        experiment_dir=exp,
        seed=seed,
        epochs=epochs,
        model_config={**args["model_config"], "dtype": dtype},
        save_epoch_freq=-1,
    )
    t0 = time.time()
    trainer = cli_main(args)
    train_s = time.time() - t0

    # batch-shared validation protocol (the trainer's validation dataset)
    valid = trainer.evaluate()
    out = {
        "dtype": dtype,
        "train_wall_s": round(train_s, 1),
        "train_loss_per_epoch": [
            float(r["training_loss"]) for r in trainer.results.rows
            if r.get("training_loss") not in (None, "")
        ],
        "valid_mrr": valid["mrr"].avg,
        "valid_h10": valid["h10"].avg,
    }

    # full-vocab test protocol via evaluate-only resume from the final ckpt
    # (metrics read from the sweep csv the CLI appends — avoids a second
    # full-vocab pass)
    ck = trainer.save()
    # free the training trainer's device buffers before the evaluate-only
    # trainer builds its own copy + the [2.47M, d] candidate cache
    del trainer
    import gc

    gc.collect()
    scores_csv = os.path.join(outdir, "cert_scores.csv")
    args2 = load_config(cfg, [])
    args2["dataset_dir"] = os.path.join(REPO, args2["dataset_dir"])
    args2.update(
        experiment_dir=exp + "-test",
        # both trained parameter sets are evaluated under ONE identical
        # eval procedure — the certification isolates the TRAINING dtype.
        # At the 2.47M shape only bf16 eval fits the 16 GB chip (the f32
        # candidate cache is 2 x 5 GB with its slice); the reduced-shape
        # config (synth-olpbench-600k-cert.yaml) certifies eval-dtype
        # numerics with --eval-dtype float32
        model_config={**args2["model_config"], "dtype": eval_dtype},
        resume_load_args=False,
        evaluate=True, evaluate_on_validation=False, resume=ck,
        evaluate_scores_file=scores_csv,
    )
    cli_main(args2)
    import csv

    with open(scores_csv) as f:
        row = list(csv.DictReader(f))[-1]
    out["test_mrr"] = float(row["mrr"])
    out["test_h10"] = float(row["h10"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--config", default=CFG)
    ap.add_argument("--eval-dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--one", help="(internal) run a single dtype in-process")
    ns = ap.parse_args(argv)
    os.makedirs(ns.outdir, exist_ok=True)
    if ns.one:
        result = run_one(ns.one, ns.outdir, ns.epochs, ns.config, ns.eval_dtype,
                         ns.seed)
        with open(os.path.join(ns.outdir, f"result-{ns.one}.json"), "w") as f:
            json.dump(result, f)
        print(json.dumps(result), flush=True)
        return
    # one subprocess per dtype: the 2.47M-scale runs must not share a
    # process (device buffers from the first run linger and the second
    # OOMs the 16 GB chip)
    import subprocess

    results = []
    for d in ("float32", "bfloat16"):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), ns.outdir,
             "--epochs", str(ns.epochs), "--config", ns.config,
             "--eval-dtype", ns.eval_dtype, "--seed", str(ns.seed), "--one", d],
            check=True, cwd=REPO,
        )
        with open(os.path.join(ns.outdir, f"result-{d}.json")) as f:
            results.append(json.load(f))
    f32, bf16 = results
    verdict = {
        "valid_mrr_gap": abs(f32["valid_mrr"] - bf16["valid_mrr"]),
        "test_mrr_gap": abs(f32["test_mrr"] - bf16["test_mrr"]),
        "test_h10_gap": abs(f32["test_h10"] - bf16["test_h10"]),
    }
    print(json.dumps({"f32": f32, "bf16": bf16, "gaps": verdict}), flush=True)


if __name__ == "__main__":
    main()
