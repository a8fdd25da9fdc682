"""Capture and summarize a per-op device profile of the flagship step.

Runs the sparse flagship train step (same setup as bench.bench_flagship)
under ``jax.profiler.trace`` for a few steps, then aggregates device-op
durations from the captured trace via ``jax.profiler.ProfileData`` and
prints the top ops — the round-over-round per-op tables in RESULTS.md
come from this.

Usage::

    python tools/profile_flagship.py [TRACE_DIR] [--steps 5] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(trace_dir: str, steps: int):
    import jax
    import jax.numpy as jnp

    import bench
    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )
    import numpy as np

    meta, model, variables = bench._flagship_model("zipf", sparse=True)
    regimes = bench._regimes()
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    rng = np.random.default_rng(0)
    raw, P_real = bench.build_batch(rng, zipf_ids=True)
    b = Batch(
        ent_ids=raw["ent_ids"], rel_ids=raw["rel_ids"], is_sp=raw["is_sp"],
        row_valid=raw["row_valid"], num_rows=bench.BATCH,
        candidate_ids=raw["candidate_ids"], col_valid=raw["col_valid"],
        num_cols=bench.CANDS, cand_offset=2,
        pos_rows=raw["pos_rows"], pos_cols=raw["pos_cols"],
        normalizer_loss=float(raw["normalizer_loss"]),
    )
    planned = SparsePlanBuilder(model.embedder, entity_sparse=True)(b)
    batch = {k: jnp.asarray(v) for k, v in planned.items()}
    step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)

    # warmup (compile + first-execute)
    variables, opt_state, stats = step(variables, opt_state, hp, batch, jax.random.key(0))
    float(stats["loss_sum"])
    with jax.profiler.trace(trace_dir):
        for i in range(steps):
            variables, opt_state, stats = step(
                variables, opt_state, hp, batch, jax.random.key(i + 1)
            )
        float(stats["loss_sum"])


def summarize(trace_dir: str, steps: int, top: int):
    from jax.profiler import ProfileData

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    assert files, f"no xplane.pb under {trace_dir}"
    data = ProfileData.from_file(files[-1])
    per_op = defaultdict(float)
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = (ev.duration_ns or 0) / 1e6
                name = ev.name
                per_op[name] += dur
                total += dur
    print(f"total device op time: {total:.2f} ms over {steps} steps "
          f"({total / max(steps, 1):.3f} ms/step)")
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / max(steps, 1):8.3f} ms/step  {name[:110]}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/oket_profile")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--summarize-only", action="store_true")
    ns = ap.parse_args(argv)
    if not ns.summarize_only:
        capture(ns.trace_dir, ns.steps)
    summarize(ns.trace_dir, ns.steps, ns.top)


if __name__ == "__main__":
    main()
