"""Benchmark: training throughput of the OLPBench flagship configuration.

Measures steady-state jitted train-step throughput of LSTM-ComplEx
(d=512, batch 4096 prefix rows, batch-shared 4096 candidates — the
ACL2020 headline config, reference config/acl2020-openlink/
wikiopenlink-thorough-complex-lstm.yaml) on one TPU chip, and prints ONE
JSON line::

    {"metric": ..., "value": N, "unit": "items/s", "vs_baseline": R}

``items/s`` is the positives-normalized throughput the reference logs per
step (reference: openkge/trainer.py:308).  ``vs_baseline`` compares
against a torch-CPU implementation of the reference's computation pattern
(4-term chunked ComplEx matmuls + torch LSTM), measured once on this host
and cached in BENCH_BASELINE.json — the only baseline available, since
the reference repo publishes no numbers (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# OLPBench-shaped workload (entity vocab scaled 2.47M -> 500k to fit the
# single v5e-lite chip alongside Adagrad state; per-step compute is
# candidate-bound, not vocab-bound, so items/s is representative)
ENTITIES = 500_000
RELATIONS = 50_000
ENT_TOKENS = 200_000
REL_TOKENS = 50_000
D = 512
BATCH = 4096
CANDS = 4096
MAX_LEN = 10
WARMUP = 3
ITERS = 20


def build_batch(rng, positives_per_row=1.07):
    P_real = int(BATCH * positives_per_row)
    P = 8192
    pos_rows = np.full(P, -1, np.int32)
    pos_cols = np.full(P, -1, np.int32)
    pos_rows[:P_real] = rng.integers(0, BATCH, P_real)
    pos_cols[:P_real] = rng.integers(0, CANDS, P_real)
    return {
        "ent_ids": rng.integers(2, ENTITIES, BATCH).astype(np.int32),
        "rel_ids": rng.integers(2, RELATIONS, BATCH).astype(np.int32),
        "is_sp": (np.arange(BATCH) % 2 == 0),
        "row_valid": np.ones(BATCH, bool),
        "candidate_ids": rng.integers(2, ENTITIES, CANDS).astype(np.int32),
        "col_valid": np.ones(CANDS, bool),
        "pos_rows": pos_rows,
        "pos_cols": pos_cols,
        "normalizer_loss": np.float32(BATCH * CANDS),
        "n_real_cols": np.float32(CANDS),
    }, P_real


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_meta
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.step import make_train_step

    meta = _synthetic_meta(ENTITIES, RELATIONS, ENT_TOKENS, REL_TOKENS, MAX_LEN)
    model = build_model(
        "LSTMComplexRelationModel", meta, entity_slot_size=D, relation_slot_size=D,
        dropout=0.1, normalize="batchnorm", init_std=0.1,
        dtype=os.environ.get("OKET_BENCH_DTYPE", "bfloat16"),
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2, "weight_decay": 1e-10})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    rng = np.random.default_rng(0)
    batch, P_real = build_batch(rng)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    key = jax.random.key(1)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        variables, opt_state, stats = step(variables, opt_state, hp, batch, sub)
    # Over the axon tunnel block_until_ready can return before the chained
    # executions finish; a host fetch of the final loss value is the only
    # reliable fence.
    float(stats["loss_sum"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        variables, opt_state, stats = step(variables, opt_state, hp, batch, sub)
    float(stats["loss_sum"])  # fences the whole donated chain
    dt = time.perf_counter() - t0
    return P_real * ITERS / dt


def bench_torch_cpu_baseline() -> float:
    """Reference-pattern torch-CPU throughput (cached)."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["torch_cpu_items_per_sec"]

    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    B2 = BATCH // 2  # per direction
    ent_tok = torch.nn.Embedding(ENT_TOKENS, D)
    rel_tok = torch.nn.Embedding(REL_TOKENS, D)
    lstm_e = torch.nn.LSTM(D, D, batch_first=True)
    lstm_r = torch.nn.LSTM(D, D, batch_first=True)
    bce = torch.nn.BCEWithLogitsLoss(reduction="sum")
    opt = torch.optim.Adagrad(
        list(ent_tok.parameters()) + list(rel_tok.parameters())
        + list(lstm_e.parameters()) + list(lstm_r.parameters()),
        lr=0.2,
    )
    toks_e = torch.randint(4, ENT_TOKENS, (BATCH + CANDS, MAX_LEN))
    toks_r = torch.randint(4, REL_TOKENS, (BATCH, MAX_LEN))
    labels = torch.zeros(BATCH, CANDS)
    labels[torch.arange(BATCH), torch.randint(0, CANDS, (BATCH,))] = 1
    P_real = int(labels.sum())

    def step():
        opt.zero_grad()
        e_all, _ = lstm_e(ent_tok(toks_e))
        e_all = e_all[:, -1, :]
        r_all, _ = lstm_r(rel_tok(toks_r))
        r_all = r_all[:, -1, :]
        ents, cands = e_all[:BATCH], e_all[BATCH:]
        # reference 4-term ComplEx prefix scores, both directions
        s1, s2 = ents[:B2].chunk(2, 1)
        r1, r2 = r_all[:B2].chunk(2, 1)
        o1, o2 = cands.chunk(2, 1)
        sp = (s1 * r1).mm(o1.T) + (s2 * r1).mm(o2.T) + (s1 * r2).mm(o2.T) - (s2 * r2).mm(o1.T)
        q1, q2 = ents[B2:].chunk(2, 1)
        p1, p2 = r_all[B2:].chunk(2, 1)
        po = (q1 * p1).mm(o1.T) + (q2 * p1).mm(o2.T) + (q2 * p2).mm(o1.T) - (q1 * p2).mm(o2.T)
        out = torch.cat([po, sp])
        loss = bce(out.view(-1), labels.view(-1)) / (BATCH * CANDS)
        loss.backward()
        opt.step()

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    items = P_real * n / dt
    with open(cache, "w") as f:
        json.dump({"torch_cpu_items_per_sec": items, "note": "reference-pattern torch CPU"}, f)
    return items


def main():
    value = bench_tpu()
    try:
        baseline = bench_torch_cpu_baseline()
        vs = value / baseline
    except Exception:
        vs = 1.0
    print(
        json.dumps(
            {
                "metric": "OLPBench-shaped LSTM-ComplEx train items/sec (1 chip, d=512, batch 4096, 4096 batch-shared candidates)",
                "value": round(value, 1),
                "unit": "items/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
