"""Per-chip scaling model for the flagship step + partitioned-HLO sweep.

Two modes, both emitting JSON (the RESULTS.md scaling tables are generated
from this output rather than hand-computed):

1. **Analytic model** (default): for a flagship-shaped config and a
   ``data x model`` mesh, print per-chip FLOPs, HBM bytes and collective
   bytes per step for every phase of the sparse train step (candidate+
   query encode, relation encode, score/BCE, gather-sum backward, table
   updates, gradient reductions), a rooflined per-phase time estimate
   (chip peaks from bench.CHIP_PEAKS, ICI bus bandwidth configurable) and
   the implied strong-scaling efficiency vs 1 chip.

       python tools/scaling_model.py --data 4 --model 2

2. **HLO sweep** (``--hlo-sweep``, needs the CPU mesh): compile the SPARSE
   PLANNED step (gather-sum grad plan active — the production flagship
   path) on pure-DP meshes D in {1, 2, 4, 8} and read the per-shard
   candidate-encode row counts off the partitioned HLO, asserting they
   shrink as N/D:

       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python tools/scaling_model.py --hlo-sweep
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


# ------------------------------------------------------------ analytic model


def _dedup_rows_per_shard(B: int, Dp: int, bucket: int = 512):
    """(entity, relation) query encode rows per data shard under the
    planner's per-shard query dedup (train/sparse.py dedup_queries) —
    MEASURED from the same Zipf id generators the bench batch uses, split
    into the Dp contiguous blocks GSPMD assigns, not hand-modeled."""
    import bench

    rng = np.random.default_rng(0)
    ent = 2 + (rng.zipf(1.3, size=B) - 1) % (bench.ENTITIES - 2)
    rel = 2 + (rng.zipf(1.1, size=B) - 1) % (bench.RELATIONS - 2)

    def rows(ids):
        blk = len(ids) // Dp
        u = max(
            len(np.unique(ids[i * blk : (i + 1) * blk])) for i in range(Dp)
        )
        S = max(bucket, -(-u // bucket) * bucket)
        return blk if Dp * S >= len(ids) else S

    return rows(ent), rows(rel)


def analytic_model(args) -> dict:
    import bench

    B, N, d, L = args.batch, args.cands, args.d, args.max_len
    H = d
    Dp, Mp = args.data, args.model
    chips = Dp * Mp
    # executed-token statistics from the Zipf flagship batch (bench.py
    # build_batch measurements; override for other datasets)
    ent_rows = B + N  # queries + candidates encoded in one LSTM pass
    ent_tok = args.ent_tokens_executed
    rel_tok = args.rel_tokens_executed
    U_ent, U_rel = args.u_ent, args.u_rel  # touched token rows per table

    f32, bf16 = 4, 2
    lstm_step_flops = 2 * (d * 4 * H + H * 4 * H)  # x/h projections per token

    # Candidate rows shard over the model axis (pure-DP: over data); query
    # and relation rows over data; LSTM/score FLOPs split accordingly.
    cand_shards = Mp if Mp > 1 else Dp
    # query dedup (default-on planner path): per-data-shard unique rows
    if getattr(args, "dedup", True):
        S_e, S_r = _dedup_rows_per_shard(B, Dp)
        q_rows_per_chip = min(S_e, B / Dp)
        rel_rows_per_chip = min(S_r, B / Dp)
    else:
        q_rows_per_chip = B / Dp
        rel_rows_per_chip = B / Dp
    enc_rows_per_chip = q_rows_per_chip + N / cand_shards
    enc_tok_per_chip = ent_tok * enc_rows_per_chip / ent_rows

    phases = {}

    def phase(name, flops, hbm, coll=0.0, note=""):
        phases[name] = {
            "flops_per_chip": round(flops),
            "hbm_bytes_per_chip": round(hbm),
            "collective_bytes_per_chip": round(coll),
            "note": note,
        }

    phase(
        "entity_encode_fwd+bwd",
        3 * lstm_step_flops * enc_tok_per_chip,
        # emb gather write + lstm hs/cs residuals + demb (bf16)
        (3 * enc_tok_per_chip * d * bf16) * 2.5,
        note=f"{enc_rows_per_chip:.0f} rows/chip of {ent_rows} (cand axis over "
        f"{'model' if Mp > 1 else 'data'})",
    )
    rel_tok_per_chip = rel_tok * rel_rows_per_chip / B
    phase(
        "relation_encode_fwd+bwd",
        3 * lstm_step_flops * rel_tok_per_chip,
        (3 * rel_tok_per_chip * d * bf16) * 2.5,
        note=f"{rel_rows_per_chip:.0f} rows/chip",
    )
    # score fwd + dq + dcand matmuls; [B/D, N/M] block per chip
    score_flops = 3 * 2 * (B / Dp) * (N / Mp) * d
    phase(
        "score_bce",
        score_flops,
        (B / Dp) * (N / Mp) * f32 * 2,  # score block + BCE pass (fused)
        note=f"[{B // Dp}, {N // Mp}] block/chip",
    )
    # backward collectives: dq psum over model, dcand psum over data, and
    # the dense-parameter (LSTM weights + BN) all-reduce over all chips
    lstm_params = 2 * (d * 4 * H + H * 4 * H + 8 * H)
    dense_coll = lstm_params * f32 * (2 * (chips - 1) / chips)
    dq_coll = (B / Dp) * d * f32 * (2 * (Mp - 1) / Mp)
    dcand_coll = (N / cand_shards) * d * f32 * (2 * (Dp - 1) / Dp if Mp == 1 else 2 * (Dp - 1) / Dp)
    phase(
        "grad_reductions",
        0,
        0,
        coll=dense_coll + dq_coll + dcand_coll,
        note="LSTM/BN all-reduce + dq/dcand partial-sum exchanges",
    )
    # token-table row grads: [U, d] f32 contributions from every chip's
    # rows; the UPDATE is scatter-issue-bound (measured, not rooflined:
    # RESULTS round-5 lever audit).  The entity token table is row-sharded
    # over `model` (parallel/sharding.py), so its update partitions /M;
    # the relation table is replicated (identical update on every chip).
    token_coll = (U_ent + U_rel) * d * f32 * (2 * (chips - 1) / chips)
    ent_frac = U_ent / (U_ent + U_rel)
    update_ms = args.update_ms * (
        ent_frac / (Mp if Mp > 1 else 1) + (1 - ent_frac)
    )
    phase(
        "token_table_grads+updates",
        0,
        0,
        coll=token_coll,
        note=f"U={U_ent}+{U_rel} touched rows; measured scatter-issue cost",
    )
    phases["token_table_grads+updates"]["measured_ms"] = round(update_ms, 3)
    # row-elementwise tail (BN, dropout, sorts, gathers) shards with rows
    phase("elementwise_tail", 0, 0,
          note=f"measured {args.elementwise_ms} ms at 1 chip, shards over data")
    phases["elementwise_tail"]["measured_ms"] = round(args.elementwise_ms / Dp, 3)

    kind, (peak_tf, peak_gbs) = bench.chip_peaks()
    if peak_tf is None:
        kind, peak_tf, peak_gbs = "v5e (assumed)", 197.0, 819.0
    ici_gbs = args.ici_gbs

    def phase_time(p):
        t_comp = p["flops_per_chip"] / (peak_tf * 1e12 * args.mfu)
        t_hbm = p["hbm_bytes_per_chip"] / (peak_gbs * 1e9)
        t_coll = p["collective_bytes_per_chip"] / (ici_gbs * 1e9)
        return max(t_comp, t_hbm, p.get("measured_ms", 0.0) / 1e3) + t_coll

    times = {k: phase_time(p) for k, p in phases.items()}
    # fixed per-step overhead that does not shard (sorts, converts, BN,
    # dropout, dispatch) — taken from the measured 1-chip decomposition
    t_fixed = args.fixed_overhead_ms / 1e3
    t_step = sum(times.values()) + t_fixed

    # 1-chip reference through the same model
    one = dict(args.__dict__)
    one_args = argparse.Namespace(**one)
    one_args.data, one_args.model = 1, 1
    if chips > 1:
        ref = analytic_model(one_args)
        t1 = ref["modeled_step_ms"] / 1e3
        eff = t1 / (t_step * chips)
    else:
        t1, eff = t_step, 1.0

    return {
        "mesh": {"data": Dp, "model": Mp, "chips": chips},
        "chip": kind,
        "peaks": {"tflops": peak_tf, "hbm_gbs": peak_gbs, "ici_gbs": ici_gbs},
        "phases": phases,
        "phase_ms": {k: round(v * 1e3, 3) for k, v in times.items()},
        "fixed_overhead_ms": args.fixed_overhead_ms,
        "modeled_step_ms": round(t_step * 1e3, 3),
        "modeled_items_per_sec": round(args.positives / t_step),
        "strong_scaling_efficiency_vs_1chip": round(eff, 3),
    }


# --------------------------------------------------------------- HLO sweep


def hlo_sweep() -> dict:
    """Compile the sparse PLANNED flagship-path step on pure-DP CPU meshes
    and read per-shard candidate-encode row counts off the partitioned HLO."""
    import jax

    # the container's sitecustomize force-registers the axon TPU backend and
    # the JAX_PLATFORMS env var alone is not honored — always pin cpu here
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        train_batch_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )
    from __graft_entry__ import _synthetic_meta

    rng = np.random.default_rng(0)
    meta = _synthetic_meta(entities=512, relations=64, ent_tokens=256, rel_tokens=64, max_len=6)
    B, N = 32, 256
    model = build_model(
        "LSTMComplexRelationModel", meta, entity_slot_size=32, init_std=0.1,
        sparse=True,
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    raw = Batch(
        ent_ids=rng.integers(2, meta.entities_size, B).astype(np.int32),
        rel_ids=rng.integers(2, meta.relations_size, B).astype(np.int32),
        is_sp=(np.arange(B) % 2 == 0), row_valid=np.ones(B, bool), num_rows=B,
        candidate_ids=rng.choice(
            np.arange(2, meta.entities_size, dtype=np.int32), N, replace=False
        ),
        col_valid=np.ones(N, bool), num_cols=N, cand_offset=2,
        pos_rows=np.arange(B, dtype=np.int32),
        pos_cols=rng.integers(0, N, B).astype(np.int32),
        normalizer_loss=float(B * N),
    )
    # host snapshots: the step donates its inputs, so each mesh iteration
    # rebuilds fresh device placements
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)
    planner = SparsePlanBuilder(model.embedder, entity_sparse=True, min_rows_ratio=0.0)
    planned = planner(raw)
    assert any(k.startswith("sparse/plan/") for k in planned), "grad plan inactive"
    rows_total = planned["sparse/buffers/entity_token_ids"].shape[0]  # B + N

    out = {"B": B, "N": N, "encode_rows_total": int(rows_total), "sweep": []}
    losses = {}
    n_dev = len(jax.devices())
    for D in (1, 2, 4, 8):
        if D > n_dev:
            break
        mesh = make_mesh(data=D, model=1)
        # mesh-aware encode regions + per-shard plans — the production
        # mesh configuration (trainer wires the same pair)
        model.set_mesh(mesh if D > 1 else None)
        mesh_planner = SparsePlanBuilder(
            model.embedder, entity_sparse=True, min_rows_ratio=0.0,
            mesh=mesh if D > 1 else None,
        )
        planned_d = mesh_planner(raw)
        try:
            var_sh = variables_shardings(variables, mesh)
            vs = jax.device_put(jax.tree_util.tree_map(jnp.asarray, host_vars), var_sh)
            os_ = jax.device_put(
                jax.tree_util.tree_map(jnp.asarray, host_opt),
                opt_state_shardings(opt_state, var_sh, mesh),
            )
            bsh = train_batch_shardings(planned_d, mesh)
            bs = {k: jax.device_put(np.asarray(v), bsh[k]) for k, v in planned_d.items()}
            step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
            compiled = step.lower(vs, os_, hp, bs, jax.random.key(3)).compile()
            hlo = compiled.as_text()
            _, _, st = step(vs, os_, hp, bs, jax.random.key(3))
            losses[D] = float(st["loss_sum"])
        finally:
            model.set_mesh(None)
        # the candidate+query LSTM input projection [L, rows, 4H]: find the
        # per-shard row count of the largest such tensor in the module
        rows = sorted(
            {int(m) for m in re.findall(r"f32\[6,(\d+),128\]", hlo)}, reverse=True
        )
        rows2d = sorted(
            {int(m) for m in re.findall(r"f32\[(\d+),128\]", hlo)}, reverse=True
        )
        out["sweep"].append({
            "data_parallel": D,
            "encode_xproj_rows_per_shard": rows[0] if rows else None,
            "all_xproj_row_counts": rows,
            "all_2d_row_counts_x128": rows2d[:8],
        })
    # losses identical across meshes (same global program)
    base = losses[1]
    for D, l in losses.items():
        assert abs(l - base) < 1e-3 * abs(base), (D, l, base)
    out["loss_equal_across_meshes"] = True
    # per-shard encode rows must shrink ~ as 1/D (the candidate axis is
    # N/D; the query axis B/D — together (B+N)/D up to sort padding)
    r1 = out["sweep"][0]["encode_xproj_rows_per_shard"]
    shrink = all(
        row["encode_xproj_rows_per_shard"] is not None
        and row["encode_xproj_rows_per_shard"]
        <= -(-r1 // row["data_parallel"]) * 1.5
        for row in out["sweep"][1:]
    )
    out["rows_shrink_as_inverse_D"] = shrink
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo-sweep", action="store_true")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: global batch (and candidate set) "
                    "grow with the data axis, per-chip rows stay constant — "
                    "the production deployment pattern; throughput reported "
                    "for the scaled global batch")
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--model", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--cands", type=int, default=4096)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--max-len", type=int, default=10)
    ap.add_argument("--ent-tokens-executed", type=int, default=37071)
    ap.add_argument("--rel-tokens-executed", type=int, default=18245)
    ap.add_argument("--u-ent", type=int, default=4096)
    ap.add_argument("--u-rel", type=int, default=2048)
    ap.add_argument("--positives", type=int, default=4381)  # bench P_real
    ap.add_argument("--ici-gbs", type=float, default=90.0)
    ap.add_argument("--mfu", type=float, default=0.6,
                    help="achievable fraction of peak on the LSTM/matmul phases")
    ap.add_argument("--update-ms", type=float, default=0.9,
                    help="measured 1-chip cost of the 2-table row-scatter "
                    "update pair (scatter-issue-bound)")
    ap.add_argument("--elementwise-ms", type=float, default=1.5,
                    help="measured 1-chip BN/dropout/sort/gather tail "
                    "(row-elementwise, shards over data)")
    ap.add_argument("--no-dedup", action="store_true",
                    help="model the pre-dedup path (per-row query encodes)")
    ap.add_argument("--fixed-overhead-ms", type=float, default=0.4,
                    help="genuinely non-sharding residual (dispatch, scalar "
                    "work); excludes the modeled phases")
    args = ap.parse_args()
    args.dedup = not args.no_dedup
    if args.hlo_sweep:
        print(json.dumps(hlo_sweep(), indent=1))
        return
    if args.weak:
        args.batch *= args.data
        args.cands *= args.data
        args.positives *= args.data
        # executed-token stats are per 1x batch; rows grew with data
        args.ent_tokens_executed *= args.data
        args.rel_tokens_executed *= args.data
    out = analytic_model(args)
    if args.weak and args.data * args.model > 1:
        # weak efficiency: per-chip time vs the 1-chip step on the 1x batch
        base = dict(args.__dict__)
        base.update(data=1, model=1,
                    batch=args.batch // args.data,
                    cands=args.cands // args.data,
                    positives=args.positives // args.data,
                    ent_tokens_executed=args.ent_tokens_executed // args.data,
                    rel_tokens_executed=args.rel_tokens_executed // args.data)
        t1 = analytic_model(argparse.Namespace(**base))["modeled_step_ms"]
        out["weak_scaling_efficiency_vs_1chip"] = round(
            t1 / out["modeled_step_ms"], 3)
        del out["strong_scaling_efficiency_vs_1chip"]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
