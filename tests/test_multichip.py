"""Sharded execution on the virtual 8-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_forward_compiles():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_matches_single_device(toy_dataset_dir):
    """Same batch, same params: sharded step == single-device step."""
    from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        train_batch_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import (
        OptimizerRegimes,
        make_train_step,
        train_batch_to_arrays,
    )

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4, use_batch_shared_entities=True, min_size_batch_labels=8,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8, init_std=0.1)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    batch = train_batch_to_arrays(next(BatchBuilder(tds, seed=3).batches()))
    rng = jax.random.key(7)

    # host copies: the train step donates its inputs, so each call gets a
    # fresh device placement
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)

    v1, o1, s1 = step(
        jax.tree_util.tree_map(jnp.asarray, host_vars),
        jax.tree_util.tree_map(jnp.asarray, host_opt),
        hp, batch, rng,
    )
    loss_single = float(s1["loss_sum"])

    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    opt_sh = opt_state_shardings(opt_state, var_sh, mesh)
    vs = jax.device_put(jax.tree_util.tree_map(jnp.asarray, host_vars), var_sh)
    os_ = jax.device_put(jax.tree_util.tree_map(jnp.asarray, host_opt), opt_sh)
    bs = jax.device_put(batch, train_batch_shardings(batch, mesh))
    step2 = make_train_step(model, regimes, variables["params"])
    v2, o2, s2 = step2(vs, os_, hp, bs, rng)
    loss_sharded = float(s2["loss_sum"])

    assert loss_sharded == pytest.approx(loss_single, rel=1e-5)
    # updated entity tables agree
    np.testing.assert_allclose(
        np.asarray(v1["params"]["entity_embedding"]),
        np.asarray(v2["params"]["entity_embedding"]),
        rtol=1e-5, atol=1e-6,
    )


def test_dp_candidate_encode_sharding():
    """Pure-DP meshes (model=1): the candidate encode shards over the data
    axis (model.set_dp_candidate_sharding) — step outputs stay equal to the
    single-device step, and per-device compiled FLOPs genuinely SHRINK
    versus the replicated candidate encode (the strong-scaling floor from
    RESULTS.md "Replicated-collate headroom")."""
    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        train_batch_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import (
        OptimizerRegimes,
        make_train_step,
        train_batch_to_arrays,
    )
    from __graft_entry__ import _synthetic_meta

    rng_np = np.random.default_rng(0)
    meta = _synthetic_meta(entities=512, relations=32, ent_tokens=128, rel_tokens=32, max_len=6)
    B, N = 24, 256  # B chosen so candidate/entity encode shapes are distinct
    ent = rng_np.integers(2, meta.entities_size, B).astype(np.int32)
    rel = rng_np.integers(2, meta.relations_size, B).astype(np.int32)
    cand = rng_np.choice(np.arange(2, meta.entities_size, dtype=np.int32), N, replace=False)
    P = 32
    pos_rows = np.arange(P, dtype=np.int32) % B
    pos_cols = rng_np.integers(0, N, P).astype(np.int32)
    batch = train_batch_to_arrays(Batch(
        ent_ids=ent, rel_ids=rel, is_sp=(np.arange(B) % 2 == 0),
        row_valid=np.ones(B, bool), num_rows=B,
        candidate_ids=cand, col_valid=np.ones(N, bool), num_cols=N,
        cand_offset=meta.min_entities_size,
        pos_rows=pos_rows, pos_cols=pos_cols, normalizer_loss=float(B * N),
    ))

    model = build_model("LSTMComplexRelationModel", meta, entity_slot_size=32, init_std=0.1)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    rng = jax.random.key(7)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)

    fresh = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    step0 = make_train_step(model, regimes, variables["params"])
    v1, _, s1 = step0(fresh(host_vars), fresh(host_opt), hp, batch, rng)
    loss_single = float(s1["loss_sum"])

    mesh = make_mesh(data=8, model=1)

    def run(dp_sharded):
        model.set_dp_candidate_sharding(mesh if dp_sharded else None)
        try:
            var_sh = variables_shardings(variables, mesh)
            vs = jax.device_put(fresh(host_vars), var_sh)
            os_ = jax.device_put(fresh(host_opt), opt_state_shardings(opt_state, var_sh, mesh))
            bsh = train_batch_shardings(batch, mesh)
            if not dp_sharded:
                # replicated-candidate baseline: pin the ids replicated so
                # GSPMD cannot opportunistically shard the encode
                from jax.sharding import NamedSharding, PartitionSpec
                bsh = dict(bsh)
                bsh["candidate_ids"] = NamedSharding(mesh, PartitionSpec())
                bsh["col_valid"] = NamedSharding(mesh, PartitionSpec())
            bs = jax.device_put(batch, bsh)
            step = make_train_step(model, regimes, variables["params"])
            compiled = step.lower(vs, os_, hp, bs, rng).compile()
            v, _, s = step(vs, os_, hp, bs, rng)
            return (
                float(s["loss_sum"]),
                np.asarray(v["params"]["entity_token_embedding"]),
                compiled.as_text(),
            )
        finally:
            model.set_dp_candidate_sharding(None)

    loss_dp, tbl_dp, hlo_dp = run(dp_sharded=True)

    assert loss_dp == pytest.approx(loss_single, rel=1e-4)
    np.testing.assert_allclose(
        tbl_dp, np.asarray(v1["params"]["entity_token_embedding"]), rtol=1e-4, atol=1e-5
    )
    # per-device work, read off the partitioned HLO: the candidate LSTM
    # input projection [L=6, N, 4H=128] must appear at its per-shard row
    # count N/8 = 32, and the FULL 256-row projection must not exist
    # anywhere — i.e. no device encodes the whole candidate set
    assert "f32[6,32,128]" in hlo_dp, "sharded candidate x_proj missing"
    assert "f32[6,256,128]" not in hlo_dp, "full candidate x_proj still materialized"


def test_sharded_checkpoint_roundtrip(toy_dataset_dir, tmp_path):
    """Per-shard checkpoint format: chunks written per replica-0 shard over
    a 4x2 mesh reassemble bit-equal through make_array_from_callback, on the
    same mesh, a different mesh, and an unsharded target."""
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.checkpoint import (
        load_checkpoint,
        local_checkpoint_chunks,
        gather_local_shard_tree,
        write_shard_slab,
    )
    import json
    import os

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])

    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    vs = jax.device_put(variables, var_sh)
    os_ = jax.device_put(opt_state, opt_state_shardings(opt_state, var_sh, mesh))

    # single process owns every replica-0 shard -> one slab covers all
    ckpt = tmp_path / "ck"
    os.makedirs(ckpt)
    chunks, index = local_checkpoint_chunks(gather_local_shard_tree(vs, os_))
    # sharded leaves really produce multiple chunks (not a full-array dump)
    assert any(len(v["chunks"]) > 1 for v in index.values())
    write_shard_slab(str(ckpt), 0, chunks, index)
    with open(ckpt / "meta.json", "w") as f:
        json.dump({"training_steps": 5}, f)

    def check(target_vars, target_opt):
        nv, no, meta = load_checkpoint(str(ckpt), target_vars, target_opt)
        assert meta["training_steps"] == 5
        for k, want in host_params.items():
            np.testing.assert_array_equal(np.asarray(nv["params"][k]), want, err_msg=k)
        return nv

    # same mesh target: shards reassemble in place
    nv = check(vs, os_)
    assert nv["params"]["entity_embedding"].sharding == var_sh["params"]["entity_embedding"]
    # different mesh target: regions re-cut across chunk boundaries
    mesh2 = make_mesh(data=8, model=1)
    var_sh2 = variables_shardings(variables, mesh2)
    vs2 = jax.device_put(variables, var_sh2)
    os2 = jax.device_put(opt_state, opt_state_shardings(opt_state, var_sh2, mesh2))
    check(vs2, os2)
    # unsharded target: full assembly from chunks
    check(
        jax.tree_util.tree_map(jnp.asarray, jax.tree_util.tree_map(np.asarray, vs)),
        jax.tree_util.tree_map(jnp.asarray, jax.tree_util.tree_map(np.asarray, os_)),
    )


def test_sparse_grad_plan_on_mesh():
    """The gather-sum grad-plan sparse step composes with device meshes:
    on a 4x2 data x model mesh, planned sparse == plan-less sparse == dense
    (GSPMD programs are global, so the host plan's global time-major
    positions match the in-jit global length sort)."""
    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )
    from open_knowledge_graph_embeddings_tpu.train.step import (
        make_train_step,
        train_batch_to_arrays,
    )
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        train_batch_shardings,
        variables_shardings,
    )
    from __graft_entry__ import _synthetic_meta

    rng = np.random.default_rng(0)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    model = build_model(
        "LSTMComplexRelationModel", meta, entity_slot_size=16, init_std=0.1, dropout=0.0
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    B, N = 16, 32

    def mk_batch():
        ent = rng.integers(2, meta.entities_size, B).astype(np.int32)
        rel = rng.integers(2, meta.relations_size, B).astype(np.int32)
        cand = rng.choice(np.arange(2, meta.entities_size, dtype=np.int32), N, replace=False)
        P = 32
        pos_rows = np.full(P, -1, np.int32)
        pos_cols = np.full(P, -1, np.int32)
        pos_rows[:B] = np.arange(B)
        pos_cols[:B] = rng.integers(0, 16, B)
        return Batch(
            ent_ids=ent, rel_ids=rel, is_sp=(np.arange(B) % 2 == 0),
            row_valid=np.ones(B, bool), num_rows=B, candidate_ids=cand,
            col_valid=np.ones(N, bool), num_cols=N, cand_offset=2,
            pos_rows=pos_rows, pos_cols=pos_cols, normalizer_loss=float(B * N),
        )

    batches = [mk_batch() for _ in range(3)]
    mesh = make_mesh(data=4, model=2)

    def run(step_fn, planner):
        vs = jax.tree_util.tree_map(jnp.copy, variables)
        var_sh = variables_shardings(vs, mesh)
        vs = jax.device_put(vs, var_sh)
        opt = regimes.init_state(vs["params"])
        opt = jax.device_put(opt, opt_state_shardings(opt, var_sh, mesh))
        for i, b in enumerate(batches):
            arrs = planner(b)
            sh = train_batch_shardings(arrs, mesh)
            arrs = {k: jax.device_put(np.asarray(v), sh[k]) for k, v in arrs.items()}
            vs, opt, st = step_fn(vs, opt, hp, arrs, jax.random.key(100 + i))
        return jax.tree_util.tree_map(np.asarray, vs["params"]), float(st["loss_sum"])

    dense, loss_d = run(make_train_step(model, regimes, variables["params"]),
                        train_batch_to_arrays)
    sparse_step = make_sparse_train_step(
        model, regimes, variables["params"], entity_sparse=True
    )
    plan_off, loss_off = run(
        sparse_step,
        SparsePlanBuilder(model.embedder, True, min_rows_ratio=0.0, grad_plan=False),
    )
    plan_on, loss_on = run(
        sparse_step,
        SparsePlanBuilder(model.embedder, True, min_rows_ratio=0.0, grad_plan=True),
    )
    # mesh-mode: split-encode shard_map regions + PER-SHARD plans (the
    # trainer's production mesh configuration, models/model.py set_mesh) —
    # every shard sorts and encodes only its row block
    # (tools/scaling_model.py --hlo-sweep pins the per-shard HLO shrink)
    model.set_mesh(mesh)
    try:
        mesh_mode, loss_mm = run(
            make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True),
            SparsePlanBuilder(model.embedder, True, min_rows_ratio=0.0,
                              grad_plan=True, mesh=mesh),
        )
    finally:
        model.set_mesh(None)

    assert abs(loss_d - loss_off) < 1e-3 and abs(loss_d - loss_on) < 1e-3
    assert abs(loss_d - loss_mm) < 1e-3
    flat_d = dict(jax.tree_util.tree_flatten_with_path(dense)[0])
    for other, atol in ((plan_off, 1e-5), (plan_on, 1e-5), (mesh_mode, 1e-4)):
        flat_o = dict(jax.tree_util.tree_flatten_with_path(other)[0])
        for kp, leaf in flat_d.items():
            # atol floor: gather-sum slot order vs dense scatter order
            # (see tests/test_sparse.py::test_sparse_matches_dense); the
            # per-shard regions additionally reorder the psum of the
            # replicated inputs' cotangents
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_o[kp]), rtol=2e-5, atol=atol,
                err_msg=str(kp),
            )


def test_sharded_checkpoint_cross_rank_entry_names(toy_dataset_dir, tmp_path):
    """One key's replica-0 shards written by two different ranks: entry
    names ('key::i') restart at 0 in every rank's slab, so chunk lookup must
    be keyed by (slab, entry) — a global entry->slab map restores a 2-rank
    table [A;B] as [B;B]."""
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.checkpoint import (
        load_checkpoint,
        local_checkpoint_chunks,
        gather_local_shard_tree,
        write_shard_slab,
    )
    import json
    import os

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8)
    variables = model.init(jax.random.key(4))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])

    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    vs = jax.device_put(variables, var_sh)
    os_ = jax.device_put(opt_state, opt_state_shardings(opt_state, var_sh, mesh))

    chunks, index = local_checkpoint_chunks(gather_local_shard_tree(vs, os_))
    multi = [k for k, v in index.items() if len(v["chunks"]) > 1]
    assert multi, "need at least one multi-chunk key for this test"

    # Simulate 2 processes: split every multi-chunk key's chunks between two
    # ranks, renumbering entries per rank so both slabs contain 'key::0'.
    slabs = [({}, {}), ({}, {})]  # (chunks, index) per rank
    for key, info in index.items():
        parts = info["chunks"]
        cut = (len(parts) + 1) // 2 if len(parts) > 1 else len(parts)
        for rank, sub in ((0, parts[:cut]), (1, parts[cut:])):
            if not sub:
                continue
            rchunks, ridx = slabs[rank]
            entry_list = []
            for i, c in enumerate(sub):
                entry = f"{key}::{i}"  # per-rank numbering, collides across ranks
                rchunks[entry] = chunks[c["entry"]]
                entry_list.append({"entry": entry, "start": c["start"], "stop": c["stop"]})
            ridx[key] = {"shape": info["shape"], "dtype": info["dtype"], "chunks": entry_list}

    ckpt = tmp_path / "ck2"
    os.makedirs(ckpt)
    for rank, (rchunks, ridx) in enumerate(slabs):
        write_shard_slab(str(ckpt), rank, rchunks, ridx)
    with open(ckpt / "meta.json", "w") as f:
        json.dump({"training_steps": 7}, f)

    # unsharded target: every region must come from the correct rank's slab
    target = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), vs
    )
    topt = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), os_)
    nv, _, meta = load_checkpoint(str(ckpt), target, topt)
    assert meta["training_steps"] == 7
    for k, want in host_params.items():
        np.testing.assert_array_equal(np.asarray(nv["params"][k]), want, err_msg=k)


def test_sharded_checkpoint_resume_filter_and_weight_map(toy_dataset_dir, tmp_path):
    """Partial loads work against the per-shard format: resume_filter keeps
    unlisted params untouched, weight_map renames checkpoint keys."""
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.checkpoint import (
        CheckpointManager,
        load_checkpoint,
    )

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8)
    variables = model.init(jax.random.key(2))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    vs = jax.device_put(variables, var_sh)
    os_ = jax.device_put(opt_state, opt_state_shardings(opt_state, var_sh, mesh))

    mgr = CheckpointManager(str(tmp_path / "exp"))
    path = mgr.save_sharded(vs, os_, {"training_steps": 1}, rank=0, barrier=lambda tag: None)
    mgr.wait_finalized()  # slab write + finalize run on the writer thread

    # fresh target with different values
    fresh = model.init(jax.random.key(9))
    fresh_opt = regimes.init_state(fresh["params"])
    nv, _, _ = load_checkpoint(
        path, fresh, fresh_opt, resume_filter=["relation_embedding"],
        load_optimizer=False,
    )
    np.testing.assert_array_equal(
        np.asarray(nv["params"]["relation_embedding"]),
        np.asarray(vs["params"]["relation_embedding"]),
    )
    np.testing.assert_array_equal(  # filtered out -> fresh values kept
        np.asarray(nv["params"]["entity_embedding"]),
        np.asarray(fresh["params"]["entity_embedding"]),
    )

    # weight_map rename: a checkpoint key mapped to a name the target does
    # not have is simply not restored (strict=False semantics); unrenamed
    # keys load normally
    nv2, _, _ = load_checkpoint(
        path, fresh, fresh_opt,
        weight_map={"params/relation_embedding": "params/renamed_away"},
        load_optimizer=False,
    )
    np.testing.assert_array_equal(
        np.asarray(nv2["params"]["relation_embedding"]),
        np.asarray(fresh["params"]["relation_embedding"]),
    )
    np.testing.assert_array_equal(
        np.asarray(nv2["params"]["entity_embedding"]),
        np.asarray(vs["params"]["entity_embedding"]),
    )


def test_checkpoint_manager_save_sharded_single_rank(toy_dataset_dir, tmp_path):
    """save_sharded end-to-end with rank 0 only (barrier injected):
    rotation dir structure, meta.json marker, and load parity."""
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.checkpoint import (
        CheckpointManager,
        load_checkpoint,
    )
    import os

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    model = build_model("LookupComplexRelationModel", tds.meta, entity_slot_size=8)
    variables = model.init(jax.random.key(1))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    vs = jax.device_put(variables, var_sh)
    os_ = jax.device_put(opt_state, opt_state_shardings(opt_state, var_sh, mesh))

    mgr = CheckpointManager(str(tmp_path / "exp"), keep_checkpoints=2)
    barriers = []
    path = mgr.save_sharded(
        vs, os_, {"training_steps": 3}, rank=0, barrier=barriers.append
    )
    assert len(barriers) == 1  # only the dir barrier runs on the main thread
    mgr.wait_finalized()  # slab write + finalize run on the writer thread
    assert os.path.exists(os.path.join(path, "arrays.p0.npz"))
    assert os.path.exists(os.path.join(path, "index.p0.json"))
    assert os.path.exists(os.path.join(path, "meta.json"))
    assert not os.path.exists(os.path.join(path, "arrays.npz"))
    nv, no, meta = load_checkpoint(path, vs, os_)
    assert meta["training_steps"] == 3
    np.testing.assert_array_equal(
        np.asarray(nv["params"]["entity_embedding"]),
        np.asarray(vs["params"]["entity_embedding"]),
    )


def test_sharded_eval_matches_single_device(toy_dataset_dir):
    from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import make_mesh, variables_shardings
    from open_knowledge_graph_embeddings_tpu.train import eval_batch_to_arrays, make_eval_step

    vds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="valid.txt", is_training_data=False, batch_size=4
    )
    vds.attach_filter_index("train.txt", "valid.txt", "test.txt")
    model = build_model("LookupComplexRelationModel", vds.meta, entity_slot_size=8, init_std=0.1)
    variables = model.init(jax.random.key(0))
    eval_step = make_eval_step(model)
    batch = eval_batch_to_arrays(next(BatchBuilder(vds).batches()))

    single = np.asarray(eval_step(variables, batch))

    mesh = make_mesh(data=4, model=2)
    vs = jax.device_put(variables, variables_shardings(variables, mesh))
    sharded = np.asarray(make_eval_step(model)(vs, batch))
    np.testing.assert_allclose(single, sharded, rtol=1e-5, atol=1e-5)


def test_cli_trains_on_mesh(toy_dataset_dir, tmp_path):
    """use_mesh + model_parallel through the CLI: trains sharded over the
    8-device CPU mesh with the tables split over the model axis."""
    from open_knowledge_graph_embeddings_tpu.cli.train import main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    args = load_config()
    args.update(
        dataset_dir=toy_dataset_dir,
        experiment_dir=str(tmp_path / "exp"),
        epochs=4, batch_size=4, eval_epoch_freq=2, eval_freq=-1,
        save_epoch_freq=100, print_freq=100,
        use_mesh=True, model_parallel=2,
        model="LookupComplexRelationModel",
        model_config={"entity_slot_size": 8, "init_std": 0.1},
        optimization_config={"optimizer": "Adagrad", "lr": 0.3},
        train_data_config={"input_file": "train.txt", "batch_size": 4,
                           "use_batch_shared_entities": False},
        val_data_config={"input_file": "valid.txt", "batch_size": 4,
                         "use_batch_shared_entities": False},
        test_data_config={"input_file": "test.txt", "batch_size": 4,
                          "use_batch_shared_entities": False},
    )
    trainer = main(args)
    assert trainer.mesh is not None and dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    # entity table really is sharded over the model axis
    sh = trainer.variables["params"]["entity_embedding"].sharding
    assert "model" in str(sh.spec)
    assert trainer.training_steps > 0


def test_sparse_step_matches_single_device_on_mesh(toy_dataset_dir):
    """Row-sparse train step under GSPMD mesh sharding == single-device
    sparse step (sharded tables + scatter row updates; the north-star's
    'sparse gradient scatter into sharded tables' composition)."""
    from open_knowledge_graph_embeddings_tpu.data import (
        BatchBuilder,
        OneToNMentionRelationDataset,
    )
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        variables_shardings,
    )
    from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )

    tds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4, use_batch_shared_entities=True, min_size_batch_labels=8,
    )
    model = build_model(
        "LookupComplexRelationModel", tds.meta, entity_slot_size=8, init_std=0.1,
        sparse=True,
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.1})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    # min_rows_ratio=0: force the sparse plan on the tiny toy tables
    plan = SparsePlanBuilder(model.embedder, entity_sparse=True, min_rows_ratio=0.0)
    step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    batch = plan(next(BatchBuilder(tds, seed=3).batches()))
    assert any(k.startswith("sparse/") for k in batch), "plan did not sparsify"
    rng = jax.random.key(7)

    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    host_opt = jax.tree_util.tree_map(np.asarray, opt_state)

    v1, o1, s1 = step(
        jax.tree_util.tree_map(jnp.asarray, host_vars),
        jax.tree_util.tree_map(jnp.asarray, host_opt),
        hp, batch, rng,
    )
    loss_single = float(s1["loss_sum"])

    mesh = make_mesh(data=4, model=2)
    var_sh = variables_shardings(variables, mesh)
    opt_sh = opt_state_shardings(opt_state, var_sh, mesh)
    vs = jax.device_put(jax.tree_util.tree_map(jnp.asarray, host_vars), var_sh)
    os_ = jax.device_put(jax.tree_util.tree_map(jnp.asarray, host_opt), opt_sh)
    step2 = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True)
    v2, o2, s2 = step2(vs, os_, hp, batch, rng)
    assert float(s2["loss_sum"]) == pytest.approx(loss_single, rel=1e-5)
    for t in ("entity_embedding", "relation_embedding"):
        np.testing.assert_allclose(
            np.asarray(v1["params"][t]), np.asarray(v2["params"][t]),
            rtol=1e-5, atol=1e-6, err_msg=t,
        )
        np.testing.assert_allclose(
            np.asarray(o1[t]["sum"]), np.asarray(o2[t]["sum"]),
            rtol=1e-5, atol=1e-6, err_msg=f"{t} accumulator",
        )


def test_encode_all_entities_mesh_cache_key(toy_dataset_dir):
    """The compiled-encoder cache must key on mesh identity DATA: a dead
    mesh's id() can be reused by a new object at the same address, which
    previously served a stale-mesh program.  Same-shape same-device meshes
    share an entry; different devices must not."""
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset
    from open_knowledge_graph_embeddings_tpu.models import build_model
    from open_knowledge_graph_embeddings_tpu.parallel import make_mesh, variables_shardings

    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    model = build_model(
        "LookupComplexRelationModel", ds.meta, entity_slot_size=8, init_std=0.1
    )
    variables = model.init(jax.random.key(0))

    devs = jax.devices()
    mesh_a = make_mesh(data=1, model=2, devices=devs[:2])
    va = jax.device_put(variables, variables_shardings(variables, mesh_a))
    out_a = np.asarray(model.encode_all_entities(va, mesh=mesh_a))
    keys_after_a = set(model._jit_cache)

    # rebuild an identical mesh: same identity data -> same cache entry
    mesh_a2 = make_mesh(data=1, model=2, devices=devs[:2])
    out_a2 = np.asarray(model.encode_all_entities(va, mesh=mesh_a2))
    assert set(model._jit_cache) == keys_after_a
    np.testing.assert_allclose(out_a, out_a2)

    # same shape, DIFFERENT devices -> must be a distinct program
    mesh_b = make_mesh(data=1, model=2, devices=devs[2:4])
    vb = jax.device_put(variables, variables_shardings(variables, mesh_b))
    out_b = np.asarray(model.encode_all_entities(vb, mesh=mesh_b))
    assert len(model._jit_cache) == len(keys_after_a) + 1
    np.testing.assert_allclose(out_a, out_b, rtol=1e-6)


def test_sparse_dedup_on_mesh_matches_dense():
    """Query dedup composes with meshes: per-DATA-shard unique lists (inv
    globalized as shard*S + local) through the shard_map encode regions
    must match the dense mesh step on duplicate-heavy batches."""
    from open_knowledge_graph_embeddings_tpu.data.batching import Batch
    from open_knowledge_graph_embeddings_tpu.models.model import build_model
    from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )
    from open_knowledge_graph_embeddings_tpu.train.step import (
        make_train_step,
        train_batch_to_arrays,
    )
    from open_knowledge_graph_embeddings_tpu.parallel import (
        make_mesh,
        opt_state_shardings,
        train_batch_shardings,
        variables_shardings,
    )
    from __graft_entry__ import _synthetic_meta

    rng = np.random.default_rng(7)
    meta = _synthetic_meta(entities=64, relations=16, ent_tokens=48, rel_tokens=24, max_len=6)
    model = build_model(
        "LSTMComplexRelationModel", meta, entity_slot_size=16, init_std=0.1, dropout=0.0
    )
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "SGD", "lr": 0.5})
    regimes.update(1, 0)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    B, N = 16, 32

    def mk_dup_batch():
        # two distinct query entities / relations: every 4-row data-shard
        # block dedups to <= 2 unique rows (bucket 2 -> S=2, A*S=8 < 16)
        ent = rng.choice(np.asarray([2, 3], np.int32), B)
        rel = rng.choice(np.asarray([2, 3], np.int32), B)
        cand = rng.choice(np.arange(2, meta.entities_size, dtype=np.int32), N, replace=False)
        P = 32
        pos_rows = np.full(P, -1, np.int32)
        pos_cols = np.full(P, -1, np.int32)
        pos_rows[:B] = np.arange(B)
        pos_cols[:B] = rng.integers(0, 16, B)
        return Batch(
            ent_ids=ent, rel_ids=rel, is_sp=(np.arange(B) % 2 == 0),
            row_valid=np.ones(B, bool), num_rows=B, candidate_ids=cand,
            col_valid=np.ones(N, bool), num_cols=N, cand_offset=2,
            pos_rows=pos_rows, pos_cols=pos_cols, normalizer_loss=float(B * N),
        )

    batches = [mk_dup_batch() for _ in range(3)]
    mesh = make_mesh(data=4, model=2)

    def run(step_fn, planner, expect_dedup=False):
        vs = jax.tree_util.tree_map(jnp.copy, variables)
        var_sh = variables_shardings(vs, mesh)
        vs = jax.device_put(vs, var_sh)
        opt = regimes.init_state(vs["params"])
        opt = jax.device_put(opt, opt_state_shardings(opt, var_sh, mesh))
        for i, b in enumerate(batches):
            arrs = planner(b)
            if expect_dedup:
                assert "dedup/ent_inv" in arrs and "dedup/rel_inv" in arrs
                assert len(arrs["ent_ids"]) == 8  # 4 shards x S=2
            sh = train_batch_shardings(arrs, mesh)
            arrs = {k: jax.device_put(np.asarray(v), sh[k]) for k, v in arrs.items()}
            vs, opt, st = step_fn(vs, opt, hp, arrs, jax.random.key(100 + i))
        return jax.tree_util.tree_map(np.asarray, vs["params"]), float(st["loss_sum"])

    dense, loss_d = run(
        make_train_step(model, regimes, variables["params"]), train_batch_to_arrays
    )
    model.set_mesh(mesh)
    try:
        dd, loss_dd = run(
            make_sparse_train_step(model, regimes, variables["params"], entity_sparse=True),
            SparsePlanBuilder(model.embedder, True, min_rows_ratio=0.0,
                              grad_plan=True, mesh=mesh, dedup_bucket=2),
            expect_dedup=True,
        )
    finally:
        model.set_mesh(None)

    assert abs(loss_d - loss_dd) < 1e-3
    flat_d = dict(jax.tree_util.tree_flatten_with_path(dense)[0])
    flat_o = dict(jax.tree_util.tree_flatten_with_path(dd)[0])
    for kp, leaf in flat_d.items():
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_o[kp]), rtol=2e-5, atol=1e-4,
            err_msg=str(kp),
        )
