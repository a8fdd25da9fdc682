"""Multi-step scan dispatch (train/step.make_scanned_step): K steps folded
into one ``lax.scan`` program must produce the SAME trajectory as K
sequential single-step dispatches — same batches, same per-step rng rows,
same update order.  Covers the dense step, the row-sparse planned step,
and the trainer integration (train_scan_steps config, window packing,
signature-mismatch / tail fallback to single steps)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
)
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train import (
    OptimizerRegimes,
    train_batch_to_arrays,
)
from open_knowledge_graph_embeddings_tpu.train.step import (
    make_scanned_step,
    make_train_step,
)


def _hp(regimes):
    return [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]


def _setup(toy_dataset_dir, name="LookupComplexRelationModel", **mkw):
    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt",
        is_training_data=True, batch_size=2,
    )
    model = build_model(name, ds.meta, **mkw)
    variables = model.init(jax.random.key(0))
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": 0.2})
    regimes.update(1, 0)
    return ds, model, variables, regimes


def _stack(batches):
    return {n: np.stack([np.asarray(b[n]) for b in batches]) for n in batches[0]}


def _assert_tree_close(got, want, atol, label):
    flat_g, _ = jax.tree_util.tree_flatten_with_path(got)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want)
    for (pg, g), (_, w) in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=0, atol=atol,
            err_msg=f"{label}: {jax.tree_util.keystr(pg)}",
        )


def test_scanned_dense_step_matches_sequential(toy_dataset_dir):
    ds, model, variables, regimes = _setup(
        toy_dataset_dir, entity_slot_size=8, init_std=0.1
    )
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(model, regimes, variables["params"])

    bb = BatchBuilder(ds, seed=3)
    batches = [train_batch_to_arrays(b) for b in bb.batches()][:4]
    assert len(batches) == 4
    keys = np.asarray(jax.random.key_data(jax.random.split(jax.random.key(7), 4)))

    # sequential reference trajectory
    v_ref = jax.tree_util.tree_map(jnp.array, variables)
    o_ref = jax.tree_util.tree_map(jnp.array, opt_state)
    losses_ref = []
    for b, kk in zip(batches, keys):
        v_ref, o_ref, st = step(v_ref, o_ref, _hp(regimes), b, kk)
        losses_ref.append(float(st["loss_sum"]))

    # one scanned dispatch
    scanned = make_scanned_step(step, 4)
    v, o, stats = scanned(
        jax.tree_util.tree_map(jnp.array, variables),
        jax.tree_util.tree_map(jnp.array, opt_state),
        _hp(regimes), _stack(batches), jnp.asarray(keys),
    )

    np.testing.assert_allclose(
        np.asarray(stats["loss_sum"]), np.asarray(losses_ref), rtol=1e-6,
        err_msg="per-step losses diverged",
    )
    _assert_tree_close(v, v_ref, 1e-6, "variables")
    _assert_tree_close(o, o_ref, 1e-6, "opt_state")


def test_scanned_sparse_step_matches_sequential(toy_dataset_dir):
    from open_knowledge_graph_embeddings_tpu.train.sparse import (
        SparsePlanBuilder,
        make_sparse_train_step,
    )

    ds, model, variables, regimes = _setup(
        toy_dataset_dir, entity_slot_size=8, init_std=0.1
    )
    opt_state = regimes.init_state(variables["params"])
    plan = SparsePlanBuilder(model.embedder, entity_sparse=False, min_rows_ratio=0.0)
    step = make_sparse_train_step(model, regimes, variables["params"], entity_sparse=False)

    bb = BatchBuilder(ds, seed=5)
    batches = [plan(b) for b in bb.batches()][:3]
    sigs = {tuple(sorted(b)) for b in batches}
    assert len(sigs) == 1, "toy batches should share one sparse signature"
    keys = np.asarray(jax.random.key_data(jax.random.split(jax.random.key(11), 3)))

    v_ref = jax.tree_util.tree_map(jnp.array, variables)
    o_ref = jax.tree_util.tree_map(jnp.array, opt_state)
    for b, kk in zip(batches, keys):
        v_ref, o_ref, _ = step(v_ref, o_ref, _hp(regimes), b, kk)

    scanned = make_scanned_step(step, 3)
    v, o, _ = scanned(
        jax.tree_util.tree_map(jnp.array, variables),
        jax.tree_util.tree_map(jnp.array, opt_state),
        _hp(regimes), _stack(batches), jnp.asarray(keys),
    )
    _assert_tree_close(v, v_ref, 1e-6, "variables")
    _assert_tree_close(o, o_ref, 1e-6, "opt_state")


def _run_toy_training(toy_dataset_dir, tmp_path, tag, scan_steps):
    from open_knowledge_graph_embeddings_tpu.cli.train import main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    exp = str(tmp_path / tag)
    args = load_config()
    args.update(
        dataset_dir=toy_dataset_dir,
        experiment_dir=exp,
        epochs=3, batch_size=2,
        eval_epoch_freq=0, eval_freq=-1, save_epoch_freq=1, print_freq=100,
        model="LookupComplexRelationModel",
        model_config={"entity_slot_size": 8, "init_std": 0.1},
        optimization_config={"optimizer": "Adagrad", "lr": 0.3},
        train_data_config={"input_file": "train.txt", "batch_size": 2,
                           "use_batch_shared_entities": False},
        val_data_config={"input_file": "valid.txt", "batch_size": 2,
                         "use_batch_shared_entities": False},
        test_data_config={"input_file": "test.txt", "batch_size": 2,
                          "use_batch_shared_entities": False},
        seed=17,
        workers=1,
        use_mesh=False,  # the 8-device CPU test env would gate scan mode off
        train_scan_steps=scan_steps,
    )
    trainer = main(args)
    return {
        k: np.asarray(v) for k, v in trainer.variables["params"].items()
    }, trainer


def test_trainer_scan_steps_matches_single_step(toy_dataset_dir, tmp_path):
    """Full trainer run, train_scan_steps=3 vs 1 (same seed): the toy set
    has 4 train batches/epoch at batch_size 2, so each epoch packs one
    3-window plus a 1-batch tail flushed as a single step — exercising the
    window path, the fallback path, and the cadence bookkeeping.  Final
    checkpoints must match."""
    ref, _ = _run_toy_training(toy_dataset_dir, tmp_path, "seq", 1)
    win, trainer = _run_toy_training(toy_dataset_dir, tmp_path, "scan", 3)
    assert trainer.scan_steps == 3, "scan mode was gated off unexpectedly"
    assert set(ref) == set(win) and ref
    for k in sorted(ref):
        np.testing.assert_allclose(ref[k], win[k], rtol=0, atol=2e-6, err_msg=k)


def test_window_entries_producer_exits_on_early_consumer_exit():
    """Breaking out of the entry loop (error / early stop) must release the
    windowing thread — it would otherwise block forever on the full queue."""
    import threading
    import time as _time
    import types

    from open_knowledge_graph_embeddings_tpu.train.trainer import Trainer

    fake = types.SimpleNamespace(scan_steps=2, _put_batch=lambda a: a)

    def src():
        i = 0
        while True:  # endless stream of identical-signature batches
            i += 1
            yield object(), {"x": np.full((4,), i, np.int32)}

    gen = Trainer._window_entries(fake, src())
    first = next(gen)
    assert first[0] == "w" and len(first[1]) == 2
    n_before = threading.active_count()
    gen.close()  # triggers the finally: stop.set() + drain
    deadline = _time.time() + 5.0
    while threading.active_count() > n_before - 1 and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n_before - 1, (
        "window producer thread did not exit after consumer close"
    )
