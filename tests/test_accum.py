"""Gradient accumulation: summed micro-batch grads == one combined update."""
import jax
import jax.numpy as jnp
import numpy as np

from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train import OptimizerRegimes, train_batch_to_arrays
from open_knowledge_graph_embeddings_tpu.train.step import make_accum_steps, make_train_step


def test_accum_two_microbatches_equals_summed_grad_step(toy_dataset_dir):
    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True, batch_size=4
    )
    model = build_model("LookupComplexRelationModel", ds.meta, entity_slot_size=8, init_std=0.1)
    variables0 = model.init(jax.random.key(0))
    host_vars = jax.tree_util.tree_map(np.asarray, variables0)
    regimes = OptimizerRegimes({"optimizer": "SGD", "lr": 0.1})
    regimes.update(1, 0)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    bb = BatchBuilder(ds, seed=0)
    batches = [train_batch_to_arrays(b) for b in bb.batches()]
    assert len(batches) >= 2
    b1, b2 = batches[0], batches[1]
    rng = jax.random.key(9)

    # accumulate grads over two micro-batches, then one apply
    zero, gstep, astep = make_accum_steps(model, regimes, variables0["params"])
    v = jax.tree_util.tree_map(jnp.asarray, host_vars)
    acc = zero()
    v, acc, _ = gstep(v, acc, b1, rng)
    v, acc, _ = gstep(v, acc, b2, rng)
    opt_state = regimes.init_state(variables0["params"])
    v, opt_state = astep(v, opt_state, acc, hp)

    # manual: grads of each micro-batch summed, single SGD update
    def grad_of(batch, variables):
        from open_knowledge_graph_embeddings_tpu.train.loss import one_vs_n_loss

        def loss_fn(params):
            vv = {**variables, "params": params}
            scores, _, reg = model.prefix_scores(
                vv, batch["ent_ids"], batch["rel_ids"], batch["is_sp"], train=True, rng=rng
            )
            l, _ = one_vs_n_loss(
                "bce", scores, batch["pos_rows"], batch["pos_cols"],
                batch["row_valid"], None, batch["n_real_cols"],
            )
            return (l + reg) / batch["normalizer_loss"]

        return jax.grad(loss_fn)(variables["params"])

    vref = jax.tree_util.tree_map(jnp.asarray, host_vars)
    g1 = grad_of(b1, vref)
    # second micro-batch sees the same params (no update between micro-batches)
    g2 = grad_of(b2, vref)
    want = jax.tree_util.tree_map(
        lambda p, a, b: p - 0.1 * (a + b), vref["params"], g1, g2
    )
    for k in want:
        np.testing.assert_allclose(
            np.asarray(v["params"][k]), np.asarray(want[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_trainer_accumulation_runs(toy_dataset_dir, tmp_path):
    from open_knowledge_graph_embeddings_tpu.cli.train import main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    args = load_config()
    args.update(
        dataset_dir=toy_dataset_dir,
        experiment_dir=str(tmp_path / "exp"),
        epochs=4, batch_size=2, batch_size_for_backward=4,
        eval_epoch_freq=0, eval_freq=-1, save_epoch_freq=100, print_freq=100,
        model="LookupComplexRelationModel",
        model_config={"entity_slot_size": 8, "init_std": 0.1},
        optimization_config={"optimizer": "Adagrad", "lr": 0.3},
        train_data_config={"input_file": "train.txt", "batch_size": 2,
                           "use_batch_shared_entities": False},
        val_data_config={"input_file": "valid.txt", "batch_size": 2,
                         "use_batch_shared_entities": False},
        test_data_config={"input_file": "test.txt", "batch_size": 2,
                          "use_batch_shared_entities": False},
    )
    trainer = main(args)
    assert trainer.accum_steps == 2
    assert trainer.training_steps > 0


def test_accumulation_carries_across_epoch_boundary(toy_dataset_dir, tmp_path):
    """Odd batches-per-epoch with accum_steps=2: the remainder micro-batch
    must combine with the first batch of the NEXT epoch, not be discarded."""
    from open_knowledge_graph_embeddings_tpu.cli.train import main
    from open_knowledge_graph_embeddings_tpu.config.options import load_config

    args = load_config()
    args.update(
        dataset_dir=toy_dataset_dir,
        experiment_dir=str(tmp_path / "exp"),
        epochs=3, batch_size=2, batch_size_for_backward=4,
        eval_epoch_freq=0, eval_freq=-1, save_epoch_freq=100, print_freq=100,
        model="LookupComplexRelationModel",
        model_config={"entity_slot_size": 8, "init_std": 0.1},
        optimization_config={"optimizer": "Adagrad", "lr": 0.3},
        train_data_config={"input_file": "train.txt", "batch_size": 2,
                           "use_batch_shared_entities": False},
        val_data_config={"input_file": "valid.txt", "batch_size": 2,
                         "use_batch_shared_entities": False},
        test_data_config={"input_file": "test.txt", "batch_size": 2,
                          "use_batch_shared_entities": False},
    )
    trainer = main(args)
    # 10 prefixes / batch 2 = 5 batches/epoch (odd): after 3 epochs the
    # carried accumulator is mid-accumulation (15 micro-batches, 7 applies)
    assert trainer._accum_i in (0, 1)
