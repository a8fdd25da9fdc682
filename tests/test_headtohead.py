"""Head-to-head learning parity against the live torch reference.

Trains the same model (LookupComplex, no dropout) on the same data
(FB15k-237 valid-as-train — the real train blob is stripped from the
reference checkout), from the same initial weights, feeding BOTH frameworks
the IDENTICAL batches, and asserts:

1. the per-step loss trajectories match,
2. the final embedding tables match,
3. the filtered ranking metrics of the two trained parameter sets match.

This is the BASELINE.md "reference-parity training" check in its
seed-matched form (reference loop: openkge/trainer.py:181-257, loss wiring
scripts/train.py:108-111).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# single-threaded torch: intra-op GEMM partitioning depends on the live
# thread pool, and a different accumulation order moves fp-noise-scale
# gradient elements across Adagrad's ±lr first-update threshold — the one
# run-to-run variance source in an otherwise fully seed-matched test
torch.set_num_threads(1)

REF = "/root/reference"
FB = f"{REF}/data/fb15k237/mapped_to_ids"
if not os.path.isdir(FB):
    pytest.skip("FB15k-237 data not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

from openkge.dataset import OneToNMentionRelationDataset as RefDS  # noqa: E402
from openkge.model import Models as RefModels  # noqa: E402
from openkge.trainer import AddLossModule  # noqa: E402
from torch.nn import BCEWithLogitsLoss, KLDivLoss  # noqa: E402

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
)
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train import (
    OptimizerRegimes,
    eval_batch_to_arrays,
    make_eval_step,
    make_train_step,
    train_batch_to_arrays,
)
from open_knowledge_graph_embeddings_tpu.train.step import unpack_eval_stats

D = 32
B = 256
STEPS = 30
LR = 0.3
WD = 1e-10


def _ref_inputs_from_batch(batch, num_cols):
    """Reference AddLossModule inputs built from OUR batch (po rows first,
    then sp — the reference's own slot order)."""
    n = batch.num_rows
    is_sp = batch.is_sp[:n]
    n_po = int((~is_sp).sum())
    po = sp = None
    if n_po:
        po = (
            torch.IntTensor(batch.rel_ids[:n_po]),
            torch.IntTensor(batch.ent_ids[:n_po]),
        )
    if n - n_po:
        sp = (
            torch.IntTensor(batch.ent_ids[n_po:n]),
            torch.IntTensor(batch.rel_ids[n_po:n]),
        )
    labels = torch.zeros(n, num_cols)
    pr, pc = batch.pos_rows, batch.pos_cols
    m = pr >= 0
    labels[pr[m], pc[m]] = 1.0
    return [po, sp], labels


@pytest.fixture(scope="module")
def datasets():
    ours_ds = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True, batch_size=B,
    )
    eval_ds = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="test.txt", is_training_data=False, batch_size=B,
    )
    eval_ds.attach_filter_index("valid.txt", "valid.txt", "test.txt")

    ref_ds = RefDS(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True,
        copy_data_to_dev_shm=False, batch_size=B,
    )
    return ours_ds, eval_ds, ref_ds


def _fresh_models(ours_ds, ref_ds):
    # earlier test files consume torch's global RNG; without this the
    # reference init (and hence the chaotic wd-only Adagrad rows, see the
    # final-table tolerance note below) depends on suite order
    torch.manual_seed(0)
    our_model = build_model(
        "LookupComplexRelationModel", ours_ds.meta, entity_slot_size=D, init_std=0.1,
    )
    ref_model = RefModels.LookupComplexRelationModel(
        entity_slot_size=D, train_data=ref_ds.get_dataset_meta_dict(), init_std=0.1,
    )
    variables = our_model.init(jax.random.key(0))
    variables["params"]["entity_embedding"] = jnp.asarray(
        ref_model.entity_embedding.weight.detach().numpy()
    )
    variables["params"]["relation_embedding"] = jnp.asarray(
        ref_model.relation_embedding.weight.detach().numpy()
    )
    return our_model, ref_model, variables


# wd==0 final-table bound: (allowed fraction beyond tight tol, max divergence).
# KL's dense softmax gradient gives every touched row fp-noise-scale elements
# each step (measured: 0.13% beyond tight tol, p99.9 = 4e-4, max 0.029 over 30
# Adagrad steps) where BCE's sparse gradient confines the tail to ~1e-5 of
# elements.
_TABLE_TAIL = {"bce": (1e-4, 2e-2), "kl": (2e-3, 5e-2)}


@pytest.mark.parametrize(
    "loss_type,wd,loss_rtol,table_rtol,table_atol,metric_tol",
    [
        # wd=0: zero-gradient rows stay exactly fixed on both sides, so the
        # chaotic wd-only Adagrad drift (table note below) disappears and
        # everything is asserted at the tight pre-widening bounds
        ("bce", 0.0, 2e-4, 1e-3, 1e-4, 1e-3),
        # wd=1e-10: the configured protocol, widened for the chaotic rows
        ("bce", WD, 5e-4, 5e-3, 1e-2, 5e-3),
        # KL: torch KLDivLoss(sum) over log_softmax rows (reference:
        # openkge/trainer.py:99-111) vs our kl_div_sum — softmax couples
        # every row cell, so each row's full gradient is dense; trajectory
        # agreement is as tight as BCE's
        ("kl", 0.0, 2e-4, 1e-3, 1e-4, 1e-3),
    ],
)
def test_training_trajectories_match(
    datasets, loss_type, wd, loss_rtol, table_rtol, table_atol, metric_tol
):
    ours_ds, eval_ds, ref_ds = datasets
    our_model, ref_model, variables = _fresh_models(ours_ds, ref_ds)
    meta = ours_ds.meta
    N = meta.entities_size - meta.min_entities_size

    # --- our side
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": LR, "weight_decay": wd})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(our_model, regimes, variables["params"], loss_type=loss_type)
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    # --- reference side
    ref_model.train()
    ref_loss = (
        KLDivLoss(reduction="sum") if loss_type == "kl"
        else BCEWithLogitsLoss(reduction="sum")
    )
    ref_loss_mod = AddLossModule(ref_model, ref_loss)
    ref_opt = torch.optim.Adagrad(ref_model.parameters(), lr=LR, weight_decay=wd)
    all_ids = torch.arange(meta.entities_size)[meta.min_entities_size:].int()

    builder = BatchBuilder(ours_ds, seed=0)
    our_losses, ref_losses = [], []
    v = variables
    batches = []
    for i, batch in enumerate(builder.batches(shuffle=False)):
        if i >= STEPS:
            break
        batches.append(batch)
        # ours
        v, opt_state, stats = step(v, opt_state, hp, train_batch_to_arrays(batch), jax.random.key(i))
        our_losses.append(float(stats["loss_sum"]) / batch.normalizer_loss)
        # reference, same batch
        inputs, labels = _ref_inputs_from_batch(batch, N)
        ref_opt.zero_grad()
        loss, hook_loss, _ = ref_loss_mod(
            inputs=inputs, labels=labels,
            use_batch_shared_entities=False, batch_shared_entities=all_ids,
            input_style_triple_or_prefix="right_and_left_prefix",
        )
        backward = loss.sum() / batch.normalizer_loss
        if hook_loss is not None:
            backward = backward + hook_loss / batch.normalizer_loss
        backward.backward()
        ref_opt.step()
        ref_losses.append(float(loss.detach()) / batch.normalizer_loss)

    # typical agreement is ~1e-5; the wd>0 headroom covers fp
    # accumulation-order jitter in the chaotic wd-only Adagrad rows (see the
    # table note below)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=loss_rtol, atol=3e-6,
                               err_msg="per-step loss trajectories diverged")
    assert our_losses[-1] < our_losses[0], "no learning happened"

    # final tables match
    for name, ref_w in (
        ("entity_embedding", ref_model.entity_embedding.weight),
        ("relation_embedding", ref_model.relation_embedding.weight),
    ):
        # fp32 accumulation-order differences compound over 30 Adagrad steps;
        # with wd>0, near-zero-gradient rows are chaotic by construction
        # (update = clr*wd*p / (sqrt((wd*p)^2 * t) + eps) divides near-zero
        # by near-zero, so 1e-12 fp noise in the wd gradient moves the row
        # by O(clr/sqrt(t))) — the wd>0 atol covers the handful of such
        # elements (the hand-written BCE VJP rounds a few ULPs differently
        # from autograd's chain, train/loss.py).  The wd=0 case has no
        # wd-only rows; all that remains is a ~1e-5-sized set of elements
        # whose *data* gradient is fp-noise-scale (Adagrad's first update is
        # ±lr for any nonzero gradient), so it binds the full mass tightly
        # and bounds that tail instead of widening atol across the board.
        ours_np, ref_np = np.asarray(v["params"][name]), ref_w.detach().numpy()
        if wd == 0.0:
            d = np.abs(ours_np - ref_np)
            tol = table_atol + table_rtol * np.abs(ref_np)
            n_loose = int((d > tol).sum())
            frac, max_div = _TABLE_TAIL[loss_type]
            allowed = max(32, int(frac * d.size))
            assert n_loose <= allowed, (
                f"{name}: {n_loose} elements beyond tight tolerance "
                f"(allowed {allowed})"
            )
            assert float(d.max()) <= max_div, f"{name}: max divergence {d.max():.4f}"
        else:
            np.testing.assert_allclose(
                ours_np, ref_np, rtol=table_rtol, atol=table_atol,
                err_msg=f"{name} diverged after {STEPS} steps",
            )

    # filtered ranking metrics of the two trained parameter sets match
    eval_step = make_eval_step(our_model)
    ref_params = dict(v["params"])
    ref_params["entity_embedding"] = jnp.asarray(
        ref_model.entity_embedding.weight.detach().numpy()
    )
    ref_params["relation_embedding"] = jnp.asarray(
        ref_model.relation_embedding.weight.detach().numpy()
    )
    eval_builder = BatchBuilder(eval_ds)

    def mrr_h10(params):
        vv = {**v, "params": params}
        sums = np.zeros(3)
        for j, eb in enumerate(eval_builder.batches()):
            if j >= 4:
                break
            s = unpack_eval_stats(eval_step(vv, eval_batch_to_arrays(eb)))
            sums += [s["mrr"], s["h10"], s["count"]]
        return sums[0] / sums[2], sums[1] / sums[2]

    ours_m, ours_h = mrr_h10(v["params"])
    ref_m, ref_h = mrr_h10(ref_params)
    # one rank flip over the 1024 scored prefixes moves MRR by up to ~1e-3;
    # with wd>0 the chaotic near-zero-gradient rows (note above) can flip a
    # couple of tie-adjacent ranks between the two independently-trained
    # tables, so allow a handful of flips while binding the metrics together
    assert abs(ours_m - ref_m) < metric_tol, (ours_m, ref_m)
    assert abs(ours_h - ref_h) < metric_tol, (ours_h, ref_h)


@pytest.mark.parametrize("loss", ["bce", "kl"])
def test_step1_gradients_match(datasets, loss):
    """Step-1 gradient parity on the embedding tables for both objectives:
    d(loss_sum / normalizer)/d(table) from our prefix_loss vs torch autograd
    through the reference AddLossModule (KL: KLDivLoss over log_softmax,
    reference: openkge/trainer.py:99-111)."""
    from open_knowledge_graph_embeddings_tpu.train.step import (
        prefix_loss,
        train_batch_to_arrays,
    )

    ours_ds, _eval_ds, ref_ds = datasets
    our_model, ref_model, variables = _fresh_models(ours_ds, ref_ds)
    meta = ours_ds.meta
    N = meta.entities_size - meta.min_entities_size
    batch = next(BatchBuilder(ours_ds, seed=0).batches(shuffle=False))

    # ours
    arrays = {k: jnp.asarray(v) for k, v in train_batch_to_arrays(batch).items()}

    def loss_fn(params):
        v = {**variables, "params": params}
        loss_sum, _, _, reg = prefix_loss(our_model, v, arrays, loss, 0.0, None)
        return (loss_sum + reg) / batch.normalizer_loss

    our_grads = jax.grad(loss_fn)(variables["params"])

    # reference, same batch
    ref_model.train()
    ref_loss = (
        KLDivLoss(reduction="sum") if loss == "kl"
        else BCEWithLogitsLoss(reduction="sum")
    )
    ref_loss_mod = AddLossModule(ref_model, ref_loss)
    inputs, labels = _ref_inputs_from_batch(batch, N)
    all_ids = torch.arange(meta.entities_size)[meta.min_entities_size:].int()
    lv, hook_loss, _ = ref_loss_mod(
        inputs=inputs, labels=labels,
        use_batch_shared_entities=False, batch_shared_entities=all_ids,
        input_style_triple_or_prefix="right_and_left_prefix",
    )
    backward = lv.sum() / batch.normalizer_loss
    if hook_loss is not None:
        backward = backward + hook_loss / batch.normalizer_loss
    backward.backward()

    for name, ref_p in (
        ("entity_embedding", ref_model.entity_embedding),
        ("relation_embedding", ref_model.relation_embedding),
    ):
        ref_g = ref_p.weight.grad.detach().numpy()
        np.testing.assert_allclose(
            np.asarray(our_grads[name]), ref_g, rtol=1e-4, atol=1e-7,
            err_msg=f"{loss}: step-1 grad of {name} diverged",
        )
