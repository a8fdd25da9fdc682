"""Flagship-mode head-to-head training parity against the live torch reference.

The OLPBench headline composition — LSTM encoder (reference:
openkge/model.py:912-998) + batch-shared candidates with negative top-up
(reference: openkge/dataset.py:833-860, openkge/trainer.py:76-82) — trained
seed-matched on FB15k-237 valid-as-train (the real train blob is stripped
from the reference checkout): identical batches (built by OUR BatchBuilder,
fed to both frameworks), identical initial weights, dropout 0, Adagrad.

What is asserted, and why this shape:

* **Full gradient parity at step 1** (every parameter tensor, tight):
  the sharp check of the composed VJP — fused LSTM kernels, candidate
  remapping, top-up columns, the indexed BCE loss.
* **Per-step loss trajectories** over the whole run.
* **Final tables modulo the chaotic tail**: Adagrad's first update for any
  element is ±lr (|Δ| = lr·|g|/(|g|+eps) ≈ lr), i.e. sign-SGD at lr=0.2 —
  through the LSTM's saturating nonlinearities, torch-vs-XLA fp
  accumulation noise amplifies chaotically over steps even at wd=0
  (measured: 98.7% of elements stay ~1e-3-tight after 20 steps; the tail
  diverges to O(lr)).  The assertion binds the 99% mass tightly and bounds
  the tail, instead of pretending bitwise long-horizon parity exists.
* **Filtered eval metrics** of the two trained parameter sets.

Three configurations:

* ``wd=0`` (mixed-direction batches, no batchnorm): untouched rows stay
  exactly fixed; tightest case.
* ``wd=1e-10`` (the configured OLPBench protocol): adds the chaotic
  wd-only rows documented in test_headtohead.py.
* ``batchnorm`` on, direction-pure batches: the reference runs po-slot and
  sp-slot rows through BN as separate sub-batches while our train step
  encodes the mixed batch jointly (a documented deviation,
  models/model.py docstring) — with single-direction batches both sides
  see identical BN batches, so training-mode BN statistics must match.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# single-threaded torch for run-to-run determinism (see test_headtohead.py)
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
from torch.nn import BCEWithLogitsLoss  # noqa: E402

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
)
from open_knowledge_graph_embeddings_tpu.data.dataset import SLOT_PO, SLOT_SP
from open_knowledge_graph_embeddings_tpu.models import build_model
from open_knowledge_graph_embeddings_tpu.train import (
    OptimizerRegimes,
    eval_batch_to_arrays,
    make_eval_step,
    make_train_step,
    train_batch_to_arrays,
)
from open_knowledge_graph_embeddings_tpu.train.step import (
    prefix_loss,
    unpack_eval_stats,
)

D = 32
B = 256
STEPS = 20
LR = 0.2
MINL = 2048  # > unique answers of every 256-row batch -> top-up every batch


def _ref_inputs_from_batch(batch):
    """Reference AddLossModule inputs from OUR batch: po rows first then sp
    (the builder's row order matches the reference slot order), labels and
    shared candidates in OUR candidate-column space."""
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
    labels = torch.zeros(n, batch.num_cols)
    pr, pc = batch.pos_rows, batch.pos_cols
    m = pr >= 0
    labels[pr[m], pc[m]] = 1.0
    shared = torch.IntTensor(batch.candidate_ids[: batch.num_cols])
    return [po, sp], labels, shared


def _port_ref_weights(ref_model, variables, batchnorm: bool):
    """Copy the torch reference's weights into our param pytree."""
    p = variables["params"]
    p["entity_token_embedding"] = jnp.asarray(
        ref_model.entity_embedding.weight.detach().numpy()
    )
    p["relation_token_embedding"] = jnp.asarray(
        ref_model.relation_embedding.weight.detach().numpy()
    )
    for kind, lstm in (
        ("entity", ref_model.entity_encoder_in),
        ("relation", ref_model.relation_encoder_in),
    ):
        p[f"{kind}_lstm"] = {
            "w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy()),
            "w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy()),
            "b_ih": jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
            "b_hh": jnp.asarray(lstm.bias_hh_l0.detach().numpy()),
        }
    if batchnorm:
        for kind, bn in (
            ("entity", ref_model.entity_batchnorm),
            ("relation", ref_model.relation_batchnorm),
        ):
            p[f"{kind}_bn"] = {
                "scale": jnp.asarray(bn.weight.detach().numpy()),
                "bias": jnp.asarray(bn.bias.detach().numpy()),
            }
    return variables


def _param_pairs(ref_model, batchnorm: bool):
    """(our param path, torch tensor) pairs covering every trainable."""
    pairs = [
        (("entity_token_embedding",), ref_model.entity_embedding.weight),
        (("relation_token_embedding",), ref_model.relation_embedding.weight),
    ]
    for kind, lstm in (
        ("entity", ref_model.entity_encoder_in),
        ("relation", ref_model.relation_encoder_in),
    ):
        pairs += [
            ((f"{kind}_lstm", "w_ih"), lstm.weight_ih_l0),
            ((f"{kind}_lstm", "w_hh"), lstm.weight_hh_l0),
            ((f"{kind}_lstm", "b_ih"), lstm.bias_ih_l0),
            ((f"{kind}_lstm", "b_hh"), lstm.bias_hh_l0),
        ]
    if batchnorm:
        for kind, bn in (
            ("entity", ref_model.entity_batchnorm),
            ("relation", ref_model.relation_batchnorm),
        ):
            pairs += [
                ((f"{kind}_bn", "scale"), bn.weight),
                ((f"{kind}_bn", "bias"), bn.bias),
            ]
    return pairs


def _get(params, path):
    node = params
    for k in path:
        node = node[k]
    return np.asarray(node)


def _make_pair(normalize: str):
    """(ours_ds, our_model, ref_model, variables) with matched init."""
    torch.manual_seed(0)
    ours_ds = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True,
        batch_size=B, use_batch_shared_entities=True, min_size_batch_labels=MINL,
    )
    ref_ds = RefDS(
        dataset_dir=FB, input_file="valid.txt", is_training_data=True,
        copy_data_to_dev_shm=False, batch_size=B,
        replace_entities_by_tokens=True, replace_relations_by_tokens=True,
    )
    ref_model = RefModels.LSTMComplexRelationModel(
        entity_slot_size=D, relation_slot_size=D,
        train_data=ref_ds.get_dataset_meta_dict(), init_std=0.1,
        normalize=normalize,
    )
    our_model = build_model(
        "LSTMComplexRelationModel", ours_ds.meta,
        entity_slot_size=D, relation_slot_size=D, normalize=normalize,
    )
    # the on-device token-id buffers must be byte-identical to the
    # reference's registered buffers (same truncate-to-last-L rule)
    np.testing.assert_array_equal(
        ref_model.entity_token_ids.numpy(), ours_ds.meta.entity_token_ids
    )
    np.testing.assert_array_equal(
        ref_model.relation_token_ids.numpy(), ours_ds.meta.relation_token_ids
    )
    variables = our_model.init(jax.random.key(0))
    variables = _port_ref_weights(ref_model, variables, normalize == "batchnorm")
    return ours_ds, our_model, ref_model, variables


def _assert_step1_grads_match(our_model, variables, ref_model, batch, atol=3e-5):
    """The sharp numerics check: full-gradient parity on the first batch.

    Only valid with batchnorm OFF (a torch forward in train() mode would
    advance BN running stats and desync the subsequent training loop)."""
    arrs = train_batch_to_arrays(batch)

    def loss_fn(params):
        v = {"params": params, "state": variables["state"], "buffers": variables["buffers"]}
        loss_sum, _, _, reg = prefix_loss(our_model, v, arrs, "bce", 0.0, jax.random.key(0))
        return (loss_sum + reg) / arrs["normalizer_loss"]

    our_grads = jax.grad(loss_fn)(variables["params"])

    ref_model.train()
    mod = AddLossModule(ref_model, BCEWithLogitsLoss(reduction="sum"))
    inputs, labels, shared = _ref_inputs_from_batch(batch)
    loss, hook_loss, _ = mod(
        inputs=inputs, labels=labels, use_batch_shared_entities=True,
        batch_shared_entities=shared,
        input_style_triple_or_prefix="right_and_left_prefix",
    )
    backward = loss.sum() / batch.normalizer_loss
    if hook_loss is not None:
        backward = backward + hook_loss / batch.normalizer_loss
    backward.backward()
    for path, ref_t in _param_pairs(ref_model, batchnorm=False):
        np.testing.assert_allclose(
            _get(our_grads, path), ref_t.grad.detach().numpy(),
            rtol=1e-4, atol=atol,
            err_msg=f"step-1 gradient of {'/'.join(path)} diverged",
        )
    ref_model.zero_grad()


def _train_both(our_model, ref_model, variables, batch_iter, wd, after_step=None):
    """Run both frameworks over the same batches; returns
    (our_losses, ref_losses, final_variables).  ``after_step(i, v)`` is
    called after both sides applied step ``i``."""
    regimes = OptimizerRegimes({"optimizer": "Adagrad", "lr": LR, "weight_decay": wd})
    regimes.update(1, 0)
    opt_state = regimes.init_state(variables["params"])
    step = make_train_step(our_model, regimes, variables["params"])
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]

    ref_model.train()
    ref_loss_mod = AddLossModule(ref_model, BCEWithLogitsLoss(reduction="sum"))
    ref_opt = torch.optim.Adagrad(ref_model.parameters(), lr=LR, weight_decay=wd)

    our_losses, ref_losses = [], []
    v = variables
    for i, batch in enumerate(batch_iter):
        v, opt_state, stats = step(
            v, opt_state, hp, train_batch_to_arrays(batch), jax.random.key(i)
        )
        our_losses.append(float(stats["loss_sum"]) / batch.normalizer_loss)

        inputs, labels, shared = _ref_inputs_from_batch(batch)
        ref_opt.zero_grad()
        loss, hook_loss, _ = ref_loss_mod(
            inputs=inputs, labels=labels,
            use_batch_shared_entities=True, batch_shared_entities=shared,
            input_style_triple_or_prefix="right_and_left_prefix",
        )
        backward = loss.sum() / batch.normalizer_loss
        if hook_loss is not None:
            backward = backward + hook_loss / batch.normalizer_loss
        backward.backward()
        ref_opt.step()
        ref_losses.append(float(loss.detach()) / batch.normalizer_loss)
        if after_step is not None:
            after_step(i, v)
    return our_losses, ref_losses, v


def _assert_tables_close_modulo_chaos(
    v, ref_model, batchnorm, tight_atol=2e-3, tail_frac=0.02, max_abs=1.0
):
    """Final parameters match except for a bounded chaotic tail (see module
    docstring): >= (1 - tail_frac) of the elements of every tensor within
    ``tight_atol`` of the torch value, and no element farther than
    ``max_abs`` (a few sign-steps of lr)."""
    for path, ref_t in _param_pairs(ref_model, batchnorm):
        ours = _get(v["params"], path)
        d = np.abs(ours - ref_t.detach().numpy())
        frac_loose = float((d > tight_atol).mean())
        name = "/".join(path)
        assert frac_loose <= tail_frac, (
            f"{name}: {frac_loose:.4f} of elements differ by more than "
            f"{tight_atol} (chaotic tail too fat)"
        )
        assert d.max() <= max_abs, f"{name}: max divergence {d.max():.3f}"


@pytest.mark.parametrize(
    "wd,loss_rtol,tail_frac",
    [
        # wd=0: untouched rows stay exactly fixed; only the fp-noise-seeded
        # chaos of touched elements remains (measured 2.4% on the relation
        # table after 20 steps)
        (0.0, 2e-4, 0.05),
        # wd=1e-10 (the configured OLPBench protocol): every row is touched
        # by the wd gradient, adding the chaotic wd-only rows documented in
        # test_headtohead.py
        (1e-10, 5e-4, 0.06),
    ],
)
def test_flagship_training_trajectories_match(wd, loss_rtol, tail_frac):
    ours_ds, our_model, ref_model, variables = _make_pair(normalize="")
    builder = BatchBuilder(ours_ds, seed=0)

    first = next(builder.batches(shuffle=False))
    assert first.num_cols == MINL, "top-up did not trigger"
    _assert_step1_grads_match(our_model, variables, ref_model, first)

    def batch_iter():
        for i, batch in enumerate(builder.batches(shuffle=False)):
            if i >= STEPS:
                return
            assert batch.num_cols == MINL, "top-up did not trigger"
            yield batch

    our_losses, ref_losses, v = _train_both(
        our_model, ref_model, variables, batch_iter(), wd
    )
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=loss_rtol, atol=3e-6,
        err_msg="per-step loss trajectories diverged",
    )
    assert our_losses[-1] < our_losses[0], "no learning happened"
    _assert_tables_close_modulo_chaos(v, ref_model, batchnorm=False, tail_frac=tail_frac)

    if wd != 0.0:
        return  # metric comparison once is enough

    # filtered ranking metrics of the two trained parameter sets match
    eval_ds = OneToNMentionRelationDataset(
        dataset_dir=FB, input_file="test.txt", is_training_data=False, batch_size=B,
    )
    eval_ds.attach_filter_index("valid.txt", "valid.txt", "test.txt")
    eval_step = make_eval_step(our_model)
    ref_v = {**v, "params": dict(v["params"])}
    _port_ref_weights(ref_model, ref_v, batchnorm=False)
    eval_builder = BatchBuilder(eval_ds)

    def mrr_h10(vv):
        sums = np.zeros(3)
        for j, eb in enumerate(eval_builder.batches()):
            if j >= 4:
                break
            s = unpack_eval_stats(eval_step(vv, eval_batch_to_arrays(eb)))
            sums += [s["mrr"], s["h10"], s["count"]]
        return sums[0] / sums[2], sums[1] / sums[2]

    ours_m, ours_h = mrr_h10(v)
    ref_m, ref_h = mrr_h10(ref_v)
    # the chaotic parameter tail can flip tie-adjacent ranks; bind the
    # metrics together without demanding identical rank lists
    assert abs(ours_m - ref_m) < 5e-3, (ours_m, ref_m)
    assert abs(ours_h - ref_h) < 5e-3, (ours_h, ref_h)


def test_flagship_batchnorm_stats_match():
    """BN on, direction-pure batches: training-mode batch statistics, BN
    running stats and all tables evolve identically (the mixed-batch joint
    encode is exercised with BN off above, where it is exact)."""
    ours_ds, our_model, ref_model, variables = _make_pair(normalize="batchnorm")
    builder = BatchBuilder(ours_ds, seed=0)
    rec = ours_ds.records
    po_ids = np.flatnonzero(rec.slot == SLOT_PO)
    sp_ids = np.flatnonzero(rec.slot == SLOT_SP)
    n_steps = 12
    chunks = []
    for k in range(n_steps):
        src = po_ids if k % 2 == 0 else sp_ids
        j = k // 2
        chunk = src[j * B : (j + 1) * B]
        assert len(chunk) == B
        chunks.append(chunk)

    def check_bn_stats(rtol, atol):
        for kind, bn in (
            ("entity", ref_model.entity_batchnorm),
            ("relation", ref_model.relation_batchnorm),
        ):
            yield (
                np.asarray(vv["state"][f"{kind}_bn"]["mean"]),
                bn.running_mean.detach().numpy(), f"{kind}_bn mean", rtol, atol,
            )
            yield (
                np.asarray(vv["state"][f"{kind}_bn"]["var"]),
                bn.running_var.detach().numpy(), f"{kind}_bn var", rtol, atol,
            )

    vv = None

    def after_step(i, v_now):
        nonlocal vv
        vv = v_now
        if i <= 1:
            # tight early check: running stats are invisible to the training
            # losses (train-mode forward uses batch stats), so the
            # EMA/unbiased-variance semantics are pinned here before the
            # chaotic parameter drift (module docstring) grows.  With
            # single-threaded torch (deterministic summation order, set at
            # import above) the measured noise floor is ~7e-6 abs on
            # batch-mean stats; bounds sit just above it so semantic errors
            # (wrong momentum, biased variance — landing at ~1e-2) and
            # subtle EMA regressions in the 1e-5..1e-2 band both trip
            for ours, ref, name, rtol, atol in check_bn_stats(1e-4, 1e-5):
                np.testing.assert_allclose(
                    ours, ref, rtol=rtol, atol=atol,
                    err_msg=f"{name} diverged at step {i}",
                )

    our_losses, ref_losses, v = _train_both(
        our_model, ref_model, variables,
        (builder.build(c) for c in chunks), wd=0.0, after_step=after_step,
    )
    # step-1 loss is a forward on identical params and matches exactly (BN
    # train-mode forward parity); later steps track through an 80x loss drop
    # where the constant ~2e-4 absolute chaos noise becomes ~1% relative
    np.testing.assert_allclose(our_losses[:2], ref_losses[:2], rtol=5e-5)
    np.testing.assert_allclose(
        our_losses, ref_losses, rtol=2e-2, atol=3e-6,
        err_msg="per-step loss trajectories diverged (batchnorm)",
    )
    # end-of-run BN stats stay coupled: they are EMAs of activations of the
    # (chaotically drifting) parameters, so they only inherit that noise
    # envelope — the exact EMA/unbiased-variance semantics were pinned at
    # steps 0-1 inside after_step above
    vv = v
    for ours, ref, name, rtol, atol in check_bn_stats(0.2, 2e-2):
        np.testing.assert_allclose(
            ours, ref, rtol=rtol, atol=atol, err_msg=f"{name} diverged at end"
        )
    # BN rescales whole feature columns, so parameter chaos is an order
    # louder than the BN-off cases (measured max 0.18, 99.8% within 5e-2)
    _assert_tables_close_modulo_chaos(
        v, ref_model, batchnorm=True, tight_atol=5e-2, tail_frac=0.03, max_abs=1.5
    )
