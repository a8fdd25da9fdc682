"""Optimizer update rules vs torch.optim, and regime phase switching."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from open_knowledge_graph_embeddings_tpu.train.optim import (
    OptimizerRegimes,
    assign_regimes,
)


def _run_parity(opt_name, torch_opt_fn, phase, steps=5, shapes=((4, 3), (7,))):
    rng = np.random.default_rng(0)
    params_np = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    grads_np = [
        [rng.standard_normal(s).astype(np.float32) for s in shapes] for _ in range(steps)
    ]

    # torch side
    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params_np]
    topt = torch_opt_fn(tparams)
    for gs in grads_np:
        topt.zero_grad()
        for p, g in zip(tparams, gs):
            p.grad = torch.tensor(g)
        topt.step()

    # ours
    regimes = OptimizerRegimes(dict(phase))
    regimes.update(1, 0)
    params = {f"p{i}": jnp.asarray(p) for i, p in enumerate(params_np)}
    state = regimes.init_state(params)
    apply = regimes.make_apply(params)
    for gs in grads_np:
        grads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(gs)}
        hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
        params, state = apply(grads, state, params, hp)

    for i, tp in enumerate(tparams):
        np.testing.assert_allclose(
            np.asarray(params[f"p{i}"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"{opt_name} param {i}",
        )


def test_adagrad_matches_torch():
    _run_parity(
        "Adagrad",
        lambda ps: torch.optim.Adagrad(ps, lr=0.3, weight_decay=1e-10),
        {"optimizer": "Adagrad", "lr": 0.3, "weight_decay": 1e-10},
    )


def test_adagrad_lr_decay_matches_torch():
    _run_parity(
        "Adagrad",
        lambda ps: torch.optim.Adagrad(ps, lr=0.1, lr_decay=0.01),
        {"optimizer": "Adagrad", "lr": 0.1, "lr_decay": 0.01},
    )


def test_adam_matches_torch():
    _run_parity(
        "Adam",
        lambda ps: torch.optim.Adam(ps, lr=1e-2, weight_decay=1e-4),
        {"optimizer": "Adam", "lr": 1e-2, "weight_decay": 1e-4},
    )


def test_sgd_momentum_matches_torch():
    _run_parity(
        "SGD",
        lambda ps: torch.optim.SGD(ps, lr=0.05, momentum=0.9),
        {"optimizer": "SGD", "lr": 0.05, "momentum": 0.9},
    )


def test_phase_switch_changes_lr():
    regimes = OptimizerRegimes(
        [[{"epoch": 0, "optimizer": "Adagrad", "lr": 0.3}, {"epoch": 5, "lr": 0.1}]]
    )
    regimes.update(1, 0)
    assert regimes.hparams()[0]["lr"] == 0.3
    changed = regimes.update(5, 100)
    assert not changed  # same optimizer type
    assert regimes.hparams()[0]["lr"] == 0.1


def test_regex_param_groups():
    params = {"entity_embedding": jnp.zeros((2, 2)), "lstm": {"w_ih": jnp.zeros((4,))}}
    labels = assign_regimes(params, ["entity", None])
    assert labels["entity_embedding"] == 0
    assert labels["lstm"]["w_ih"] == 1

    regimes = OptimizerRegimes(
        [
            {"optimizer": "Adagrad", "lr": 1.0, "match": "entity"},
            {"optimizer": "SGD", "lr": 0.0, "match": None},
        ]
    )
    regimes.update(1, 0)
    state = regimes.init_state(params)
    apply = regimes.make_apply(params)
    grads = {"entity_embedding": jnp.ones((2, 2)), "lstm": {"w_ih": jnp.ones((4,))}}
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    new_params, _ = apply(grads, state, params, hp)
    # entity table moved (adagrad lr 1), lstm unchanged (sgd lr 0)
    assert float(jnp.abs(new_params["entity_embedding"]).sum()) > 0
    assert float(jnp.abs(new_params["lstm"]["w_ih"]).sum()) == 0


def test_plateau_scheduler_scales_lr():
    regimes = OptimizerRegimes(
        {"optimizer": "Adagrad", "lr": 1.0},
        lr_scheduler_config={"lr_scheduler": "ReduceLROnPlateau", "factor": 0.5, "patience": 1},
    )
    regimes.update(1, 0)
    regimes.lr_scheduler_step(0.5)
    regimes.lr_scheduler_step(0.4)  # worse x1
    regimes.lr_scheduler_step(0.4)  # worse x2 -> scale
    assert regimes.hparams()[0]["lr"] == 0.5


def test_grad_clip_global_norm():
    params = {"a": jnp.zeros((2,))}
    regimes = OptimizerRegimes({"optimizer": "SGD", "lr": 1.0})
    regimes.update(1, 0)
    state = regimes.init_state(params)
    apply = regimes.make_apply(params, grad_clip=1.0)
    grads = {"a": jnp.asarray([3.0, 4.0])}  # norm 5 -> scaled by 1/5
    hp = [{k: jnp.float32(v) for k, v in h.items()} for h in regimes.hparams()]
    new_params, _ = apply(grads, state, params, hp)
    np.testing.assert_allclose(np.asarray(new_params["a"]), [-0.6, -0.8], rtol=1e-5)


def test_step_keyed_phase_waits():
    """A phase keyed only by 'step' must not activate at step 0 (reference
    keeps absent trigger keys as +inf)."""
    regimes = OptimizerRegimes(
        [[{"optimizer": "Adagrad", "lr": 0.2}, {"step": 1000, "lr": 0.02}]]
    )
    regimes.update(1, 0)
    assert regimes.hparams()[0]["lr"] == 0.2
    regimes.update(1, 500)
    assert regimes.hparams()[0]["lr"] == 0.2
    regimes.update(1, 1000)
    assert regimes.hparams()[0]["lr"] == 0.02


def test_phase_switch_carries_over_unspecified_hparams():
    regimes = OptimizerRegimes(
        [[{"optimizer": "Adagrad", "lr": 0.2, "weight_decay": 1e-10},
          {"step": 10, "lr": 0.02}]]
    )
    regimes.update(1, 0)
    regimes.update(1, 10)
    hp = regimes.hparams()[0]
    assert hp["lr"] == 0.02
    assert hp["weight_decay"] == 1e-10  # inherited from the earlier phase


def test_phase_for_initial_scan_picks_last_triggered_phase():
    """Resume-without-host-meta: the initial scan must land on the LAST
    phase whose trigger already passed, not the first."""
    regimes = OptimizerRegimes(
        [[
            {"optimizer": "Adagrad", "lr": 1.0, "epoch": 0},
            {"lr": 0.5, "epoch": 5},
            {"lr": 0.25, "epoch": 10},
        ]]
    )
    # simulate resume at epoch 12 with no restored host state
    regimes.update(12, 1200)
    assert regimes.current_phase[0] == 2
    assert regimes.hparams()[0]["lr"] == 0.25


def test_epoch_indexed_lr_schedulers():
    for kind, cfg, expect in (
        ("StepLR", {"step_size": 2, "gamma": 0.1}, {1: 1.0, 2: 0.1, 5: 0.01}),
        ("MultiStepLR", {"milestones": [3, 6], "gamma": 0.5}, {2: 1.0, 3: 0.5, 7: 0.25}),
        ("ExponentialLR", {"gamma": 0.5}, {0: 1.0, 1: 0.5, 3: 0.125}),
    ):
        regimes = OptimizerRegimes(
            {"optimizer": "SGD", "lr": 1.0},
            lr_scheduler_config={"lr_scheduler": kind, **cfg},
        )
        regimes.update(1, 0)
        for epoch, scale in expect.items():
            regimes.lr_scheduler_step(0.0, epoch=epoch)
            assert abs(regimes.hparams()[0]["lr"] - scale) < 1e-12, (kind, epoch)


def test_unknown_scheduler_rejected():
    import pytest

    regimes = OptimizerRegimes(
        {"optimizer": "SGD", "lr": 1.0},
        lr_scheduler_config={"lr_scheduler": "OneCycleLR"},  # step-scoped; unsupported
    )
    regimes.update(1, 0)
    with pytest.raises(ValueError):
        regimes.lr_scheduler_step(0.0, epoch=1)


def test_cosine_linear_polynomial_lambda_schedulers():
    """The round-3 scheduler additions match torch's closed forms."""
    import math

    for kind, cfg, expect in (
        ("CosineAnnealingLR", {"T_max": 10, "eta_min": 0.0},
         {0: 1.0, 5: 0.5, 10: 0.0}),
        ("CosineAnnealingLR", {"T_max": 10, "eta_min": 0.5},
         {0: 1.0, 5: 0.75, 10: 0.5}),
        ("CosineAnnealingWarmRestarts", {"T_0": 4, "T_mult": 1},
         {0: 1.0, 2: 0.5, 4: 1.0, 6: 0.5}),
        ("LinearLR", {"start_factor": 0.5, "end_factor": 1.0, "total_iters": 4},
         {0: 0.5, 2: 0.75, 4: 1.0, 9: 1.0}),
        ("PolynomialLR", {"total_iters": 4, "power": 1.0},
         {0: 1.0, 1: 0.75, 4: 0.0, 6: 0.0}),
        ("LambdaLR", {"lr_lambda": "0.5 ** epoch"}, {0: 1.0, 1: 0.5, 3: 0.125}),
    ):
        regimes = OptimizerRegimes(
            {"optimizer": "SGD", "lr": 1.0},
            lr_scheduler_config={"lr_scheduler": kind, **cfg},
        )
        regimes.update(1, 0)
        for epoch, scale in expect.items():
            regimes.lr_scheduler_step(0.0, epoch=epoch)
            assert abs(regimes.hparams()[0]["lr"] - scale) < 1e-9, (kind, epoch)


def test_lambda_lr_safe_evaluator():
    """lr_lambda expressions are AST-evaluated, never eval()'d.

    Arithmetic, math calls, and conditional expressions work; anything that
    could escape (attribute traversal, subscripts, dunder access, imports)
    raises ValueError instead of executing.
    """
    import math

    import pytest

    from open_knowledge_graph_embeddings_tpu.train.optim import (
        safe_eval_lr_lambda,
    )

    assert safe_eval_lr_lambda("0.5 ** epoch", 3) == 0.125
    assert safe_eval_lr_lambda("1.0 / (1 + 0.1 * epoch)", 10) == 0.5
    assert abs(safe_eval_lr_lambda("exp(-epoch / 10)", 10) - math.exp(-1)) < 1e-12
    assert abs(safe_eval_lr_lambda("math.cos(pi * epoch / 4)", 2)) < 1e-12
    assert safe_eval_lr_lambda("1.0 if epoch < 5 else 0.1", 7) == 0.1
    assert safe_eval_lr_lambda("max(0.01, 0.9 ** epoch)", 100) == 0.01

    for malicious in (
        "().__class__.__bases__[0].__subclasses__()",
        "__import__('os').system('true')",
        "open('/etc/passwd')",
        "epoch.__class__",
        "(lambda: 1)()",
        "[x for x in (1,)][0]",
        "'a' * 10",
        "math.__loader__",
        "globals()",
    ):
        with pytest.raises(ValueError):
            safe_eval_lr_lambda(malicious, 1)


def test_cosine_scheduler_matches_torch():
    torch = __import__("pytest").importorskip("torch")
    base_lr = 0.2
    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=7, eta_min=0.01)
    regimes = OptimizerRegimes(
        {"optimizer": "SGD", "lr": base_lr},
        lr_scheduler_config={"lr_scheduler": "CosineAnnealingLR",
                             "T_max": 7, "eta_min": 0.01},
    )
    regimes.update(1, 0)
    for epoch in range(12):
        # torch closed-form stepping via explicit epoch (deprecated API but
        # exactly the semantics the reference relies on: step(metric, epoch))
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sched.step(epoch)
        regimes.lr_scheduler_step(0.0, epoch=epoch)
        ours = regimes.hparams()[0]["lr"]
        assert abs(ours - opt.param_groups[0]["lr"]) < 1e-7, epoch
