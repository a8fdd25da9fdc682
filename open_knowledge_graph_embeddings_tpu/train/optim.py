"""Optimizer regimes with torch-matching update rules.

Capability equivalent of the reference's OptimRegime
(reference: utils/optim.py:14-218): a list of phase dicts
``{'epoch'/'step', 'optimizer', 'lr', ...}`` switched during training, with
multiple independent regimes selected by param-name regex ``match`` — i.e.
per-parameter-group optimizer configurations.

TPU-native shape: the update *rules* are pure functions applied inside the
jitted train step; hyperparameters (lr, weight decay, ...) enter as traced
scalars so phase changes and plateau-scheduler scaling never trigger
recompilation.  Only an optimizer *type* switch rebuilds the step (rare,
and the reference also resets optimizer state in that case —
utils/optim.py:143-146 constructs a fresh torch optimizer).

Update rules replicate torch.optim semantics exactly (verified by unit
tests against torch on CPU): Adagrad (lr_decay, eps=1e-10, additive weight
decay), Adam, SGD(momentum, nesterov), RMSprop, Adadelta.
"""

from __future__ import annotations

import ast
import logging
import math
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def safe_eval_lr_lambda(expr: str, epoch: float) -> float:
    """Evaluate a LambdaLR factor expression without ``eval``.

    Config files carry the torch ``lr_lambda`` callable as an arithmetic
    expression of ``epoch`` (e.g. ``"0.95 ** epoch"``).  A raw ``eval`` —
    even with ``{"__builtins__": {}}`` — is an arbitrary-code vector via
    attribute traversal, so this walks the AST and permits only numeric
    literals, ``epoch``, arithmetic/comparison operators, conditional
    expressions, and a whitelist of ``math`` functions/constants.
    Anything else (attributes, subscripts, calls to non-whitelisted names,
    lambdas, comprehensions, strings) raises ``ValueError``.
    """
    _FUNCS = {
        "exp": math.exp, "log": math.log, "log2": math.log2,
        "log10": math.log10, "sqrt": math.sqrt, "cos": math.cos,
        "sin": math.sin, "tan": math.tan, "floor": math.floor,
        "ceil": math.ceil, "pow": math.pow, "min": min, "max": max,
        "abs": abs,
    }
    _CONSTS = {"epoch": float(epoch), "pi": math.pi, "e": math.e}
    _BINOPS = {
        ast.Add: lambda a, b: a + b, ast.Sub: lambda a, b: a - b,
        ast.Mult: lambda a, b: a * b, ast.Div: lambda a, b: a / b,
        ast.FloorDiv: lambda a, b: a // b, ast.Mod: lambda a, b: a % b,
        ast.Pow: lambda a, b: a ** b,
    }
    _CMPOPS = {
        ast.Lt: lambda a, b: a < b, ast.LtE: lambda a, b: a <= b,
        ast.Gt: lambda a, b: a > b, ast.GtE: lambda a, b: a >= b,
        ast.Eq: lambda a, b: a == b, ast.NotEq: lambda a, b: a != b,
    }

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float, bool)):
                return node.value
            raise ValueError(f"non-numeric literal {node.value!r}")
        if isinstance(node, ast.Name):
            if node.id in _CONSTS:
                return _CONSTS[node.id]
            raise ValueError(f"unknown name {node.id!r}")
        if isinstance(node, ast.Attribute):
            # permit `math.<whitelisted>` spelled as in old configs
            if (
                isinstance(node.value, ast.Name)
                and node.value.id == "math"
                and node.attr in _FUNCS
            ):
                return _FUNCS[node.attr]
            if (
                isinstance(node.value, ast.Name)
                and node.value.id == "math"
                and node.attr in ("pi", "e")
            ):
                return getattr(math, node.attr)
            raise ValueError("attribute access not allowed in lr_lambda")
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            return _BINOPS[type(node.op)](ev(node.left), ev(node.right))
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                return -ev(node.operand)
            if isinstance(node.op, ast.UAdd):
                return +ev(node.operand)
            raise ValueError("unsupported unary op in lr_lambda")
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            op = node.ops[0]
            if type(op) in _CMPOPS:
                return _CMPOPS[type(op)](ev(node.left), ev(node.comparators[0]))
            raise ValueError("unsupported comparison in lr_lambda")
        if isinstance(node, ast.IfExp):
            return ev(node.body) if ev(node.test) else ev(node.orelse)
        if isinstance(node, ast.Call):
            if isinstance(node.func, ast.Name) and node.func.id in _FUNCS:
                fn = _FUNCS[node.func.id]
            elif isinstance(node.func, ast.Attribute):
                fn = ev(node.func)
            else:
                raise ValueError("only whitelisted math calls allowed")
            if node.keywords:
                raise ValueError("keyword arguments not allowed in lr_lambda")
            return fn(*[ev(a) for a in node.args])
        raise ValueError(
            f"disallowed syntax in lr_lambda: {type(node).__name__}"
        )

    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as exc:
        raise ValueError(f"invalid lr_lambda expression: {exc}") from exc
    return float(ev(tree))

Params = Any
State = Any
HParams = Dict[str, jax.Array]


# ------------------------------------------------------------- update rules


def _adagrad_init(p):
    return {"sum": jnp.zeros_like(p), "step": jnp.zeros((), jnp.float32)}


def _adagrad_update(g, s, p, hp):
    step = s["step"] + 1.0
    clr = hp["lr"] / (1.0 + (step - 1.0) * hp["lr_decay"])
    from open_knowledge_graph_embeddings_tpu.ops.pallas.adagrad_kernel import (
        adagrad_update_pallas,
        pallas_adagrad_supported,
    )

    if pallas_adagrad_supported(p):
        new_p, acc = adagrad_update_pallas(
            g, p, s["sum"], clr, hp["weight_decay"], hp["eps"]
        )
        return new_p, {"sum": acc, "step": step}
    g = g + hp["weight_decay"] * p
    acc = s["sum"] + g * g
    new_p = p - clr * g / (jnp.sqrt(acc) + hp["eps"])
    return new_p, {"sum": acc, "step": step}


def _adam_init(p):
    return {
        "m": jnp.zeros_like(p),
        "v": jnp.zeros_like(p),
        "step": jnp.zeros((), jnp.float32),
    }


def _adam_update(g, s, p, hp):
    step = s["step"] + 1.0
    g = g + hp["weight_decay"] * p
    b1, b2 = hp["beta1"], hp["beta2"]
    m = b1 * s["m"] + (1 - b1) * g
    v = b2 * s["v"] + (1 - b2) * g * g
    m_hat = m / (1 - b1 ** step)
    v_hat = v / (1 - b2 ** step)
    new_p = p - hp["lr"] * m_hat / (jnp.sqrt(v_hat) + hp["eps"])
    return new_p, {"m": m, "v": v, "step": step}


def _sgd_init(p):
    return {"momentum": jnp.zeros_like(p), "step": jnp.zeros((), jnp.float32)}


def _sgd_update(g, s, p, hp):
    g = g + hp["weight_decay"] * p
    buf = hp["momentum"] * s["momentum"] + g
    g_eff = jnp.where(hp["nesterov"] > 0, g + hp["momentum"] * buf, buf)
    # momentum == 0 -> plain SGD (torch skips the buffer entirely)
    g_eff = jnp.where(hp["momentum"] > 0, g_eff, g)
    return p - hp["lr"] * g_eff, {"momentum": buf, "step": s["step"] + 1.0}


def _rmsprop_init(p):
    return {"sq": jnp.zeros_like(p), "momentum": jnp.zeros_like(p), "step": jnp.zeros((), jnp.float32)}


def _rmsprop_update(g, s, p, hp):
    g = g + hp["weight_decay"] * p
    sq = hp["alpha"] * s["sq"] + (1 - hp["alpha"]) * g * g
    avg = jnp.sqrt(sq) + hp["eps"]
    buf = hp["momentum"] * s["momentum"] + g / avg
    new_p = jnp.where(hp["momentum"] > 0, p - hp["lr"] * buf, p - hp["lr"] * g / avg)
    return new_p, {"sq": sq, "momentum": buf, "step": s["step"] + 1.0}


def _adadelta_init(p):
    return {"sq": jnp.zeros_like(p), "acc_delta": jnp.zeros_like(p), "step": jnp.zeros((), jnp.float32)}


def _adadelta_update(g, s, p, hp):
    g = g + hp["weight_decay"] * p
    rho, eps = hp["rho"], hp["eps"]
    sq = rho * s["sq"] + (1 - rho) * g * g
    delta = jnp.sqrt(s["acc_delta"] + eps) / jnp.sqrt(sq + eps) * g
    acc_delta = rho * s["acc_delta"] + (1 - rho) * delta * delta
    return p - hp["lr"] * delta, {"sq": sq, "acc_delta": acc_delta, "step": s["step"] + 1.0}


_RULES: Dict[str, Tuple[Callable, Callable, Dict[str, float]]] = {
    "Adagrad": (_adagrad_init, _adagrad_update,
                dict(lr=0.01, lr_decay=0.0, weight_decay=0.0, eps=1e-10)),
    "Adam": (_adam_init, _adam_update,
             dict(lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=0.0)),
    "SGD": (_sgd_init, _sgd_update,
            dict(lr=0.01, momentum=0.0, weight_decay=0.0, nesterov=0.0)),
    "RMSprop": (_rmsprop_init, _rmsprop_update,
                dict(lr=0.01, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0)),
    "Adadelta": (_adadelta_init, _adadelta_update,
                 dict(lr=1.0, rho=0.9, eps=1e-6, weight_decay=0.0)),
}

_HP_ALIASES = {"betas": None, "eps": "eps"}


def _phase_hparams(opt_name: str, phase: Dict) -> Dict[str, float]:
    """Full hyperparameter dict for one regime phase (defaults + overrides)."""
    hp = dict(_RULES[opt_name][2])
    for k, v in phase.items():
        if k in ("optimizer", "epoch", "step", "match", "lr_decay") and k != "lr_decay":
            continue
        if k == "betas":
            hp["beta1"], hp["beta2"] = float(v[0]), float(v[1])
        elif k == "nesterov":
            hp["nesterov"] = 1.0 if v else 0.0
        elif k in hp:
            hp[k] = float(v)
    return hp


# ------------------------------------------------------------ param labels


def _leaf_paths(params: Params) -> List[str]:
    paths = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kp, _ in flat:
        paths.append("/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp))
    return paths


def assign_regimes(
    params: Params,
    regime_matches: Sequence[Optional[str]],
    frozen_patterns: Sequence[str] = (),
) -> Any:
    """Pytree of int regime indices per leaf (-1 = not optimized).

    Each leaf goes to the first regime whose ``match`` regex hits its
    slash-joined path (None matches everything) — reference semantics with
    the documented restriction that a param belongs to one regime.
    Leaves matching any ``frozen_patterns`` regex are never optimized.
    """

    def label(kp, _leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        for pattern in frozen_patterns:
            if re.search(pattern, path) is not None:
                return -1
        for i, pattern in enumerate(regime_matches):
            if pattern is None or re.search(pattern, path) is not None:
                return i
        return -1

    return jax.tree_util.tree_map_with_path(label, params)


# ----------------------------------------------------------------- regimes


class OptimizerRegimes:
    """A set of per-param-group phase-switched optimizers."""

    def __init__(self, optimization_config, lr_scheduler_config=None, frozen_patterns=None):
        # normalize: list of regimes, each a list of phase dicts
        if isinstance(optimization_config, dict):
            optimization_config = [optimization_config]
        self.regimes: List[List[Dict]] = []
        self.matches: List[Optional[str]] = []
        for rc in optimization_config:
            phases = rc if isinstance(rc, list) else [dict(rc)]
            phases = [dict(p) for p in phases]
            # only the first phase starts immediately; later phases keep
            # their own epoch/step trigger keys untouched (a phase keyed
            # only by 'step' must NOT inherit epoch=0)
            if phases and "epoch" not in phases[0] and "step" not in phases[0]:
                phases[0]["epoch"] = 0
            self.regimes.append(phases)
            self.matches.append(phases[0].get("match"))
        if lr_scheduler_config is None:
            lr_scheduler_config = [None] * len(self.regimes)
        elif isinstance(lr_scheduler_config, dict):
            lr_scheduler_config = [lr_scheduler_config]
        self.lr_scheduler_config = lr_scheduler_config
        self.current_phase = [None] * len(self.regimes)
        self.lr_scale = [1.0] * len(self.regimes)
        self._plateau_state = [None] * len(self.regimes)
        #: regexes of parameter paths excluded from every regime (the
        #: requires_grad=False capability of the reference's resume_freeze,
        #: openkge/trainer.py:532-536)
        self.frozen_patterns: List[str] = list(frozen_patterns or [])

    # -- host-side phase logic (reference: utils/optim.py:104-134)

    def phase_for(self, ri: int, epoch: int, steps: int) -> int:
        phases = self.regimes[ri]
        current = self.current_phase[ri]
        if current is None:
            # initial scan (e.g. resume without host meta): land on the LAST
            # phase whose trigger has already passed, not the first
            current = 0
            for i, ph in enumerate(phases):
                if epoch >= ph.get("epoch", float("inf")) or steps >= ph.get(
                    "step", float("inf")
                ):
                    current = i
        if current + 1 < len(phases):
            nxt = phases[current + 1]
            if epoch >= nxt.get("epoch", float("inf")) or steps >= nxt.get("step", float("inf")):
                current += 1
        return current

    def update(self, epoch: int, steps: int) -> bool:
        """Advance phases; returns True if any optimizer *type* changed
        (caller must rebuild the step function and reset that regime's state)."""
        type_changed = False
        for ri in range(len(self.regimes)):
            new_phase = self.phase_for(ri, epoch, steps)
            old = self.current_phase[ri]
            if old is None or new_phase != old:
                old_name = None if old is None else self.opt_name(ri, old)
                if old is not None and self.opt_name(ri, new_phase) != old_name:
                    type_changed = True
                if old is not None:
                    logger.info(
                        "OPTIMIZER regime %d phase -> %s", ri, self.regimes[ri][new_phase]
                    )
                self.current_phase[ri] = new_phase
        return type_changed

    def opt_name(self, ri: int, phase: Optional[int] = None) -> str:
        phase = self.current_phase[ri] if phase is None else phase
        phases = self.regimes[ri]
        for i in range(phase if phase is not None else 0, -1, -1):
            if "optimizer" in phases[i]:
                return phases[i]["optimizer"]
        return "Adam"  # reference default placeholder (utils/optim.py:29)

    def opt_names(self) -> List[str]:
        return [self.opt_name(ri) for ri in range(len(self.regimes))]

    def hparams(self) -> List[Dict[str, float]]:
        out = []
        for ri in range(len(self.regimes)):
            phase = self.current_phase[ri] or 0
            # later phases override earlier settings but inherit the rest
            # (reference adjust() mutates param_groups in place,
            # utils/optim.py:147-153)
            merged: Dict = {}
            for ph in self.regimes[ri][: phase + 1]:
                merged.update(ph)
            hp = _phase_hparams(self.opt_name(ri), merged)
            hp["lr"] *= self.lr_scale[ri]
            out.append(hp)
        return out

    # -- lr schedulers (reference constructs any torch scheduler by name and
    # steps it at validation time with (metric, epoch);
    # reference: utils/optim.py:154-159, openkge/trainer.py:483-484)

    def lr_scheduler_step(
        self, metric_value: float, greater_is_better: bool = True, epoch: Optional[int] = None
    ) -> None:
        for ri, cfg in enumerate(self.lr_scheduler_config):
            if not cfg:
                continue
            kind = cfg.get("lr_scheduler")
            if kind == "ReduceLROnPlateau":
                factor = float(cfg.get("factor", 0.1))
                patience = int(cfg.get("patience", 10))
                st = self._plateau_state[ri] or {"best": None, "bad": 0}
                better = st["best"] is None or (
                    metric_value > st["best"] if greater_is_better else metric_value < st["best"]
                )
                if better:
                    st["best"], st["bad"] = metric_value, 0
                else:
                    st["bad"] += 1
                    if st["bad"] > patience:
                        self.lr_scale[ri] *= factor
                        st["bad"] = 0
                        logger.info(
                            "ReduceLROnPlateau: regime %d lr_scale -> %g", ri, self.lr_scale[ri]
                        )
                self._plateau_state[ri] = st
            elif kind in (
                "StepLR", "MultiStepLR", "ExponentialLR", "CosineAnnealingLR",
                "CosineAnnealingWarmRestarts", "LinearLR", "PolynomialLR", "LambdaLR",
            ):
                # epoch-indexed schedulers: lr scale is a pure function of
                # the epoch (torch closed-form with step(epoch))
                if epoch is None:
                    continue
                gamma = float(cfg.get("gamma", 0.1))
                if kind == "StepLR":
                    scale = gamma ** (epoch // int(cfg.get("step_size", 1)))
                elif kind == "MultiStepLR":
                    milestones = sorted(cfg.get("milestones", []))
                    scale = gamma ** sum(1 for m in milestones if epoch >= int(m))
                elif kind == "ExponentialLR":
                    scale = gamma ** epoch
                elif kind in ("CosineAnnealingLR", "CosineAnnealingWarmRestarts"):
                    # torch closed form: eta_min + (base - eta_min) *
                    # (1 + cos(pi * t / T)) / 2; eta_min is an absolute lr
                    base = self._base_lr(ri)
                    eta_min = float(cfg.get("eta_min", 0.0))
                    if kind == "CosineAnnealingLR":
                        t, T = epoch, int(cfg.get("T_max", 50))
                    else:
                        t, T = epoch, int(cfg.get("T_0", 10))
                        t_mult = int(cfg.get("T_mult", 1))
                        while t >= T:
                            t -= T
                            T = T * t_mult if t_mult > 1 else T
                    lr = eta_min + (base - eta_min) * (1 + math.cos(math.pi * t / T)) / 2
                    scale = lr / base if base else 1.0
                elif kind == "LinearLR":
                    start = float(cfg.get("start_factor", 1.0 / 3.0))
                    end = float(cfg.get("end_factor", 1.0))
                    total = max(1, int(cfg.get("total_iters", 5)))
                    scale = start + (end - start) * (min(epoch, total) / total)
                elif kind == "PolynomialLR":
                    total = max(1, int(cfg.get("total_iters", 5)))
                    power = float(cfg.get("power", 1.0))
                    scale = (1.0 - min(epoch, total) / total) ** power
                else:  # LambdaLR: factor expression of `epoch` (config analog
                    # of torch's lr_lambda callable, which YAML cannot carry)
                    expr = cfg.get("lr_lambda")
                    assert expr, "LambdaLR needs an lr_lambda expression"
                    scale = safe_eval_lr_lambda(expr, epoch)
                if scale != self.lr_scale[ri]:
                    self.lr_scale[ri] = scale
                    logger.info("%s: regime %d lr_scale -> %g", kind, ri, scale)
            elif kind:
                raise ValueError(
                    f"unsupported lr_scheduler {kind!r} (supported: ReduceLROnPlateau, "
                    "StepLR, MultiStepLR, ExponentialLR, CosineAnnealingLR, "
                    "CosineAnnealingWarmRestarts, LinearLR, PolynomialLR, LambdaLR)"
                )

    def _base_lr(self, ri: int) -> float:
        """The regime's current unscaled lr (merged over reached phases)."""
        phase = self.current_phase[ri] or 0
        merged: Dict = {}
        for ph in self.regimes[ri][: phase + 1]:
            merged.update(ph)
        return float(merged.get("lr", 0.0))

    # -- device-side init/apply

    def init_state(self, params: Params) -> State:
        labels = assign_regimes(params, self.matches, self.frozen_patterns)
        names = self.opt_names()

        def init_leaf(lbl, p):
            if lbl < 0:
                return {}
            return _RULES[names[lbl]][0](p)

        return jax.tree_util.tree_map(init_leaf, labels, params)

    def make_apply(self, params_example: Params, grad_clip: Optional[float] = None):
        """Build the pure (grads, state, params, hparams) -> (new_params,
        new_state) update function; staged into the jitted train step."""
        labels = assign_regimes(params_example, self.matches, self.frozen_patterns)
        names = self.opt_names()

        def apply(grads, state, params, hparams: List[HParams]):
            if grad_clip is not None and grad_clip > 0:
                leaves = jax.tree_util.tree_leaves(grads)
                gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
                scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

            def upd(lbl, g, s, p):
                if lbl < 0:
                    return p, s
                update_fn = _RULES[names[lbl]][1]
                new_p, new_s = update_fn(g, s, p, hparams[lbl])
                return new_p, new_s

            out = jax.tree_util.tree_map(
                upd, labels, grads, state, params,
                is_leaf=lambda x: isinstance(x, int),
            )
            # out is a pytree of (param, state) tuples at leaf positions
            new_params = jax.tree_util.tree_map(
                lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_state = jax.tree_util.tree_map(
                lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple)
            )
            return new_params, new_state

        return apply

    # -- checkpointing

    def host_state(self) -> Dict:
        return {
            "current_phase": list(self.current_phase),
            "lr_scale": list(self.lr_scale),
            "plateau": [dict(s) if s else None for s in self._plateau_state],
            "regimes": self.regimes,
        }

    def load_host_state(self, d: Dict, reset: bool = False) -> None:
        self.regimes = d.get("regimes", self.regimes)
        if not reset:
            self.current_phase = d["current_phase"]
            self.lr_scale = d["lr_scale"]
            self._plateau_state = d["plateau"]
