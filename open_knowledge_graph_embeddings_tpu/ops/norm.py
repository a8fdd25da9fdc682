"""Batch normalization with torch.nn.BatchNorm1d semantics, functional style.

State (running mean/var, num_batches) lives in the model's mutable state
pytree; apply() returns (output, new_state).  Matches torch:

* train: normalize by biased batch variance, update running stats with
  *unbiased* variance; ``running = (1 - m) * running + m * batch``,
* ``momentum=None`` -> cumulative moving average over batches seen,
* eval: normalize by running statistics.

The reference relies on these exact semantics in encoder pipelines
(reference: openkge/model.py:440-442, 613-617, 859-860).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def init_batchnorm(
    num_features: int, uniform_weight: bool = False, rng: Optional[jax.Array] = None
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Returns (params {scale, bias}, state {mean, var, count}).

    ``uniform_weight`` replicates the reference's U(0,1) re-init of BN scale
    for token embedders (reference: openkge/model.py:616-617).
    """
    if uniform_weight:
        assert rng is not None
        scale = jax.random.uniform(rng, (num_features,), jnp.float32)
    else:
        scale = jnp.ones((num_features,), jnp.float32)
    params = {"scale": scale, "bias": jnp.zeros((num_features,), jnp.float32)}
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }
    return params, state


def apply_batchnorm(
    params: Dict[str, jax.Array],
    state: Dict[str, jax.Array],
    x: jax.Array,
    train: bool,
    momentum: Optional[float] = 0.1,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)  # biased, used for normalization
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        if momentum is None:
            # cumulative moving average (torch momentum=None)
            cnt = state["count"]
            new_mean = (state["mean"] * cnt + mean) / (cnt + 1.0)
            new_var = (state["var"] * cnt + unbiased) / (cnt + 1.0)
            new_state = {"mean": new_mean, "var": new_var, "count": cnt + 1.0}
        else:
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
                "count": state["count"] + 1.0,
            }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state
