"""Device mesh construction.

Axes:

* ``data``  — batch rows (prefixes) are sharded here; gradients for
  replicated parameters all-reduce over it,
* ``model`` — the long axes live here: entity/token embedding-table rows
  and the 1-vs-N candidate dimension of the score matrix.  This replaces
  the reference's 16k candidate chunking (reference: openkge/model.py:222-229)
  and its single-process DataParallel replication (openkge/trainer.py:143-145).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def default_mesh(devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1) -> Mesh:
    """All visible devices; ``model_parallel`` chips per model shard group."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0
    return make_mesh(data=n // model_parallel, model=model_parallel, devices=devices)
