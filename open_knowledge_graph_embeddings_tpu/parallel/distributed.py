"""Multi-host (multi-process) execution wiring.

The reference's only multi-device story is single-process
``torch.nn.DataParallel`` (reference: openkge/trainer.py:143-145).  The
TPU-native replacement spans hosts: each process owns a slice of the chips,
``jax.distributed.initialize`` connects them over DCN, and one global
``Mesh`` spans every chip so XLA routes collectives over ICI within a host
and DCN across hosts.

Input-pipeline contract (mirrors what DataParallel actually computes): the
*whole* batch — including the batch-shared candidate set, which depends on
every row's answers — is built identically on every host (same dataset, same
seed, deterministic builder), and each host materializes only its local
rows via ``jax.make_array_from_process_local_data``.  This makes an
n-process run bit-identical to the 1-process run on the same global mesh
(asserted by tests/test_multihost.py), which is the property that lets
loss curves be compared across pod-slice sizes.

Evaluation sharding is different: eval prefixes are independent, so hosts
evaluate disjoint slices (``BatchBuilder(host_shard=...)``) on a host-local
sub-mesh (:func:`local_eval_mesh` + :func:`variables_to_host_local`) and
the summed metric vectors are reduced with :func:`all_processes_sum` at the
end — wired in Trainer.evaluate, asserted by tests/test_multihost.py.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def maybe_initialize_distributed(args: Optional[Dict[str, Any]] = None) -> Tuple[int, int]:
    """Connect this process to the JAX distributed runtime when configured.

    Configuration sources (first match wins):

    * config keys ``coordinator_address`` / ``num_processes`` / ``process_id``
    * env vars ``OKET_COORDINATOR`` / ``OKET_NUM_PROCESSES`` / ``OKET_PROCESS_ID``
    * TPU pod autodetection (``jax.distributed.initialize()`` with no args)
      when ``OKET_AUTO_DISTRIBUTED=1``.

    Returns (process_index, process_count); (0, 1) when not distributed.
    """
    args = args or {}
    coord = args.get("coordinator_address") or os.environ.get("OKET_COORDINATOR")
    nproc = args.get("num_processes") or os.environ.get("OKET_NUM_PROCESSES")
    pid = args.get("process_id")
    if pid is None:
        pid = os.environ.get("OKET_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=str(coord),
            num_processes=int(nproc),
            process_id=int(pid),
        )
        logger.info(
            "jax.distributed: process %d/%d via %s (%d local / %d global devices)",
            jax.process_index(), jax.process_count(), coord,
            len(jax.local_devices()), len(jax.devices()),
        )
    elif os.environ.get("OKET_AUTO_DISTRIBUTED"):
        jax.distributed.initialize()  # TPU pod metadata autodetection
        logger.info(
            "jax.distributed (auto): process %d/%d",
            jax.process_index(), jax.process_count(),
        )
    return jax.process_index(), jax.process_count()


def put_global_batch(batch_arrays: Dict[str, Any], shardings: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a host-built batch onto (possibly multi-process) shardings.

    Every process passes the FULL global batch (identical across processes);
    each only materializes the shards its local devices own.  In
    single-process runs this degrades to a plain ``jax.device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch_arrays, shardings)
    out = {}
    for k, v in batch_arrays.items():
        sh = shardings[k]
        arr = np.asarray(v)
        # every process holds the FULL array; the callback hands each local
        # device exactly its shard (jax.make_array_from_process_local_data
        # would instead CONCATENATE per-process data into a larger global)
        out[k] = jax.make_array_from_callback(arr.shape, sh, lambda idx, a=arr: a[idx])
    return out


def local_eval_mesh(global_mesh) -> Optional[Any]:
    """Host-local sub-mesh for per-host evaluation, or None.

    Valid when every model-axis group (one row of the mesh's
    ``[data, model]`` device array) is owned by a single process — the
    ``default_mesh`` layout puts the model axis within a host and the data
    axis across hosts, so this process's local devices form complete model
    groups and hold a full copy of every (model-sharded or replicated)
    parameter.  Evaluation then runs host-locally with no cross-host
    collectives, each host covering a disjoint slice of the eval set.

    Returns None in single-process runs or when model groups span hosts
    (fall back to replicated evaluation on the global mesh).
    """
    if jax.process_count() == 1:
        return None
    from jax.sharding import Mesh

    dev = np.asarray(global_mesh.devices)
    pid = jax.process_index()
    local_rows = []
    for row in dev:
        procs = {d.process_index for d in np.atleast_1d(row)}
        if len(procs) != 1:
            return None  # a model group spans hosts; can't evaluate locally
        if procs.pop() == pid:
            local_rows.append(np.atleast_1d(row))
    if not local_rows:
        return None
    return Mesh(np.stack(local_rows), global_mesh.axis_names)


def variables_to_host_local(tree: Any, global_mesh, shardings: Any) -> Any:
    """Convert globally-sharded arrays to host-local arrays (each process's
    complete copy, viewing only its own shards).  Only meaningful under a
    mesh accepted by :func:`local_eval_mesh`."""
    from jax.experimental import multihost_utils

    pspecs = jax.tree_util.tree_map(lambda s: s.spec, shardings)
    return multihost_utils.global_array_to_host_local_array(tree, global_mesh, pspecs)


def all_processes_sum(x: np.ndarray) -> np.ndarray:
    """Sum a small host-side vector across processes (eval metric reduction);
    a no-op in single-process runs."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0)
