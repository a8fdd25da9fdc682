"""Checkpoint save/load with rotation, best-model tagging, partial resume.

Capability equivalent of the reference's torch checkpoints
(reference: openkge/trainer.py:489-638): rotating ``checkpoint{0..k-1}``,
``model_best-{metric}`` copies with previous-best archival, full config
embedded, partial loads with a name whitelist (``resume_filter``), freeze
lists and ``weight_map`` renames, and optimizer warm-restart vs reset.

Format: one directory per checkpoint containing ``arrays.npz`` (params,
batch-norm state and optimizer accumulators flattened to slash-joined path
keys) and ``meta.json`` (step counters, config, host-side optimizer phase
state, results history).  Buffers (token-id matrices) are *not* saved — they
are derived from the dataset and rebuilt at model construction.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


# ------------------------------------------------------- pytree <-> flat


def flatten_arrays(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[f"{prefix}/{path}" if path else prefix] = np.asarray(leaf)
    return out


def flatten_shapes(tree: Any, prefix: str) -> Dict[str, tuple]:
    """Leaf shapes by flattened path — no device->host transfer (flattening
    the actual arrays costs minutes over a remote-TPU link)."""
    out: Dict[str, tuple] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        out[f"{prefix}/{path}" if path else prefix] = tuple(getattr(leaf, "shape", ()))
    return out


def unflatten_into(tree: Any, prefix: str, arrays: Dict[str, np.ndarray]) -> Any:
    """Rebuild ``tree`` with leaves replaced by matching entries of ``arrays``."""

    def repl(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        key = f"{prefix}/{path}" if path else prefix
        if key in arrays:
            return jnp.asarray(arrays[key])
        return leaf

    return jax.tree_util.tree_map_with_path(repl, tree)


# -------------------------------------------------------------- save/load


def _write_checkpoint_files(
    directory: str, name: str, arrays: Dict[str, np.ndarray], meta: Dict[str, Any]
) -> str:
    path = os.path.join(directory, name)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    np.savez(os.path.join(tmp, "arrays.npz"), **arrays)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, default=str)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    logger.info("saved checkpoint %s", path)
    return path


def gather_checkpoint_arrays(variables: Any, opt_state: Any) -> Dict[str, np.ndarray]:
    """Device->host fetch of everything a checkpoint stores (the only
    synchronous part of an async save)."""
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(flatten_arrays(variables.get("params", {}), "params"))
    arrays.update(flatten_arrays(variables.get("state", {}), "state"))
    arrays.update(flatten_arrays(opt_state, "opt"))
    return arrays


def save_checkpoint(
    directory: str,
    name: str,
    variables: Any,
    opt_state: Any,
    meta: Dict[str, Any],
) -> str:
    return _write_checkpoint_files(
        directory, name, gather_checkpoint_arrays(variables, opt_state), meta
    )


def load_checkpoint_meta(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


def load_checkpoint(
    path: str,
    variables: Any,
    opt_state: Any,
    resume_filter: Optional[List[str]] = None,
    weight_map: Optional[Dict[str, str]] = None,
    load_optimizer: bool = True,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore into existing pytrees; shapes must match for loaded names.

    ``resume_filter``: whitelist of parameter paths (params/... keys) to load.
    ``weight_map``: rename checkpoint paths before matching
    (reference: openkge/trainer.py:507-510).
    """
    z = np.load(os.path.join(path, "arrays.npz"))
    arrays = {k: z[k] for k in z.files}
    if weight_map:
        for old, new in weight_map.items():
            if old in arrays:
                arrays[new] = arrays.pop(old)
    if resume_filter is not None:
        keep = set()
        for k in list(arrays):
            bare = k.split("/", 1)[1] if "/" in k else k
            if k.startswith("params/") and not any(f in bare for f in resume_filter):
                del arrays[k]
    # drop shape mismatches (strict=False semantics, reference :519-530)
    example = {}
    example.update(flatten_shapes(variables.get("params", {}), "params"))
    example.update(flatten_shapes(variables.get("state", {}), "state"))
    example.update(flatten_shapes(opt_state, "opt"))
    for k in list(arrays):
        if k in example and example[k] != arrays[k].shape:
            logger.warning("skipping %s: shape %s != %s", k, arrays[k].shape, example[k])
            del arrays[k]
    new_vars = dict(variables)
    new_vars["params"] = unflatten_into(variables["params"], "params", arrays)
    new_vars["state"] = unflatten_into(variables.get("state", {}), "state", arrays)
    new_opt = unflatten_into(opt_state, "opt", arrays) if load_optimizer else opt_state
    meta = load_checkpoint_meta(path)
    logger.info("loaded checkpoint %s (training_steps=%s)", path, meta.get("training_steps"))
    return new_vars, new_opt, meta


class CheckpointManager:
    """Rotation + best-model tagging (reference: openkge/trainer.py:608-638).

    ``async_write=True`` (default) performs the file write, rotation and
    best-copies on a background thread: the training loop only pays for the
    device->host fetch, not the (much larger) serialization + disk IO.  At
    most one write is in flight; a new save joins the previous one first, so
    rotation order is preserved.  Call :meth:`wait` before reading a
    just-saved checkpoint.
    """

    def __init__(self, save_path: str, keep_checkpoints: int = 5, async_write: bool = True):
        self.save_path = save_path
        self.keep = keep_checkpoints
        self.async_write = async_write
        self._counter = 0
        self._pending = None
        os.makedirs(save_path, exist_ok=True)

    def next_name(self) -> str:
        name = f"checkpoint{self._counter}"
        self._counter = (self._counter + 1) % self.keep
        return name

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def save(
        self,
        variables,
        opt_state,
        meta: Dict[str, Any],
        is_best: bool = False,
        tags: Optional[List[str]] = None,
        save_all: bool = False,
    ) -> str:
        name = self.next_name()
        path = os.path.join(self.save_path, name)
        # synchronous part: fetch to host (the arrays must be snapshotted
        # before the next donated train step invalidates the device buffers)
        arrays = gather_checkpoint_arrays(variables, opt_state)

        def job():
            _write_checkpoint_files(self.save_path, name, arrays, meta)
            if is_best:
                for tag in tags or ["best"]:
                    best = os.path.join(self.save_path, f"model_best-{tag}")
                    if os.path.exists(best):
                        prev = os.path.join(self.save_path, f"model_best-{tag}-{name}")
                        if os.path.exists(prev):
                            shutil.rmtree(prev)
                        shutil.move(best, prev)
                    shutil.copytree(path, best)
            if save_all:
                epoch_path = os.path.join(
                    self.save_path, f"checkpoint_epoch_{meta.get('epoch')}"
                )
                if os.path.exists(epoch_path):
                    shutil.rmtree(epoch_path)
                shutil.copytree(path, epoch_path)

        self.wait()
        if self.async_write:
            import threading

            self._pending = threading.Thread(target=job, daemon=True)
            self._pending.start()
        else:
            job()
        return path


def merge_resume_config(args: Dict[str, Any], ckpt_config: Dict[str, Any]) -> Dict[str, Any]:
    """Adopt the checkpoint's config except run-control keys
    (reference: openkge/utils.py:19-61)."""
    keep_keys = {
        "resume", "resume_filter", "resume_freeze", "resume_load_args", "reset_optimizer",
        "train", "evaluate", "evaluate_on_validation", "evaluate_scores_file",
        "devices", "no_cuda", "results_dir", "experiment_dir", "epochs",
    }
    merged = dict(ckpt_config)
    for k in keep_keys:
        if k in args:
            merged[k] = args[k]
    return merged
