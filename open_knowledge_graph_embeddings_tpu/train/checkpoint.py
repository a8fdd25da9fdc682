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

Multi-process runs use a **per-shard** format instead: each process writes
``arrays.p{rank}.npz`` + ``index.p{rank}.json`` containing only the array
shards whose replica 0 it owns (so each global shard is written exactly
once, by one process), and rank 0 writes ``meta.json`` last as the
completion marker.  Loading reassembles per-process via
``jax.make_array_from_callback`` against the *target* leaves' shardings —
no process ever materializes a full sharded table on the host.  At the
north-star scale (2.47M x 512 entity table + its Adagrad accumulator,
~10 GB f32) the previous replicate-to-all-chips save was exactly the OOM
the model axis exists to avoid.
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


# ------------------------------------------------- per-shard save/load


def local_checkpoint_chunks(
    arrays_tree: Dict[str, Any],
) -> Tuple[Dict[str, np.ndarray], Dict[str, Dict[str, Any]]]:
    """This process's slab of a sharded checkpoint.

    For each leaf, every addressable shard with ``replica_id == 0`` becomes
    one chunk — across processes each distinct global shard has exactly one
    replica 0, so the union of all slabs covers every array exactly once
    with no full-array gather anywhere.  Returns ``(chunks, index)`` where
    ``chunks`` maps npz entry names to host arrays and ``index`` maps flat
    keys to ``{"shape", "dtype", "chunks": [{"entry", "start", "stop"}]}``.
    """
    chunks: Dict[str, np.ndarray] = {}
    index: Dict[str, Dict[str, Any]] = {}
    for key, leaf in arrays_tree.items():
        shape = tuple(getattr(leaf, "shape", ()))
        entry_list = []
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            seen = set()
            for shard in leaf.addressable_shards:
                if shard.replica_id != 0:
                    continue
                norm = tuple(
                    sl.indices(dim) for sl, dim in zip(shard.index, shape)
                ) if shard.index else ()
                if norm in seen:
                    continue
                seen.add(norm)
                entry = f"{key}::{len(entry_list)}"
                chunks[entry] = np.asarray(shard.data)
                entry_list.append({
                    "entry": entry,
                    "start": [s[0] for s in norm],
                    "stop": [s[1] for s in norm],
                })
            dtype = str(np.dtype(leaf.dtype))
        else:
            arr = np.asarray(leaf)
            entry = f"{key}::0"
            chunks[entry] = arr
            entry_list.append({
                "entry": entry,
                "start": [0] * arr.ndim,
                "stop": list(arr.shape),
            })
            dtype = str(arr.dtype)
        if entry_list:
            index[key] = {"shape": list(shape), "dtype": dtype, "chunks": entry_list}
    return chunks, index


def gather_local_shard_tree(variables: Any, opt_state: Any) -> Dict[str, Any]:
    """Flat {key -> leaf} WITHOUT host transfer (leaves stay jax.Arrays so
    the chunker can read per-shard)."""
    out: Dict[str, Any] = {}
    for prefix, tree in (("params", variables.get("params", {})),
                         ("state", variables.get("state", {})),
                         ("opt", opt_state)):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            out[f"{prefix}/{path}" if path else prefix] = leaf
    return out


def write_shard_slab(directory: str, rank: int, chunks, index) -> None:
    np.savez(os.path.join(directory, f"arrays.p{rank}.npz"), **chunks)
    with open(os.path.join(directory, f"index.p{rank}.json"), "w") as f:
        json.dump(index, f)


class _FullReader:
    """Single-file checkpoint (arrays.npz) behind the reader interface.

    Entries are cached on first load: NpzFile decompresses on every
    ``__getitem__``, and loading re-reads each array at least twice (shape
    check + materialize) — more for sharded targets reading per-region."""

    def __init__(self, path: str):
        self._z = np.load(os.path.join(path, "arrays.npz"))
        self._cache: Dict[str, np.ndarray] = {}

    def keys(self):
        return list(self._z.files)

    def _get(self, key):
        if key not in self._cache:
            self._cache[key] = self._z[key]
        return self._cache[key]

    def shape(self, key):
        return self._get(key).shape

    def read_full(self, key):
        return self._get(key)

    def read_region(self, key, norm_idx):
        return self._get(key)[tuple(slice(a, b) for a, b in norm_idx)]


class _ShardReader:
    """Per-shard checkpoint: lazily opens only the slab files that contain
    chunks overlapping a requested region.

    Chunk entry names (``key::i``) are only unique *per rank*, so each chunk
    record is tagged with its slab file at index-merge time and lookups are
    keyed by ``(slab, entry)`` — a global entry->slab map would collide when
    one parameter's replica-0 shards span processes (model axis over hosts)
    and silently read every region from one rank's slab."""

    def __init__(self, path: str):
        self.path = path
        self.index: Dict[str, Dict[str, Any]] = {}
        self._open: Dict[str, Any] = {}
        import glob

        for idx_file in sorted(glob.glob(os.path.join(path, "index.p*.json"))):
            slab = idx_file.replace("index.p", "arrays.p").replace(".json", ".npz")
            with open(idx_file) as f:
                part = json.load(f)
            for key, info in part.items():
                entry = self.index.setdefault(
                    key, {"shape": info["shape"], "dtype": info["dtype"], "chunks": []}
                )
                for c in info["chunks"]:
                    entry["chunks"].append({**c, "slab": slab})

    def keys(self):
        return list(self.index)

    def shape(self, key):
        return tuple(self.index[key]["shape"])

    def _load_entry(self, slab: str, entry: str) -> np.ndarray:
        if slab not in self._open:
            self._open[slab] = np.load(slab)
        return self._open[slab][entry]

    def read_region(self, key, norm_idx) -> np.ndarray:
        info = self.index[key]
        shape = tuple(info["shape"])
        if not shape:  # scalar
            c0 = info["chunks"][0]
            return self._load_entry(c0["slab"], c0["entry"])
        out_shape = tuple(b - a for a, b in norm_idx)
        out = np.empty(out_shape, dtype=np.dtype(info["dtype"]))
        filled = 0
        for c in info["chunks"]:
            inter = [
                (max(a, cs), min(b, ce))
                for (a, b), cs, ce in zip(norm_idx, c["start"], c["stop"])
            ]
            if any(lo >= hi for lo, hi in inter):
                continue
            src = self._load_entry(c["slab"], c["entry"])
            src_sl = tuple(
                slice(lo - cs, hi - cs) for (lo, hi), cs in zip(inter, c["start"])
            )
            dst_sl = tuple(
                slice(lo - a, hi - a) for (lo, hi), (a, _b) in zip(inter, norm_idx)
            )
            out[dst_sl] = src[src_sl]
            filled += int(np.prod([hi - lo for lo, hi in inter]))
        assert filled == int(np.prod(out_shape)), (
            f"checkpoint chunks do not cover requested region of {key}"
        )
        return out

    def read_full(self, key) -> np.ndarray:
        return self.read_region(
            key, tuple((0, d) for d in self.index[key]["shape"])
        )


def open_checkpoint_reader(path: str):
    if os.path.exists(os.path.join(path, "arrays.npz")):
        return _FullReader(path)
    return _ShardReader(path)


def _normalize_index(idx, shape):
    if not idx:
        return tuple((0, d) for d in shape)
    return tuple(
        (sl.indices(dim)[0], sl.indices(dim)[1]) for sl, dim in zip(idx, shape)
    )


def materialize_like(reader, key: str, target_leaf: Any):
    """Build the restored leaf: sharded targets assemble per-device via
    ``jax.make_array_from_callback`` (each process reads only the regions
    its devices hold — no full-array host materialization); everything else
    reads the full entry."""
    shape = reader.shape(key)
    if (
        isinstance(target_leaf, jax.Array)
        and hasattr(target_leaf, "sharding")
        and len(target_leaf.sharding.device_set) > 1
    ):
        return jax.make_array_from_callback(
            tuple(shape),
            target_leaf.sharding,
            lambda idx: reader.read_region(key, _normalize_index(idx, shape)),
        )
    return jnp.asarray(reader.read_full(key))


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

    Works on both formats (single ``arrays.npz``, per-shard slabs); sharded
    target leaves are reassembled shard-by-shard without a full-array host
    copy (see :func:`materialize_like`).
    """
    reader = open_checkpoint_reader(path)
    # ckpt key -> target key, after renames and filters
    keymap = {k: k for k in reader.keys()}
    if weight_map:
        for old, new in weight_map.items():
            if old in keymap:
                keymap[old] = new
    if resume_filter is not None:
        for ck, tk in list(keymap.items()):
            bare = tk.split("/", 1)[1] if "/" in tk else tk
            if tk.startswith("params/") and not any(f in bare for f in resume_filter):
                del keymap[ck]
    # drop shape mismatches (strict=False semantics, reference :519-530) —
    # checked from the index, no data read
    example = {}
    example.update(flatten_shapes(variables.get("params", {}), "params"))
    example.update(flatten_shapes(variables.get("state", {}), "state"))
    example.update(flatten_shapes(opt_state, "opt"))
    for ck, tk in list(keymap.items()):
        if tk in example and example[tk] != tuple(reader.shape(ck)):
            logger.warning(
                "skipping %s: shape %s != %s", tk, tuple(reader.shape(ck)), example[tk]
            )
            del keymap[ck]
    # Renamed keys take deterministic priority over identity-mapped keys
    # when both land on the same target (reference semantics: the renamed
    # array overwrites the original, openkge/trainer.py:507-510).
    renamed = set(weight_map or ())
    by_target: Dict[str, str] = {}
    for ck, tk in keymap.items():
        if tk in by_target and by_target[tk] in renamed and ck not in renamed:
            continue
        if tk in by_target and ck != by_target[tk]:
            logger.warning("weight_map target collision on %s: using %s",
                           tk, ck if ck in renamed else by_target[tk])
        if tk not in by_target or ck in renamed:
            by_target[tk] = ck

    def restore_tree(tree: Any, prefix: str) -> Any:
        def repl(kp, leaf):
            p = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            tk = f"{prefix}/{p}" if p else prefix
            if tk in by_target:
                return materialize_like(reader, by_target[tk], leaf)
            return leaf

        return jax.tree_util.tree_map_with_path(repl, tree)

    new_vars = dict(variables)
    new_vars["params"] = restore_tree(variables["params"], "params")
    new_vars["state"] = restore_tree(variables.get("state", {}), "state")
    new_opt = restore_tree(opt_state, "opt") if load_optimizer else opt_state
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

    def _post_write(self, path: str, name: str, meta, is_best, tags, save_all):
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
            self._post_write(path, name, meta, is_best, tags, save_all)

        self.wait()
        if self.async_write:
            import threading

            self._pending = threading.Thread(target=job, daemon=True)
            self._pending.start()
        else:
            job()
        return path

    def save_sharded(
        self,
        variables,
        opt_state,
        meta: Dict[str, Any],
        rank: int,
        n_ranks: Optional[int] = None,
        is_best: bool = False,
        tags: Optional[List[str]] = None,
        save_all: bool = False,
        barrier=None,
    ) -> str:
        """Collective per-shard save — every process calls this in lockstep
        on a SHARED checkpoint directory.  Each process writes only the
        shards whose replica 0 it owns (:func:`local_checkpoint_chunks`):
        nothing is replicated across the mesh, no process holds a full
        sharded table.

        Only the device->host shard fetch and one dir-creation barrier run
        on the calling thread (device collectives must enqueue in a
        consistent order across hosts, so they cannot move to a thread);
        slab serialization + IO runs in the background.  Write-completion
        ordering uses per-rank ``done.p{rank}`` sentinel files in the shared
        tmp dir: rank 0's writer thread waits for all sentinels, then writes
        ``meta.json`` (the completion marker), renames tmp into place and
        performs rotation/best-copies.  :meth:`wait` on any rank blocks
        until the finalized checkpoint is visible.

        ``barrier``: injection point for tests; defaults to
        ``jax.experimental.multihost_utils.sync_global_devices``.
        """
        if barrier is None:
            from jax.experimental import multihost_utils

            barrier = multihost_utils.sync_global_devices
        if n_ranks is None:
            n_ranks = jax.process_count()
        self._save_seq = getattr(self, "_save_seq", 0) + 1
        seq = self._save_seq
        name = self.next_name()
        path = os.path.join(self.save_path, name)
        tmp = path + ".tmp"
        self.wait()
        # synchronous: snapshot this process's shards to host before the
        # next donated train step invalidates the device buffers
        chunks, index = local_checkpoint_chunks(
            gather_local_shard_tree(variables, opt_state)
        )
        if rank == 0:
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp, exist_ok=True)
        barrier(f"oket-ckpt-dir-{seq}")

        def job():
            import time as _time

            write_shard_slab(tmp, rank, chunks, index)
            with open(os.path.join(tmp, f"done.p{rank}"), "w"):
                pass
            if rank == 0:
                deadline = _time.time() + 1800.0
                want = [os.path.join(tmp, f"done.p{r}") for r in range(n_ranks)]
                while not all(os.path.exists(w) for w in want):
                    if _time.time() > deadline:
                        raise RuntimeError(
                            f"sharded save {path}: slab sentinels missing after 1800s"
                        )
                    _time.sleep(0.05)
                for w in want:
                    os.remove(w)
                with open(os.path.join(tmp, "meta.json"), "w") as f:
                    json.dump(meta, f, default=str)
                if os.path.exists(path):
                    shutil.rmtree(path)
                os.replace(tmp, path)
                logger.info("saved sharded checkpoint %s", path)
                self._post_write(path, name, meta, is_best, tags, save_all)

        self._last_finalized = os.path.join(path, "meta.json")
        if self.async_write:
            import threading

            self._pending = threading.Thread(target=job, daemon=True)
            self._pending.start()
        else:
            job()
        return path

    def wait_finalized(self, timeout: float = 1800.0) -> None:
        """After :meth:`wait`, also poll until rank 0's finalize of the last
        sharded save is visible (non-zero ranks only join their own slab
        write — the rename into place happens on rank 0's writer thread)."""
        import time as _time

        self.wait()
        marker = getattr(self, "_last_finalized", None)
        if marker is None:
            return
        deadline = _time.time() + timeout
        while not os.path.exists(marker):
            if _time.time() > deadline:
                raise RuntimeError(f"sharded checkpoint {marker} never finalized")
            _time.sleep(0.05)


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
