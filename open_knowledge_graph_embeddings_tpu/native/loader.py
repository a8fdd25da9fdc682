"""ctypes bindings + build-on-import for the native components."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oket_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("OKET_NATIVE_BUILD_DIR")
    if d:
        return d
    if os.access(_HERE, os.W_OK):
        return _HERE
    return os.path.join(os.path.expanduser("~/.cache/oket"), "native")


def _lib_path() -> str:
    mtime = int(os.path.getmtime(_SRC))
    return os.path.join(_build_dir(), f"liboket_native.{mtime}.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("OKET_DISABLE_NATIVE"):
            return None
        path = _lib_path()
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp{os.getpid()}"  # per-process: concurrent builds don't collide
            cmd = [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-o", tmp, _SRC,
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(tmp, path)
            except Exception as e:  # missing toolchain / sandbox: fall back
                logger.warning("native build failed (%s); using python readers", e)
                return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            logger.warning("could not load %s (%s); using python readers", path, e)
            return None
        lib.oket_count_5col.restype = ctypes.c_int
        lib.oket_count_5col.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.oket_parse_5col.restype = ctypes.c_int64
        lib.oket_parse_5col.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def read_triple_file_native(
    path: str,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native 5-col parse; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nt = ctypes.c_int64()
    ns = ctypes.c_int64()
    no = ctypes.c_int64()
    rc = lib.oket_count_5col(path.encode(), ctypes.byref(nt), ctypes.byref(ns), ctypes.byref(no))
    if rc != 0:
        raise FileNotFoundError(f"native reader could not open {path} (rc={rc})")
    T, S, O = nt.value, ns.value, no.value
    triples = np.empty((T, 3), np.int32)
    s_off = np.zeros(T + 1, np.int64)
    s_val = np.empty(S, np.int32)
    o_off = np.zeros(T + 1, np.int64)
    o_val = np.empty(O, np.int32)
    written = lib.oket_parse_5col(
        path.encode(), triples.reshape(-1), s_off, s_val, o_off, o_val
    )
    if written != T:
        raise RuntimeError(f"native parse wrote {written} triples, counted {T} ({path})")
    return triples, s_off, s_val, o_off, o_val


# ---------------------------------------------------------- sparse-plan kernels

_PLAN_BOUND = False


def _bind_plan(lib) -> None:
    global _PLAN_BOUND
    if _PLAN_BOUND:
        return
    lib.oket_unique_remap.restype = ctypes.c_int64
    lib.oket_unique_remap.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.oket_grad_plan.restype = ctypes.c_int64
    lib.oket_grad_plan.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    _PLAN_BOUND = True


def unique_remap_native(toks: np.ndarray, vocab: int, scratch: np.ndarray):
    """Sorted unique ids (0 included) + compact remap of ``toks``.

    ``scratch`` int32 [>= vocab], reusable across calls.  Returns
    ``(uids, remapped)`` or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    _bind_plan(lib)
    flat = np.ascontiguousarray(toks.reshape(-1), dtype=np.int32)
    uids_buf = np.empty(flat.size + 1, np.int32)
    remapped = np.empty(flat.size, np.int32)
    u = lib.oket_unique_remap(flat, flat.size, vocab, scratch, uids_buf, remapped)
    if u < 0:
        return None
    return uids_buf[:u].copy(), remapped.reshape(toks.shape)


def grad_plan_native(remapped: np.ndarray, n_unique: int, K: int, oob: int):
    """Native gather-sum plan over a remapped [R, L] token matrix; mirrors
    train/sparse.py build_token_grad_plan (pinned by tests).  Returns
    ``(pos [S,K], valid [S,K] bool, uid [S], n_slots)`` with S the
    worst-case capacity (caller buckets/trims), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    _bind_plan(lib)
    R, L = remapped.shape
    rm = np.ascontiguousarray(remapped, dtype=np.int32)
    n = R * L
    cap = int(n_unique + n // K + 2)
    scratch = np.empty(max(n_unique + 1, L + 1) + R, np.int64)
    pos = np.zeros(cap * K, np.int32)  # unused cells must be in-range for jnp.take
    valid = np.zeros(cap * K, np.uint8)
    uid = np.empty(cap, np.int32)
    s = lib.oket_grad_plan(rm, R, L, n_unique, K, oob, cap, scratch, pos, valid, uid)
    if s < 0:
        return None
    return (
        pos.reshape(cap, K), valid.reshape(cap, K).astype(bool), uid, int(s),
    )
