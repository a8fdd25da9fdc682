"""Small host-side helpers: seeding, ragged-array packing, shape rounding.

Ragged answer/mention lists are represented framework-wide as CSR-style
(offsets, values) numpy arrays instead of the offset-shifted flat encoding the
reference uses (reference: utils/misc.py:56-89 pack_list_of_lists).  CSR keeps
slicing O(1), vectorizes in numpy, and converts directly into the static-shape
padded tensors the TPU step functions consume.
"""

from __future__ import annotations

import random
from typing import Iterable, List, Sequence, Tuple

import numpy as np


def set_global_seeds(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def pack_ragged(list_of_lists: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a list of int lists into CSR (offsets[int64, n+1], values[int32])."""
    offsets = np.zeros(len(list_of_lists) + 1, dtype=np.int64)
    total = 0
    for i, lst in enumerate(list_of_lists):
        total += len(lst)
        offsets[i + 1] = total
    values = np.empty(total, dtype=np.int32)
    pos = 0
    for lst in list_of_lists:
        values[pos : pos + len(lst)] = lst
        pos += len(lst)
    return offsets, values


def unpack_ragged(offsets: np.ndarray, values: np.ndarray) -> List[List[int]]:
    return [values[offsets[i] : offsets[i + 1]].tolist() for i in range(len(offsets) - 1)]


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def next_bucket(n: int, minimum: int = 128) -> int:
    """Smallest power-of-two >= n (and >= minimum).

    Used to bucket data-dependent sizes (batch-shared candidate counts,
    positive-label counts) into a small number of static shapes so jitted
    step functions compile only a handful of times.
    """
    b = max(minimum, 1)
    while b < n:
        b <<= 1
    return b


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def prettyformat_dict(d: dict, indent: str = "") -> str:
    out = []
    for k, v in d.items():
        if isinstance(v, dict):
            out.append(f"{indent}{k}:\n{prettyformat_dict(v, indent + '  ')}")
        else:
            out.append(f"{indent}{k}: {v}\n")
    return "".join(out)


def flatten_once(lists: Iterable[Sequence[int]]) -> List[int]:
    out: List[int] = []
    for l in lists:
        out.extend(l)
    return out
