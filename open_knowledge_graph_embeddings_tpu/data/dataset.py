"""Dataset layer: mapped-to-ids readers, prefix grouping, filter indices.

Consumes the same on-disk contract as the reference framework
(reference: openkge/default.yaml:100-150, openkge/dataset.py:49-54):

* ``{train,valid,test}.txt`` — 5 TAB columns per line::

      subj_id  rel_id  obj_id  subj_entity_ids(space-sep)  obj_entity_ids(space-sep)

  Columns 4/5 list the *mention* ids that realize the subject/object entity
  (for closed KGs they duplicate columns 1/3).
* ``entity_id_map.txt`` (``text\tid\tcount``), ``entity_id_tokens_ids_map.txt``
  (``id\ttok_ids``), ``entity_token_id_map.txt`` and relation analogues.

Training/evaluation examples are 1-vs-N *prefix* records in two directions
(reference: openkge/dataset.py:481-518):

* ``sp_o``: prefix=(subj, rel), slot=2, answer groups from column 5,
* ``po_s``: prefix=(rel, obj),  slot=0, answer groups from column 4,

where each input line contributes one *answer group* (the mention
alternatives of one gold entity).  Unlike the reference's
offset-shifted flat ``pack_list_of_lists`` tensors
(reference: openkge/dataset.py:567-710), everything here is CSR numpy —
O(1) slicing, vectorized batch construction, and direct conversion to the
static-shape device arrays the jitted TPU step functions require.  All
derived structures are cached as ``.npz`` next to the data (or in a mirror
cache dir when the dataset dir is read-only).
"""

from __future__ import annotations

import hashlib
import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from open_knowledge_graph_embeddings_tpu.data.vocab import BOS, EOS, PAD, UNK

logger = logging.getLogger(__name__)

SLOT_PO = 0  # prefix = (rel, obj), predict subject
SLOT_SP = 2  # prefix = (subj, rel), predict object

_CACHE_VERSION = 4


# ----------------------------------------------------------------------- meta


@dataclass
class DatasetMeta:
    """Static vocabulary metadata shared by datasets and models.

    Equivalent of the reference's EntityRelationDatasetMeta
    (reference: openkge/dataset.py:25-40) plus dense token-id matrices, which
    the reference builds inside the model (reference: openkge/model.py:579-595)
    but on TPU belong with the data: they are static [num_items, max_len]
    int32 arrays consumed directly by token-based encoders.
    """

    entities_size: int
    relations_size: int
    min_entities_size: int  # first real entity id (PAD/UNK excluded)
    min_relations_size: int
    entity_tokens_size: int
    relation_tokens_size: int
    max_length: Tuple[int, int]
    entity_token_ids: Optional[np.ndarray] = None  # [entities_size, max_length[0]] int32
    relation_token_ids: Optional[np.ndarray] = None  # [relations_size, max_length[1]] int32
    entity_id_counts: Optional[np.ndarray] = None
    relation_id_counts: Optional[np.ndarray] = None

    @property
    def num_candidate_entities(self) -> int:
        return self.entities_size - self.min_entities_size


def _token_matrix(id_to_tokens: Dict[int, List[int]], size: int, max_len: int) -> np.ndarray:
    """Dense [size, max_len] token-id matrix, truncating to the LAST max_len
    tokens (matches reference truncation, openkge/model.py:581-585)."""
    mat = np.zeros((size, max_len), dtype=np.int32)
    for iid, toks in id_to_tokens.items():
        toks = toks[-max_len:]
        mat[iid, : len(toks)] = toks
    return mat


def _read_id_map(path: str) -> Tuple[Dict[str, int], Dict[int, int], int]:
    text_to_id: Dict[str, int] = {}
    id_counts: Dict[int, int] = {}
    max_id = -1
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f):
            if ln == 0 and line.startswith("#"):
                continue
            parts = line.rstrip("\n").split("\t")
            text, iid, count = parts[0], int(parts[1]), int(parts[2])
            text_to_id[text] = iid
            id_counts[iid] = count
            max_id = max(max_id, iid)
    return text_to_id, id_counts, max_id


def _read_id_tokens_map(path: str) -> Tuple[Dict[int, List[int]], int]:
    id_to_tokens: Dict[int, List[int]] = {}
    max_tok = -1
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f):
            if ln == 0 and line.startswith("#"):
                continue
            iid_s, toks_s = line.rstrip("\n").split("\t")
            toks = [int(t) for t in toks_s.split()]
            id_to_tokens[int(iid_s)] = toks
            max_tok = max(max_tok, max(toks))
    return id_to_tokens, max_tok


def load_meta(
    dataset_dir: str,
    max_lengths_tuple: Tuple[int, int] = (10, 10),
    cache_dir: Optional[str] = None,
) -> DatasetMeta:
    """Load vocabulary metadata from a mapped-to-ids directory (cached)."""
    cache_dir = _resolve_cache_dir(dataset_dir, cache_dir)
    key = f"meta-v{_CACHE_VERSION}-{max_lengths_tuple[0]}-{max_lengths_tuple[1]}"
    cache_path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(cache_path):
        z = np.load(cache_path, allow_pickle=False)
        return DatasetMeta(
            entities_size=int(z["entities_size"]),
            relations_size=int(z["relations_size"]),
            min_entities_size=int(z["min_entities_size"]),
            min_relations_size=int(z["min_relations_size"]),
            entity_tokens_size=int(z["entity_tokens_size"]),
            relation_tokens_size=int(z["relation_tokens_size"]),
            max_length=tuple(int(x) for x in z["max_length"]),
            entity_token_ids=z["entity_token_ids"] if "entity_token_ids" in z else None,
            relation_token_ids=z["relation_token_ids"] if "relation_token_ids" in z else None,
            entity_id_counts=z["entity_id_counts"] if "entity_id_counts" in z else None,
            relation_id_counts=z["relation_id_counts"] if "relation_id_counts" in z else None,
        )

    _, ent_counts, ent_max = _read_id_map(os.path.join(dataset_dir, "entity_id_map.txt"))
    _, rel_counts, rel_max = _read_id_map(os.path.join(dataset_dir, "relation_id_map.txt"))
    entities_size = ent_max + 1
    relations_size = rel_max + 1
    # First real ids follow PAD=0/UNK=1 (reference: openkge/dataset.py:101-102).
    min_entities_size = max(PAD, UNK) + 1
    min_relations_size = max(PAD, UNK) + 1

    entity_token_ids = relation_token_ids = None
    entity_tokens_size = relation_tokens_size = max(PAD, UNK, BOS, EOS) + 1
    ent_tok_path = os.path.join(dataset_dir, "entity_id_tokens_ids_map.txt")
    if os.path.exists(ent_tok_path):
        ent_map, ent_tok_max = _read_id_tokens_map(ent_tok_path)
        for sid in range(min_entities_size):
            ent_map.setdefault(sid, [UNK])
        entity_tokens_size = ent_tok_max + 1
        entity_token_ids = _token_matrix(ent_map, entities_size, max_lengths_tuple[0])
    rel_tok_path = os.path.join(dataset_dir, "relation_id_tokens_ids_map.txt")
    if os.path.exists(rel_tok_path):
        rel_map, rel_tok_max = _read_id_tokens_map(rel_tok_path)
        for sid in range(min_relations_size):
            rel_map.setdefault(sid, [UNK])
        relation_tokens_size = rel_tok_max + 1
        relation_token_ids = _token_matrix(rel_map, relations_size, max_lengths_tuple[1])

    ent_count_arr = np.zeros(entities_size, dtype=np.int64)
    for iid, c in ent_counts.items():
        ent_count_arr[iid] = c
    rel_count_arr = np.zeros(relations_size, dtype=np.int64)
    for iid, c in rel_counts.items():
        rel_count_arr[iid] = c

    meta = DatasetMeta(
        entities_size=entities_size,
        relations_size=relations_size,
        min_entities_size=min_entities_size,
        min_relations_size=min_relations_size,
        entity_tokens_size=entity_tokens_size,
        relation_tokens_size=relation_tokens_size,
        max_length=tuple(max_lengths_tuple),
        entity_token_ids=entity_token_ids,
        relation_token_ids=relation_token_ids,
        entity_id_counts=ent_count_arr,
        relation_id_counts=rel_count_arr,
    )
    arrays = dict(
        entities_size=entities_size,
        relations_size=relations_size,
        min_entities_size=min_entities_size,
        min_relations_size=min_relations_size,
        entity_tokens_size=entity_tokens_size,
        relation_tokens_size=relation_tokens_size,
        max_length=np.array(max_lengths_tuple),
        entity_id_counts=ent_count_arr,
        relation_id_counts=rel_count_arr,
    )
    if entity_token_ids is not None:
        arrays["entity_token_ids"] = entity_token_ids
    if relation_token_ids is not None:
        arrays["relation_token_ids"] = relation_token_ids
    _atomic_savez(cache_path, **arrays)
    return meta


# ------------------------------------------------------------------- caching


def _resolve_cache_dir(dataset_dir: str, cache_dir: Optional[str]) -> str:
    if cache_dir is None:
        if os.access(dataset_dir, os.W_OK):
            cache_dir = os.path.join(dataset_dir, ".oket_cache")
        else:
            digest = hashlib.sha1(os.path.abspath(dataset_dir).encode()).hexdigest()[:12]
            cache_dir = os.path.join(
                os.environ.get("OKET_CACHE_DIR", os.path.expanduser("~/.cache/oket")), digest
            )
    os.makedirs(cache_dir, exist_ok=True)
    return cache_dir


def _atomic_savez(path: str, **arrays) -> None:
    tmp = path + f".tmp{os.getpid()}.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


# ----------------------------------------------------------- triple file I/O


def read_triple_file(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a 5-col mapped file.

    Returns (triples [T,3] int32, subj_offsets [T+1], subj_mentions,
    obj_offsets [T+1], obj_mentions) where mention arrays are the ragged
    contents of columns 4 and 5 in CSR form.

    Uses the native C++ parser when available (~GB/s streaming scan —
    OLPBench's 30M-line train file parses in seconds instead of the
    reference's ~30-minute python indexing, README.md:74); falls back to
    the python reader below.
    """
    from open_knowledge_graph_embeddings_tpu.native import read_triple_file_native

    native = read_triple_file_native(path)
    if native is not None:
        return native

    triples: List[Tuple[int, int, int]] = []
    subj_offs = [0]
    obj_offs = [0]
    subj_vals: List[int] = []
    obj_vals: List[int] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            s, r, o = int(parts[0]), int(parts[1]), int(parts[2])
            triples.append((s, r, o))
            # empty/missing mention columns duplicate cols 1/3 (closed-KG
            # convention; keeps python and native parsers identical)
            s_m = [int(x) for x in parts[3].split()] if len(parts) >= 5 else []
            o_m = [int(x) for x in parts[4].split()] if len(parts) >= 5 else []
            subj_vals.extend(s_m if s_m else [s])
            obj_vals.extend(o_m if o_m else [o])
            subj_offs.append(len(subj_vals))
            obj_offs.append(len(obj_vals))
    return (
        np.asarray(triples, dtype=np.int32).reshape(-1, 3),
        np.asarray(subj_offs, dtype=np.int64),
        np.asarray(subj_vals, dtype=np.int32),
        np.asarray(obj_offs, dtype=np.int64),
        np.asarray(obj_vals, dtype=np.int32),
    )


# ------------------------------------------------------------ prefix records


@dataclass
class PrefixRecords:
    """CSR store of 1-vs-N prefix examples for one split (both directions).

    Row i: prefix ``(p1[i], p2[i])`` with slot[i] in {SLOT_PO, SLOT_SP};
    its gold answers are groups ``group_offsets[i]..group_offsets[i+1]``, and
    group g covers mention ids ``mentions[mention_offsets[g]:mention_offsets[g+1]]``
    (one group per original triple line = the mention alternatives of one
    gold entity).  ``filter_offsets/filter_values`` (eval only) hold the
    all-splits known-true mention ids per row for filtered ranking.
    """

    p1: np.ndarray  # [P] int32
    p2: np.ndarray  # [P] int32
    slot: np.ndarray  # [P] int8
    group_offsets: np.ndarray  # [P+1] int64
    mention_offsets: np.ndarray  # [G+1] int64
    mentions: np.ndarray  # [M] int32
    filter_offsets: Optional[np.ndarray] = None  # [P+1] int64
    filter_values: Optional[np.ndarray] = None  # [F] int32
    #: per-example "same mention appears twice across my groups" flag —
    #: lets the batch builder skip its (row, col) dedup sort on the common
    #: dup-free path (None = unknown, treated as maybe-dup)
    row_has_dup: Optional[np.ndarray] = None  # [P] bool

    def __len__(self) -> int:
        return len(self.p1)

    @property
    def num_positives(self) -> int:
        return int(self.mention_offsets[-1])

    def row_groups(self, i: int) -> List[List[int]]:
        gs, ge = self.group_offsets[i], self.group_offsets[i + 1]
        return [
            self.mentions[self.mention_offsets[g] : self.mention_offsets[g + 1]].tolist()
            for g in range(gs, ge)
        ]

    def row_mentions(self, i: int) -> np.ndarray:
        gs, ge = self.group_offsets[i], self.group_offsets[i + 1]
        return self.mentions[self.mention_offsets[gs] : self.mention_offsets[ge]]

    def row_filter(self, i: int) -> np.ndarray:
        return self.filter_values[self.filter_offsets[i] : self.filter_offsets[i + 1]]


def _group_direction(
    triples: np.ndarray,
    ans_offsets: np.ndarray,
    ans_values: np.ndarray,
    pref_cols: Tuple[int, int],
    slot: int,
):
    """Group triples by (pref_cols) prefix; each line is one answer group.

    Vectorized: lexsort rows by prefix, then segment by prefix change.
    Returns dict with per-prefix CSR pieces for this direction.
    """
    t = triples
    order = np.lexsort((t[:, pref_cols[1]], t[:, pref_cols[0]]))
    p1 = t[order, pref_cols[0]]
    p2 = t[order, pref_cols[1]]
    new_prefix = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        new_prefix[1:] = (p1[1:] != p1[:-1]) | (p2[1:] != p2[:-1])
    prefix_starts = np.flatnonzero(new_prefix)
    P = len(prefix_starts)
    group_counts = np.diff(np.append(prefix_starts, len(order)))

    # Answer groups in sorted-triple order.
    lens = (ans_offsets[1:] - ans_offsets[:-1])[order]
    mention_offsets = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens, out=mention_offsets[1:])
    # Gather ragged rows in `order`: build index via repeat of starts.
    starts = ans_offsets[:-1][order]
    idx = np.repeat(starts, lens) + (np.arange(mention_offsets[-1]) - np.repeat(mention_offsets[:-1], lens))
    mentions = ans_values[idx.astype(np.int64)]

    group_offsets = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(group_counts, out=group_offsets[1:])
    return dict(
        p1=p1[prefix_starts].astype(np.int32),
        p2=p2[prefix_starts].astype(np.int32),
        slot=np.full(P, slot, dtype=np.int8),
        group_offsets=group_offsets,
        mention_offsets=mention_offsets,
        mentions=mentions.astype(np.int32),
    )


def _concat_directions(sp: dict, po: dict) -> PrefixRecords:
    """Concatenate sp_o then po_s records (sp first, matching the reference's
    file layout, openkge/dataset.py:489-492)."""

    def cat_csr(a_off, a_val, b_off, b_val):
        off = np.concatenate([a_off, a_off[-1] + b_off[1:]])
        val = np.concatenate([a_val, b_val])
        return off, val

    g_off, m_off_parts = (
        np.concatenate([sp["group_offsets"], sp["group_offsets"][-1] + po["group_offsets"][1:]]),
        np.concatenate([sp["mention_offsets"], sp["mention_offsets"][-1] + po["mention_offsets"][1:]]),
    )
    return PrefixRecords(
        p1=np.concatenate([sp["p1"], po["p1"]]),
        p2=np.concatenate([sp["p2"], po["p2"]]),
        slot=np.concatenate([sp["slot"], po["slot"]]),
        group_offsets=g_off,
        mention_offsets=m_off_parts,
        mentions=np.concatenate([sp["mentions"], po["mentions"]]),
    )


def _compute_dup_flags(rec: PrefixRecords) -> np.ndarray:
    """[P] bool: example has the same mention in more than one position
    across its groups (one vectorized sort at index build, cached)."""
    P = len(rec)
    row_lens = (
        rec.mention_offsets[rec.group_offsets[1:]]
        - rec.mention_offsets[rec.group_offsets[:-1]]
    ).astype(np.int64)
    flags = np.zeros(P, dtype=bool)
    if rec.mentions.size == 0:
        return flags
    ex = np.repeat(np.arange(P, dtype=np.int64), row_lens)
    stride = np.int64(rec.mentions.max(initial=0)) + 1
    key = np.sort(ex * stride + rec.mentions)
    dup = key[1:][key[1:] == key[:-1]]
    if dup.size:
        flags[np.unique(dup // stride)] = True
    return flags


def _split_large_prefixes(rec: PrefixRecords, max_groups: int) -> PrefixRecords:
    """Split training prefixes with more than ``max_groups`` answer groups into
    repeated examples of at most ``max_groups`` groups each (capability of
    ``max_size_prefix_label``, reference: openkge/dataset.py:630-690)."""
    if max_groups is None or max_groups <= 1:
        return rec
    counts = np.diff(rec.group_offsets)
    if counts.max(initial=0) <= max_groups:
        return rec
    # Chunks tile each prefix's group range in order, so the flat group
    # sequence — and with it mentions and mention_offsets — is unchanged;
    # only the per-chunk prefix repeats and group offsets are rebuilt.
    # (Fully vectorized: the per-prefix python loop cost 11.6 s at 1.2M
    # prefixes; this path is the first-run index build's hot spot.)
    chunks = -(-counts // max_groups)  # ceil; 0-group prefixes drop, as before
    reps = chunks.astype(np.int64)
    rep_counts = np.repeat(counts, reps)
    first = np.repeat(np.cumsum(reps) - reps, reps)
    idx_in_prefix = np.arange(int(reps.sum()), dtype=np.int64) - first
    sizes = np.minimum(max_groups, rep_counts - idx_in_prefix * max_groups)
    goff = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=goff[1:])
    return PrefixRecords(
        p1=np.repeat(rec.p1, reps),
        p2=np.repeat(rec.p2, reps),
        slot=np.repeat(rec.slot, reps),
        group_offsets=goff,
        mention_offsets=np.asarray(rec.mention_offsets, dtype=np.int64)
        - rec.mention_offsets[0],
        mentions=np.asarray(rec.mentions),
    )


# ------------------------------------------------------------------- dataset


class OneToNMentionRelationDataset:
    """1-vs-N prefix dataset over mention-annotated triples.

    Capability equivalent of the reference class of the same name
    (reference: openkge/dataset.py:346-710); the batch construction itself
    lives in :mod:`..data.batching` so it can emit static-shape arrays.
    """

    def __init__(
        self,
        dataset_dir: str,
        input_file: str,
        is_training_data: bool,
        batch_size: int = 512,
        use_batch_shared_entities: bool = False,
        min_size_batch_labels: int = -1,
        max_size_prefix_label: int = -1,
        max_lengths_tuple: Tuple[int, int] = (10, 10),
        loss: str = "bce",
        cache_dir: Optional[str] = None,
        batch_size_for_backward: Optional[int] = None,
        # accepted for config compatibility; tokens are always available via meta
        replace_entities_by_tokens: bool = False,
        replace_relations_by_tokens: bool = False,
        copy_data_to_dev_shm: bool = False,
        device=None,
    ):
        self.dataset_dir = dataset_dir
        self.input_file_name = input_file
        self.copy_data_to_dev_shm = copy_data_to_dev_shm
        self.is_training_data = is_training_data
        self.batch_size = batch_size
        self.batch_size_for_backward = batch_size_for_backward
        self.use_batch_shared_entities = use_batch_shared_entities
        self.min_size_batch_labels = min_size_batch_labels
        self.max_size_prefix_label = max_size_prefix_label
        self.loss = loss
        self.cache_dir = _resolve_cache_dir(dataset_dir, cache_dir)
        self.meta = load_meta(dataset_dir, max_lengths_tuple, cache_dir=self.cache_dir)
        self.records = self._build_records()

    # -- construction

    def _records_cache_path(self) -> str:
        key = f"records-v{_CACHE_VERSION}-{self.input_file_name}-{self.max_size_prefix_label if self.is_training_data else 'eval'}"
        return os.path.join(self.cache_dir, key + ".npz")

    def _build_records(self) -> PrefixRecords:
        path = self._records_cache_path()
        if os.path.exists(path):
            z = np.load(path)
            return PrefixRecords(
                p1=z["p1"], p2=z["p2"], slot=z["slot"],
                group_offsets=z["group_offsets"], mention_offsets=z["mention_offsets"],
                mentions=z["mentions"],
                row_has_dup=z["row_has_dup"] if "row_has_dup" in z.files else None,
            )
        triples, s_off, s_val, o_off, o_val = read_triple_file(
            self._staged_input_path()
        )
        sp = _group_direction(triples, o_off, o_val, (0, 1), SLOT_SP)
        po = _group_direction(triples, s_off, s_val, (1, 2), SLOT_PO)
        rec = _concat_directions(sp, po)
        if self.is_training_data:
            rec = _split_large_prefixes(rec, self.max_size_prefix_label)
        rec.row_has_dup = _compute_dup_flags(rec)
        _atomic_savez(
            path,
            p1=rec.p1, p2=rec.p2, slot=rec.slot,
            group_offsets=rec.group_offsets, mention_offsets=rec.mention_offsets,
            mentions=rec.mentions, row_has_dup=rec.row_has_dup,
        )
        return rec

    def _staged_input_path(self) -> str:
        """Path the triple parser reads.  ``copy_data_to_dev_shm`` stages
        the input file to tmpfs first (reference parity:
        openkge/dataset.py:111-117) — on a slow network filesystem the
        OLPBench 30M-line first-run parse then streams from RAM.  Cached
        runs (the npz records) never reach this method."""
        src = os.path.join(self.dataset_dir, self.input_file_name)
        if not self.copy_data_to_dev_shm or not os.path.isdir("/dev/shm"):
            return src
        import hashlib
        import shutil

        tag = hashlib.sha1(os.path.abspath(src).encode()).hexdigest()[:12]
        dst = os.path.join("/dev/shm", f"oket-{tag}-{self.input_file_name}")
        if (
            not os.path.exists(dst)
            or os.path.getsize(dst) != os.path.getsize(src)
        ):
            tmp = dst + f".tmp{os.getpid()}"
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)  # atomic: concurrent ranks race benignly
        return dst

    def __len__(self) -> int:
        return len(self.records)

    # -- filter index over all splits

    def attach_filter_index(
        self, train_file: str, valid_file: str, test_file: str
    ) -> None:
        """Attach the all-splits known-true mention index to this (eval)
        split's records for filtered ranking
        (capability of merge_all_splits_triples, reference: openkge/dataset.py:520-565)."""
        key = f"filter-v{_CACHE_VERSION}-{self.input_file_name}-{train_file}-{valid_file}-{test_file}"
        path = os.path.join(self.cache_dir, key + ".npz")
        if os.path.exists(path):
            z = np.load(path)
            self.records.filter_offsets = z["filter_offsets"]
            self.records.filter_values = z["filter_values"]
            return

        union: Dict[Tuple[int, int, int], set] = {}
        for fname in [train_file, valid_file, test_file]:
            fpath = os.path.join(self.dataset_dir, fname)
            if not os.path.exists(fpath):
                continue
            triples, s_off, s_val, o_off, o_val = read_triple_file(fpath)
            for i in range(len(triples)):
                s, r, o = triples[i]
                union.setdefault((int(s), int(r), SLOT_SP), set()).update(
                    o_val[o_off[i] : o_off[i + 1]].tolist()
                )
                union.setdefault((int(r), int(o), SLOT_PO), set()).update(
                    s_val[s_off[i] : s_off[i + 1]].tolist()
                )

        rec = self.records
        offsets = np.zeros(len(rec) + 1, dtype=np.int64)
        chunks = []
        for i in range(len(rec)):
            ents = union.get((int(rec.p1[i]), int(rec.p2[i]), int(rec.slot[i])), set())
            arr = np.fromiter(ents, dtype=np.int32, count=len(ents))
            chunks.append(arr)
            offsets[i + 1] = offsets[i] + len(arr)
        values = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int32)
        rec.filter_offsets, rec.filter_values = offsets, values
        _atomic_savez(path, filter_offsets=offsets, filter_values=values)

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(file={self.input_file_name}, prefixes={len(self)}, "
            f"positives={self.records.num_positives}, entities={self.meta.entities_size}, "
            f"relations={self.meta.relations_size}, batch_shared={self.use_batch_shared_entities})"
        )


class Datasets:
    OneToNMentionRelationDataset = OneToNMentionRelationDataset
