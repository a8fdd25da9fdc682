"""Batch-construction parity: our BatchBuilder vs the reference collate.

Runs the reference's dataset indexing + collate function on the same toy
data directory and compares label matrices, filter masks, gold label ids,
and loss/metric normalizers (aligned by prefix key — the two frameworks
order records differently)."""

import os
import shutil
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference repo not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

from openkge.dataset import (  # noqa: E402
    OneToNMentionRelationDataset as RefDS,
    OneToNMentionRelationDataset_collate_func as ref_collate,
)

from open_knowledge_graph_embeddings_tpu.data import BatchBuilder, OneToNMentionRelationDataset
from open_knowledge_graph_embeddings_tpu.train.loss import cell_mask, dense_labels

sys.path.insert(0, os.path.dirname(__file__))
from conftest import write_toy_dataset  # noqa: E402


@pytest.fixture(scope="module")
def ref_setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refds"))
    write_toy_dataset(d)
    ref_train = RefDS(
        dataset_dir=d, input_file="train.txt", is_training_data=True,
        copy_data_to_dev_shm=False, batch_size=100,
    )
    ref_valid = RefDS(
        dataset_dir=d, input_file="valid.txt", is_training_data=False,
        copy_data_to_dev_shm=False, batch_size=100,
    )
    RefDS(  # indexes test.txt so the all-splits merge can run
        dataset_dir=d, input_file="test.txt", is_training_data=False,
        copy_data_to_dev_shm=False, batch_size=100,
    )
    ref_valid.merge_all_splits_triples(d, "train.txt", "valid.txt", "test.txt")
    ref_train.create_data_tensors(d, "train.txt", "valid.txt", "test.txt")
    ref_valid.create_data_tensors(d, "train.txt", "valid.txt", "test.txt")
    return d, ref_train, ref_valid


def _ref_batch(ref_ds, use_shared, min_size=0):
    rows = [ref_ds.seen_prefixes_tensor[i] for i in range(len(ref_ds.seen_prefixes_tensor))]
    return ref_collate(
        sp_po__batch=rows,
        entity_vocab_size=ref_ds.entity_vocab_size,
        entity_vocab_offset=ref_ds.entity_special_vocab_size,
        min_size_batch_labels=min_size,
        is_training_data=ref_ds.is_training_data,
        this_split_entities_list=ref_ds.seen_entities_tensor,
        all_splits_entities_tensor=ref_ds.all_splits_entities_tensor,
        use_batch_shared_entities=use_shared,
    )


def _ref_row_keys(ref_ds, inputs):
    """(p1, p2, slot) per label row, slot order [0, 2] as in the collate."""
    keys = []
    for slot, slot_input in zip([0, 2], inputs):
        if slot_input is None:
            continue
        p1, p2 = slot_input
        for i in range(len(p1)):
            keys.append((int(p1[i, 0]), int(p2[i, 0]), slot))
    return keys


def _our_row_keys(batch):
    keys = []
    for i in range(batch.num_rows):
        if batch.is_sp[i]:
            keys.append((int(batch.ent_ids[i]), int(batch.rel_ids[i]), 2))
        else:
            keys.append((int(batch.rel_ids[i]), int(batch.ent_ids[i]), 0))
    return keys


def test_full_vocab_train_batch_parity(ref_setup):
    d, ref_train, _ = ref_setup
    inputs, norm_loss, norm_metric, labels, _, _, shared = _ref_batch(ref_train, False)

    ours = OneToNMentionRelationDataset(
        dataset_dir=d, input_file="train.txt", is_training_data=True, batch_size=100,
    )
    bb = BatchBuilder(ours, drop_last=False)
    batch = next(bb.batches())

    # NOTE: the reference's _collect_seen_triples never flushes the final
    # prefix group per direction (openkge/dataset.py:496-518 writes only on
    # prefix change), silently dropping one prefix per direction; we keep all
    # prefixes, so the reference rows are a strict subset of ours.
    assert batch.num_cols == labels.shape[1]
    assert batch.num_rows == labels.shape[0] + 2

    our_dense = np.asarray(
        dense_labels(batch.pos_rows, batch.pos_cols, batch.batch_size, batch.num_cols)
    )[: batch.num_rows]

    ref_keys = _ref_row_keys(ref_train, inputs)
    our_keys = _our_row_keys(batch)
    assert set(ref_keys) <= set(our_keys)
    ref_labels = labels.numpy()
    ref_by_key = {k: ref_labels[i] for i, k in enumerate(ref_keys)}
    for i, k in enumerate(our_keys):
        if k in ref_by_key:
            np.testing.assert_array_equal(our_dense[i], ref_by_key[k], err_msg=f"row {k}")


def test_full_vocab_eval_batch_parity(ref_setup):
    d, _, ref_valid = ref_setup
    inputs, norm_loss, norm_metric, labels, label_ids, filter_mask, _ = _ref_batch(
        ref_valid, False
    )

    ours = OneToNMentionRelationDataset(
        dataset_dir=d, input_file="valid.txt", is_training_data=False, batch_size=100,
    )
    ours.attach_filter_index("train.txt", "valid.txt", "test.txt")
    batch = next(BatchBuilder(ours, drop_last=False).batches())

    ref_keys = _ref_row_keys(ref_valid, inputs)
    our_keys = _our_row_keys(batch)
    # reference drops the last prefix per direction (see note above)
    assert set(ref_keys) <= set(our_keys)

    # filter masks match row-by-row
    from open_knowledge_graph_embeddings_tpu.train.evaluate import scatter_mask
    import jax.numpy as jnp

    our_mask = np.asarray(
        scatter_mask(
            jnp.asarray(batch.filter_rows), jnp.asarray(batch.filter_cols),
            batch.batch_size, batch.num_cols,
        )
    )[: batch.num_rows]
    ref_mask = filter_mask.numpy()
    ref_by_key = {k: ref_mask[i] for i, k in enumerate(ref_keys)}
    for i, k in enumerate(our_keys):
        if k in ref_by_key:
            np.testing.assert_array_equal(our_mask[i], ref_by_key[k], err_msg=f"filter row {k}")

    # gold label ids (sets of mention-alternative column groups) match
    ref_golds = {k: sorted(tuple(sorted(g.tolist())) for g in label_ids[i])
                 for i, k in enumerate(ref_keys)}
    our_golds = {}
    gv = batch.gold_rows >= 0
    for g in np.flatnonzero(gv):
        r = int(batch.gold_rows[g])
        cols = batch.gold_mention_cols[g]
        our_golds.setdefault(our_keys[r], []).append(tuple(sorted(cols[cols >= 0].tolist())))
    our_golds = {k: sorted(v) for k, v in our_golds.items()}
    for k, v in ref_golds.items():
        assert our_golds[k] == v, f"golds for {k}"


def test_batch_shared_train_parity(ref_setup):
    """Candidate semantics: with min_size <= unique answers both frameworks
    use exactly the first-seen-order unique answer set."""
    d, ref_train, _ = ref_setup
    inputs, norm_loss, norm_metric, labels, _, _, ref_shared = _ref_batch(
        ref_train, True, min_size=1
    )
    ref_shared = ref_shared.view(-1).numpy()

    ours = OneToNMentionRelationDataset(
        dataset_dir=d, input_file="train.txt", is_training_data=True, batch_size=100,
        use_batch_shared_entities=True, min_size_batch_labels=1,
    )
    batch = next(BatchBuilder(ours, drop_last=False).batches())

    # reference candidate pool misses the answers of its two dropped
    # prefixes; ours is a superset built from all prefixes
    assert set(ref_shared.tolist()) <= set(batch.candidate_ids[: batch.num_cols].tolist())

    ref_keys = _ref_row_keys(ref_train, inputs)
    our_keys = _our_row_keys(batch)
    our_dense = np.asarray(
        dense_labels(batch.pos_rows, batch.pos_cols, batch.batch_size, batch.num_cols)
    )[: batch.num_rows]
    # per-row positive entity ids (mapped back through candidate list) match
    ref_labels = labels.numpy()
    ref_by_key = {
        k: set(ref_shared[np.nonzero(ref_labels[i])[0]].tolist())
        for i, k in enumerate(ref_keys)
    }
    cand = batch.candidate_ids
    for i, k in enumerate(our_keys):
        if k not in ref_by_key:
            continue
        got = set(cand[np.nonzero(our_dense[i])[0]].tolist())
        assert got == ref_by_key[k], f"row {k}"


def test_batch_shared_eval_parity(ref_setup):
    """Eval-mode batch-shared candidates: pool from all splits, gold
    mention-alternative groups and filter masks translate identically
    (min_size below unique count -> no random negatives -> deterministic)."""
    d, _, ref_valid = ref_setup
    inputs, _, _, labels, label_ids, filter_mask, ref_shared = _ref_batch(
        ref_valid, True, min_size=1
    )
    ref_shared = ref_shared.view(-1).numpy()

    ours = OneToNMentionRelationDataset(
        dataset_dir=d, input_file="valid.txt", is_training_data=False, batch_size=100,
        use_batch_shared_entities=True, min_size_batch_labels=1,
    )
    ours.attach_filter_index("train.txt", "valid.txt", "test.txt")
    batch = next(BatchBuilder(ours, drop_last=False).batches())

    # candidate pools agree as sets (reference misses its dropped prefixes)
    assert set(ref_shared.tolist()) <= set(batch.candidate_ids[: batch.num_cols].tolist())

    ref_keys = _ref_row_keys(ref_valid, inputs)
    our_keys = _our_row_keys(batch)
    cand = batch.candidate_ids

    # gold groups as entity-id sets per (prefix, gold)
    ref_golds = {}
    for i, k in enumerate(ref_keys):
        ref_golds[k] = sorted(
            tuple(sorted(ref_shared[g.long().numpy()].tolist())) for g in label_ids[i]
        )
    our_golds = {}
    gv = batch.gold_rows >= 0
    for g in np.flatnonzero(gv):
        r = int(batch.gold_rows[g])
        cols = batch.gold_mention_cols[g]
        ids = cand[cols[cols >= 0]]
        our_golds.setdefault(our_keys[r], []).append(tuple(sorted(ids.tolist())))
    for k, v in ref_golds.items():
        assert sorted(our_golds[k]) == v, f"golds for {k}"

    # filter sets as entity ids per row
    from open_knowledge_graph_embeddings_tpu.train.evaluate import scatter_mask
    import jax.numpy as jnp

    our_mask = np.asarray(
        scatter_mask(
            jnp.asarray(batch.filter_rows), jnp.asarray(batch.filter_cols),
            batch.batch_size, len(cand),
        )
    )
    ref_mask = filter_mask.numpy()
    ref_by_key = {
        k: set(ref_shared[np.nonzero(ref_mask[i])[0]].tolist())
        for i, k in enumerate(ref_keys)
    }
    for i, k in enumerate(our_keys):
        if k in ref_by_key:
            got = set(cand[np.nonzero(our_mask[i])[0]].tolist())
            assert got == ref_by_key[k], f"filter for {k}"
