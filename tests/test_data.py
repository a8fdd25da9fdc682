"""Data layer: reading, prefix grouping, filter index, batch construction."""

import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.data import (
    BatchBuilder,
    OneToNMentionRelationDataset,
    SLOT_PO,
    SLOT_SP,
    load_meta,
    read_triple_file,
)


def _ds(toy_dataset_dir, **kw):
    defaults = dict(
        dataset_dir=toy_dataset_dir,
        input_file="train.txt",
        is_training_data=True,
        batch_size=4,
    )
    defaults.update(kw)
    return OneToNMentionRelationDataset(**defaults)


def test_meta(toy_dataset_dir):
    meta = load_meta(toy_dataset_dir)
    assert meta.entities_size == 10  # max id 9 + 1
    assert meta.relations_size == 6
    assert meta.min_entities_size == 2
    assert meta.entity_token_ids.shape == (10, 10)
    # entity 2 ("B O") tokens: BOS, B, O, EOS
    assert meta.entity_token_ids[2, :4].tolist() == [2, 4, 5, 3]
    assert meta.entity_token_ids[2, 4:].tolist() == [0] * 6
    # specials get the UNK token sequence
    assert meta.entity_token_ids[0, 0] == 1 and meta.entity_token_ids[1, 0] == 1


def test_read_triple_file(toy_dataset_dir):
    triples, s_off, s_val, o_off, o_val = read_triple_file(f"{toy_dataset_dir}/train.txt")
    assert triples.shape == (5, 3)
    assert triples[0].tolist() == [2, 2, 4]
    assert s_val[s_off[0] : s_off[1]].tolist() == [2, 3]
    assert o_val[o_off[0] : o_off[1]].tolist() == [4, 5]


def test_prefix_grouping(toy_dataset_dir):
    ds = _ds(toy_dataset_dir)
    rec = ds.records
    # 5 sp_o prefixes (all (s,r) distinct) + 5 po_s prefixes
    assert len(rec) == 10
    assert (rec.slot[:5] == SLOT_SP).all() and (rec.slot[5:] == SLOT_PO).all()
    # find sp prefix (2, 2): answers = one group [4, 5]
    for i in range(len(rec)):
        if rec.slot[i] == SLOT_SP and rec.p1[i] == 2 and rec.p2[i] == 2:
            assert rec.row_groups(i) == [[4, 5]]
            break
    else:
        pytest.fail("missing sp prefix (2,2)")


def test_prefix_grouping_merges_same_prefix(tmp_path):
    # two triples sharing the sp prefix -> one record with two groups
    d = tmp_path / "ds"
    d.mkdir()
    with open(d / "entity_id_map.txt", "w") as f:
        f.write("# h\t\t\n")
        for i in range(2, 8):
            f.write(f"e{i}\t{i}\t1\n")
    with open(d / "relation_id_map.txt", "w") as f:
        f.write("# h\t\t\n")
        f.write("r2\t2\t1\n")
    with open(d / "train.txt", "w") as f:
        f.write("2\t2\t3\t2\t3\n")
        f.write("2\t2\t4\t2\t4 5\n")
        f.write("3\t2\t4\t3\t4\n")
    ds = OneToNMentionRelationDataset(
        dataset_dir=str(d), input_file="train.txt", is_training_data=True, batch_size=2
    )
    rec = ds.records
    sp_rows = [i for i in range(len(rec)) if rec.slot[i] == SLOT_SP]
    assert len(sp_rows) == 2
    i = [j for j in sp_rows if rec.p1[j] == 2][0]
    assert rec.row_groups(i) == [[3], [4, 5]]


def test_max_size_prefix_label_splitting(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    with open(d / "entity_id_map.txt", "w") as f:
        f.write("# h\t\t\n")
        for i in range(2, 10):
            f.write(f"e{i}\t{i}\t1\n")
    with open(d / "relation_id_map.txt", "w") as f:
        f.write("# h\t\t\n")
        f.write("r2\t2\t1\n")
    with open(d / "train.txt", "w") as f:
        for o in range(3, 8):  # 5 groups for sp prefix (2,2)
            f.write(f"2\t2\t{o}\t2\t{o}\n")
    ds = OneToNMentionRelationDataset(
        dataset_dir=str(d), input_file="train.txt", is_training_data=True,
        batch_size=2, max_size_prefix_label=2,
    )
    rec = ds.records
    sp_rows = [i for i in range(len(rec)) if rec.slot[i] == SLOT_SP and rec.p1[i] == 2]
    # 5 groups split into chunks of 2 -> 3 repeated examples
    assert len(sp_rows) == 3
    sizes = sorted(len(rec.row_groups(i)) for i in sp_rows)
    assert sizes == [1, 2, 2]


def test_filter_index(toy_dataset_dir):
    ds = _ds(toy_dataset_dir, input_file="valid.txt", is_training_data=False)
    ds.attach_filter_index("train.txt", "valid.txt", "test.txt")
    rec = ds.records
    # valid sp prefix (3, 2): gold [4,5]; train has (2,2)->{4,5} not same prefix;
    # filter = union over all splits for prefix (3,2) = {4,5}
    i = [j for j in range(len(rec)) if rec.slot[j] == SLOT_SP and rec.p1[j] == 3 and rec.p2[j] == 2][0]
    assert sorted(rec.row_filter(i).tolist()) == [4, 5]


def test_full_vocab_batch(toy_dataset_dir):
    ds = _ds(toy_dataset_dir)
    bb = BatchBuilder(ds)
    batches = list(bb.batches(shuffle=False))
    assert len(batches) == 2  # 10 prefixes / batch 4, drop_last
    b = batches[0]
    assert b.candidate_ids is None
    assert b.num_cols == 8  # 10 entities - 2 specials
    assert b.ent_ids.shape == (4,)
    # po rows (if any) come before sp rows
    order = b.is_sp[: b.num_rows].astype(int)
    assert (np.diff(order) >= 0).all()
    # positives reference real columns
    real = b.pos_rows >= 0
    assert (b.pos_cols[real] >= 0).all() and (b.pos_cols[real] < 8).all()
    assert b.normalizer_loss == 4 * 8


def test_batch_shared_batch(toy_dataset_dir):
    ds = _ds(toy_dataset_dir, use_batch_shared_entities=True, min_size_batch_labels=6)
    bb = BatchBuilder(ds, seed=1)
    b = next(bb.batches())
    assert b.candidate_ids is not None
    assert b.num_cols == 6
    assert b.col_valid[: b.num_cols].all()
    # all positive cols resolve inside the candidate list
    real = b.pos_rows >= 0
    cand = b.candidate_ids[: b.num_cols]
    for r, c in zip(b.pos_rows[real], b.pos_cols[real]):
        assert 0 <= c < b.num_cols
    # candidates unique
    assert len(np.unique(cand)) == len(cand)
    assert b.normalizer_loss == b.num_rows * 6


def test_eval_batch_fields(toy_dataset_dir):
    ds = _ds(toy_dataset_dir, input_file="valid.txt", is_training_data=False, batch_size=4)
    ds.attach_filter_index("train.txt", "valid.txt", "test.txt")
    bb = BatchBuilder(ds)
    b = next(bb.batches())
    assert b.filter_rows is not None and b.gold_rows is not None
    gv = b.gold_rows >= 0
    assert gv.sum() == 4  # one gold entity per prefix here
    # every gold's mention cols are valid candidate columns
    for g in np.flatnonzero(gv):
        cols = b.gold_mention_cols[g]
        cols = cols[cols >= 0]
        assert len(cols) >= 1
        assert (cols < b.num_cols).all()


def test_host_sharded_batches(toy_dataset_dir):
    ds = _ds(toy_dataset_dir, batch_size=2)
    all_items = set()
    for h in range(2):
        bb = BatchBuilder(ds, seed=7, host_shard=(h, 2))
        items = set()
        for b in bb.batches(shuffle=True):
            for i in range(b.num_rows):
                key = (int(b.ent_ids[i]), int(b.rel_ids[i]), bool(b.is_sp[i]))
                items.add(key)
        assert items, f"host {h} got no items"
        assert not (items & all_items), "hosts overlap"
        all_items |= items


def test_prefetch_matches_sync(toy_dataset_dir):
    ds = _ds(toy_dataset_dir)
    sync = [b.ent_ids.tolist() for b in BatchBuilder(ds, seed=5).batches(shuffle=True)]
    pre = [b.ent_ids.tolist() for b in BatchBuilder(ds, seed=5).batches(shuffle=True, prefetch=2)]
    assert sync == pre


def test_split_large_prefixes_matches_loop_reference():
    """Vectorized _split_large_prefixes == the straightforward per-prefix
    loop on random ragged records (including 0-group prefixes, which both
    drop)."""
    from open_knowledge_graph_embeddings_tpu.data.dataset import (
        PrefixRecords,
        _split_large_prefixes,
    )

    def loop_reference(rec, max_groups):
        counts = np.diff(rec.group_offsets)
        if counts.max(initial=0) <= max_groups:
            return rec
        new_p1, new_p2, new_slot = [], [], []
        new_goff = [0]
        chunk_group_slices = []
        for i in range(len(rec.p1)):
            gs, ge = rec.group_offsets[i], rec.group_offsets[i + 1]
            for cs in range(gs, ge, max_groups):
                ce = min(cs + max_groups, ge)
                new_p1.append(rec.p1[i])
                new_p2.append(rec.p2[i])
                new_slot.append(rec.slot[i])
                new_goff.append(new_goff[-1] + (ce - cs))
                chunk_group_slices.append((cs, ce))
        G = new_goff[-1]
        new_moff = np.zeros(G + 1, dtype=np.int64)
        pieces = []
        g_out = 0
        for cs, ce in chunk_group_slices:
            glens = rec.mention_offsets[cs + 1 : ce + 1] - rec.mention_offsets[cs:ce]
            new_moff[g_out + 1 : g_out + 1 + len(glens)] = new_moff[g_out] + np.cumsum(glens)
            pieces.append(rec.mentions[rec.mention_offsets[cs] : rec.mention_offsets[ce]])
            g_out += len(glens)
        return PrefixRecords(
            p1=np.asarray(new_p1, dtype=np.int32),
            p2=np.asarray(new_p2, dtype=np.int32),
            slot=np.asarray(new_slot, dtype=np.int8),
            group_offsets=np.asarray(new_goff, dtype=np.int64),
            mention_offsets=new_moff,
            mentions=np.concatenate(pieces) if pieces else np.zeros(0, np.int32),
        )

    rng = np.random.default_rng(5)
    for trial in range(8):
        n = int(rng.integers(1, 60))
        counts = rng.integers(0, 13, n)
        goff = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        glens = rng.integers(1, 4, int(goff[-1]))
        moff = np.concatenate([[0], np.cumsum(glens)]).astype(np.int64)
        rec = PrefixRecords(
            p1=rng.integers(2, 50, n).astype(np.int32),
            p2=rng.integers(2, 50, n).astype(np.int32),
            slot=(rng.integers(0, 2, n) * 2).astype(np.int8),
            group_offsets=goff,
            mention_offsets=moff,
            mentions=rng.integers(2, 99, int(moff[-1])).astype(np.int32),
        )
        mg = int(rng.integers(2, 6))
        a = _split_large_prefixes(rec, mg)
        b = loop_reference(rec, mg)
        for f in ("p1", "p2", "slot", "group_offsets", "mention_offsets", "mentions"):
            np.testing.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg=f"{f} trial {trial} mg={mg}"
            )


def test_multiworker_batches_deterministic_and_ordered(toy_dataset_dir):
    """workers>1 yields the same batch sequence across runs (per-batch rng
    streams) and matches single-worker output except for the negative
    top-up stream."""
    from open_knowledge_graph_embeddings_tpu.data import BatchBuilder

    ds = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=2, use_batch_shared_entities=True, min_size_batch_labels=6,
    )

    def run(workers):
        b = BatchBuilder(ds, seed=3)
        return list(b.batches(shuffle=True, prefetch=4, workers=workers))

    a1 = run(4)
    a2 = run(4)
    single = run(1)
    assert len(a1) == len(single) > 0
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x.ent_ids, y.ent_ids)
        np.testing.assert_array_equal(x.candidate_ids, y.candidate_ids)
        np.testing.assert_array_equal(x.pos_rows, y.pos_rows)
        np.testing.assert_array_equal(x.pos_cols, y.pos_cols)
    for x, s in zip(a1, single):
        # same rows and positives; candidates agree on the shared (answer)
        # prefix — only the random negative top-up stream differs
        np.testing.assert_array_equal(x.ent_ids, s.ent_ids)
        np.testing.assert_array_equal(x.pos_rows, s.pos_rows)
        np.testing.assert_array_equal(x.pos_cols, s.pos_cols)
        n_shared = len(
            np.intersect1d(x.candidate_ids[x.col_valid], s.candidate_ids[s.col_valid])
        )
        assert n_shared >= 1


def test_dev_shm_staging(toy_dataset_dir):
    """copy_data_to_dev_shm stages the input file to tmpfs before the
    first-run parse (reference parity: openkge/dataset.py:111-117) and
    produces identical records."""
    import os
    import shutil
    import tempfile

    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset

    # fresh dir so no records cache short-circuits the parse
    d = tempfile.mkdtemp()
    for f in os.listdir(toy_dataset_dir):
        if f.endswith(".txt"):
            shutil.copy(os.path.join(toy_dataset_dir, f), d)
    base = OneToNMentionRelationDataset(
        dataset_dir=toy_dataset_dir, input_file="train.txt", is_training_data=True,
        batch_size=4,
    )
    staged = OneToNMentionRelationDataset(
        dataset_dir=d, input_file="train.txt", is_training_data=True,
        batch_size=4, copy_data_to_dev_shm=True,
    )
    if os.path.isdir("/dev/shm"):
        assert staged._staged_input_path().startswith("/dev/shm/")
    np.testing.assert_array_equal(base.records.p1, staged.records.p1)
    np.testing.assert_array_equal(base.records.mentions, staged.records.mentions)
