"""IndexMapper: collect/finalize/toidx/save/load round trips."""

from open_knowledge_graph_embeddings_tpu.data.vocab import BOS, EOS, PAD, UNK, IndexMapper


def test_collect_finalize_toidx():
    m = IndexMapper(segment=True, min_count=1)
    for t in ["new york", "new york", "berlin"]:
        m.collect(t)
    m.finalize()
    nyid, toks = m.toidx("new york")
    assert nyid >= 2  # after specials
    assert toks[0] == BOS and toks[-1] == EOS
    assert len(toks) == 4  # BOS new york EOS
    # unseen -> UNK item, unseen tokens -> UNK
    uid, utoks = m.toidx("paris france")
    assert uid == UNK
    assert utoks[1] == UNK and utoks[2] == UNK


def test_min_count_threshold():
    m = IndexMapper(segment=True, min_count=2)
    m.collect("rare thing")
    m.collect("common")
    m.collect("common")
    m.finalize()
    assert m.item_id("common") != UNK
    assert m.item_id("rare thing") == UNK


def test_save_load_roundtrip(tmp_path):
    m = IndexMapper(segment=True)
    for t in ["a b", "c", "a b"]:
        m.collect(t)
    m.finalize()
    m.save(str(tmp_path), "entity")
    m2 = IndexMapper.load(str(tmp_path), "entity")
    assert m2.item_to_id == m.item_to_id
    assert m2.segment_to_id == m.segment_to_id
    assert m2.toidx("a b") == m.toidx("a b")
    # files follow the on-disk contract consumed by the data layer
    assert (tmp_path / "entity_id_map.txt").exists()
    assert (tmp_path / "entity_token_id_map.txt").exists()
    assert (tmp_path / "entity_id_tokens_ids_map.txt").exists()


def test_ids_ordered_by_frequency():
    m = IndexMapper(segment=False)
    for t in ["x"] * 5 + ["y"] * 10:
        m.collect(t)
    m.finalize()
    assert m.item_id("y") < m.item_id("x")
