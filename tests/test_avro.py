"""Self-contained Avro implementation: spec vectors, roundtrips, and the
vendored binary OPIEC fixture read end-to-end through the corpus extractor.
"""

import io
import json
import os
import struct
import zlib

import pytest

from open_knowledge_graph_embeddings_tpu.preprocessing.avro import (
    MAGIC,
    _Reader,
    _zigzag,
    reader,
    writer,
)

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(HERE, "fixtures", "opiec_tiny.avro")

#: OPIEC-Clean-shaped schema subset: every construct the corpus extractor
#: touches — records, arrays, maps, unions (nullable pos / w_link /
#: sentence), enum polarity, double confidence
TOKEN = {
    "type": "record",
    "name": "TokenLinked",
    "fields": [
        {"name": "word", "type": "string"},
        {"name": "pos", "type": ["null", "string"]},
        {"name": "index", "type": "long"},
        {"name": "w_link", "type": {
            "type": "record", "name": "WikiLink",
            "fields": [{"name": "wiki_link", "type": ["null", "string"]}],
        }},
    ],
}
SCHEMA = {
    "type": "record",
    "name": "TripleLinked",
    "namespace": "de.uni_mannheim.opiec",
    "fields": [
        {"name": "triple_id", "type": "string"},
        {"name": "article_id", "type": "string"},
        {"name": "confidence_score", "type": "double"},
        {"name": "polarity", "type": {
            "type": "enum", "name": "Polarity", "symbols": ["POSITIVE", "NEGATIVE"],
        }},
        {"name": "subject", "type": {"type": "array", "items": TOKEN}},
        {"name": "relation", "type": {"type": "array", "items": "TokenLinked"}},
        {"name": "object", "type": {"type": "array", "items": "TokenLinked"}},
        {"name": "dropped_words_subject", "type": {"type": "array", "items": "TokenLinked"}},
        {"name": "dropped_words_relation", "type": {"type": "array", "items": "TokenLinked"}},
        {"name": "dropped_words_object", "type": {"type": "array", "items": "TokenLinked"}},
        {"name": "quantities", "type": {"type": "map", "values": "string"}},
        {"name": "sentence_linked", "type": ["null", {
            "type": "record", "name": "Sentence",
            "fields": [{"name": "tokens", "type": {"type": "array", "items": "TokenLinked"}}],
        }]},
    ],
}


def _tok(word, pos, index, link=None):
    return {"word": word, "pos": pos, "index": index, "w_link": {"wiki_link": link}}


def _record(tid, conf, polarity, subj, rel, obj, sentence=None):
    return {
        "triple_id": tid,
        "article_id": "a1",
        "confidence_score": conf,
        "polarity": polarity,
        "subject": subj,
        "relation": rel,
        "object": obj,
        "dropped_words_subject": [],
        "dropped_words_relation": [],
        "dropped_words_object": [],
        "quantities": {},
        "sentence_linked": sentence,
    }


def fixture_records():
    good = _record(
        "t1", 0.9, "POSITIVE",
        [_tok("Barack", "NNP", 0, "Barack_Obama"), _tok("Obama", "NNP", 1, "Barack_Obama")],
        [_tok("visited", "VBD", 2)],
        [_tok("Paris", "NNP", 3, "Paris")],
        sentence={"tokens": [
            _tok("Barack", "NNP", 0), _tok("Obama", "NNP", 1),
            _tok("visited", "VBD", 2), _tok("Paris", "NNP", 3),
        ]},
    )
    low_conf = _record(
        "t2", 0.1, "POSITIVE",
        [_tok("A", "NNP", 0)], [_tok("likes", "VBZ", 1)], [_tok("B", "NNP", 2)],
    )
    negative = _record(
        "t3", 0.9, "NEGATIVE",
        [_tok("C", "NNP", 0)], [_tok("hates", "VBZ", 1)], [_tok("D", "NNP", 2)],
    )
    return [good, low_conf, negative]


def test_zigzag_spec_vectors():
    # the Avro spec's documented examples
    for value, raw in ((0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                       (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"),
                       (-65, b"\x81\x01")):
        assert _zigzag(value) == raw, value
        assert _Reader(raw).read_long() == value


def test_roundtrip_all_constructs():
    buf = io.BytesIO()
    records = fixture_records()
    writer(buf, SCHEMA, records)
    buf.seek(0)
    out = list(reader(buf))
    assert out == records


def test_multi_block_roundtrip():
    buf = io.BytesIO()
    records = fixture_records() * 7
    writer(buf, SCHEMA, records, records_per_block=4)
    buf.seek(0)
    assert list(reader(buf)) == records


def test_deflate_codec_read():
    """Reader handles deflate blocks (hand-assembled container)."""
    import open_knowledge_graph_embeddings_tpu.preprocessing.avro as av

    schema = "string"
    payload = io.BytesIO()
    for s in ("alpha", "beta"):
        av._encode(payload, schema, s, {})
    compressed = zlib.compress(payload.getvalue())[2:-4]  # raw deflate
    sync = bytes(range(16))
    f = io.BytesIO()
    f.write(MAGIC)
    meta = [("avro.schema", json.dumps(schema).encode()), ("avro.codec", b"deflate")]
    f.write(_zigzag(len(meta)))
    for k, v in meta:
        raw = k.encode()
        f.write(_zigzag(len(raw)) + raw + _zigzag(len(v)) + v)
    f.write(_zigzag(0))
    f.write(sync)
    f.write(_zigzag(2) + _zigzag(len(compressed)) + compressed + sync)
    f.seek(0)
    assert list(reader(f)) == ["alpha", "beta"]


def test_corrupt_sync_detected():
    buf = io.BytesIO()
    writer(buf, "long", [1, 2, 3])
    raw = bytearray(buf.getvalue())
    raw[-1] ^= 0xFF  # flip a bit in the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        list(reader(io.BytesIO(bytes(raw))))


def test_vendored_fixture_is_stable_and_extracts():
    """The committed binary fixture parses and yields exactly the one
    record surviving the reference filters (confidence >= 0.3, POSITIVE
    polarity; reference: preprocessing/process_avro.py:16-80)."""
    from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import (
        iter_opiec_triples,
    )

    assert os.path.exists(FIXTURE), "run tools/make_avro_fixture.py"
    with open(FIXTURE, "rb") as f:
        assert len(list(reader(f))) == 3
    triples = list(iter_opiec_triples([FIXTURE]))
    assert len(triples) == 1
    t = triples[0]
    assert t["subject"] == ["Barack", "Obama"]
    assert t["relation"] == ["visited"]
    assert t["object"] == ["Paris"]
    assert t["subject_link"] == "Barack_Obama"
    assert t["object_link"] == "Paris"
    assert t["sentence"] == ["Barack", "Obama", "visited", "Paris"]
    assert t["sentence_mask"] == ["[SUBJ]", "[SUBJ]", "[REL]", "[OBJ]"]


def test_fixture_bytes_reproducible(tmp_path):
    """Regenerating the fixture with the pinned sync marker is
    byte-identical to the committed file (guards codec drift)."""
    out = tmp_path / "regen.avro"
    with open(out, "wb") as f:
        writer(f, SCHEMA, fixture_records())
    assert out.read_bytes() == open(FIXTURE, "rb").read()
