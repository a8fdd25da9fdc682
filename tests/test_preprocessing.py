"""Offline pipeline: DAG runner, search index, leakage filter, sampling,
triple aggregation, id mapping (golden cases modeled on the toy fixtures the
reference embeds at utils/map_*_to_ids.py:110-157,316-443)."""

import os

import numpy as np
import pytest

from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import (
    aggregate_triples,
    build_entity_mention_maps,
    iter_opiec_triples,
    parse_redirects,
)
from open_knowledge_graph_embeddings_tpu.preprocessing.leakage import (
    build_train_splits,
    compute_exclusion_sets,
    get_mentions_for_entity,
    write_triples_file,
)
from open_knowledge_graph_embeddings_tpu.preprocessing.map_to_ids import (
    convert_closed_dataset,
    convert_open_dataset,
    tokenize_closed_relation,
)
from open_knowledge_graph_embeddings_tpu.preprocessing.pipeline import PipelineJob
from open_knowledge_graph_embeddings_tpu.preprocessing.sampling import sample_evaluation_data
from open_knowledge_graph_embeddings_tpu.preprocessing.search import TripleSearchIndex


# --------------------------------------------------------------- pipeline


def test_pipeline_dag(tmp_path):
    order = []

    class JobA(PipelineJob):
        def __init__(self, opts=None, jobs=None):
            super().__init__([], [str(tmp_path / "a.txt")], opts, jobs)

        def _run(self):
            order.append("A")
            open(self.provides[0], "w").write("a")

    class JobB(PipelineJob):
        def __init__(self, opts=None, jobs=None):
            super().__init__([str(tmp_path / "a.txt")], [str(tmp_path / "b.txt")], opts, jobs)

        def _run(self):
            order.append("B")
            open(self.provides[0], "w").write(open(self.requires[0]).read() + "b")

    jobs = PipelineJob.run_jobs([JobB, JobA], opts=None)
    assert order == ["A", "B"]  # dependency ran first
    assert open(tmp_path / "b.txt").read() == "ab"
    # second run: everything satisfied, nothing re-runs
    order.clear()
    PipelineJob.run_jobs([JobB, JobA], opts=None)
    assert order == []


def test_pipeline_missing_provider(tmp_path):
    class JobC(PipelineJob):
        def __init__(self, opts=None, jobs=None):
            super().__init__([str(tmp_path / "nope.txt")], [str(tmp_path / "c.txt")], opts, jobs)

        def _run(self):
            pass

    with pytest.raises(FileNotFoundError):
        PipelineJob.run_jobs([JobC], opts=None)


# ----------------------------------------------------------------- search


@pytest.fixture
def index():
    idx = TripleSearchIndex(stopwords={"the", "of"})
    idx.add(0, ("barack", "obama"), ("president", "of"), ("united", "states"))
    idx.add(1, ("obama",), ("visited",), ("berlin",))
    idx.add(2, ("the", "president"), ("lives", "in"), ("washington",))
    return idx


def test_match(index):
    assert {index.triple_ids[p] for p in index.match("subject_mention", "obama")} == {0, 1}
    assert {index.triple_ids[p] for p in index.match("subject_mention", "barack obama")} == {0}
    assert index.match("subject_mention", "nixon") == set()


def test_match_phrase(index):
    assert {index.triple_ids[p] for p in index.match_phrase("subject_mention", "barack obama")} == {0}
    # non-consecutive -> no phrase hit
    assert index.match_phrase("object_mention", "united berlin") == set()


def test_term_exact_and_stopword_filtering(index):
    # "the president" filters to "president"
    assert {index.triple_ids[p] for p in index.term("subject_mention_exact", "president")} == {2}
    # all-stopword mention keeps original tokens
    fs = index.filter_stopwords
    assert fs(("the", "of")) == ("the", "of")
    assert fs(("the", "president")) == ("president",)


# ---------------------------------------------------------------- leakage


def test_leakage_filter_and_splits():
    idx = TripleSearchIndex(stopwords=set())
    train = [
        ((("obama",), ("visited",), ("berlin",)), ("Obama", None)),        # 0: same pair as eval
        ((("obama",), ("met",), ("merkel",)), ("Obama", "Merkel")),        # 1
        ((("paris",), ("capital", "of"), ("france",)), ("Paris", "France")),  # 2
        ((("barack", "obama"), ("visited",), ("berlin",)), ("Obama", None)),  # 3: alt mention pair
    ]
    for i, ((s, r, o), _) in enumerate(train):
        idx.add(i, s, r, o)
    entity_mentions = {"Obama": {("obama",): 5, ("barack", "obama"): 3}}
    eval_triples = [((("obama",), ("visited",), ("berlin",)), ("Obama", None))]

    simple, thorough = compute_exclusion_sets(idx, eval_triples, entity_mentions)
    assert 0 in simple  # exact full-triple leak
    assert 3 in simple  # alternative-mention full-triple leak
    assert {0, 3} <= thorough  # entity-pair leak too
    assert 2 not in simple and 2 not in thorough

    tr_simple, tr_basic, tr_thorough = build_train_splits(
        train, evaluation_ids={0}, simple_excluded=simple, thorough_excluded=thorough
    )
    assert len(tr_simple) == 3  # only the eval triple itself removed
    assert all(t[0][0] != ("obama",) or t[0][1] != ("visited",) for t in tr_thorough)
    assert len(tr_thorough) <= len(tr_basic) <= len(train)


def test_mentions_for_entity_and_writer(tmp_path):
    em = {"Obama": {("obama",): 2, ("barack", "obama"): 1}}
    out = get_mentions_for_entity("Obama", ("obama",), em)
    assert set(out) == {"obama", "barack obama"}
    assert get_mentions_for_entity(None, ("x", "y"), em) == ["x y"]

    path = str(tmp_path / "eval.txt")
    write_triples_file(
        path, [((("obama",), ("visited",), ("berlin",)), ("Obama", None))], em
    )
    line = open(path).read().strip().split("\t")
    assert line[0] == "obama" and line[2] == "berlin"
    assert set(line[3].split("|||")) == {"obama", "barack obama"}
    assert line[4] == "berlin"


# ----------------------------------------------------------------- corpus


def test_opiec_jsonl_filters(tmp_path):
    import json

    p = tmp_path / "triples.jsonl"
    rows = [
        {"subject": ["a"], "relation": ["likes"], "object": ["b"], "confidence": 0.9},
        {"subject": ["a"], "relation": ["likes"], "object": ["b"], "confidence": 0.1},  # low conf
        {"subject": ["a"], "relation": ["hates"], "object": ["b"], "polarity": "NEGATIVE"},
        {"subject": ["x"] * 11, "relation": ["r"], "object": ["b"]},  # too long
        {"subject": [{"word": "5", "ner": "QUANTITY"}, {"word": "cats"}],
         "relation": [{"word": "live"}], "object": [{"word": "here"}]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    got = list(iter_opiec_triples([str(p)]))
    assert len(got) == 2
    assert got[1]["subject"] == ["QUANT", "cats"]


def test_avro_built_in_reader_used_without_fastavro(tmp_path):
    """With fastavro absent, .avro paths go through the self-contained
    reader (preprocessing/avro.py) — a malformed file surfaces its error,
    not an ImportError."""
    p = tmp_path / "x.avro"
    p.write_bytes(b"not-an-avro-file")
    with pytest.raises((ValueError, EOFError)):
        list(iter_opiec_triples([str(p)]))


def test_parse_redirects(tmp_path):
    ttl = tmp_path / "redirects.ttl"
    ttl.write_text(
        "<http://dbpedia.org/resource/A> <http://dbpedia.org/ontology/wikiPageRedirects> <http://dbpedia.org/resource/B> .\n"
        "<http://dbpedia.org/resource/B> <http://dbpedia.org/ontology/wikiPageRedirects> <http://dbpedia.org/resource/C> .\n"
    )
    red = parse_redirects(str(ttl))
    assert red["A"] == "C" and red["B"] == "C"


def test_entity_mention_maps():
    counts = {
        "Obama": {("obama",): 90, ("barack", "obama"): 30, ("rare",): 2,
                  ("obama", ",", "president"): 20},
        "OldObama": {("potus",): 40},
    }
    filtered, mention_entities = build_entity_mention_maps(
        counts, redirects={"OldObama": "Obama"}, min_fraction=0.1
    )
    m = filtered["Obama"]
    assert ("obama",) in m and ("barack", "obama") in m
    assert ("rare",) not in m  # below 10%
    assert ("obama", ",", "president") not in m  # comma qualifier of existing mention
    assert ("potus",) in m  # merged through redirect
    assert "Obama" in mention_entities[("obama",)]


def test_aggregate_triples():
    raws = (
        [{"subject": ["Obama"], "relation": ["visited"], "object": ["Berlin"],
          "subject_link": "Obama", "object_link": "Berlin"}] * 5
        + [{"subject": ["obama"], "relation": ["visited"], "object": ["berlin"],
            "subject_link": "Obama", "object_link": "Berlin"}] * 2
        + [{"subject": ["x"], "relation": ["is"], "object": ["x2"],
            "subject_link": "X", "object_link": "X"}] * 5  # self-loop
        + [{"subject": ["solo"], "relation": ["seen"], "object": ["once"]}]  # rare
        + [{"subject": ["paris"], "relation": ["capital"], "object": ["france"]}] * 4
    )
    out, ment_toks, rel_toks = aggregate_triples(raws, min_count=1)
    keys = {t[0] for t in out}
    assert (("obama",), ("visited",), ("berlin",)) in keys  # lowercased dedup
    assert all(not (l[0] is not None and l[0] == l[1]) for _, l in out)  # no self loops
    # links survive with enough votes
    linked = {t[0]: t[1] for t in out}
    assert linked[(("obama",), ("visited",), ("berlin",))] == ("Obama", "Berlin")


# ------------------------------------------------------------------ sample


def test_sample_evaluation_data():
    triples = []
    for i in range(60):
        linked = ("E%d" % i, "F%d" % i) if i % 2 == 0 else (None, None)
        rel = ("r", "x", "y") if i % 3 == 0 else ("r",)
        triples.append((((f"s{i}",), rel, (f"o{i}",)), linked))
    v, vl, t = sample_evaluation_data(triples, eval_size=3, seed=1)
    assert len(v) == 3 and len(vl) == 3 and len(t) == 3
    assert not (set(v) & set(vl)) and not (set(vl) & set(t)) and not (set(v) & set(t))
    # all three sets require long relations; linked sets also require links
    for i in v + vl + t:
        assert len(triples[i][0][1]) >= 3
    for i in vl + t:
        assert triples[i][1][0] is not None and triples[i][1][1] is not None


# ---------------------------------------------------------------- mapping


def test_convert_open_dataset_roundtrip(tmp_path):
    # toy open KG modeled on the reference's embedded fixture
    train = tmp_path / "train_data_thorough.txt"
    train.write_text(
        "B O\tworks in\tN Y\tB O|||Barack Obama\tN Y|||New York\n"
        "Barack Obama\tlives in\tNew York\tB O|||Barack Obama\tN Y|||New York\n"
        "A Merkel\tleads\tGermany\tA Merkel\tGermany\n"
    )
    valid = tmp_path / "validation_data.txt"
    valid.write_text("Barack Obama\tworks in\tNew York\tB O|||Barack Obama\tN Y|||New York\n")
    out = tmp_path / "mapped"
    written = convert_open_dataset(str(out), str(train), [str(valid)])
    assert written[str(out / "train_data_thorough.txt")] == 3
    assert written[str(out / "validation_data.txt")] == 1

    # the output obeys the data-layer contract end to end
    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset

    ds = OneToNMentionRelationDataset(
        dataset_dir=str(out), input_file="train_data_thorough.txt",
        is_training_data=True, batch_size=2,
    )
    assert ds.meta.entity_token_ids is not None
    assert len(ds.records) > 0
    # alternative mentions share answer groups
    line = open(out / "validation_data.txt").read().strip().split("\t")
    assert len(line[3].split()) == 2  # two alternative subject mention ids


def test_convert_open_dataset_unk_drop(tmp_path):
    train = tmp_path / "train.txt"
    train.write_text("a b\tr s\tc d\ta b\tc d\n")
    valid = tmp_path / "valid.txt"
    # all-unseen tokens -> UNK mention -> triple dropped
    valid.write_text("zz qq\tr s\tc d\tzz qq\tc d\n")
    out = tmp_path / "mapped"
    written = convert_open_dataset(str(out), str(train), [str(valid)])
    assert written[str(out / "valid.txt")] == 0


def test_convert_closed_dataset(tmp_path):
    for name, rows in (
        ("train.txt", ["/m/1\t/film/actor\t/m/2", "/m/2\t/film/director\t/m/3"]),
        ("valid.txt", ["/m/1\t/film/director\t/m/3"]),
    ):
        (tmp_path / name).write_text("\n".join(rows) + "\n")
    names = {"/m/1": "Tom Hanks", "/m/2": "Big", "/m/3": "Penny Marshall"}
    out = tmp_path / "mapped"
    written = convert_closed_dataset(
        str(out), [str(tmp_path / "train.txt"), str(tmp_path / "valid.txt")], names
    )
    assert written[str(out / "train.txt")] == 2
    assert tokenize_closed_relation("/film/actor_of.type") == ["film", "actor", "of", "type"]

    from open_knowledge_graph_embeddings_tpu.data import OneToNMentionRelationDataset, load_meta

    meta = load_meta(str(out))
    assert meta.entities_size >= 5  # 3 entities + specials
    ds = OneToNMentionRelationDataset(
        dataset_dir=str(out), input_file="train.txt", is_training_data=True, batch_size=2
    )
    rec = ds.records
    assert len(rec) == 4  # 2 triples x 2 directions, all prefixes distinct
    # cols 4/5 duplicated: each answer group is a single mention == the entity
    assert all(len(g) == 1 for i in range(len(rec)) for g in rec.row_groups(i))


# -------------------------------------------- full OPIEC-Clean record shape


def _opiec_record(**over):
    """Synthetic OPIEC-Clean avro-shaped record (the contract the reference
    consumes; process_avro.py:16-195): token dicts with word/pos/index,
    dropped_words_* lists, quantities, w_link.wiki_link, sentence_linked."""

    def tok(word, pos, index, link=None):
        return {"word": word, "pos": pos, "index": index,
                "w_link": {"wiki_link": link or ""}}

    rec = {
        "polarity": "POSITIVE",
        "confidence_score": 0.9,
        "triple_id": 1,
        "article_id": 10,
        "quantities": {},
        "subject": [tok("Barack", "NNP", 1, "barack_obama"),
                    tok("Obama", "NNP", 2, "barack_obama")],
        "dropped_words_subject": [],
        "relation": [tok("lives", "VBZ", 3), tok("in", "IN", 4)],
        "dropped_words_relation": [],
        "object": [tok("Washington", "NNP", 5, "washington,_d.c.")],
        "dropped_words_object": [],
        "sentence_linked": {"tokens": [
            tok("Barack", "NNP", 1), tok("Obama", "NNP", 2), tok("lives", "VBZ", 3),
            tok("in", "IN", 4), tok("Washington", "NNP", 5), tok(".", ".", 6),
        ]},
    }
    rec.update(over)
    return rec


def test_opiec_full_record_extraction():
    from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import extract_opiec_triple

    out = extract_opiec_triple(_opiec_record())
    assert out["subject"] == ["Barack", "Obama"]
    assert out["relation"] == ["lives", "in"]
    assert out["object"] == ["Washington"]
    # links are anchor-snipped + capitalized, unambiguous only
    assert out["subject_link"] == "Barack_obama"
    assert out["object_link"] == "Washington,_d.c."
    assert out["sentence_mask"] == ["[SUBJ]", "[SUBJ]", "[REL]", "[REL]", "[OBJ]", "-"]


def test_opiec_full_record_pos_filters():
    from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import extract_opiec_triple

    def tok(word, pos, index):
        return {"word": word, "pos": pos, "index": index, "w_link": {"wiki_link": ""}}

    # last subject token DT -> dropped (unless the word is 'I')
    rec = _opiec_record(subject=[tok("the", "DT", 1)])
    assert extract_opiec_triple(rec) is None
    rec = _opiec_record(subject=[tok("I", "PRP", 1)])
    assert extract_opiec_triple(rec) is not None
    # last object token RB -> dropped
    rec = _opiec_record(object=[tok("quickly", "RB", 5)])
    assert extract_opiec_triple(rec) is None
    # PRP$ among dropped subject words -> dropped
    rec = _opiec_record(dropped_words_subject=[tok("his", "PRP$", 0)])
    assert extract_opiec_triple(rec) is None
    # low confidence -> dropped
    assert extract_opiec_triple(_opiec_record(confidence_score=0.2)) is None
    # negative polarity -> dropped
    assert extract_opiec_triple(_opiec_record(polarity="NEGATIVE")) is None


def test_opiec_full_record_quant_and_dropped_words():
    from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import extract_opiec_triple

    def tok(word, pos, index):
        return {"word": word, "pos": pos, "index": index, "w_link": {"wiki_link": ""}}

    # QUANT_x placeholders resolve back through the quantities dict, and
    # dropped words are merged in sentence order
    rec = _opiec_record(
        subject=[tok("QUANT_a", "CD", 2), tok("cats", "NNS", 3)],
        dropped_words_subject=[tok("exactly", "RB", 1)],
        quantities={"a": "5"},
    )
    out = extract_opiec_triple(rec)
    assert out["subject"] == ["exactly", "5", "cats"]
    # a 'no' quantity kills the record
    rec = _opiec_record(quantities={"a": "no"})
    assert extract_opiec_triple(rec) is None
    # self-loop (subject words == object words) dropped
    rec = _opiec_record(object=[tok("Barack", "NNP", 1), tok("Obama", "NNP", 2)])
    assert extract_opiec_triple(rec) is None
    # the implicit-appositive marker relation is dropped at extraction
    rec = _opiec_record(relation=[tok("is:impl_appos-clause", "VBZ", 3)])
    assert extract_opiec_triple(rec) is None


def test_opiec_full_records_via_jsonl_reader(tmp_path):
    import json

    p = tmp_path / "full.jsonl"
    p.write_text(json.dumps(_opiec_record()) + "\n")
    got = list(iter_opiec_triples([str(p)]))
    assert len(got) == 1 and got[0]["subject"] == ["Barack", "Obama"]


def test_extract_corpus_parallel(tmp_path):
    import json

    from open_knowledge_graph_embeddings_tpu.preprocessing.corpus import (
        extract_corpus_parallel,
    )

    files = []
    for i in range(3):
        p = tmp_path / f"part{i}.jsonl"
        p.write_text(json.dumps(_opiec_record(triple_id=i)) + "\n")
        files.append(str(p))
    records, mentions, relations = extract_corpus_parallel(files, workers=3)
    assert len(records) == 3
    assert mentions["Barack_obama"][("Barack", "Obama")] == 3
    assert relations[("lives", "in")] == 3
    # single-worker path produces identical aggregates
    r1, m1, c1 = extract_corpus_parallel(files, workers=1)
    assert len(r1) == 3 and m1 == mentions and c1 == relations
