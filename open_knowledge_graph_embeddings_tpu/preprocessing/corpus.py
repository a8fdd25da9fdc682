"""Corpus-side preprocessing: OPIEC extraction, redirects, entity/mention
maps, triple aggregation (capabilities P2-P5 of the reference pipeline).

* :func:`iter_opiec_triples` — streaming reader of OPIEC-Clean triples.
  The avro backend is gated (the ``avro``/``fastavro`` libraries are not in
  this image); a JSON-lines debug format with the same record fields is
  always supported, mirroring the reference's filter semantics
  (reference: preprocessing/process_avro.py:16-80): confidence >= 0.3,
  POSITIVE polarity, quantity substitution, token length <= 10.
* :func:`parse_redirects` — DBpedia ``redirects_en.ttl(.bz2)`` parsing with
  the reference's two-sweep transitive resolution
  (reference: preprocessing/create_redirects.py:14-70).  The download
  itself is the caller's problem (this environment has no egress).
* :func:`build_entity_mention_maps` — apply redirects, drop mentions
  below ``min_fraction`` of an entity's total count and comma-qualifier
  artifacts (reference: preprocessing/process_entities_and_mentions.py:15-125).
* :func:`aggregate_triples` — lowercased dedup, most-popular entity link
  per slot with the log-count confidence threshold ``1 - 1/log(total)``,
  self-loop removal, top-K token vocab restriction, rare mention/relation
  dropping (reference: preprocessing/process_triples.py:14-199).
"""

from __future__ import annotations

import bz2
import json
import logging
import math
import re
from collections import Counter, defaultdict
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Set, Tuple

logger = logging.getLogger(__name__)

Tokens = Tuple[str, ...]


# ------------------------------------------------------------- P2: OPIEC


def _passes_filters(rec: Dict, min_confidence: float, max_tokens: int) -> bool:
    if float(rec.get("confidence", 1.0)) < min_confidence:
        return False
    if rec.get("polarity", "POSITIVE") != "POSITIVE":
        return False
    for slot in ("subject", "relation", "object"):
        toks = rec[slot]
        if not toks or len(toks) > max_tokens:
            return False
    return True


def _substitute_quantities(tokens: Sequence[Dict]) -> List[str]:
    """QUANT_* placeholders for quantity tokens (reference semantics)."""
    out = []
    for tok in tokens:
        word = tok["word"] if isinstance(tok, dict) else str(tok)
        if isinstance(tok, dict) and tok.get("ner") == "QUANTITY":
            word = "QUANT"
        out.append(word)
    return out


def iter_opiec_triples(
    paths: Sequence[str],
    min_confidence: float = 0.3,
    max_tokens: int = 10,
) -> Iterator[Dict]:
    """Yield filtered OPIEC triples as dicts with keys
    subject/relation/object (token lists), subject_link/object_link
    (wikipedia links or None), confidence."""
    for path in paths:
        if path.endswith(".avro"):
            try:
                import fastavro  # type: ignore
            except ImportError as e:  # pragma: no cover - gated dependency
                raise ImportError(
                    "reading OPIEC avro files needs the 'fastavro' package, which "
                    "is not installed in this environment; convert the corpus to "
                    "the JSON-lines debug format (one record per line with "
                    "subject/relation/object token lists) or install fastavro"
                ) from e
            with open(path, "rb") as f:
                records = fastavro.reader(f)
                yield from _iter_records(records, min_confidence, max_tokens)
        else:
            opener = bz2.open if path.endswith(".bz2") else open
            with opener(path, "rt", encoding="utf-8") as f:
                yield from _iter_records(
                    (json.loads(line) for line in f if line.strip()),
                    min_confidence,
                    max_tokens,
                )


def _iter_records(records: Iterable[Dict], min_confidence: float, max_tokens: int):
    for rec in records:
        norm = {
            "subject": _substitute_quantities(rec.get("subject", [])),
            "relation": _substitute_quantities(rec.get("relation", [])),
            "object": _substitute_quantities(rec.get("object", [])),
            "subject_link": rec.get("subject_link"),
            "object_link": rec.get("object_link"),
            "confidence": float(rec.get("confidence", 1.0)),
            "polarity": rec.get("polarity", "POSITIVE"),
        }
        if _passes_filters(norm, min_confidence, max_tokens):
            yield norm


# --------------------------------------------------------- P3: redirects


_TTL_RE = re.compile(r"<[^>]*/([^>/]+)>\s+<[^>]+>\s+<[^>]*/([^>/]+)>\s*\.")


def parse_redirects(path: str) -> Dict[str, str]:
    """Two-sweep transitive redirect resolution over a DBpedia ttl dump."""
    redirects: Dict[str, str] = {}
    opener = bz2.open if path.endswith(".bz2") else open
    with opener(path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            m = _TTL_RE.match(line)
            if m:
                redirects[m.group(1)] = m.group(2)
    # sweep twice: A->B->C collapses to A->C (reference does exactly two
    # sweeps, not a full closure)
    for _ in range(2):
        for src, dst in list(redirects.items()):
            if dst in redirects and redirects[dst] != src:
                redirects[src] = redirects[dst]
    return redirects


def apply_redirects(link: Optional[str], redirects: Dict[str, str]) -> Optional[str]:
    if link is None:
        return None
    return redirects.get(link, link)


# ------------------------------------------- P4: entity / mention maps


def build_entity_mention_maps(
    entity_mention_counts: Dict[str, Dict[Tokens, int]],
    redirects: Optional[Dict[str, str]] = None,
    min_fraction: float = 0.1,
) -> Tuple[Dict[str, Dict[Tokens, int]], Dict[Tokens, Set[str]]]:
    """Apply redirects; drop per-entity mentions below ``min_fraction`` of
    the entity's total count and comma-qualifier artifacts ("X , Y" where
    "X" is also a mention).  Returns (entity->mention->count,
    mention->entities)."""
    merged: Dict[str, Dict[Tokens, int]] = defaultdict(Counter)
    for entity, mentions in entity_mention_counts.items():
        target = apply_redirects(entity, redirects or {})
        for m, c in mentions.items():
            merged[target][tuple(m)] += c

    filtered: Dict[str, Dict[Tokens, int]] = {}
    for entity, mentions in merged.items():
        total = sum(mentions.values())
        keep: Dict[Tokens, int] = {}
        for m, c in mentions.items():
            if c < min_fraction * total:
                continue
            if "," in m:
                head = tuple(m[: m.index(",")])
                if head in mentions:
                    continue
            keep[m] = c
        if keep:
            filtered[entity] = keep

    mention_entities: Dict[Tokens, Set[str]] = defaultdict(set)
    for entity, mentions in filtered.items():
        for m in mentions:
            mention_entities[m].add(entity)
    return filtered, dict(mention_entities)


# ------------------------------------------------ P5: triple aggregation


def aggregate_triples(
    triples: Iterable[Dict],
    mention_vocab_size: int = 200_000,
    relation_vocab_size: int = 50_000,
    min_count: int = 3,
    drop_relations: Sequence[Tuple[str, ...]] = (
        ("is:impl_appos-clause",),
        ("is:impl_appos-clause", "in:impl_appos-clause"),
    ),
) -> Tuple[List[Tuple[Tuple[Tokens, Tokens, Tokens], Tuple[Optional[str], Optional[str]]]], Counter, Counter]:
    """Dedup + link + vocab-restrict raw extractions.

    * lowercased (s, r, o) dedup keeping the most confident instance and
      pooling link votes,
    * per slot, pick the most popular link if its vote share passes the
      ``1 - 1/log(total_votes)`` confidence threshold
      (reference: process_triples.py:77-79),
    * self-loops (same link both slots) keep the triple but null both links
      (reference: process_triples.py:102-107),
    * restrict to the top-K mention/relation token vocabularies, THEN count
      surviving mentions/relations and drop those rarer than ``min_count``
      (reference order: process_triples.py:139-159, count > 2),
    * drop configured implicit-appositive marker relations
      (reference: process_triples.py:168-169).
    """
    by_key: Dict[Tuple[Tokens, Tokens, Tokens], Dict] = {}
    for t in triples:
        s, r, o = (tuple(w.lower() for w in t[k]) for k in ("subject", "relation", "object"))
        key = (s, r, o)
        slot = by_key.setdefault(
            key, {"s_links": Counter(), "o_links": Counter(), "count": 0}
        )
        slot["count"] += 1
        if t.get("subject_link"):
            slot["s_links"][t["subject_link"]] += 1
        if t.get("object_link"):
            slot["o_links"][t["object_link"]] += 1

    def pick_link(votes: Counter) -> Optional[str]:
        total = sum(votes.values())
        if total == 0:
            return None
        link, cnt = votes.most_common(1)[0]
        if total < 3:
            return link
        threshold = 1.0 - 1.0 / math.log(total)
        return link if cnt / total >= threshold else None

    mention_tokens = Counter()
    relation_tokens = Counter()
    linked: List[Tuple[Tuple[Tokens, Tokens, Tokens], Tuple[Optional[str], Optional[str]]]] = []
    for (s, r, o), info in by_key.items():
        se = pick_link(info["s_links"])
        oe = pick_link(info["o_links"])
        if se is not None and se == oe:
            # same link on both slots: something is wrong with the linking;
            # keep the triple, null the links (reference :102-107)
            se = oe = None
        linked.append(((s, r, o), (se, oe)))
        mention_tokens.update(s)
        mention_tokens.update(o)
        relation_tokens.update(r)

    keep_mention_toks = {t for t, _ in mention_tokens.most_common(mention_vocab_size)}
    keep_relation_toks = {t for t, _ in relation_tokens.most_common(relation_vocab_size)}

    # token-vocab restriction first, then recount survivors (reference order)
    tok_filtered = [
        t for t in linked
        if all(x in keep_mention_toks for x in t[0][0] + t[0][2])
        and all(x in keep_relation_toks for x in t[0][1])
    ]
    mention_counts = Counter()
    relation_counts = Counter()
    for (s, r, o), _ in tok_filtered:
        mention_counts.update((s, o))
        relation_counts[r] += 1

    drop_rel_set = {tuple(r) for r in drop_relations}
    out = []
    for (s, r, o), links in tok_filtered:
        if r in drop_rel_set:
            continue
        if mention_counts[s] < min_count or mention_counts[o] < min_count:
            continue
        if relation_counts[r] < min_count:
            continue
        out.append(((s, r, o), links))
    return out, mention_tokens, relation_tokens
