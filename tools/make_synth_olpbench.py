"""Generate a synthetic OLPBench-shaped dataset at configurable scale.

Writes the exact ``mapped_to_ids`` on-disk contract the framework (and the
reference, openkge/dataset.py:49-54) consumes: 5-TAB-column triple files
with space-separated alternative-mention id lists, plus the six vocab map
files.  Used for end-to-end scale demonstrations (RESULTS.md) in this
environment, where the real OLPBench download is unavailable (no egress).

Mention surface forms are token sequences drawn Zipf-ish from the token
vocab; ~30% of mentions are paired into two-mention entities so the
max-over-alternatives eval crediting path is exercised.

Usage::

    python tools/make_synth_olpbench.py OUTDIR \
        --mentions 300000 --relations 20000 --triples 1500000 [--seed 0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _tok_lines(n_items, vocab, max_body, rng, first_id=2):
    """Token-id sequences (without BOS/EOS) for items first_id..first_id+n."""
    lens = 1 + (rng.zipf(1.6, size=n_items) - 1) % max_body
    toks = 4 + ((rng.zipf(1.2, size=(n_items, max_body)) - 1) % (vocab - 4))
    return lens.astype(np.int64), toks.astype(np.int64)


def write_map(path, header, ids, texts, counts):
    with open(path, "w") as f:
        f.write(header)
        for i, t, c in zip(ids, texts, counts):
            f.write(f"{t}\t{i}\t{c}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--mentions", type=int, default=300_000)
    ap.add_argument("--relations", type=int, default=20_000)
    ap.add_argument("--triples", type=int, default=1_500_000)
    ap.add_argument("--eval-size", type=int, default=5_000)
    ap.add_argument("--ent-tokens", type=int, default=50_000)
    ap.add_argument("--rel-tokens", type=int, default=10_000)
    ap.add_argument("--max-len", type=int, default=8, help="max body tokens (BOS/EOS added on top)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    M, R = args.mentions, args.relations

    # --- token sequences per mention / relation (ids start at 2)
    m_lens, m_toks = _tok_lines(M, args.ent_tokens, args.max_len, rng)
    r_lens, r_toks = _tok_lines(R, args.rel_tokens, args.max_len, rng)

    def dump_vocab(prefix, n, lens, toks, tok_vocab):
        ids = np.arange(2, 2 + n)
        # surface forms: synthetic "t<id>" words joined; counts Zipf-ish
        texts = [
            " ".join(f"t{t}" for t in toks[i, : lens[i]]) + f" #{i+2}"
            for i in range(n)
        ]
        counts = 3 + (rng.zipf(1.5, size=n) - 1) % 1000
        write_map(
            f"{args.outdir}/{prefix}_id_map.txt", "# token\tid\tcount\t\n",
            ids, texts, counts,
        )
        with open(f"{args.outdir}/{prefix}_id_tokens_ids_map.txt", "w") as f:
            f.write(f"# {prefix} id\ttokens\t\n")
            for i in range(n):
                body = " ".join(str(t) for t in toks[i, : lens[i]])
                f.write(f"{i+2}\t2 {body} 3\n")
        tok_ids = np.arange(4, tok_vocab)
        write_map(
            f"{args.outdir}/{prefix}_token_id_map.txt", "# token\tid\tcount\t\n",
            tok_ids, [f"t{t}" for t in tok_ids],
            3 + (rng.zipf(1.5, size=len(tok_ids)) - 1) % 1000,
        )

    dump_vocab("entity", M, m_lens, m_toks, args.ent_tokens)
    dump_vocab("relation", R, r_lens, r_toks, args.rel_tokens)

    # --- alternative-mention structure: pair ~30% of mentions
    alt = np.arange(2, 2 + M)
    n_pair = int(0.3 * M) // 2 * 2
    paired = rng.permutation(M)[:n_pair] + 2
    partner = {}
    for a, b in paired.reshape(-1, 2):
        partner[a] = b
        partner[b] = a

    def alts(mid):
        p = partner.get(mid)
        return f"{mid} {p}" if p is not None else f"{mid}"

    # --- triples: Zipf-ish head entities, uniform-ish relations
    def sample_triples(n):
        s = 2 + (rng.zipf(1.3, size=n) - 1) % M
        o = 2 + (rng.zipf(1.3, size=n) - 1) % M
        r = 2 + ((rng.zipf(1.1, size=n) - 1) % R)
        keep = s != o
        return s[keep], r[keep], o[keep]

    def write_triples(path, n):
        s, r, o = sample_triples(int(n * 1.05))
        s, r, o = s[:n], r[:n], o[:n]
        with open(path, "w") as f:
            f.write("".join(
                f"{si}\t{ri}\t{oi}\t{alts(si)}\t{alts(oi)}\n"
                for si, ri, oi in zip(s, r, o)
            ))
        return len(s)

    nt = write_triples(f"{args.outdir}/train.txt", args.triples)
    nv = write_triples(f"{args.outdir}/valid.txt", args.eval_size)
    ne = write_triples(f"{args.outdir}/test.txt", args.eval_size)
    print(f"wrote {nt} train / {nv} valid / {ne} test triples, "
          f"{M} mentions ({n_pair} in two-mention entities), {R} relations -> {args.outdir}")


if __name__ == "__main__":
    main()
