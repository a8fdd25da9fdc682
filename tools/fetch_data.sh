#!/usr/bin/env bash
# Dataset acquisition for open_knowledge_graph_embeddings_tpu.
#
# Encodes the reference's exact download steps (reference: README.md:36-46,
# 150-163, 186-192; preprocessing/create_redirects.py:14-36) so the training
# and benchmark-creation pipelines are runnable end-to-end outside an
# egress-less sandbox.  Run with --print to list the commands without
# executing them (useful where network access must go through a proxy).
#
# Usage:
#   tools/fetch_data.sh [--print] [olpbench|opiec|redirects|fb15k237|all]
#
# Targets:
#   olpbench   OLPBench training/eval data (~2.4 GB compressed, ~7.9 GB
#              uncompressed) -> data/olpbench/
#   opiec      OPIEC-Clean corpus for creating OLPBench from scratch
#              (~35 GB compressed, ~292 GB uncompressed) -> data/OPIEC-Clean/
#   redirects  DBpedia 2016-10 Wikipedia redirects (used by the
#              entity/mention-map pipeline stage) -> data/downloads/
#   fb15k237   Notes for FB15k-237: the reference ships
#              data/fb15k237/{train,valid,test}.txt + mid2name.tsv.gz in-repo
#              and maps them with prepare_fb237.py; our equivalent is
#              `python -m open_knowledge_graph_embeddings_tpu.cli.create_data
#              --prepare-fb15k237 DIR`.
set -euo pipefail

PRINT=0
if [[ "${1:-}" == "--print" ]]; then PRINT=1; shift; fi
TARGET="${1:-all}"

run() {
  if [[ "$PRINT" == 1 ]]; then
    printf '%q ' "$@"; printf '\n'
  else
    "$@"
  fi
}

fetch_olpbench() {
  # reference: README.md:36-46
  run mkdir -p data
  run wget -c -P data http://data.dws.informatik.uni-mannheim.de/olpbench/olpbench.tar.gz
  run tar xzf data/olpbench.tar.gz -C data
}

fetch_opiec() {
  # reference: README.md:155-163 (only needed to rebuild OLPBench from scratch)
  run mkdir -p data
  run wget -c -P data http://data.dws.informatik.uni-mannheim.de/opiec/OPIEC-Clean.zip
  run unzip -n data/OPIEC-Clean.zip -d data
}

fetch_redirects() {
  # reference: preprocessing/create_redirects.py:33-36 (DBpedia 2016-10 dump)
  run mkdir -p data/downloads
  run wget -c -P data/downloads \
    http://downloads.dbpedia.org/2016-10/core-i18n/en/redirects_en.ttl.bz2
}

note_fb15k237() {
  cat <<'EOF'
FB15k-237 ships inside the reference repository (data/fb15k237/: train.txt,
valid.txt, test.txt, mid2name.tsv.gz) — no download needed.  To produce the
mapped_to_ids/ files this framework consumes:
  python -m open_knowledge_graph_embeddings_tpu.cli.create_data \
      --prepare-fb15k237 /path/to/fb15k237
(equivalent of the reference's `cd data/fb15k237 && python prepare_fb237.py`,
reference: README.md:186-192, data/fb15k237/prepare_fb237.py)
EOF
}

case "$TARGET" in
  olpbench)  fetch_olpbench ;;
  opiec)     fetch_opiec ;;
  redirects) fetch_redirects ;;
  fb15k237)  note_fb15k237 ;;
  all)       fetch_olpbench; fetch_redirects; note_fb15k237 ;;
  *) echo "unknown target: $TARGET (olpbench|opiec|redirects|fb15k237|all)" >&2; exit 2 ;;
esac
