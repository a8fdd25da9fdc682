"""Benchmark-creation entry point.

Usage (mirrors the reference, reference: scripts/create_data.py)::

    python -m open_knowledge_graph_embeddings_tpu.cli.create_data -c pipeline.yaml

The YAML config provides at least ``work_dir`` and ``corpus_files`` (OPIEC
avro files, or the JSON-lines debug format — see preprocessing/corpus.py);
optional keys: redirects_file, eval_data_size, mention_vocab_size,
relation_vocab_size, min_count, vocab_min_count, seed.
"""

from __future__ import annotations

import argparse
import sys

import yaml

from open_knowledge_graph_embeddings_tpu.preprocessing.jobs import run_pipeline
from open_knowledge_graph_embeddings_tpu.utils.logging_utils import setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(description="OLP benchmark creation pipeline")
    parser.add_argument("-c", "--config", required=True, help="pipeline YAML config")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        opts = yaml.safe_load(f)
    setup_logging()
    run_pipeline(opts)


if __name__ == "__main__":
    main(sys.argv[1:])
