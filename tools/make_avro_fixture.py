"""Regenerate tests/fixtures/opiec_tiny.avro (byte-reproducible: pinned
sync marker, codec null).  Usage: python tools/make_avro_fixture.py"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_avro import FIXTURE, SCHEMA, fixture_records  # noqa: E402

from open_knowledge_graph_embeddings_tpu.preprocessing.avro import writer  # noqa: E402

if __name__ == "__main__":
    with open(FIXTURE, "wb") as f:
        writer(f, SCHEMA, fixture_records())
    print(f"wrote {FIXTURE} ({os.path.getsize(FIXTURE)} bytes)")
