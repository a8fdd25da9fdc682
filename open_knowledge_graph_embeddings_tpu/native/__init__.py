"""Native (C++) runtime components, loaded through ctypes.

The shared library builds on first import with g++ (cached next to the
source, keyed by source mtime); every consumer has a pure-python fallback,
so a missing toolchain degrades to slower startup, never to failure.
"""

from open_knowledge_graph_embeddings_tpu.native.loader import (  # noqa: F401
    native_available,
    read_triple_file_native,
)
