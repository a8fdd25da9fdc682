from open_knowledge_graph_embeddings_tpu.ops.pallas.lstm_kernel import (  # noqa: F401
    lstm_scan_pallas,
    pallas_supported,
)
