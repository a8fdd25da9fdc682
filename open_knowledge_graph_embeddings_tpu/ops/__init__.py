from open_knowledge_graph_embeddings_tpu.ops import lstm, norm, scoring  # noqa: F401
