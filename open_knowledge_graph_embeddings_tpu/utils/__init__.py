from open_knowledge_graph_embeddings_tpu.utils import misc  # noqa: F401
