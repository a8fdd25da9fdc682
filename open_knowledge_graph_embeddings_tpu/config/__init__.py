from open_knowledge_graph_embeddings_tpu.config.options import load_config, parse_cli  # noqa: F401
