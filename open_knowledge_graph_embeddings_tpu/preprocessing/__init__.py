from open_knowledge_graph_embeddings_tpu.preprocessing.pipeline import PipelineJob  # noqa: F401
from open_knowledge_graph_embeddings_tpu.preprocessing.search import TripleSearchIndex  # noqa: F401
