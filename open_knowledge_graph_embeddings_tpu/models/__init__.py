from open_knowledge_graph_embeddings_tpu.models.embedders import (  # noqa: F401
    BigramPoolingEmbedder,
    Embedder,
    LookupEmbedder,
    LSTMEmbedder,
    UnigramPoolingEmbedder,
)
from open_knowledge_graph_embeddings_tpu.models.model import (  # noqa: F401
    KGEModel,
    MODELS,
    build_model,
)
