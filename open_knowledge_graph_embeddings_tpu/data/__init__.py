from open_knowledge_graph_embeddings_tpu.data.dataset import (  # noqa: F401
    DatasetMeta,
    Datasets,
    OneToNMentionRelationDataset,
    PrefixRecords,
    SLOT_PO,
    SLOT_SP,
    load_meta,
    read_triple_file,
)
from open_knowledge_graph_embeddings_tpu.data.batching import Batch, BatchBuilder  # noqa: F401
from open_knowledge_graph_embeddings_tpu.data.vocab import (  # noqa: F401
    BOS,
    EOS,
    PAD,
    UNK,
    IndexMapper,
)
