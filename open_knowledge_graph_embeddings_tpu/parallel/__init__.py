from open_knowledge_graph_embeddings_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    default_mesh,
    make_mesh,
)
from open_knowledge_graph_embeddings_tpu.parallel.sharding import (  # noqa: F401
    opt_state_shardings,
    train_batch_shardings,
    variables_shardings,
)
