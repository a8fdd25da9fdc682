from open_knowledge_graph_embeddings_tpu.train.metrics import AccumulateMeter, MetricResult  # noqa: F401
from open_knowledge_graph_embeddings_tpu.train.optim import OptimizerRegimes  # noqa: F401
from open_knowledge_graph_embeddings_tpu.train.step import (  # noqa: F401
    eval_batch_to_arrays,
    make_eval_step,
    make_train_step,
    train_batch_to_arrays,
)
