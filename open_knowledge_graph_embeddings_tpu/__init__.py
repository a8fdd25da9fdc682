"""open_knowledge_graph_embeddings_tpu — a TPU-native open knowledge-graph
embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
samuelbroscheit/open_knowledge_graph_embeddings (ACL 2020 OLPBench):

* standard link prediction on closed KGs (FB15k-237) and open link
  prediction over free-text mentions (OLPBench),
* scorer x embedder model families (ComplEx / DistMult / Tucker3 x
  lookup / unigram-pool / bigram-CNN / LSTM),
* 1-vs-N multi-label training with full-vocabulary or batch-shared
  candidate label spaces,
* filtered ranking evaluation with max-over-mention-alternative credit,
* sharded embedding tables and candidate axes over a TPU device mesh.

Unlike the reference (PyTorch, single-process DataParallel), every model is a
pure function over a parameter pytree, every training/eval step is a single
jitted program with static shapes, and scale-out happens through
`jax.sharding` over an ICI mesh rather than replication.
"""

__version__ = "0.1.0"

from open_knowledge_graph_embeddings_tpu import data, models, ops, parallel, train  # noqa: F401
