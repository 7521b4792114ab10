"""Multi-chip scaling: device meshes, data parallelism, edge-partitioned
graph parallelism.

The reference's multi-GPU story is vestigial (`DataParallel` defeated by a
hardcoded device pin, `train.py:16`; `Normalizer.synchronize` never called,
`normalizer.py:37,92-114`). Here scaling is first-class and TPU-native:

  * `data_parallel` — batch sharded over the 'data' mesh axis via jit
    sharding annotations; XLA inserts the gradient all-reduce, and the
    normalizer statistics are global means by construction (the working
    version of what `synchronize` intended).
  * `edge_shard` — each level's edge set sharded over the 'graph' axis via
    `shard_map`: local gather + edge MLP + local segment-sum, then `psum`
    over ICI — the graph analog of sequence/context parallelism
    (SURVEY.md §5.7).
"""

from bsms_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from bsms_gnn_tpu.parallel.data_parallel import (  # noqa: F401
    replicate_state,
    shard_batch,
    make_dp_train_step,
)
from bsms_gnn_tpu.parallel.edge_shard import (  # noqa: F401
    hierarchy_shardings,
    shard_hierarchy,
    strip_ell,
    make_spmd_train_step,
)
