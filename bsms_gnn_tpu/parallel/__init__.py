"""Multi-chip scaling: device meshes, data parallelism, edge-partitioned
graph parallelism.

The reference's multi-GPU story is vestigial (`DataParallel` defeated by a
hardcoded device pin, `train.py:16`; `Normalizer.synchronize` never called,
`normalizer.py:37,92-114`). Here scaling is first-class and TPU-native,
with two complementary graph-scaling paths:

  * `data_parallel` / `edge_shard` — GSPMD: batch sharded over the 'data'
    mesh axis and edge arrays over 'graph' via jit sharding annotations;
    XLA places the collectives (the working version of what `synchronize`
    intended).
  * `partition` + `halo` — explicit `shard_map` edge partitioning: each
    level's edges are owned by their receiver's shard, pool/unpool are
    shard-aligned (zero communication), and sender features cross chips
    through one static halo `all_to_all` per gather — the graph analog of
    sequence/context parallelism (SURVEY.md §5.7, BASELINE.md scaling
    north star).
"""

from bsms_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from bsms_gnn_tpu.parallel.data_parallel import (  # noqa: F401
    replicate_state,
    shard_batch,
)
from bsms_gnn_tpu.parallel.edge_shard import (  # noqa: F401
    hierarchy_shardings,
    shard_hierarchy,
    make_spmd_train_step,
)
from bsms_gnn_tpu.parallel.partition import (  # noqa: F401
    PartitionPlan,
    build_partition,
    partition_nodes,
    unpartition_nodes,
)
from bsms_gnn_tpu.parallel.halo import (  # noqa: F401
    make_halo_forward,
    make_halo_rollout,
    make_halo_train_step,
)
