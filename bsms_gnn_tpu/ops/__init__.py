"""TPU-native GNN building blocks (pure functions over param pytrees).

Capability parity with reference `src/ops/` (`MLP`, `GMP`, `WeightedEdgeConv`,
`Unpool`, `BSGMP`) and the scatter primitives in `src/utils/basic.py:287-343`,
rebuilt scatter-free: every aggregation is an ELL gather + dense sum whose
custom VJP is also a gather.
"""

from bsms_gnn_tpu.ops.dense import MLPParams, init_mlp, mlp_apply, layer_norm  # noqa: F401
from bsms_gnn_tpu.ops.scatter import (  # noqa: F401
    gather_send,
    gather_recv,
    aggregate_recv,
    aggregate_send,
)
from bsms_gnn_tpu.ops.message import (  # noqa: F401
    GMPParams,
    init_gmp,
    gmp_apply,
    cal_ew,
    edge_conv_down,
    edge_conv_up,
)
from bsms_gnn_tpu.ops.pool import pool_nodes, unpool_nodes  # noqa: F401
from bsms_gnn_tpu.ops.bsgmp import BSGMPParams, init_bsgmp, bsgmp_apply  # noqa: F401
