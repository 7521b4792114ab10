"""Data layer: trajectory storage, hierarchy-aware batching, dataset registry.

Capability parity with reference `src/datasets/` (h5 trajectory reading,
multi-mesh caching, per-dataset Dirichlet masks, train-time sampling,
rollout mode) rebuilt around static shapes: every sample is padded to its
dataset's bucket shapes, a consistent-mesh dataset batches as [B, N_pad, C]
over one shared `Hierarchy`, and variable-mesh datasets stack per-sample
hierarchies leaf-wise for a vmapped forward (replacing the reference's PyG
disjoint-union collation, `base.py:322-351`).
"""

from bsms_gnn_tpu.data.datasets import DATASET_HANDLER, get_mask  # noqa: F401
from bsms_gnn_tpu.data.trajectory import TrajectoryReader  # noqa: F401
from bsms_gnn_tpu.data.pipeline import (  # noqa: F401
    Batch,
    TrajectorySampler,
    rollout_iterator,
    stack_hierarchies,
)
from bsms_gnn_tpu.data.synthetic import generate_synthetic_dataset  # noqa: F401
