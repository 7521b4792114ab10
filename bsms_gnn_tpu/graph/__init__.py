"""Offline graph precompute: mesh→edges, BFS/bi-stride coarsening, and
static-shape padded hierarchy artifacts for the TPU hot path.

Everything in this package is host-side NumPy/C++ and runs once per mesh
(results are cached); nothing here touches a device.
"""

from bsms_gnn_tpu.graph.mesh import to_flat_edge  # noqa: F401
from bsms_gnn_tpu.graph.csr import CsrGraph  # noqa: F401
from bsms_gnn_tpu.graph.bistride import build_bistride_levels  # noqa: F401
from bsms_gnn_tpu.graph.hierarchy import (  # noqa: F401
    LevelGraph,
    Transition,
    Hierarchy,
    build_hierarchy,
    load_or_build_hierarchy,
)
