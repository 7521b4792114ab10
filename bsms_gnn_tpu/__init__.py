"""BSMS-GNN-TPU: a TPU-native bi-stride multi-scale GNN framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference PyTorch codebase Eydcao/BSMS-GNN (ICML 2023, "Efficient Learning of
Mesh-Based Physical Simulation with Bi-Stride Multi-Scale GNN").

Design stance (TPU-first, not a port):
  * Offline graph precompute emits *static-shape* padded per-level artifacts
    (receiver-sorted edge lists + ELL gather tables), so the entire hot path
    is scatter-free: message aggregation is gather + dense reduction with
    custom VJPs whose backwards are also gathers.
  * Model/trainer state is an explicit functional pytree (params, optimizer
    state, online-normalizer statistics, step) updated under `jit`;
    the reference's Python-side warmup gate becomes `lax.cond`.
  * Rollout is a `lax.scan` over the trajectory.
  * Scaling is `jax.sharding.Mesh` + `shard_map` (data-parallel batch axis and
    edge-partitioned graph axis), not NCCL calls.
"""

__version__ = "0.1.0"

from bsms_gnn_tpu.config import Config, load_config  # noqa: F401
