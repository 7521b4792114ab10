"""Data parallelism via jit sharding annotations.

Batch arrays shard over the 'data' mesh axis; state (params, optimizer,
normalizer stats) replicates. Under jit, the global-sum loss and normalizer
means make XLA insert psum/all-reduce collectives over ICI automatically —
no explicit communication code. This is the corrected realization of the
reference's intended-but-dead multi-GPU path (`trainer.py:15-18`,
`normalizer.py:92-114`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate_state(mesh: Mesh, state):
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, node_in, node_tar, node_mask, hierarchy=None):
    """Shard batch arrays along 'data'. A stacked hierarchy (per-sample
    graphs) shards its sample axis too; a shared hierarchy replicates."""
    sh = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(x, sh) for x in (node_in, node_tar, node_mask))
    if hierarchy is None:
        return out
    stacked = hierarchy.levels[0].senders.ndim == 2
    hspec = NamedSharding(mesh, P("data") if stacked else P())
    return out + (jax.device_put(hierarchy, hspec),)
