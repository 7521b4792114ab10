"""Multi-host bring-up: `jax.distributed` initialization + global mesh.

The reference has no multi-node path at all (SURVEY.md §5.8: NCCL reached
only through a never-called `Normalizer.synchronize`). Here: every host runs
the same program, `init_multihost` wires the JAX distributed runtime
(coordinator discovery via args or TPU-pod metadata), and `global_mesh`
builds a ('data','graph') mesh over all chips in the slice — the SPMD train
step from `parallel.edge_shard` then runs unchanged, with XLA routing
collectives over ICI within a slice and DCN across slices.

Local testing recipe (SURVEY.md §4): run N processes with
`jax.distributed.initialize(coordinator, N, rank)` on CPU, or single-process
with `XLA_FLAGS=--xla_force_host_platform_device_count=N` (what tests/ do).
"""

from __future__ import annotations

from typing import Optional

import jax

from bsms_gnn_tpu.parallel.mesh import make_mesh


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the distributed runtime. With no args on a TPU pod slice,
    JAX auto-discovers from the TPU metadata; pass explicit values for
    CPU/GPU clusters or manual launches. Safe to call once per process.

    Must run before anything touches the XLA backend (jax.devices etc.) —
    so the check below uses `is_initialized`, not `process_count`."""
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-process run: fine
        if num_processes not in (None, 1):
            raise
        print(f"[multihost] single-process mode ({e})", flush=True)


def global_mesh(graph: int = 1):
    """('data','graph') mesh over every device in the job: `graph` chips per
    graph shard (ICI neighbors first), the rest data-parallel."""
    n = len(jax.devices())
    assert n % graph == 0, (n, graph)
    return make_mesh(n // graph, graph)
