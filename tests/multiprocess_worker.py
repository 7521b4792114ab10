"""Worker for the multi-process `jax.distributed` local-cluster harness
(SURVEY.md §4): each process owns 4 virtual CPU devices, joins the
coordinator, assembles global arrays from process-local shards, and runs
SPMD train steps over the global ('data','graph') mesh. Rank 0 writes
losses + a param checksum for the pytest driver to compare against the
single-process run.

Usage: python multiprocess_worker.py RANK NPROCS PORT OUT_JSON GRAPH_AXIS
"""

import json
import os
import sys

rank, nprocs, port, out_path, graph_axis = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], int(sys.argv[5]),
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bsms_gnn_tpu.parallel.multihost import global_mesh, init_multihost  # noqa: E402

init_multihost(f"127.0.0.1:{port}", nprocs, rank)
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

from tests_problem import build_problem  # noqa: E402  (shared with pytest)

cfg, h, node_in, node_tar, mask = build_problem()

from bsms_gnn_tpu.parallel.edge_shard import (  # noqa: E402
    hierarchy_pspecs,
    make_spmd_train_step,
)
from bsms_gnn_tpu.training import Trainer  # noqa: E402

mesh = global_mesh(graph=graph_axis)
data_axis = mesh.shape["data"]
tr = Trainer(cfg)

# Global arrays from process-local pieces: state + hierarchy replicate
# (every process contributes identical values), batch shards over 'data'.
state_g = multihost_utils.host_local_array_to_global_array(tr.state, mesh, P())
key = jax.random.PRNGKey(5)

h_g = multihost_utils.host_local_array_to_global_array(
    h, mesh, hierarchy_pspecs(h)
)

b = node_in.shape[0]
lo = rank * (b // nprocs)
hi = lo + b // nprocs
batch_g = multihost_utils.host_local_array_to_global_array(
    (node_in[lo:hi], node_tar[lo:hi], mask[lo:hi]), mesh, P("data")
)

step = make_spmd_train_step(tr, mesh, h)
losses = []
state = state_g
for i in range(3):
    key_g = multihost_utils.host_local_array_to_global_array(
        jax.random.fold_in(key, i), mesh, P()
    )
    state, loss = step(state, h_g, *batch_g, key_g)
    # Outputs are replicated, so every process's first addressable shard
    # holds the full value.
    losses.append(float(np.asarray(loss.addressable_data(0))))

# Param checksum: sum of |params| over every leaf (replicated output).
leaves = jax.tree_util.tree_leaves(state.sim.params)
checksum = float(
    sum(float(jnp.sum(jnp.abs(l.addressable_data(0)))) for l in leaves)
)
norm_ex = np.asarray(state.sim.norm_in.e_x.addressable_data(0))

# ---------------------------------------------------------------------------
# Ghost-edge halo path across the process boundary: partition the same mesh
# over ALL global devices on the graph axis (each process owns 4 shards),
# assemble shard-major global arrays from process-local shard slices, and
# run warmup + 2 gradient steps of the shard_map train step.
# ---------------------------------------------------------------------------
import copy  # noqa: E402

from bsms_gnn_tpu.graph.bistride import build_bistride_levels  # noqa: E402
from bsms_gnn_tpu.graph.mesh import to_flat_edge  # noqa: E402
from bsms_gnn_tpu.parallel import (  # noqa: E402
    build_partition,
    make_halo_train_step,
    make_mesh,
    partition_nodes,
)
from tests_problem import _grid, halo_target  # noqa: E402

S = len(jax.devices())
cfg2 = copy.deepcopy(cfg)
cfg2.datasets.noise_level = [0.0] * cfg2.model.out_dim
node_tar_h = halo_target(cfg2, node_in) * mask
pos, cells = _grid(9, 9)
edges = to_flat_edge(cells, "tri")
levels = build_bistride_levels(edges, cfg2.model.unet_depth, pos.shape[0], pos)
plan = build_partition(levels, S, h.levels[0].n_pad_nodes, pos, block=32,
                       local_layouts=True)
hmesh = make_mesh(1, S, devices=jax.devices())
tr2 = Trainer(cfg2)
hstep = make_halo_train_step(tr2, hmesh, plan)

state2 = multihost_utils.host_local_array_to_global_array(tr2.state, hmesh, P())
local = slice(rank * (S // nprocs), (rank + 1) * (S // nprocs))
hargs = tuple(
    multihost_utils.host_local_array_to_global_array(
        partition_nodes(plan, np.asarray(a[0]))[local], hmesh, P("graph")
    )
    for a in (node_in, node_tar_h, mask)
)
halo_losses = []
st = state2
for i in range(3):
    key_g = multihost_utils.host_local_array_to_global_array(
        jax.random.fold_in(key, i), hmesh, P()
    )
    st, hloss = hstep(st, *hargs, key_g)
    halo_losses.append(float(np.asarray(hloss.addressable_data(0))))

if rank == 0:
    with open(out_path, "w") as f:
        json.dump(
            {
                "losses": losses,
                "checksum": checksum,
                "norm_in_ex": norm_ex.tolist(),
                "process_count": jax.process_count(),
                "n_devices": len(jax.devices()),
                "halo_losses": halo_losses,
            },
            f,
        )
print(f"[worker {rank}] done: losses={losses} halo={halo_losses}", flush=True)
