"""Training-step throughput on an airfoil-scale problem.

The reference's headline metric is training time/epoch: ≈9.5 h for airfoil
(10k steps of batch 48 → ≈3.4 s/step on unspecified hardware; BASELINE.md).
This measures our jitted train step (fwd+bwd+update, batch 48, ~5k nodes,
depth 7) with pipelined dispatch.

Usage: python benchmarks/train_step.py [batch] [n_nodes] [agg] [dtype]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(batch=48, n_nodes=5000, agg="pallas", dtype="float32"):
    import jax

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.training import Trainer

    cfg = load_config([
        "model.unet_depth=7", "datasets.unet_depth=7",
        f"model.aggregation={agg}", f"model.compute_dtype={dtype}",
        "model.accumulation_steps=0",
    ])
    pos, cells, node_type = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 7, pos.shape[0], pos.astype(np.float64))
    h = jax.device_put(h)

    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c = cfg.model.out_dim
    rng = np.random.default_rng(1)
    node_in = np.zeros((batch, n_pad, c + 3), np.float32)
    node_in[:, :n, :c] = rng.standard_normal((batch, n, c))
    node_in[:, :n, c : c + 2] = pos
    node_tar = np.zeros((batch, n_pad, c), np.float32)
    node_tar[:, :n] = node_in[:, :n, :c]
    mask = np.zeros((batch, n_pad, 1), np.float32)
    mask[:, :n] = 1.0
    node_in, node_tar, mask = map(jnp.asarray, (node_in, node_tar, mask))

    tr = Trainer(cfg)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    first_loss = float(tr.iter(h, node_in, node_tar, mask, key))
    print(f"compile {time.time()-t0:.0f}s loss0={first_loss:.4f}", flush=True)

    for i in range(3):
        float(tr.iter(h, node_in, node_tar, mask, jax.random.fold_in(key, i)))
    steps = 10
    # Chained dispatch, materialize the final loss once: steps serialize on
    # the state dependency, so total/steps is true step time. (NB
    # jax.block_until_ready is not a reliable fence on this backend.)
    t0 = time.time()
    loss = None
    for i in range(steps):
        loss = tr.iter(h, node_in, node_tar, mask, jax.random.fold_in(key, 100 + i))
    final_loss = float(loss)
    dt = (time.time() - t0) / steps
    edges_total = sum(g.n_edges for g in h.levels) * batch
    print(
        f"train_step[b{batch},n{n_nodes},{agg},{dtype}]: {dt*1e3:.1f} ms/step, "
        f"{batch/dt:.1f} samples/s, "
        f"epoch(10k steps) = {dt*10000/3600:.2f} h "
        f"(ref airfoil ≈ 9.5 h)",
        flush=True,
    )


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        int(args[0]) if len(args) > 0 else 48,
        int(args[1]) if len(args) > 1 else 5000,
        args[2] if len(args) > 2 else "pallas",
        args[3] if len(args) > 3 else "float32",
    )
