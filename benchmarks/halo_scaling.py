"""Halo-partitioned scaling efficiency — the BASELINE.md multi-host row
(">=80% edges/s scaling efficiency at >=2 hosts; measured at 1 chip / 1
host / N hosts").

Builds one mesh, partitions it S ways (ghost-edge kernel layouts), times
the sharded forward at each shard count on the first S devices, and
reports edges/s + efficiency vs the single-shard run. On a single real
chip this degenerates to a layout-overhead check; on a pod slice (or the
8-virtual-device CPU mesh with JAX_PLATFORMS=cpu) it is the real scaling
curve.

Usage: python benchmarks/halo_scaling.py [n_nodes] [depth] [shard counts...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_nodes=20000, depth=6, shards=(1, 2, 4, 8), window=512,
         replicate_floor=0, force_cpu=False):
    if force_cpu:
        from bsms_gnn_tpu.parallel.mesh import ensure_n_devices

        jax = ensure_n_devices(max(shards))
    else:
        import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_graded_airfoil_mesh
    from bsms_gnn_tpu.graph.bistride import build_bistride_levels
    from bsms_gnn_tpu.graph.hierarchy import pad_levels
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.parallel import (
        build_partition,
        make_halo_forward,
        make_mesh,
        partition_nodes,
    )
    from bsms_gnn_tpu.training import Trainer
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    enable_compilation_cache()
    n_dev = len(jax.devices())
    shards = [s for s in shards if s <= n_dev]

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        "model.aggregation=fused",
    ])
    rng = np.random.default_rng(0)
    pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels = build_bistride_levels(edges, depth, n, pos.astype(np.float64))
    h = pad_levels(levels, pad_multiple=128, pos=pos.astype(np.float64))
    n_pad = h.levels[0].n_pad_nodes
    total_edges = sum(
        g.flat_edges.shape[1] * (1 if l == depth else 2)
        for l, g in enumerate(levels.graphs)
    )

    c, pd = cfg.model.out_dim, cfg.model.pos_dim
    node_in = np.zeros((n_pad, c + pd + 1), np.float32)
    node_in[:n, :c] = rng.standard_normal((n, c))
    node_in[:n, c:c + pd] = pos
    node_in[:n, -1:] = node_type
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = 1.0

    base_eps = None
    rows = []
    for s in shards:
        plan = build_partition(
            levels, s, n_pad, pos.astype(np.float64),
            local_layouts=True, edge_block=min(512, 128 if s > 4 else 512),
            window=window, replicate_floor=replicate_floor,
        )
        tr = Trainer(cfg)
        mesh = make_mesh(1, s, devices=jax.devices()[:s])
        fwd = make_halo_forward(tr, mesh, plan)
        ni = jnp.asarray(partition_nodes(plan, node_in))
        nm = jnp.asarray(partition_nodes(plan, mask))
        out = fwd(tr.state.sim, ni, nm)
        assert np.all(np.isfinite(np.asarray(out)[:, : min(64, n), :]))
        n_steps = 20 if jax.devices()[0].platform == "tpu" else 5
        # On the virtual CPU mesh, wall-clock cannot measure scaling (all
        # "devices" share the same host cores, which S=1 already saturates
        # through XLA's intra-op threading). Process CPU-seconds per step
        # DO measure it: padding overhead is real executed work, so the
        # work ratio cpu(S)/cpu(1) is the measured counterpart of the
        # scaling model's padding factor (its only modeled compute term).
        import time as _time

        cpu0 = _time.process_time()
        t = pipelined_timeit(lambda: fwd(tr.state.sim, ni, nm), steps=n_steps,
                             warmup=2)
        cpu_per_step = (_time.process_time() - cpu0) / (n_steps + 2)
        eps = total_edges / t
        if base_eps is None:
            base_eps = eps
            base_cpu = cpu_per_step
        eff = eps / (base_eps * s / shards[0])
        rows.append({
            "shards": s, "ms_fwd": round(1e3 * t, 3),
            "medges_per_s": round(eps / 1e6, 2),
            "scaling_eff": round(eff, 4),
            "cpu_s_per_step": round(cpu_per_step, 3),
            "work_ratio_vs_s1": round(cpu_per_step / base_cpu, 3),
        })
        print(
            f"shards={s}: {1e3 * t:8.2f} ms/fwd  {eps / 1e6:9.1f} Medges/s  "
            f"scaling-eff {100 * eff:5.1f}%  cpu/step {cpu_per_step:6.2f}s "
            f"(work x{cpu_per_step / base_cpu:.3f})",
            flush=True,
        )

    import json

    plat = jax.devices()[0].platform
    out = os.path.join(
        os.path.dirname(__file__), "out", f"halo_scaling_{plat}.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({
            "mesh": {"n_nodes": n, "depth": depth, "window": window,
                     "replicate_floor": replicate_floor,
                     "total_edges_per_fwd": int(total_edges)},
            "platform": plat,
            "note": ("CPU wall-clock: absolute times are not TPU times, but "
                     "padding overhead is real executed work, so the S-curve "
                     "anchors the scaling model's padding-factor term "
                     "(BASELINE.md row 3, PARITY.md 'Scaling model')."),
            "rows": rows,
        }, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    floor = next((int(x.split("=")[1]) for x in sys.argv[1:]
                  if x.startswith("--floor=")), 0)
    main(
        int(a[0]) if a else 20000,
        int(a[1]) if len(a) > 1 else 6,
        tuple(int(x) for x in a[2:]) or (1, 2, 4, 8),
        replicate_floor=floor,
        force_cpu=("--cpu" in sys.argv),
    )
