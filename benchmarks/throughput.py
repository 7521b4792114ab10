"""Batched-inference throughput at the 5k headline point.

The headline bench (bench.py) measures single-mesh latency, which below
~20k nodes is op-chain bound (~13 µs per dependent op on this chip —
PARITY.md "Windowed-kernel roofline"), so its MFU says nothing about the
design's ceiling. Production serving and training batch many meshes per
step ([B, N_pad, C] over a shared hierarchy — the reference's
consistent-mesh mode, `/root/reference/src/models/model.py:190-192`);
batching multiplies every matmul's rows by B without lengthening the
dependent chain, so MXU occupancy — not dispatch — governs.

Usage:  python benchmarks/throughput.py [--batches 1,4,16,32]

Writes benchmarks/out/throughput.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PEAK_TFLOPS, _build, _dense_flops  # noqa: E402

HBM_BYTES_PER_S = 373e9  # v5e markets ~819 GB/s; 373 GB/s is this chip's
#  measured stream rate (benchmarks/windowed_roofline.py copy roof)


def union_byte_budget(h, cfg, dt=2):
    """Static HBM byte budget of one bf16 union forward (VERDICT r4 item 5:
    'write the per-level byte budget of the union step against the roof').

    Counts, per level, the streams every kernel actually touches:
    window-block DMAs (one pair per win_base transition over the chunk
    sequence), xj/output block traffic (one per chunk_block transition),
    the [8, E] fiber stream, packed sw/recv/ew tables, the per-node
    transforms and node-MLP I/O, the compact-residual accumulate's
    read-modify-write, and encode/decode at the boundary. Down+up GMP per
    level + bottom, plus one transition conv each way per level.
    `dt` is the stream dtype width (bf16 = 2)."""
    import numpy as np

    c = cfg.model.latent_dim
    total = 0
    per_level = []
    L = len(h.levels)
    for li, g in enumerate(h.levels):
        n_pad, e_pad = int(g.n_pad_nodes), int(g.n_pad_edges)
        be = int(g.edge_block)
        nc = e_pad // be
        wh = g.window // 2
        wb = np.asarray(g.win_base)
        wtrans = 1 + int(np.count_nonzero(np.diff(wb)))
        indptr = np.asarray(g.recv_indptr)
        blocks = indptr[::128]
        cb = np.searchsorted(blocks[1:], np.arange(nc) * be, side="right")
        ctrans = 1 + int(np.count_nonzero(np.diff(cb)))
        rpad = 0
        if g.cresid is not None:
            rpad = int(np.asarray(g.cresid.senders).shape[-1])
        # one fused GMP edge phase
        edge = (
            wtrans * 2 * wh * c * dt        # window pair DMAs
            + ctrans * 128 * c * dt         # xj blocks
            + 16 * e_pad                    # fiber_t [8, E] bf16
            + 8 * e_pad                     # sw + recv int32 rows
            + n_pad * c * 4                 # aggregate out (f32)
        )
        # per-node transforms xwi/xj + node MLP ([x|aggr] in, out + resid)
        node = (
            n_pad * c * dt * 3              # x read, xwi+xj written
            + n_pad * c * (dt + 4)          # node MLP reads x + aggr(f32)
            + n_pad * c * dt                # node MLP out
        )
        # compact-residual accumulate: RMW of the aggregate + row tables
        resid = 2 * n_pad * c * 4 + 3 * rpad * c * dt
        gmp = edge + node + resid
        n_gmps = 1 if li == L - 1 else 2
        # transition convs (down+up), only for non-bottom levels
        conv = 0
        if li < L - 1:
            conv = 2 * (
                wtrans * 2 * wh * c * dt    # windows
                + 4 * e_pad                 # ew f32 row-packed
                + 8 * e_pad                 # sw + recv
                + n_pad * c * 4             # out
                + n_pad * c * dt            # x stream
                + 2 * n_pad * c * 4         # residual accumulate RMW
            )
        lvl_bytes = n_gmps * gmp + conv
        per_level.append({"level": li, "gbytes": round(lvl_bytes / 1e9, 3),
                          "window_dmas": wtrans, "block_dmas": ctrans})
        total += lvl_bytes
    # encode/decode + normalizer at level 0
    n0 = int(h.levels[0].n_pad_nodes)
    io_dim = cfg.model.out_dim + 2
    total += n0 * (io_dim + c) * 4 * 2
    return total, per_level


def measure(batches, n_nodes=5233, depth=7):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    cfg, h, node_in, mask, n_real, stats = _build("airfoil", n_nodes, depth)
    h = jax.device_put(h)  # once — h rides as a per-call jit argument
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    flops1 = _dense_flops(cfg.model, h)  # per mesh

    rows = []
    for B in batches:
        ni = jnp.broadcast_to(node_in, (B, *node_in.shape))
        m = jnp.broadcast_to(mask, (B, *mask.shape))
        for dtype, label in ((None, "f32"), (jnp.bfloat16, "bf16")):
            # h rides as a jit ARGUMENT: closing over it bakes the tables
            # into the serialized program (remote compile size limit).
            fwd_h = jax.jit(
                lambda hh, a, b, dt=dtype: simulator_forward(
                    state.params, state.norm_in, state.norm_out, hh, a, b,
                    cfg.model, dt,
                )
            )
            fwd = lambda a, b: fwd_h(h, a, b)
            out = fwd(ni, m)
            assert np.all(np.isfinite(np.asarray(out[:, :n_real])))
            t = min(
                pipelined_timeit(lambda: fwd(ni, m), steps=30, warmup=3)
                for _ in range(3)
            )
            tflops = B * flops1 / t / 1e12
            rows.append({
                "batch": B,
                "dtype": label,
                "ms_per_step": round(1e3 * t, 3),
                "meshes_per_s": round(B / t, 1),
                "ms_per_mesh": round(1e3 * t / B, 4),
                "dense_tflops": round(tflops, 2),
                "mfu_vs_bf16_peak": round(tflops / PEAK_TFLOPS, 4),
            })
            print(
                f"B={B:3d} {label:4s}  {rows[-1]['ms_per_step']:8.3f} ms/step"
                f"  {rows[-1]['meshes_per_s']:8.1f} meshes/s"
                f"  {rows[-1]['ms_per_mesh']:7.3f} ms/mesh"
                f"  {rows[-1]['dense_tflops']:6.2f} TFLOP/s"
                f"  MFU {rows[-1]['mfu_vs_bf16_peak']:.1%}",
                flush=True,
            )
    return {"n_nodes": n_nodes, "depth": depth, "mesh_stats": stats,
            "rows": rows}


def measure_union(batches, n_nodes=5233, depth=7, window=512,
                  edge_block=512):
    """Union batching (graph/bistride.py::replicate_levels): B disjoint
    copies of the mesh as ONE hierarchy, single-mesh kernels with B·N rows
    — batch lands on the kernel row axis instead of a vmap replay. The
    union crosses the windowed kernels' profitability threshold as B·N
    grows, so it runs the production windowed/fused path."""
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_graded_airfoil_mesh
    from bsms_gnn_tpu.graph.bistride import (
        build_bistride_levels,
        replicate_levels,
    )
    from bsms_gnn_tpu.graph.hierarchy import pad_levels
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        "model.aggregation=fused",
    ])
    rng = np.random.default_rng(0)
    pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels1 = build_bistride_levels(edges, depth, n, pos.astype(np.float64))
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)

    c, pd = cfg.model.out_dim, cfg.model.pos_dim
    sample = np.zeros((n, c + pd + 1), np.float32)
    sample[:, :c] = rng.standard_normal((n, c))
    sample[:, c:c + pd] = pos
    sample[:, -1:] = node_type

    from bench import _dense_flops

    rows = []
    for B in batches:
        levels_b = replicate_levels(levels1, B) if B > 1 else levels1
        pos_b = np.tile(pos.astype(np.float64), (B, 1))
        h = pad_levels(levels_b, 128, pos=pos_b, edge_block=edge_block,
                       window=window)
        n_pad = h.levels[0].n_pad_nodes
        ni = np.zeros((n_pad, c + pd + 1), np.float32)
        ni[:B * n] = np.tile(sample, (B, 1))
        mask = np.zeros((n_pad, 1), np.float32)
        mask[:B * n] = 1.0
        ni, mask = jnp.asarray(ni), jnp.asarray(mask)
        flops1 = _dense_flops(cfg.model, h) / B
        for dtype, label in ((jnp.bfloat16, "bf16"),):
            fwd_h = jax.jit(
                lambda hh, a, b, dt=dtype: simulator_forward(
                    state.params, state.norm_in, state.norm_out, hh, a, b,
                    cfg.model, dt,
                )
            )
            hd = jax.device_put(h)
            fwd = lambda a, b: fwd_h(hd, a, b)
            out = fwd(ni, mask)
            assert np.all(np.isfinite(np.asarray(out[: min(64, n)])))
            t = min(
                pipelined_timeit(lambda: fwd(ni, mask), steps=30, warmup=3)
                for _ in range(3)
            )
            tflops = B * flops1 / t / 1e12
            budget, per_level = union_byte_budget(h, cfg)
            bw_ms = budget / HBM_BYTES_PER_S * 1e3
            rows.append({
                "batch": B, "dtype": label, "mode": "union",
                "edge_block": edge_block, "window": window,
                "ms_per_step": round(1e3 * t, 3),
                "meshes_per_s": round(B / t, 1),
                "ms_per_mesh": round(1e3 * t / B, 4),
                "dense_tflops": round(tflops, 2),
                "mfu_vs_bf16_peak": round(tflops / PEAK_TFLOPS, 4),
                "byte_budget_gb": round(budget / 1e9, 3),
                "bw_bound_ms": round(bw_ms, 3),
                "x_of_bw_bound": round(1e3 * t / bw_ms, 2),
                "bytes_per_level": per_level,
            })
            print(
                f"UNION B={B:3d} {label:4s}  "
                f"{rows[-1]['ms_per_step']:8.3f} ms/step"
                f"  {rows[-1]['meshes_per_s']:8.1f} meshes/s"
                f"  {rows[-1]['ms_per_mesh']:7.3f} ms/mesh"
                f"  {rows[-1]['dense_tflops']:6.2f} TFLOP/s"
                f"  MFU {rows[-1]['mfu_vs_bf16_peak']:.1%}"
                f"  bw-bound {rows[-1]['bw_bound_ms']:.2f} ms"
                f" ({rows[-1]['x_of_bw_bound']:.2f}x)",
                flush=True,
            )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,16,32")
    ap.add_argument("--n-nodes", type=int, default=5233)
    ap.add_argument("--depth", type=int, default=7)
    ap.add_argument("--union", action="store_true",
                    help="also run the union-batched path (appends rows)")
    ap.add_argument("--union-only", action="store_true")
    ap.add_argument("--edge-block", type=int, default=512)
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--append", action="store_true",
                    help="merge rows into the existing throughput.json")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.union_only:
        out = {"n_nodes": args.n_nodes, "depth": args.depth,
               "rows": measure_union(batches, args.n_nodes, args.depth,
                                     args.window, args.edge_block)}
    else:
        out = measure(batches, args.n_nodes, args.depth)
        if args.union:
            out["rows"] += measure_union(batches, args.n_nodes, args.depth,
                                         args.window, args.edge_block)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                        "throughput.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if args.append and os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        seen = {(r.get("mode"), r["batch"], r["dtype"],
                 r.get("edge_block"), r.get("window")) for r in out["rows"]}
        out["rows"] += [
            r for r in prev.get("rows", [])
            if (r.get("mode"), r["batch"], r["dtype"],
                r.get("edge_block"), r.get("window")) not in seen
        ]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
