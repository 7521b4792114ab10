"""Roofline accounting for the aggregation kernels (BASELINE.md: "≥90% of
speed-of-light per chip, reported as edges/s/chip").

Edge→node aggregation at latent width C is bandwidth-bound: the minimum HBM
traffic is E·C·4 B of edge features in + N·C·4 B of node sums out (indices
are E·4 B). Speed of light is therefore the chip's measured HBM copy
bandwidth divided by bytes-per-edge — NOT an MXU number (the one-hot matmul
trick converts the scatter into MXU work precisely because the MXU is
otherwise idle during aggregation; its flops are free, its operand streaming
is not).

Through the tunneled backend a single dispatch costs ~1 ms of host latency,
so every measurement here loops the op K times INSIDE one jit (lax.scan with
a data dependence between iterations) and divides — device-only time.
Aggregation and gather are measured as a round trip (edge→node→edge) because
chaining them gives each scan iteration a true data dependence; reported
bytes are the pair's combined minimum traffic.

This script measures:
  * the empirical HBM roof (scanned saxpy) and MXU roof (scanned bf16 matmul);
  * per hierarchy level: round-trip time, achieved GB/s, % of the HBM roof,
    and edges/s for the pallas, ELL, and XLA-sort segment-sum paths;
  * the whole edge phase (edge-MLP tail + aggregate) unfused vs the fused
    Pallas kernel, against the MXU roof.

The hot op being raced is the reference's `scatter_sum` to receiver
(`/root/reference/src/ops/basic.py:83-94`, `src/utils/basic.py:324-343`).

Usage: python benchmarks/kernel_roofline.py [n_nodes] [depth] [C]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_time(body, init, iters, timeit, steps=5):
    """Seconds per `body` application, looped inside one jit via lax.scan."""
    import jax

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), x, None, length=iters)
        return out

    t = timeit(lambda: run(init), steps=steps)
    return t / iters


def measure_roofs(timeit):
    import jax
    import jax.numpy as jnp

    n = 32 * 1024 * 1024  # 128 MB f32
    x = jnp.ones((n,), jnp.float32)
    t = _scan_time(lambda v: v * 1.0000001 + 1e-12, x, 20, timeit)
    hbm_gbps = 2 * n * 4 / t / 1e9

    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    t = _scan_time(lambda v: (v @ a) * 1e-3, a, 20, timeit)
    mxu_tflops = 2 * m**3 / t / 1e12
    return hbm_gbps, mxu_tflops


def main(n_nodes=5000, depth=7, c=128, iters=50):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.ops.scatter import aggregate_recv, gather_recv
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    hbm_gbps, mxu_tflops = measure_roofs(pipelined_timeit)
    print(f"device: {jax.devices()[0].device_kind}")
    print(f"measured roofs: HBM {hbm_gbps:.0f} GB/s, MXU {mxu_tflops:.0f} "
          f"TFLOP/s (bf16)\n")

    pos, cells, _ = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, depth, pos.shape[0], pos.astype(np.float64))
    h = jax.device_put(h)

    header = (f"{'lvl':>3} {'E_real':>9} {'E_pad':>9} {'N_pad':>7} | "
              f"{'path':>8} {'µs/pair':>8} {'GB/s':>7} {'%roof':>6} "
              f"{'Gedges/s':>9}")
    print("round trip = aggregate(edge→node) + gather(node→edge):")
    print(header)
    print("-" * len(header))

    results = []
    for l, level in enumerate(h.levels):
        e_real, e_pad, n_pad = level.n_edges, level.n_pad_edges, level.n_pad_nodes
        if e_real == 0:
            continue
        feat = jnp.asarray(
            np.random.default_rng(l).standard_normal((e_pad, c)), jnp.float32
        )
        pair_bytes = 2 * (e_pad + n_pad) * c * 4 + 2 * e_pad * 4

        for path in ("pallas", "ell", "segment"):
            def body(ft, p=path):
                agg = aggregate_recv(level, ft, p)
                return gather_recv(level, agg, p) * 0.5

            t = _scan_time(body, feat, iters, pipelined_timeit)
            gbps = pair_bytes / t / 1e9
            results.append(dict(level=l, path=path, us=t * 1e6,
                                gbps=gbps, pct=100 * gbps / hbm_gbps,
                                gedges=e_real / t / 1e9))
            print(f"{l:>3} {e_real:>9} {e_pad:>9} {n_pad:>7} | {path:>8} "
                  f"{t*1e6:>8.1f} {gbps:>7.0f} {100*gbps/hbm_gbps:>5.0f}% "
                  f"{e_real/t/1e9:>9.2f}")

    # Whole edge phase: MLP tail (3 hidden matmuls on E rows) + aggregate,
    # unfused vs the fused Pallas kernel. MXU-bound → compare to MXU roof.
    from bsms_gnn_tpu.ops.dense import init_mlp, mlp_apply_tail
    from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_mlp_aggregate

    level = h.levels[0]
    e_pad = level.n_pad_edges
    pre = jnp.asarray(
        np.random.default_rng(9).standard_normal((e_pad, c)), jnp.float32
    )
    mlp = init_mlp(jax.random.PRNGKey(0), c, c, c, hidden_layers=3)
    flops = 2 * e_pad * c * c * 3

    def unfused(p):
        emb = mlp_apply_tail(mlp, p)
        agg = aggregate_recv(level, emb, "pallas")
        return gather_recv(level, agg, "pallas") * 0.1

    t_unfused = _scan_time(unfused, pre, 20, pipelined_timeit)

    def fused(p):
        agg = fused_edge_mlp_aggregate(level, p, mlp.weights[1:], mlp.biases[1:])
        return gather_recv(level, agg, "pallas") * 0.1

    ok = fused_edge_mlp_aggregate(level, pre, mlp.weights[1:], mlp.biases[1:])
    t_fused = (
        _scan_time(fused, pre, 20, pipelined_timeit)
        if ok is not None else float("nan")
    )
    print(f"\nedge phase (lvl0, tail-MLP+aggregate+gather, E_pad={e_pad}):")
    print(f"  unfused: {t_unfused*1e6:8.1f} µs  "
          f"({flops/t_unfused/1e12:.1f} TFLOP/s, "
          f"{100*flops/t_unfused/1e12/mxu_tflops:.0f}% of MXU roof)")
    print(f"  fused:   {t_fused*1e6:8.1f} µs  "
          f"({flops/t_fused/1e12:.1f} TFLOP/s, "
          f"{100*flops/t_fused/1e12/mxu_tflops:.0f}% of MXU roof)")

    # Windowed gather-free transition conv vs the gathered path. The
    # gathered conv's floor is the issue-rate-bound XLA row gather
    # (~200M rows/s on v5e — NOT bandwidth); the windowed kernel's floor is
    # streaming: x windows in (coverage·E·C·4/avg-reuse) + out, hence the
    # comparison is edges/s, not GB/s.
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.ops.message import edge_conv_down

    posm, cellsm, _, _ = reorder_mesh(pos, cells)
    edgesm = to_flat_edge(cellsm, "tri")
    hw = jax.device_put(
        build_hierarchy(edgesm, depth, posm.shape[0],
                        posm.astype(np.float64), window=512)
    )
    print(f"\ntransition conv down (windowed vs gathered), Morton mesh:")
    for l in (0, min(2, depth)):
        lw = hw.levels[l]
        lg = h.levels[l]
        xw = jnp.asarray(
            np.random.default_rng(l).standard_normal(
                (lw.n_pad_nodes, c)), jnp.float32)
        xg = xw[: lg.n_pad_nodes]
        t_win = _scan_time(
            lambda v, lw=lw: edge_conv_down(lw, v, None, "pallas"),
            xw, iters, pipelined_timeit)
        t_gat = _scan_time(
            lambda v, lg=lg: edge_conv_down(lg, v, None, "pallas"),
            xg, iters, pipelined_timeit)
        cov = 100 * (1 - (lw.resid.n_edges if lw.resid else 0) / lw.n_edges)
        print(f"  lvl{l} E={lw.n_edges}: windowed {t_win*1e6:8.1f} µs "
              f"({lw.n_edges/t_win/1e9:.2f} Gedges/s, cover {cov:.0f}%)  "
              f"gathered {t_gat*1e6:8.1f} µs "
              f"({lg.n_edges/t_gat/1e9:.2f} Gedges/s)")
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
