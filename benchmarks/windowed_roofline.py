"""Roofline rows for the windowed fused GMP kernels (v3) — the kernels that
carry the 1M-node numbers (VERDICT r2 item 2; BASELINE.md ">=90% of
speed-of-light" row).

Per hierarchy level, times the v3 edge phase (both gathers in-kernel:
windowed one-hot sender selection + transposed receiver one-hot, static
fiber via the component-major [8, E] stream) FORWARD and BACKWARD, and
reports:

  * achieved GB/s against two byte counts:
      - `min`: the information-theoretic floor (xwi+xj read once, fiber_t
        stream, aggregate out) — the BASELINE "speed of light";
      - `streamed`: what the kernel actually moves (each edge chunk streams
        its W-row source windows; window re-reads are the price of killing
        the issue-rate-bound row gather, PARITY.md roofline §6);
  * % of the measured HBM copy roof for both;
  * Gedges/s, fwd and bwd.

Run AFTER benchmarks/scale_1m.py has built the /tmp/bsms-scale caches (the
1M hierarchy build is minutes; this script reuses it).

Usage: python benchmarks/windowed_roofline.py [n_nodes] [depth] [window]
           [dtype]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kernel_roofline import measure_roofs  # noqa: E402
from profile_1m import _scan_time  # noqa: E402  (consts ride as jit args —
# closure-embedded level tables blow the tunnel's compile size limit)


def main(n_nodes=1_000_000, depth=7, window=512, dtype="bfloat16", c=128):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.ops.dense import init_mlp
    from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase_win
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    hbm_gbps, mxu_tflops = measure_roofs(pipelined_timeit)
    print(f"device: {jax.devices()[0].device_kind}; roofs: HBM "
          f"{hbm_gbps:.0f} GB/s, MXU {mxu_tflops:.0f} TFLOP/s bf16\n")

    cache_dir = "/tmp/bsms-scale"
    os.makedirs(cache_dir, exist_ok=True)
    pos, cells, _ = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h = load_or_build_hierarchy(
        cache_dir, f"scale{n_nodes}mrt", edges, depth, pos.shape[0],
        pos.astype(np.float64), edge_block=512, window=window,
    )
    h = jax.device_put(h)
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    sz = 2 if dtype == "bfloat16" else 4

    mlp = init_mlp(jax.random.PRNGKey(0), 2 * c + 3, c, c, hidden_layers=3)
    wf8 = jnp.asarray(np.random.default_rng(3).standard_normal((8, c)), jdt)
    tail_w = [w.astype(jdt) for w in mlp.weights[1:]]
    tail_b = [b.astype(jdt) for b in mlp.biases[1:]]

    hdr = (f"{'lvl':>3} {'E':>9} {'W':>5} {'cov%':>5} | {'fwd µs':>9} "
           f"{'min GB/s':>9} {'%roof':>6} {'strm%':>6} {'Gedge/s':>8} | "
           f"{'bwd µs':>9} {'Gedge/s':>8}")
    print("v3 windowed fused edge phase (selection dots replace both "
          "gathers):")
    print(hdr)
    print("-" * len(hdr))

    for l, level in enumerate(h.levels):
        if level.send_win is None or level.n_edges < 1000:
            continue
        n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
        w = level.window
        rng = np.random.default_rng(l)
        xwi = jnp.asarray(rng.standard_normal((n_pad, c)), jdt)
        xj = jnp.asarray(rng.standard_normal((n_pad, c)), jdt)

        probe = fused_edge_phase_win(level, xwi, xj, wf8, tail_w, tail_b)
        if probe is None:
            print(f"{l:>3} kernel unsupported")
            continue

        def fwd_body(pair, lvl):
            a, b = pair
            out = fused_edge_phase_win(lvl, a, b, wf8, tail_w, tail_b)
            return (a + 1e-6 * out.astype(a.dtype), b)

        t_f = _scan_time(fwd_body, (xwi, xj), 20, pipelined_timeit,
                         consts=(level,))

        cot = jnp.asarray(rng.standard_normal((n_pad, c)), jnp.float32)

        def bwd_body(pair, lvl, ct):
            def loss(a, b):
                out = fused_edge_phase_win(lvl, a, b, wf8, tail_w, tail_b)
                return jnp.vdot(out, ct)

            ga, gb = jax.grad(loss, argnums=(0, 1))(*pair)
            return (pair[0] + 1e-6 * ga.astype(pair[0].dtype),
                    pair[1] + 1e-6 * gb.astype(pair[1].dtype))

        t_b = _scan_time(bwd_body, (xwi, xj), 10, pipelined_timeit,
                         consts=(level, cot)) - t_f

        chunks = e_pad // level.edge_block
        min_bytes = 2 * n_pad * c * sz + 32 * e_pad + n_pad * c * 4
        streamed = chunks * w * c * sz * 2 + 32 * e_pad + n_pad * c * 4
        cov = 100 * (1 - (level.resid.n_edges if level.resid else 0)
                     / max(level.n_edges, 1))
        gb_min = min_bytes / t_f / 1e9
        gb_strm = streamed / t_f / 1e9
        print(f"{l:>3} {level.n_edges:>9} {w:>5} {cov:>5.1f} | "
              f"{t_f*1e6:>9.1f} {gb_min:>9.0f} {100*gb_min/hbm_gbps:>5.0f}% "
              f"{100*gb_strm/hbm_gbps:>5.0f}% "
              f"{level.n_edges/t_f/1e9:>8.2f} | {t_b*1e6:>9.1f} "
              f"{level.n_edges/max(t_b,1e-9)/1e9:>8.2f}")

    print("\nNotes: 'min' counts xwi/xj once (speed-of-light floor); "
          "'strm%' counts the actual per-chunk window streams — the gap "
          "between them is the window re-read price, the gap between "
          "strm% and 100% is kernel inefficiency. MXU selection dots "
          f"add 2·E·(W/2)·C MACs ({'1-pass bf16' if sz == 2 else '3-term'}).")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 1_000_000,
        int(a[1]) if len(a) > 1 else 7,
        int(a[2]) if len(a) > 2 else 512,
        a[3] if len(a) > 3 else "bfloat16",
    )
