"""Additive cost breakdown of the v3 windowed fused edge phase (round-4
kernel attack, VERDICT item 1: find which in-kernel piece binds the flat
43%-of-copy-roof wall before rewriting anything).

Times, on one hierarchy level at scale (default 1M level 0):

  * conv      — windowed_conv_raw: window streams + sender selection +
                weighted scatter, NO MLP at all (the pure selection machinery);
  * v3 L=1    — fused_edge_phase_win with a 1-layer tail (final Linear+LN);
  * v3 L=2/3  — 2-/3-layer tails; the marginal per-layer cost is the cost of
                ONE [BE,C]x[C,C] tail dot per chunk, which is exactly what
                cross-chunk tail batching would amortize.

If (v3 L=3 − conv) dominates, the tail is the wall (VERDICT's hypothesis);
if conv itself sits at ~43% of roof, the selection dots / window streams
bind and tail batching can't reach 60%.

Usage: python benchmarks/kernel_breakdown.py [n_nodes] [level] [dtype]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kernel_roofline import measure_roofs  # noqa: E402
from profile_1m import _scan_time  # noqa: E402


def main(n_nodes=1_000_000, lvl_idx=0, dtype="bfloat16", depth=7, c=128):
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
    from bsms_gnn_tpu.ops.pallas.windowed import windowed_conv_raw
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
        pos.astype(np.float64), edge_block=512, window=512,
    )
    level = jax.device_put(h.levels[lvl_idx])
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    sz = 2 if dtype == "bfloat16" else 4

    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    be = level.edge_block
    w = level.window
    chunks = e_pad // be
    rng = np.random.default_rng(7)
    xwi = jnp.asarray(rng.standard_normal((n_pad, c)), jdt)
    xj = jnp.asarray(rng.standard_normal((n_pad, c)), jdt)
    ew = jnp.asarray(rng.standard_normal((e_pad,)), jnp.float32)
    wf8 = jnp.asarray(rng.standard_normal((8, c)), jdt)

    mlp = init_mlp(jax.random.PRNGKey(0), 2 * c + 3, c, c, hidden_layers=3)

    print(f"level {lvl_idx}: E={level.n_edges} E_pad={e_pad} "
          f"chunks={chunks} be={be} W={w} dtype={dtype}")
    streamed = chunks * w * c * sz * 2 + 32 * e_pad + n_pad * c * 4
    print(f"streamed bytes/step: {streamed/1e6:.0f} MB "
          f"(copy-roof floor {streamed/(hbm_gbps*1e9)*1e3:.2f} ms)\n")

    rows = []

    def report(name, t, macs):
        mxu_pct = 100 * (2 * macs / max(t, 1e-12)) / (mxu_tflops * 1e12)
        rows.append((name, t))
        print(f"{name:>10}: {t*1e6:>9.1f} µs  "
              f"{streamed/t/1e9:>6.0f} GB/s-strm ({100*streamed/t/1e9/hbm_gbps:>4.0f}%)  "
              f"selection+tail MACs {2*macs/1e9:.0f} GFLOP "
              f"→ {mxu_pct:.0f}% of MXU roof")

    # Selection machinery only (window selects + weighted scatter).
    sel_macs = chunks * (2 * (w // 2) * be * c) * (1 if sz == 2 else 3)
    scat_macs = chunks * (128 * be * c)

    def conv_body(x, lvl, ewc):
        out = windowed_conv_raw(lvl, x, ewc)
        return x + 1e-6 * out.astype(x.dtype)

    t = _scan_time(conv_body, xwi, 20, pipelined_timeit, consts=(level, ew))
    report("conv", t, sel_macs + scat_macs)

    # v3 with tail depth 1..3. zj select adds one more [BN,BE]x[BN,C] dot,
    # fiber a [8->BE] dot; each tail layer one [BE,C]x[C,C] dot per chunk.
    for n_layers in (1, 2, 3):
        tail_w = tuple(wm.astype(jdt) for wm in mlp.weights[1:1 + n_layers])
        tail_b = tuple(bm.astype(jdt) for bm in mlp.biases[1:1 + n_layers])

        def v3_body(pair, lvl):
            a, b = pair
            out = fused_edge_phase_win(lvl, a, b, wf8, tail_w, tail_b)
            return (a + 1e-6 * out.astype(a.dtype), b)

        t = _scan_time(v3_body, (xwi, xj), 20, pipelined_timeit,
                       consts=(level,))
        macs = (sel_macs + 2 * scat_macs + chunks * 8 * be * c
                + chunks * n_layers * be * c * c)
        report(f"v3 L={n_layers}", t, macs)

    base = dict(rows)
    if "v3 L=1" in base and "v3 L=3" in base:
        d = (base["v3 L=3"] - base["v3 L=1"]) / 2
        print(f"\nmarginal tail-layer cost: {d*1e6:.1f} µs/level-pass "
              f"= {d/chunks*1e9:.0f} ns/chunk "
              f"(pure dot at MXU roof: "
              f"{be*c*c*2/(mxu_tflops*1e12)*1e9:.0f} ns)")
    if "conv" in base and "v3 L=3" in base:
        print(f"tail+zj+fib total (v3L3 − conv): "
              f"{(base['v3 L=3']-base['conv'])*1e6:.1f} µs")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 1_000_000,
        int(a[1]) if len(a) > 1 else 0,
        a[2] if len(a) > 2 else "bfloat16",
    )
