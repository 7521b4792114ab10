"""K-way chunk-interleaved fused-kernel probe (VERDICT r4 item 1).

Times the windowed fused edge phase on the real 1M-airfoil level layouts,
isolating each mechanism of the v5 kernel family:

  v3            — production single-chunk kernel (one 512-edge chunk/step)
  v5k{K}        — K chunks/step, tail MLP on the stacked [K*be, C] rows
  v5k{K}-nostack— K chunks/step, per-stream tail MLP (no in-kernel concat;
                  tests whether Mosaic's concat copy eats the win)
  *-kernel      — same minus the visited-mask combine (kernel-only cost)

Writes benchmarks/out/k_interleave.json. Usage:
    python benchmarks/k_interleave.py [n_nodes] [levels...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(f, steps=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = f()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / steps


def main(n_nodes=1_000_000, level_ids=(0, 4)):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.ops.pallas import fused_gmp as fg
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cache_dir = "/tmp/bsms-scale"
    os.makedirs(cache_dir, exist_ok=True)
    pos, cells, _ = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h = load_or_build_hierarchy(
        cache_dir, f"scale{n_nodes}mrt", edges, 7, pos.shape[0],
        pos.astype(np.float64), edge_block=512, window=512,
    )
    h = jax.device_put(h)
    c = 128
    rng = np.random.default_rng(1)
    ws = tuple(jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
               for _ in range(3))
    bs = tuple(jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
               for _ in range(3))
    rows = {}
    for li in level_ids:
        lvl = h.levels[li]
        n_pad, e_pad = lvl.n_pad_nodes, lvl.n_pad_edges
        be = lvl.edge_block
        nc = e_pad // be
        xwi = jnp.asarray(
            rng.standard_normal((n_pad, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        xj = jnp.asarray(
            rng.standard_normal((n_pad, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        wf8 = jnp.asarray(rng.standard_normal((8, c)).astype(np.float32))

        # The level rides as a jit ARGUMENT (closing over it would bake
        # hundreds of MB of tables into the serialized program — the
        # remote compile service rejects oversized bodies).
        f3 = jax.jit(lambda l, a, b, w: fg.fused_edge_phase_win(
            l, a, b, w, ws, bs))
        res = {"v3": _time(lambda: f3(lvl, xwi, xj, wf8)) * 1e3}
        for k in (2, 4):
            f5 = jax.jit(lambda l, a, b, w, k=k: fg.fused_edge_phase_win_k(
                l, a, b, w, ws, bs, k))
            res[f"v5k{k}"] = _time(lambda: f5(lvl, xwi, xj, wf8)) * 1e3

            # kernel-only: skip the visited-mask combine (and optionally
            # the in-kernel concat: per-stream tail chains)
            def v5_kern(l, a, b, w, k=k, stack=True):
                tabs, vis, recv = fg._chunk_tables5(l, k)
                from bsms_gnn_tpu.ops.pallas.windowed import _pack_rows

                sw = _pack_rows(l.send_win.astype(jnp.int32), be, nc,
                                l.window)
                call = fg._get_fwd5(e_pad, n_pad, c, 3, False, "bfloat16",
                                    be, l.window // 2, k, stack)
                si = []
                for _ in range(k):
                    si += [l.fiber_t.astype(jnp.bfloat16), a, a, b,
                           sw, recv]
                w_stack = jnp.stack([x for x in ws])
                b_stack = jnp.stack([x for x in bs])
                return call(*tabs, *si, w, w_stack, b_stack)

            fk = jax.jit(v5_kern)
            res[f"v5k{k}-kernel"] = _time(
                lambda: fk(lvl, xwi, xj, wf8)) * 1e3
            fkn = jax.jit(lambda l, a, b, w, k=k: v5_kern(
                l, a, b, w, k, stack=False))
            res[f"v5k{k}-nostack-kernel"] = _time(
                lambda: fkn(lvl, xwi, xj, wf8)) * 1e3
        us_per_chunk = {m: v * 1e3 / nc for m, v in res.items()}
        rows[f"level{li}"] = {
            "n_pad_nodes": int(n_pad), "n_pad_edges": int(e_pad),
            "chunks": int(nc),
            "ms": {m: round(v, 3) for m, v in res.items()},
            "us_per_chunk": {m: round(v, 3) for m, v in us_per_chunk.items()},
        }
        print(f"level{li}: " + "  ".join(
            f"{m}={v:.2f}ms({us_per_chunk[m]:.2f}us/ch)"
            for m, v in res.items()), flush=True)
    out = {"n_nodes": n_nodes, "dtype": "bfloat16", "rows": rows,
           "device": jax.devices()[0].device_kind}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                        "k_interleave.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    a = sys.argv[1:]
    n = int(a[0]) if a else 1_000_000
    lv = tuple(int(x) for x in a[1:]) or (0, 4)
    main(n, lv)
