"""Component-level device-time breakdown of the 1M-node forward
(VERDICT item 8: identify the top time sinks at scale, then fix them).

The full forward at 1M nodes / 30M edges cannot be profiled by naive
wall-clock (dispatch latency through the tunneled backend ~1 ms/op) and an
in-jit per-op stopwatch at this scale OOMs (every observed intermediate
becomes a live [E,128] buffer). Instead each architectural component is
timed in ISOLATION with a data-dependent `lax.scan` loop inside one jit —
device-only time, no materialization beyond the component's own working set:

  * gmp[l]    — one GMP block on level l (the down/up passes run 2 of these
                per level per forward, the bottom level 1);
  * trans[l]  — one down+up transition round trip (weighted conv → pool →
                unpool → reverse conv), 1 of each direction per forward;
  * node_mlp  — encode/decode-shaped MLP on the level-0 node set.

Σ components (2·gmp[0..d-1] + gmp[d] + trans[0..d-1] + 2·node_mlp) should
reconstruct the measured full-forward time; the table prints each
component's share so the top sinks are explicit, in f32 (the round-1
default) and bfloat16 compute.

Usage: python benchmarks/profile_1m.py [n_nodes] [depth]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_time(body, init, iters, timeit, steps=5, consts=()):
    """`consts` (e.g. the level graph) ride as jit ARGUMENTS, not closure
    constants — embedded multi-MB constants blow the tunnel's remote-compile
    request size limit (HTTP 413)."""
    import jax

    @jax.jit
    def run(x, consts):
        out, _ = jax.lax.scan(
            lambda c, _: (body(c, *consts), None), x, None, length=iters
        )
        return out

    t = timeit(lambda: run(init, consts), steps=steps)
    return t / iters


def load_scale_hierarchy(cache_dir, n_nodes, depth, edge_block=128, window=0):
    """Load the scale benchmark's cached hierarchy without re-running the
    1M-node Delaunay triangulation (cache-hit path only needs the file)."""
    from bsms_gnn_tpu.graph.hierarchy import _cache_key, load_hierarchy

    name = f"scale{n_nodes}mrt" if window else f"scale{n_nodes}"
    key = _cache_key(depth, 128, None, None, edge_block, window)
    path = os.path.join(cache_dir, f"{name}_tpu_mmesh_{key}.npz")
    if os.path.isfile(path):
        return load_hierarchy(path)
    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge

    pos, cells, _ = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    if window:
        from bsms_gnn_tpu.graph.order import reorder_mesh

        pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    return load_or_build_hierarchy(
        cache_dir, name, edges, depth, pos.shape[0],
        pos.astype(np.float64), edge_block=edge_block, window=window,
    )


def main(n_nodes=1_000_000, depth=7, iters=8, method="pallas", edge_block=128,
         window=0):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.models.simulator import init_simulator
    from bsms_gnn_tpu.ops.dense import mlp_apply
    from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up, gmp_apply
    from bsms_gnn_tpu.ops.pool import pool_nodes, unpool_nodes
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        f"model.aggregation={method}",
    ])
    t0 = time.time()
    h = load_scale_hierarchy("/tmp/bsms-scale", n_nodes, depth, edge_block,
                             window)
    print(f"hierarchy load {time.time()-t0:.0f}s; "
          f"edges/level={[g.n_edges for g in h.levels]}", flush=True)
    h = jax.device_put(h)
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    c = cfg.model.latent_dim

    rows = []

    def report(name, secs, count, dtype):
        rows.append((name, dtype, secs * 1e3, count))
        print(f"  {name:>10} [{dtype}]: {secs*1e3:8.2f} ms x{count}", flush=True)

    for dtype_name, cdt in (("f32", None), ("bf16", jnp.bfloat16)):
        carry_dt = jnp.float32 if cdt is None else jnp.bfloat16
        print(f"--- compute={dtype_name}", flush=True)
        for l, level in enumerate(h.levels):
            p = (state.params.process.down_gmps[l]
                 if l < depth else state.params.process.bottom_gmp)
            hx = jnp.zeros((level.n_pad_nodes, c), carry_dt)

            def gmp_body(x, level, p=p):
                return gmp_apply(p, level, x, None, method, cdt).astype(carry_dt)

            t = _scan_time(gmp_body, hx, iters, pipelined_timeit,
                           consts=(level,))
            report(f"gmp[{l}]", t, 2 if l < depth else 1, dtype_name)

        for l in range(depth):
            level, trans = h.levels[l], h.transitions[l]
            ew = level.ew.astype(carry_dt)
            hx = jnp.zeros((level.n_pad_nodes, c), carry_dt)

            def trans_body(x, level, trans, ew):
                del ew  # level-own weights (None) select the windowed path
                down = pool_nodes(trans, edge_conv_down(level, x, None, method))
                up = edge_conv_up(level, unpool_nodes(trans, down), None, method)
                return up.astype(carry_dt)

            t = _scan_time(trans_body, hx, iters, pipelined_timeit,
                           consts=(level, trans, ew))
            report(f"trans[{l}]", t, 1, dtype_name)

            if l == 0:
                # Sub-op breakdown of the dominant level-0 round trip.
                def conv_only(x, level, trans, ew):
                    del ew
                    return edge_conv_down(level, x, None, method).astype(carry_dt)

                def pool_only(x, level, trans, ew):
                    return unpool_nodes(trans, pool_nodes(trans, x)).astype(
                        carry_dt
                    )

                for nm, body in (("conv_dn[0]", conv_only),
                                 ("poolpair[0]", pool_only)):
                    t = _scan_time(body, hx, iters, pipelined_timeit,
                                   consts=(level, trans, ew))
                    report(nm, t, 0, dtype_name)  # x0: informational only

        hx = jnp.zeros((h.levels[0].n_pad_nodes, c), carry_dt)
        from bsms_gnn_tpu.ops.dense import init_mlp

        proxy = init_mlp(jax.random.PRNGKey(1), c, c, c, cfg.model.hidden_layer)

        def mlp_body(x):
            return mlp_apply(proxy, x, cdt).astype(carry_dt)

        t = _scan_time(mlp_body, hx, iters, pipelined_timeit)
        report("node_mlp", t, 2, dtype_name)

        total = sum(ms * n for _, d, ms, n in rows if d == dtype_name)
        print(f"  reconstructed forward [{dtype_name}]: {total:.1f} ms",
              flush=True)

    print("\nper-component share (count-weighted):")
    for dtype_name in ("f32", "bf16"):
        sel = [(nm, ms * n) for nm, d, ms, n in rows if d == dtype_name]
        tot = sum(v for _, v in sel)
        top = sorted(sel, key=lambda kv: -kv[1])[:5]
        print(f"  [{dtype_name}] total {tot:.0f} ms; top: "
              + ", ".join(f"{nm} {v:.0f}ms ({100*v/tot:.0f}%)" for nm, v in top),
              flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 1_000_000,
        int(a[1]) if len(a) > 1 else 7,
        8,
        a[2] if len(a) > 2 else "pallas",
        int(a[3]) if len(a) > 3 else 128,
        int(a[4]) if len(a) > 4 else 0,
    )
