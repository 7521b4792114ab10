"""Aggregation-method sweep at the two headline sizes (5k airfoil-like,
16k inflating surface): times the forward for each hot-path implementation
so bench.py's default is measured, not assumed.

Methods swept:
  * pallas            — MXU one-hot segment-sum kernels, XLA gathers
  * fused             — single-kernel edge phase (v2 on plain layouts)
  * fused+window=512  — Morton-reordered windowed layout, v3/v4 kernels
                        (both gathers in-kernel) + fused node phase

Usage: python benchmarks/method_sweep.py [dtype]
Prints one line per (case, method): ms/step. Run on the TPU chip.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(kind: str, n_nodes: int, window: int):
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import (
        make_graded_airfoil_mesh,
        make_sphere_mesh,
    )
    from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge

    rng = np.random.default_rng(0)
    if kind == "airfoil":
        cfg = load_config(["model.unet_depth=7", "datasets.unet_depth=7"])
        pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    else:
        cfg = load_config([
            "datasets=inflating_font", "model=inflating_font",
            "model.unet_depth=7", "datasets.unet_depth=7",
        ])
        pos, cells, node_type = make_sphere_mesh(n_nodes, rng)
    if window:
        from bsms_gnn_tpu.graph.order import reorder_mesh

        pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(
        edges, 7, pos.shape[0], pos.astype(np.float64),
        edge_block=512 if window else 128, window=window,
    )
    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c, pd = cfg.model.out_dim, cfg.model.pos_dim
    node_in = np.zeros((n_pad, c + pd + 1), np.float32)
    if kind == "airfoil":
        node_in[:n, :c] = rng.standard_normal((n, c))
        node_in[:n, c:c + pd] = pos
    else:
        node_in[:n, :c] = pos * 1.05
        node_in[:n, c:c + pd] = pos
    node_in[:n, -1:] = node_type
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = (node_type[:, 0] == 0)[:, None]
    return cfg, h, jnp.asarray(node_in), jnp.asarray(mask), n


def _time(cfg, h, node_in, mask, n_real, method, dtype):
    import dataclasses

    import jax

    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    mcfg = dataclasses.replace(cfg.model, aggregation=method)
    state = init_simulator(jax.random.PRNGKey(0), mcfg)
    cdt = None if dtype == "float32" else dtype
    fwd = jax.jit(
        lambda ni, m: simulator_forward(
            state.params, state.norm_in, state.norm_out, h, ni, m, mcfg, cdt
        )
    )
    out = fwd(node_in, mask)
    assert np.all(np.isfinite(np.asarray(out[:n_real])))
    return 1e3 * pipelined_timeit(lambda: fwd(node_in, mask), steps=50, warmup=3)


def main(dtype="float32"):
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cases = [("airfoil", 5233), ("surface", 16000)]
    for kind, n_nodes in cases:
        plain = _build(kind, n_nodes, 0)
        win = _build(kind, n_nodes, 512)
        for label, built, method in (
            ("pallas", plain, "pallas"),
            ("fused-v2", plain, "fused"),
            ("fused-win512", win, "fused"),
            ("pallas-win512", win, "pallas"),
        ):
            cfg, h, ni, m, n = built
            try:
                ms = _time(cfg, h, ni, m, n, method, dtype)
                print(f"{kind}@{n}: {label:>14s} {ms:8.3f} ms/step", flush=True)
            except Exception as e:  # keep sweeping
                print(f"{kind}@{n}: {label:>14s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "float32")
