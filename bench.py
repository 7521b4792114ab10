"""Headline benchmark: single-step inference latency of the flagship BSMS
simulator at the reference's two published comparison points
(BASELINE.md, `figs/perform.png(b)`):

  * ~5k-node airfoil (reference ≈8 ms/step) — measured on a mesh with the
    real airfoil's topology statistics (graded Delaunay around a carved-out
    body: same node count, strongly skewed edge-length distribution), not a
    uniform carpet;
  * ~16k-node inflating surface (reference ≈33 ms/step) — closed sphere
    surface with world-space edge features.

Prints ONE JSON line. Required keys {"metric", "value", "unit",
"vs_baseline"} describe the 5k airfoil point (vs_baseline =
baseline_ms / our_ms, >1 = faster); extra keys report edges/s, achieved
dense-matmul TFLOP/s + MFU, and the 16k point.
"""

from __future__ import annotations

import json

import numpy as np

BASELINE_5K_MS = 8.0  # reference airfoil ~5k nodes, figs/perform.png(b)
BASELINE_16K_MS = 33.0  # reference InflatingFont ~16k nodes, same figure
PEAK_TFLOPS = 197.0  # TPU v5e bf16 spec (MFU denominator; f32 runs lower)


def _dense_flops(cfg_model, h) -> int:
    """Dense-layer flops of one forward pass (2·rows·in·out per matmul over
    PADDED sizes — what the chip actually executes). Aggregation/gather are
    data movement and excluded."""
    c = cfg_model.latent_dim
    hl = cfg_model.hidden_layer
    o = cfg_model.out_dim
    pd1 = cfg_model.pos_dim + 1
    depth = h.depth

    total = 0
    n0 = h.levels[0].n_pad_nodes
    # encode: (o+1)->C then hl x C->C ... final C (hl hidden + out layer)
    total += 2 * n0 * ((o + 1) * c + hl * c * c)
    # decode: C->C hidden + C->o out
    total += 2 * n0 * (hl * c * c + c * o)

    for l in range(depth + 1):
        n, e = h.levels[l].n_pad_nodes, h.levels[l].n_pad_edges
        gmps = 1 if l == depth else 2  # down+up, bottom once
        per_gmp = (
            2 * n * c * c * 2          # wi, wj node-side pre-transforms
            + 2 * e * pd1 * c          # fiber block
            + 2 * e * c * c * hl       # edge MLP tail
            + 2 * n * (2 * c) * c      # node MLP first (split)
            + 2 * n * c * c * hl       # node MLP tail
        )
        total += gmps * per_gmp
    return total


def _sum_edges(cfg_model, h) -> int:
    """Real edges touched by GMP blocks in one forward (levels 0..D-1
    twice, bottom once)."""
    depth = h.depth
    tot = 0
    for l in range(depth + 1):
        tot += h.levels[l].n_edges * (1 if l == depth else 2)
    return tot


def _build(kind: str, n_nodes: int, depth: int):
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
        # Windowed fused aggregation (Morton order + W=256, eb=512): the
        # round-4 method sweep (benchmarks/out/method_5k.log) has it
        # matching plain pallas at f32 (4.12 vs 4.16 ms) and 1.36x faster
        # at bf16 (2.34 vs 3.18 ms) at this size.
        cfg = load_config([
            f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
            "model.aggregation=fused",
        ])
        pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
        from bsms_gnn_tpu.graph.order import reorder_mesh

        pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
        edges = to_flat_edge(cells, "tri")
        h = build_hierarchy(edges, depth, pos.shape[0],
                            pos.astype(np.float64), edge_block=512,
                            window=256)
    else:  # inflating surface, world-space edges
        cfg = load_config([
            "datasets=inflating_font", "model=inflating_font",
            f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
            "model.aggregation=pallas",
        ])
        pos, cells, node_type = make_sphere_mesh(n_nodes, rng)
        edges = to_flat_edge(cells, "tri")
        h = build_hierarchy(edges, depth, pos.shape[0], pos.astype(np.float64))

    # Mesh-comparability stats (VERDICT r2 weak #4): for any closed 2-D
    # triangulation Euler's formula forces E_undirected ≈ 3N (mean degree
    # ≈ 6), so node count + triangulation pins the edge count to the real
    # airfoil's within boundary effects; the degree tail and edge-length
    # skew quantify the grading (the real airfoil is strongly graded
    # toward the body — a uniform carpet would understate gather locality
    # pressure).
    deg = np.bincount(np.asarray(edges[1]), minlength=pos.shape[0])
    el = np.linalg.norm(pos[edges[0]] - pos[edges[1]], axis=-1)
    stats = {
        "n_nodes": int(pos.shape[0]),
        "directed_edges": int(edges.shape[1]),
        "edges_over_nodes": round(edges.shape[1] / pos.shape[0], 2),
        "degree_mean": round(float(deg.mean()), 2),
        "degree_p95": int(np.percentile(deg, 95)),
        "edge_len_p95_over_p5": round(
            float(np.percentile(el, 95) / np.percentile(el, 5)), 1
        ),
    }

    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c = cfg.model.out_dim
    pd = cfg.model.pos_dim
    node_in = np.zeros((n_pad, c + pd + 1), np.float32)
    if kind == "airfoil":
        node_in[:n, :c] = rng.standard_normal((n, c))
        node_in[:n, c : c + pd] = pos
    else:
        node_in[:n, :c] = pos * 1.05  # world_pos
        node_in[:n, c : c + pd] = pos
    node_in[:n, -1:] = node_type
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = (node_type[:, 0] == 0)[:, None]
    return cfg, h, jnp.asarray(node_in), jnp.asarray(mask), n, stats


def _time_forward(cfg, h, node_in, mask, n_real, compute_dtype=None) -> float:
    import jax

    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    fwd = jax.jit(
        lambda ni, m: simulator_forward(
            state.params, state.norm_in, state.norm_out, h, ni, m, cfg.model,
            compute_dtype,
        )
    )
    out = fwd(node_in, mask)  # compile + warm
    assert np.all(np.isfinite(np.asarray(out[:n_real])))
    # Best of 3 repeats: the tunneled chip shows ±8% run-to-run drift;
    # each repeat is already a 50-dispatch pipelined average.
    return min(
        pipelined_timeit(lambda: fwd(node_in, mask), steps=50, warmup=3)
        for _ in range(3)
    )


def main() -> None:
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    cfg5, h5, ni5, m5, n5, stats5 = _build("airfoil", 5233, 7)
    t5 = _time_forward(cfg5, h5, ni5, m5, n5)
    ms5 = 1e3 * t5
    # The TPU-native precision recipe (README "bf16 recipe": f32 master
    # weights, bf16 operands) — reported alongside, headline stays f32.
    try:
        ms5_bf16 = 1e3 * _time_forward(cfg5, h5, ni5, m5, n5, jnp.bfloat16)
    except Exception:
        ms5_bf16 = float("nan")

    cfg16, h16, ni16, m16, n16, _stats16 = _build("surface", 16000, 7)
    t16 = _time_forward(cfg16, h16, ni16, m16, n16)
    ms16 = 1e3 * t16
    try:
        ms16_bf16 = 1e3 * _time_forward(cfg16, h16, ni16, m16, n16, jnp.bfloat16)
    except Exception:
        ms16_bf16 = float("nan")

    flops5 = _dense_flops(cfg5.model, h5)
    tflops = flops5 / t5 / 1e12
    print(
        json.dumps(
            {
                "metric": "airfoil_5k_infer_ms",
                "value": round(ms5, 4),
                "unit": "ms/step",
                "vs_baseline": round(BASELINE_5K_MS / ms5, 4),
                "edges_per_s": round(_sum_edges(cfg5.model, h5) / t5),
                "dense_tflops": round(tflops, 2),
                "mfu_vs_bf16_peak": round(tflops / PEAK_TFLOPS, 4),
                "infer_16k_ms": round(ms16, 4),
                "vs_baseline_16k": round(BASELINE_16K_MS / ms16, 4),
                "infer_5k_bf16_ms": round(ms5_bf16, 4),
                "infer_16k_bf16_ms": round(ms16_bf16, 4),
                "n_nodes": {"airfoil": n5, "surface": n16},
                "mesh_stats_5k": stats5,
            }
        )
    )


if __name__ == "__main__":
    main()
