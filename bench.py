"""Headline benchmark: single-step inference latency of the flagship BSMS
simulator on an airfoil-scale mesh (~5k nodes, unet_depth=7, latent 128).

Baseline: the reference reports ≈8 ms/inference-step at ~5k nodes (airfoil)
read off `figs/perform.png` panel (b) — see BASELINE.md. vs_baseline is
baseline_ms / our_ms (>1 = faster than the reference's published figure).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_MS = 8.0  # reference airfoil ~5k-node inference, figs/perform.png(b)


def build_problem(n_nodes: int = 5000, depth: int = 7, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge

    cfg = load_config([
        f"model.unet_depth={depth}",
        f"datasets.unet_depth={depth}",
        "model.aggregation=pallas",  # sorted-CSR Pallas kernel on the hot path
    ])
    pos, cells, node_type = make_delaunay_mesh(n_nodes, np.random.default_rng(seed))
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, depth, pos.shape[0], pos.astype(np.float64))

    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c = cfg.model.out_dim
    rng = np.random.default_rng(seed + 1)
    node_in = np.zeros((n_pad, c + 3), np.float32)
    node_in[:n, :c] = rng.standard_normal((n, c))
    node_in[:n, c : c + 2] = pos
    node_in[:n, -1:] = node_type
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = (node_type[:, 0] == 0)[:, None]
    return cfg, h, jnp.asarray(node_in), jnp.asarray(mask), n


def main() -> None:
    import jax

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    cfg, h, node_in, mask, n_real = build_problem()
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)

    # Hierarchy/params closed over (constants): at this scale (~20 MB of
    # tables) the compile service accepts them, and avoiding ~100 argument
    # buffers per dispatch matters through the tunnel. (Million-node runs
    # must pass the hierarchy as an argument instead — see
    # benchmarks/scale_1m.py.)
    fwd = jax.jit(
        lambda ni, m: simulator_forward(
            state.params, state.norm_in, state.norm_out, h, ni, m, cfg.model
        )
    )
    out = fwd(node_in, mask)  # compile + warm
    assert np.all(np.isfinite(np.asarray(out[:n_real])))

    # Pipelined timing (issue a window of steps, materialize the last
    # result): sustained device throughput, independent of the tunnel's
    # per-call dispatch latency. NB jax.block_until_ready is not a reliable
    # fence on this backend; value materialization is (utils/timing.py).
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    ms = 1e3 * pipelined_timeit(lambda: fwd(node_in, mask), steps=50, warmup=3)

    print(
        json.dumps(
            {
                "metric": "airfoil_5k_infer_ms",
                "value": round(ms, 4),
                "unit": "ms/step",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
