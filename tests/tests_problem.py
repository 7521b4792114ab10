"""Deterministic tiny training problem shared by the multi-process worker
and the pytest driver (both must build bit-identical inputs)."""

import numpy as np

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.graph.mesh import to_flat_edge


def _grid(nx, ny):
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float64)
    cells = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = (i + 1) * ny + j + 1
            d = i * ny + j + 1
            cells.append([a, b, c])
            cells.append([a, c, d])
    return pos, np.asarray(cells, dtype=np.int64)


def build_problem():
    cfg = load_config([
        "model.unet_depth=2", "model.latent_dim=16", "model.hidden_layer=1",
        "model.accumulation_steps=1", "opt.warmup_steps=2", "opt.decay_steps=20",
    ])
    pos, cells = _grid(9, 9)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    h = build_hierarchy(edges, 2, n, pos, pad_multiple=32)
    n_pad = h.levels[0].n_pad_nodes
    rng = np.random.default_rng(11)
    b = 8
    c = cfg.model.out_dim
    node_in = np.zeros((b, n_pad, c + 3), np.float32)
    node_in[:, :n, :c] = rng.standard_normal((b, n, c))
    node_in[:, :n, c:c + 2] = pos
    node_tar = np.zeros((b, n_pad, c), np.float32)
    node_tar[:, :n] = node_in[:, :n, :c] + 0.05
    mask = np.zeros((b, n_pad, 1), np.float32)
    mask[:, :n] = 1.0
    return cfg, h, node_in, node_tar, mask


def halo_target(cfg, node_in):
    """Position-dependent target for the halo section: the constant-delta
    target above is learned to float-noise level after one step, which
    makes cross-layout loss comparisons meaningless."""
    c = cfg.model.out_dim
    return (node_in[..., :c] * 1.03
            + 0.05 * np.sin(node_in[..., c : c + 1]))
