"""Bi-stride pooling: BFS-parity node selection + adjacency squaring.

Semantics parity with reference `src/graph_wrappers/bsms_graph_wrapper.py`:
per connected cluster, seed at the node nearest the cluster centroid
(`nearest_center_seed`, ref :106-126), split nodes by BFS-ring parity and
keep the smaller side (even wins ties or when odd is empty, ref :84-93);
square A+I to preserve connectivity among kept nodes (ref :99-101, MKL
SpGEMM → our C++ SpGEMM); relabel kept nodes and drop dangling edges
(`pool_edge`, ref :128-154).

Redesigned for scale: one multi-seed BFS covers every cluster at once
(distinct clusters are mutually unreachable, so distances equal per-cluster
BFS), and the parity vote is a bincount — no per-node Python loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import scipy.sparse

from bsms_gnn_tpu.graph.csr import CsrGraph, UNREACHABLE
from bsms_gnn_tpu.graph.native import square_pattern


def nearest_center_seeds(pos: np.ndarray, clusters: List[np.ndarray]) -> np.ndarray:
    """Per cluster, the node closest (L2) to the cluster centroid."""
    seeds = []
    for c in clusters:
        center = pos[c].mean(axis=0)
        d = np.linalg.norm(pos[c] - center[None, :], axis=-1)
        seeds.append(c[int(np.argmin(d))])
    return np.asarray(seeds, dtype=np.int64)


def bstride_select(g: CsrGraph, pos: np.ndarray) -> np.ndarray:
    """Kept-node indices (sorted) for one bi-stride level."""
    clusters = g.components()
    seeds = nearest_center_seeds(pos, clusters)
    dist = g.bfs_dist(seeds)

    labels = np.empty(g.num_nodes, dtype=np.int64)
    for ci, c in enumerate(clusters):
        labels[c] = ci
    reachable = dist != UNREACHABLE
    parity = np.zeros(g.num_nodes, dtype=np.int64)
    parity[reachable] = dist[reachable] % 2

    n_clusters = len(clusters)
    even_counts = np.bincount(labels[reachable & (parity == 0)], minlength=n_clusters)
    odd_counts = np.bincount(labels[reachable & (parity == 1)], minlength=n_clusters)
    # Keep even when |even| <= |odd| or odd is empty, else odd.
    keep_even = (even_counts <= odd_counts) | (odd_counts == 0)

    keep = reachable & (parity == np.where(keep_even, 0, 1)[labels])
    return np.flatnonzero(keep).astype(np.int64)


def squared_adjacency(g: CsrGraph) -> CsrGraph:
    """Graph of (A + I)^2 with the diagonal removed (pattern only)."""
    # A + I via sparse add (scipy's `setdiag` on CSR round-trips through
    # LIL with per-element Python sets — measured 6.7 s of an 18.6 s
    # 300k-node build); square_pattern's output is already row-major CSR,
    # so skip CsrGraph's lexsort too.
    adj = g.to_adj() + scipy.sparse.eye(g.num_nodes, format="csr")
    indptr, indices = square_pattern(adj, drop_diag=True)
    return CsrGraph.from_csr(indptr, indices, g.num_nodes)


def pool_edges(g: CsrGraph, kept: np.ndarray) -> CsrGraph:
    """Restrict g to `kept` nodes, relabeling them 0..len(kept)-1."""
    remap = np.full(g.num_nodes, -1, dtype=np.int64)
    remap[kept] = np.arange(len(kept), dtype=np.int64)
    e = remap[g.flat_edges]
    valid = (e[0] >= 0) & (e[1] >= 0)
    return CsrGraph(e[:, valid], len(kept))


@dataclass
class BistrideLevels:
    """Raw (unpadded) multi-level graph structure.

    graphs[l] is the level-l graph (graphs[0] = input mesh graph);
    ids[l] are the level-l node indices kept to form level l+1.
    """

    graphs: List[CsrGraph]
    ids: List[np.ndarray]


def build_bistride_levels(
    flat_edges: np.ndarray, num_layers: int, num_nodes: int, pos: np.ndarray
) -> BistrideLevels:
    """Equivalent of the reference's `BistrideMultiLayerGraph` driver
    (ref `bsms_graph_wrapper.py:30-44`)."""
    g = CsrGraph(flat_edges, num_nodes)
    pos = np.asarray(pos, dtype=np.float64)
    graphs = [g]
    ids: List[np.ndarray] = []
    for _ in range(num_layers):
        kept = bstride_select(g, pos)
        g = pool_edges(squared_adjacency(g), kept)
        pos = pos[kept]
        graphs.append(g)
        ids.append(kept)
    return BistrideLevels(graphs=graphs, ids=ids)


def flat_edge_lists(levels: BistrideLevels) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """(per-level [2,E] edge arrays, per-level kept-index arrays)."""
    return [g.flat_edges for g in levels.graphs], list(levels.ids)


def replicate_levels(levels: BistrideLevels, b: int) -> BistrideLevels:
    """Disjoint union of `b` copies of a hierarchy — batched serving with
    batch rows ON the kernel row axis.

    The [B, N, C] batched forward replays the per-mesh kernels per sample
    (vmap), so per-chunk overheads multiply by B and the step goes
    bandwidth-bound past B≈16 (PARITY.md "Batched serving throughput").
    Tiling every level's edge set and kept-id list with per-copy node
    offsets instead yields ONE mesh with B·N nodes: the single-mesh
    windowed/fused kernels then run with B-amortized chunk overheads and
    B·N-row matmuls. Transition weights, smoothed positions, and bi-stride
    structure are per-copy identical by construction (all three are local
    graph functions). Inputs flatten to [B·N_real ; pad] row layout."""
    graphs = [
        CsrGraph(
            np.concatenate(
                [g.flat_edges + i * g.num_nodes for i in range(b)], axis=1
            ),
            g.num_nodes * b,
        )
        for g in levels.graphs
    ]
    ids = [
        np.concatenate([k + i * levels.graphs[l].num_nodes for i in range(b)])
        for l, k in enumerate(levels.ids)
    ]
    return BistrideLevels(graphs=graphs, ids=ids)


def transition_edge_weights(levels: BistrideLevels) -> List[np.ndarray]:
    """Per-level transition edge weights `ec`, precomputed offline.

    The reference recomputes `cal_ew` under no_grad every forward
    (`src/ops/basic.py:142-167`, driven by `src/ops/BSMS.py:64-77` with
    w₀ = 1), but the recurrence is a pure function of the hierarchy:
        normed_w = w / out_degree;  aggr_w[j] = Σ_{i→j} normed_w[i] + 1e-12
        ec[i→j] = normed_w[i] / aggr_w[j];  w_next = aggr_w[kept]
    so it moves into the offline build — three fewer data movers per level
    per step on the TPU hot path. Computed in f64 with f32 degrees to match
    the reference dtype mix (torch `degree(..., dtype=float)`).

    Returns, for levels 0..depth, `ec` arrays aligned with each level's
    `flat_edges` columns (level `depth`'s weights are computed for
    completeness; the U-Net only uses levels 0..depth-1).
    """
    w = np.ones(levels.graphs[0].num_nodes, np.float64)
    out = []
    for l, g in enumerate(levels.graphs):
        snd, rcv = g.flat_edges[0], g.flat_edges[1]
        deg = np.bincount(snd, minlength=g.num_nodes).astype(np.float32)
        deg = np.maximum(deg, 1.0)
        normed_w = w / deg
        aggr_w = np.bincount(rcv, weights=normed_w[snd],
                             minlength=g.num_nodes) + 1e-12
        out.append((normed_w[snd] / aggr_w[rcv]).astype(np.float64))
        if l < len(levels.ids):
            w = aggr_w[levels.ids[l]]
    return out


def smoothed_positions(levels: BistrideLevels, pos: np.ndarray) -> List[np.ndarray]:
    """Per-level node positions as each GMP sees them, precomputed offline.

    The reference smooths `pos` through the weighted transition conv and
    pools it per level (`src/ops/BSMS.py:74-89`) — but since the weights are
    the pure-graph `transition_edge_weights`, the whole mesh-position chain
    is static too. Level l's array is the position BEFORE that level's conv
    (the reference's `down_ps[l]`, reused by the up GMP); the bottom level
    gets the fully smoothed+pooled chain. Dynamic (world-space) positional
    streams cannot be precomputed and stay online.
    """
    ecs = transition_edge_weights(levels)
    p = np.asarray(pos, np.float64)
    out = []
    for l, g in enumerate(levels.graphs):
        out.append(p)
        if l == len(levels.ids):
            break
        snd, rcv = g.flat_edges[0], g.flat_edges[1]
        ec = ecs[l]
        smoothed = np.stack(
            [np.bincount(rcv, weights=ec * p[snd, d], minlength=g.num_nodes)
             for d in range(p.shape[1])],
            axis=-1,
        )
        p = smoothed[levels.ids[l]]
    return out
