"""Precompute-layer tests: mesh→edges, CSR/BFS, bi-stride invariants,
padded-hierarchy consistency (SURVEY.md §4: connectivity invariants — every
removed node must stay adjacent to a kept node after squaring)."""

import numpy as np
import pytest

from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.csr import CsrGraph, UNREACHABLE
from bsms_gnn_tpu.graph.bistride import (
    build_bistride_levels,
    bstride_select,
    pool_edges,
    squared_adjacency,
)
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy, load_or_build_hierarchy
from bsms_gnn_tpu.graph.native import native_available, square_pattern

from conftest import make_grid_mesh, make_path_graph


def test_tri_edges_square():
    # One square split into two triangles: 5 undirected edges → 10 directed.
    cells = np.array([[0, 1, 2], [0, 2, 3]])
    e = to_flat_edge(cells, "tri")
    assert e.shape == (2, 10)
    undirected = {tuple(sorted(p)) for p in e.T.tolist()}
    assert undirected == {(0, 1), (1, 2), (0, 2), (2, 3), (0, 3)}
    # Symmetry: both directions present.
    pairs = {tuple(p) for p in e.T.tolist()}
    assert all((b, a) in pairs for a, b in pairs)


def test_tetra_and_quad_and_line_edges():
    tet = to_flat_edge(np.array([[0, 1, 2, 3]]), "tetra")
    assert {tuple(sorted(p)) for p in tet.T.tolist()} == {
        (0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)
    }
    quad = to_flat_edge(np.array([[0, 1, 2, 3]]), "quad")
    assert {tuple(sorted(p)) for p in quad.T.tolist()} == {
        (0, 1), (1, 2), (2, 3), (0, 3)
    }
    line = to_flat_edge(np.array([[0, 1], [1, 2]]), "line")
    assert line.shape == (2, 4)
    flat = to_flat_edge(np.array([[0], [1]]), "flat")
    assert flat.tolist() == [[0], [1]]


def test_bfs_dist_path():
    edges, _ = make_path_graph(11)
    g = CsrGraph(edges, 11)
    d = g.bfs_dist(0)
    assert d.tolist() == list(range(11))
    d5 = g.bfs_dist(5)
    assert d5.tolist() == [5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5]


def test_bfs_unreachable_and_components():
    edges = np.array([[0, 1, 3, 4], [1, 0, 4, 3]])
    g = CsrGraph(edges, 6)
    d = g.bfs_dist(0)
    assert d[0] == 0 and d[1] == 1
    assert d[3] == UNREACHABLE and d[5] == UNREACHABLE
    comps = sorted([c.tolist() for c in g.components()])
    assert comps == [[0, 1], [2], [3, 4], [5]]


def test_spgemm_matches_scipy():
    rng = np.random.default_rng(1)
    n = 60
    mask = rng.random((n, n)) < 0.08
    mask = mask | mask.T
    np.fill_diagonal(mask, True)
    g = CsrGraph.from_adj(mask)
    adj = g.to_adj()
    indptr, indices = square_pattern(adj, drop_diag=True)
    ref = (adj.astype(bool) @ adj.astype(bool)).tocsr()
    ref.setdiag(False)
    ref.eliminate_zeros()
    ref.sort_indices()
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(indices, ref.indices)


def test_native_spgemm_compiled():
    # The native library should compile in this environment; the scipy
    # fallback existing is not an excuse for it to silently never build.
    assert native_available()


def test_bstride_path_graph_parity():
    # Path 0..10, seed = node 5 (nearest centroid): BFS parity keeps the
    # smaller side; even ring = {5,3,7,1,9}=5+1... distances from 5 are
    # [5,4,3,2,1,0,1,2,3,4,5] → even set {1,3,5,7,9} (6 nodes? no:
    # dists even at nodes 1,3,5,7,9 and 0? dist0=5 odd) — compute directly.
    edges, pos = make_path_graph(11)
    g = CsrGraph(edges, 11)
    kept = bstride_select(g, pos)
    d = g.bfs_dist(5)
    even = set(np.flatnonzero(d % 2 == 0).tolist())
    odd = set(np.flatnonzero(d % 2 == 1).tolist())
    expect = even if (len(even) <= len(odd) or not odd) else odd
    assert set(kept.tolist()) == expect


def test_bistride_levels_invariants():
    pos, cells = make_grid_mesh(12, 9)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    depth = 3
    levels = build_bistride_levels(edges, depth, n, pos)
    assert len(levels.graphs) == depth + 1
    assert len(levels.ids) == depth
    for l in range(depth):
        g = levels.graphs[l]
        kept = levels.ids[l]
        removed = np.setdiff1d(np.arange(g.num_nodes), kept)
        # Connectivity invariant: in the squared graph every removed node is
        # adjacent to a kept node (so information can reach the next level).
        sq = squared_adjacency(g)
        adj = sq.to_adj().tocsr()
        kept_mask = np.zeros(g.num_nodes, dtype=bool)
        kept_mask[kept] = True
        for r in removed:
            neigh = adj.indices[adj.indptr[r] : adj.indptr[r + 1]]
            assert kept_mask[neigh].any(), f"removed node {r} stranded at level {l}"
        # Next level node count matches kept count.
        assert levels.graphs[l + 1].num_nodes == len(kept)
        # Coarser level is (roughly) half the size.
        assert len(kept) <= g.num_nodes


def test_pool_edges_relabel():
    edges = np.array([[0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2]])
    g = CsrGraph(edges, 4)
    pooled = pool_edges(g, np.array([0, 2]))
    # Only edges among {0, 2} survive; path graph has none.
    assert pooled.flat_edges.shape[1] == 0
    pooled2 = pool_edges(g, np.array([1, 2]))
    assert {tuple(p) for p in pooled2.flat_edges.T.tolist()} == {(0, 1), (1, 0)}


def test_from_csr_matches_constructor():
    """The sort-free SpGEMM-output path: same adjacency as the lexsorting
    constructor, row by row (within-row column order is unspecified)."""
    rng = np.random.default_rng(7)
    n, e = 50, 300
    edges = rng.integers(0, n, size=(2, e))
    g = CsrGraph(edges, n)
    g2 = CsrGraph.from_csr(g.indptr, g.indices, n)
    np.testing.assert_array_equal(g.indptr, g2.indptr)
    for i in range(n):
        a = np.sort(g.indices[g.indptr[i]:g.indptr[i + 1]])
        b = np.sort(g2.indices[g2.indptr[i]:g2.indptr[i + 1]])
        np.testing.assert_array_equal(a, b)
    # flat_edges reconstructed row-major: senders must be non-decreasing.
    assert np.all(np.diff(g2.flat_edges[0]) >= 0)
    assert g2.flat_edges.shape == (2, e)


def test_hierarchy_padding_and_ell():
    pos, cells = make_grid_mesh(10, 10)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 2, pos.shape[0], pos, pad_multiple=64)
    assert h.depth == 2
    for g in h.levels:
        n_pad, e_pad = g.n_pad_nodes, g.n_pad_edges
        assert n_pad % 128 == 0 and n_pad > g.n_nodes
        assert e_pad % 128 == 0
        real = g.edge_mask > 0
        assert real.sum() == g.n_edges
        # Real edges are receiver-sorted within the block-aligned layout.
        rr = g.receivers[real].astype(np.int64)
        assert np.all(np.diff(rr) >= 0)
        # Pad slots self-loop on the pad node.
        assert np.all(g.senders[~real] == n_pad - 1)
        assert np.all(g.receivers[~real] == n_pad - 1)
        # Block alignment: every 128-node block owns a chunk-aligned,
        # contiguous slot segment starting at recv_indptr of its first node.
        block_starts = g.recv_indptr[::128].astype(np.int64)
        assert np.all(block_starts % 128 == 0)
        assert block_starts[-1] == e_pad
        assert np.all(np.diff(block_starts) >= 128)
        # Every real slot of block b lies inside [bs[b], bs[b+1]).
        slot_block = np.searchsorted(block_starts[1:], np.flatnonzero(real), side="right")
        np.testing.assert_array_equal(slot_block, g.receivers[real] // 128)
        # ELL tables reconstruct exact per-node slot sets.
        for n in [0, 1, g.n_nodes - 1]:
            slots = g.recv_ell[n]
            listed = slots[slots < e_pad]
            assert set(listed.tolist()) == set(
                np.flatnonzero(real & (g.receivers == n)).tolist()
            )
        # Degree matches real edge counts (senders).
        counts = np.bincount(g.senders[real], minlength=n_pad)
        np.testing.assert_array_equal(
            g.deg[: g.n_nodes], np.maximum(counts[: g.n_nodes], 1).astype(np.float32)
        )
        # Mask marks exactly the real nodes.
        assert g.node_mask.sum() == g.n_nodes

    for l, t in enumerate(h.transitions):
        parent, child = h.levels[l], h.levels[l + 1]
        m = child.n_nodes
        # Real pool ids are real parent nodes; pads point at parent pad node.
        assert np.all(t.pool_ids[:m] < parent.n_nodes)
        assert np.all(t.pool_ids[m:] == parent.n_pad_nodes - 1)
        # unpool_inv inverts pool_ids on the kept set.
        inv = t.unpool_inv
        kept = t.pool_ids[:m]
        np.testing.assert_array_equal(inv[kept], np.arange(m))
        dropped = np.setdiff1d(np.arange(parent.n_nodes), kept)
        assert np.all(inv[dropped] == child.n_pad_nodes)


def test_hierarchy_cache_roundtrip(tmp_path):
    pos, cells = make_grid_mesh(8, 8)
    edges = to_flat_edge(cells, "tri")
    h1 = load_or_build_hierarchy(
        str(tmp_path), "shared", edges, 2, pos.shape[0], pos, pad_multiple=32
    )
    h2 = load_or_build_hierarchy(
        str(tmp_path), "shared", edges, 2, pos.shape[0], pos, pad_multiple=32
    )
    assert h1.depth == h2.depth
    for g1, g2 in zip(h1.levels, h2.levels):
        np.testing.assert_array_equal(g1.senders, g2.senders)
        np.testing.assert_array_equal(g1.recv_ell, g2.recv_ell)
        assert g1.n_nodes == g2.n_nodes and g1.n_edges == g2.n_edges
    for t1, t2 in zip(h1.transitions, h2.transitions):
        np.testing.assert_array_equal(t1.pool_ids, t2.pool_ids)
        np.testing.assert_array_equal(t1.unpool_inv, t2.unpool_inv)


def test_hierarchy_buckets():
    pos, cells = make_grid_mesh(6, 6)
    edges = to_flat_edge(cells, "tri")
    node_buckets = [128, 128, 128]
    edge_buckets = [512, 512, 512]
    h = build_hierarchy(
        edges, 2, pos.shape[0], pos, node_buckets=node_buckets, edge_buckets=edge_buckets
    )
    for l, g in enumerate(h.levels):
        assert g.n_pad_nodes == node_buckets[l]
        assert g.n_pad_edges == edge_buckets[l]
        assert g.edge_mask.sum() == g.n_edges


def test_replicate_levels_union_matches_batched_forward():
    """graph/bistride.py::replicate_levels: the B-copy disjoint-union
    hierarchy run flat ([B*N_real ; pad] rows) must reproduce the
    [B, N_pad, C] batched forward per copy (the union serving path,
    benchmarks/throughput.py --union)."""
    import jax
    import jax.numpy as jnp

    from conftest import make_grid_mesh

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.graph.bistride import (
        build_bistride_levels,
        replicate_levels,
    )
    from bsms_gnn_tpu.graph.hierarchy import pad_levels
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    cfg = load_config([
        "model.unet_depth=2", "model.latent_dim=16", "model.hidden_layer=1",
    ])
    pos, cells = make_grid_mesh(7, 7)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels = build_bistride_levels(edges, 2, n, pos)
    h1 = pad_levels(levels, pad_multiple=32, pos=pos)
    b = 3
    hb = pad_levels(replicate_levels(levels, b), pad_multiple=32,
                    pos=np.tile(pos, (b, 1)))

    rng = np.random.default_rng(0)
    c = cfg.model.out_dim
    sample = np.zeros((b, n, c + 3), np.float32)
    sample[..., :c] = rng.standard_normal((b, n, c))
    sample[..., c:c + 2] = pos

    state = init_simulator(jax.random.PRNGKey(0), cfg.model)

    # batched reference: [B, N_pad, C]
    n_pad1 = h1.levels[0].n_pad_nodes
    ni = np.zeros((b, n_pad1, c + 3), np.float32)
    ni[:, :n] = sample
    mask = np.zeros((b, n_pad1, 1), np.float32)
    mask[:, :n] = 1.0
    ref = np.asarray(simulator_forward(
        state.params, state.norm_in, state.norm_out, h1,
        jnp.asarray(ni), jnp.asarray(mask), cfg.model,
    ))

    # union: [B*N_real ; pad] rows
    n_padb = hb.levels[0].n_pad_nodes
    niu = np.zeros((n_padb, c + 3), np.float32)
    niu[:b * n] = sample.reshape(b * n, -1)
    masku = np.zeros((n_padb, 1), np.float32)
    masku[:b * n] = 1.0
    got = np.asarray(simulator_forward(
        state.params, state.norm_in, state.norm_out, hb,
        jnp.asarray(niu), jnp.asarray(masku), cfg.model,
    ))[:b * n].reshape(b, n, -1)

    np.testing.assert_allclose(got, ref[:, :n], rtol=1e-5, atol=1e-6)
