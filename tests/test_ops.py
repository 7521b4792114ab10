"""Ops-layer tests: scatter-free primitives against the NumPy oracle, grad
parity of the custom VJPs, GMP/edge-conv/pool behavior, full BSGMP forward on
the reference's path-graph fixture and on a real mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import reference_math as ref
from conftest import make_grid_mesh, make_path_graph

from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.ops import (
    aggregate_recv,
    aggregate_send,
    gather_recv,
    gather_send,
    init_mlp,
    mlp_apply,
    init_gmp,
    gmp_apply,
    cal_ew,
    edge_conv_down,
    edge_conv_up,
    pool_nodes,
    unpool_nodes,
    init_bsgmp,
    bsgmp_apply,
)


def _mesh_hierarchy(depth=2, nx=8, ny=8, pad_multiple=32):
    pos, cells = make_grid_mesh(nx, ny)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, depth, pos.shape[0], pos, pad_multiple=pad_multiple)
    return h, pos


def _pad_nodes(x, n_pad):
    out = np.zeros((n_pad,) + x.shape[1:], dtype=np.float32)
    out[: x.shape[0]] = x
    return out


def _real_edges(lvl):
    """(slot indices, senders, receivers) of the real edges in the
    block-aligned layout."""
    slots = np.flatnonzero(np.asarray(lvl.edge_mask) > 0)
    return slots, np.asarray(lvl.senders)[slots], np.asarray(lvl.receivers)[slots]


@pytest.mark.parametrize("method", ["ell", "segment"])
def test_aggregate_matches_oracle(method, rng):
    h, _ = _mesh_hierarchy()
    lvl = h.levels[0]
    n = lvl.n_nodes
    slots, s_real, r_real = _real_edges(lvl)
    feat = np.zeros((lvl.n_pad_edges, 16), np.float32)
    feat[slots] = rng.standard_normal((len(slots), 16)).astype(np.float32)
    out = aggregate_recv(lvl, jnp.asarray(feat), method)
    oracle = ref.scatter_sum(feat[slots], r_real, n)
    np.testing.assert_allclose(np.asarray(out)[:n], oracle, rtol=1e-6, atol=1e-6)

    out_s = aggregate_send(lvl, jnp.asarray(feat), method)
    oracle_s = ref.scatter_sum(feat[slots], s_real, n)
    np.testing.assert_allclose(np.asarray(out_s)[:n], oracle_s, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("method", ["ell", "segment"])
def test_gather_matches_oracle(method, rng):
    h, _ = _mesh_hierarchy()
    lvl = h.levels[0]
    x = rng.standard_normal((lvl.n_pad_nodes, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(gather_send(lvl, jnp.asarray(x), method)), x[np.asarray(lvl.senders)]
    )
    np.testing.assert_array_equal(
        np.asarray(gather_recv(lvl, jnp.asarray(x), method)), x[np.asarray(lvl.receivers)]
    )


def test_custom_vjp_grads_match_segment_path(rng):
    """ELL custom VJPs must produce the same gradients as plain autodiff
    through the segment path — on the real (non-pad) rows. Pad rows differ by
    design: the pad node's ELL row excludes pad edges while segment-sum
    routes them there; pad values never reach real outputs either way."""
    h, _ = _mesh_hierarchy()
    lvl = h.levels[0]
    n, e = lvl.n_nodes, lvl.n_edges
    x = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 8)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((lvl.n_pad_edges, 8)).astype(np.float32))
    cot_n = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 8)).astype(np.float32))
    cot_e = jnp.asarray(rng.standard_normal((lvl.n_pad_edges, 8)).astype(np.float32))

    slots, _, _ = _real_edges(lvl)
    node_valid = np.arange(n)
    for fn, inp, cot, valid in [
        (lambda v, m: gather_send(lvl, v, m), x, cot_e, node_valid),
        (lambda v, m: gather_recv(lvl, v, m), x, cot_e, node_valid),
        (lambda v, m: aggregate_recv(lvl, v, m), feat, cot_n, slots),
        (lambda v, m: aggregate_send(lvl, v, m), feat, cot_n, slots),
    ]:
        g_seg = jax.grad(lambda v: jnp.vdot(fn(v, "segment"), cot))(inp)
        for method in ("ell", "pallas"):
            g_m = jax.grad(lambda v: jnp.vdot(fn(v, method), cot))(inp)
            np.testing.assert_allclose(
                np.asarray(g_m)[valid], np.asarray(g_seg)[valid],
                rtol=1e-5, atol=1e-5,
            )


def test_batched_leading_dims(rng):
    h, _ = _mesh_hierarchy()
    lvl = h.levels[0]
    x = jnp.asarray(rng.standard_normal((3, lvl.n_pad_nodes, 8)).astype(np.float32))
    for method in ["ell", "segment"]:
        out = aggregate_recv(lvl, gather_send(lvl, x, method), method)
        assert out.shape == (3, lvl.n_pad_nodes, 8)
        single = aggregate_recv(lvl, gather_send(lvl, x[0], method), method)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), rtol=1e-6)


def test_mlp_matches_oracle(rng):
    key = jax.random.PRNGKey(0)
    p = init_mlp(key, 10, 16, 4, hidden_layers=2, layer_normalized=True)
    x = rng.standard_normal((7, 10)).astype(np.float32)
    got = np.asarray(mlp_apply(p, jnp.asarray(x)))
    want = ref.mlp([np.asarray(w) for w in p.weights], [np.asarray(b) for b in p.biases],
                   x.astype(np.float64), True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("method", ["ell", "segment"])
def test_gmp_matches_oracle(method, rng):
    h, pos = _mesh_hierarchy()
    lvl = h.levels[0]
    n = lvl.n_nodes
    key = jax.random.PRNGKey(1)
    params = init_gmp(key, latent_dim=16, hidden_layer=2, pos_dim=2)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    xp = _pad_nodes(x, lvl.n_pad_nodes)
    posp = _pad_nodes(pos.astype(np.float32), lvl.n_pad_nodes)

    got = np.asarray(gmp_apply(params, lvl, jnp.asarray(xp), jnp.asarray(posp), method))

    ew = [np.asarray(w) for w in params.mlp_edge.weights]
    eb = [np.asarray(b) for b in params.mlp_edge.biases]
    nw = [np.asarray(w) for w in params.mlp_node.weights]
    nb = [np.asarray(b) for b in params.mlp_node.biases]
    _, s_real, r_real = _real_edges(lvl)
    want = ref.gmp(
        ew, eb, nw, nb,
        x.astype(np.float64),
        s_real,
        r_real,
        pos.astype(np.float64),
    )
    np.testing.assert_allclose(got[:n], want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("method", ["ell", "segment"])
def test_cal_ew_and_conv_match_oracle(method, rng):
    h, pos = _mesh_hierarchy()
    lvl = h.levels[0]
    n = lvl.n_nodes
    slots, s, r = _real_edges(lvl)
    w = np.ones((lvl.n_pad_nodes, 1), dtype=np.float32)
    ec, aggr_w = cal_ew(lvl, jnp.asarray(w), method)
    ec_ref, aggr_ref = ref.cal_ew(np.ones((n, 1)), s, r, n)
    np.testing.assert_allclose(np.asarray(ec)[slots], ec_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aggr_w)[:n], aggr_ref, rtol=1e-5, atol=1e-6)

    x = rng.standard_normal((n, 8)).astype(np.float32)
    xp = _pad_nodes(x, lvl.n_pad_nodes)
    down = edge_conv_down(lvl, jnp.asarray(xp), ec, method)
    down_ref = ref.edge_conv(x.astype(np.float64), s, r, ec_ref, aggregating=True)
    np.testing.assert_allclose(np.asarray(down)[:n], down_ref, rtol=1e-4, atol=1e-5)

    up = edge_conv_up(lvl, jnp.asarray(xp), ec, method)
    up_ref = ref.edge_conv(x.astype(np.float64), s, r, ec_ref, aggregating=False)
    np.testing.assert_allclose(np.asarray(up)[:n], up_ref, rtol=1e-4, atol=1e-5)


def test_pool_unpool_roundtrip(rng):
    h, _ = _mesh_hierarchy()
    t = h.transitions[0]
    parent, child = h.levels[0], h.levels[1]
    x = rng.standard_normal((parent.n_pad_nodes, 4)).astype(np.float32)
    x[parent.n_nodes :] = 0.0
    pooled = pool_nodes(t, jnp.asarray(x))
    kept = np.asarray(t.pool_ids[: child.n_nodes])
    np.testing.assert_array_equal(np.asarray(pooled)[: child.n_nodes], x[kept])
    # Pad slots read zeros (parent pad node).
    assert np.all(np.asarray(pooled)[child.n_nodes :] == 0)

    up = unpool_nodes(t, pooled)
    want = ref.unpool(x[kept], parent.n_pad_nodes, kept)
    np.testing.assert_array_equal(np.asarray(up), want)

    # Transpose test: <pool(x), y> == <x, unpool(y)>.
    y = jnp.asarray(rng.standard_normal(pooled.shape).astype(np.float32))
    lhs = jnp.vdot(pool_nodes(t, jnp.asarray(x)), y)
    rhs = jnp.vdot(jnp.asarray(x), unpool_nodes(t, y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)

    # Grad parity against take-based autodiff on real parent rows (the
    # parent pad node differs by design: take-autodiff scatters the pad
    # slots' cotangents there, the custom VJP drops them).
    g1 = jax.grad(lambda v: jnp.vdot(pool_nodes(t, v), y))(jnp.asarray(x))
    g2 = jax.grad(lambda v: jnp.vdot(jnp.take(v, t.pool_ids, axis=-2), y))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(g1)[: parent.n_nodes], np.asarray(g2)[: parent.n_nodes], rtol=1e-5
    )


def _run_reference_bsgmp(params, levels_arrays, ids, x, pos):
    """Full U-Net oracle in NumPy following SURVEY.md §3.4."""
    depth = len(ids)
    down_outs, down_ps, cts = [], [], []
    w = np.ones((x.shape[0], 1))
    h = x

    def gmp_np(p, h, s, r, pos):
        return ref.gmp(
            [np.asarray(a) for a in p.mlp_edge.weights],
            [np.asarray(a) for a in p.mlp_edge.biases],
            [np.asarray(a) for a in p.mlp_node.weights],
            [np.asarray(a) for a in p.mlp_node.biases],
            h, s, r, pos,
        )

    for i in range(depth):
        s, r = levels_arrays[i]
        h = gmp_np(params.down_gmps[i], h, s, r, pos)
        down_outs.append(h)
        down_ps.append(pos)
        ec, w = ref.cal_ew(w, s, r, h.shape[0])
        h = ref.edge_conv(h, s, r, ec, True)
        pos = ref.edge_conv(pos, s, r, ec, True)
        cts.append(ec)
        h, pos, w = h[ids[i]], pos[ids[i]], w[ids[i]]
    s, r = levels_arrays[depth]
    h = gmp_np(params.bottom_gmp, h, s, r, pos)
    for i in range(depth):
        d = depth - i - 1
        s, r = levels_arrays[d]
        h = ref.unpool(h, down_outs[d].shape[0], ids[d])
        h = ref.edge_conv(h, s, r, cts[d], False)
        h = gmp_np(params.up_gmps[i], h, s, r, down_ps[d])
        h = h + down_outs[d]
    return h


@pytest.mark.parametrize("fixture", ["path", "mesh"])
def test_bsgmp_matches_oracle(fixture, rng):
    if fixture == "path":
        edges, pos = make_path_graph(11)
        depth, latent, pos_dim = 2, 16, 3
    else:
        pos, cells = make_grid_mesh(7, 7)
        edges = to_flat_edge(cells, "tri")
        depth, latent, pos_dim = 2, 16, 2
    n = pos.shape[0]
    h = build_hierarchy(edges, depth, n, pos, pad_multiple=16)

    key = jax.random.PRNGKey(2)
    params = init_bsgmp(key, depth, latent, hidden_layer=2, pos_dim=pos_dim)
    x = rng.standard_normal((n, latent)).astype(np.float32)

    lvl0 = h.levels[0]
    xp = _pad_nodes(x, lvl0.n_pad_nodes)
    posp = _pad_nodes(pos.astype(np.float32), lvl0.n_pad_nodes)

    for method in ["ell", "segment"]:
        got = np.asarray(bsgmp_apply(params, h, jnp.asarray(xp), jnp.asarray(posp), method))
        levels_arrays = []
        for g in h.levels:
            sl = np.flatnonzero(np.asarray(g.edge_mask) > 0)
            levels_arrays.append(
                (np.asarray(g.senders)[sl], np.asarray(g.receivers)[sl])
            )
        ids = [np.asarray(t.pool_ids[: h.levels[l + 1].n_nodes]) for l, t in enumerate(h.transitions)]
        want = _run_reference_bsgmp(params, levels_arrays, ids, x.astype(np.float64), pos)
        np.testing.assert_allclose(got[:n], want, rtol=2e-3, atol=2e-4)
        assert not np.any(np.isnan(got))


def test_bsgmp_grads_finite(rng):
    pos, cells = make_grid_mesh(6, 6)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 2, pos.shape[0], pos, pad_multiple=16)
    params = init_bsgmp(jax.random.PRNGKey(3), 2, 8, 1, 2)
    lvl0 = h.levels[0]
    x = jnp.asarray(_pad_nodes(rng.standard_normal((pos.shape[0], 8)).astype(np.float32), lvl0.n_pad_nodes))
    posp = jnp.asarray(_pad_nodes(pos.astype(np.float32), lvl0.n_pad_nodes))

    def loss(p):
        out = bsgmp_apply(p, h, x, posp, "ell")
        return jnp.sum(out**2)

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)
