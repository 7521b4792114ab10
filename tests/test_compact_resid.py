"""Compact residual tables + block-visit accumulate kernel
(graph/hierarchy.py::CompactResid, ops/pallas/compact_resid.py).

The windowed parity tests already drive the compact path end-to-end inside
gmp_apply / edge_conv / transitions; these tests pin the pieces directly:
visit-table construction invariants, kernel parity vs a NumPy scatter-add
oracle, and the twin-permutation sender-gather VJP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.ops.pallas.compact_resid import (
    compact_accum,
    compact_accum_raw,
    compact_gather,
)

C = 128


def _windowed_level(scramble=True, nx=36, ny=36, depth=2):
    pos, cells = make_grid_mesh(nx, ny)
    if scramble:
        # Scrambled ids push most edges out-of-window -> big residual.
        rng = np.random.default_rng(3)
        perm = rng.permutation(len(pos))
        inv = np.empty(len(pos), np.int64)
        inv[perm] = np.arange(len(pos))
        pos, cells = pos[perm], inv[cells.astype(np.int64)].astype(cells.dtype)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, depth, pos.shape[0], pos, window=128)
    return h


@pytest.fixture(scope="module")
def level():
    h = _windowed_level()
    lvl = h.levels[0]
    assert lvl.cresid is not None and lvl.cresid.n_real > 100
    return lvl


def test_tables_invariants(level):
    cr = level.cresid
    n = cr.n_real
    r = np.asarray(cr.receivers)
    s = np.asarray(cr.senders)
    # receiver-sorted real rows; pads point at the pad node
    assert (np.diff(r[:n]) >= 0).all()
    assert (r[n:] == cr.n_pad_nodes - 1).all()
    # twin is an involution over real rows mapping (s, r) -> (r, s)
    t = np.asarray(cr.twin)[:n]
    assert (np.asarray(cr.twin)[t] == np.arange(n)).all()
    np.testing.assert_array_equal(s[t], r[:n])
    np.testing.assert_array_equal(r[t], s[:n])
    # ew_rev is the twin's weight
    np.testing.assert_allclose(np.asarray(cr.ew_rev)[:n],
                               np.asarray(cr.ew)[t])
    # visits: out blocks non-decreasing, every real row claimed exactly once
    vb = np.asarray(cr.visit_block)
    assert (np.diff(vb) >= 0).all()
    claimed = np.zeros(cr.n_rows, np.int32)
    vr = np.asarray(cr.visit_recv)
    vc = np.asarray(cr.visit_cblk)
    for v in range(vb.shape[0]):
        rows = np.flatnonzero(vr[v] >= 0)
        claimed[vc[v] * 128 + rows] += 1
        np.testing.assert_array_equal(
            vr[v][rows], r[vc[v] * 128 + rows] - vb[v] * 128
        )
    assert (claimed[:n] == 1).all()
    assert (claimed[n:] == 0).all()


def test_accum_matches_oracle(level):
    cr = level.cresid
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((cr.n_rows, C)).astype(np.float32)
    acc = rng.standard_normal((cr.n_pad_nodes, C)).astype(np.float32)

    out = np.asarray(jax.jit(
        lambda v, a: compact_accum_raw(cr, v, a)
    )(jnp.asarray(vals), jnp.asarray(acc)))

    oracle = acc.copy()
    n = cr.n_real
    np.add.at(oracle, np.asarray(cr.receivers)[:n], vals[:n])
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)


def test_accum_batched(level):
    cr = level.cresid
    rng = np.random.default_rng(1)
    vals = rng.standard_normal((3, cr.n_rows, C)).astype(np.float32)
    acc = np.zeros((3, cr.n_pad_nodes, C), np.float32)
    out = np.asarray(jax.jit(
        lambda v, a: compact_accum_raw(cr, v, a)
    )(jnp.asarray(vals), jnp.asarray(acc)))
    n = cr.n_real
    for b in range(3):
        oracle = np.zeros((cr.n_pad_nodes, C), np.float32)
        np.add.at(oracle, np.asarray(cr.receivers)[:n], vals[b, :n])
        np.testing.assert_allclose(out[b], oracle, rtol=1e-5, atol=1e-5)


def test_gather_vjps_match_dense(level):
    cr = level.cresid
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((cr.n_pad_nodes, C)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((cr.n_rows, C)), jnp.float32)

    for by in ("send", "recv"):
        out, vjp = jax.vjp(lambda xx: compact_gather(cr, xx, by), x)
        idx = np.asarray(cr.senders if by == "send" else cr.receivers)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[idx])
        (dx,) = vjp(ct)
        oracle = np.zeros((cr.n_pad_nodes, C), np.float32)
        # pad rows must contribute nothing to real nodes: mask them the way
        # the kernel does (their visit slots are -1)
        n = cr.n_real
        np.add.at(oracle, idx[:n], np.asarray(ct)[:n])
        np.testing.assert_allclose(
            np.asarray(dx)[: cr.n_pad_nodes - 1],
            oracle[: cr.n_pad_nodes - 1], rtol=1e-5, atol=1e-5,
        )


def test_accum_vjp(level):
    cr = level.cresid
    rng = np.random.default_rng(4)
    vals = jnp.asarray(rng.standard_normal((cr.n_rows, C)), jnp.float32)
    acc = jnp.asarray(rng.standard_normal((cr.n_pad_nodes, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((cr.n_pad_nodes, C)), jnp.float32)

    out, vjp = jax.vjp(lambda v, a: compact_accum(cr, v, a), vals, acc)
    dv, da = vjp(g)
    np.testing.assert_array_equal(np.asarray(da), np.asarray(g))
    np.testing.assert_array_equal(
        np.asarray(dv), np.asarray(g)[np.asarray(cr.receivers)]
    )


def test_transop_cresid_built():
    h = _windowed_level(scramble=True)
    ops = [t.down_op for t in h.transitions if t.down_op is not None]
    assert any(
        op.cresid is not None for op in ops if op.resid is not None
    ) or all(op.resid is None for op in ops)
    for op in ops:
        if op.cresid is None:
            continue
        assert not op.cresid.symmetric
        assert op.cresid.n_pad_nodes == op.n_pad_nodes
