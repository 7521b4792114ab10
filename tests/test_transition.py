"""Fused transition operators (ops/transition.py, hierarchy.TransOp):
`trans_down` must equal conv→pool and `trans_up` must equal unpool→conv
(the parity-oracle ell paths, themselves golden-tested against the
reference `BSMS.py:74-89,98-100`), in values and gradients, for wide
(kernel) and narrow (ELL-fallback) features, batched and not, and the pair
must survive a save/load round trip and the full-model forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.graph.bistride import build_bistride_levels
from bsms_gnn_tpu.graph.hierarchy import load_hierarchy, pad_levels, save_hierarchy
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up
from bsms_gnn_tpu.ops.pool import pool_nodes, unpool_nodes
from bsms_gnn_tpu.ops.transition import trans_down, trans_up

from conftest import make_grid_mesh

DEPTH = 3


@pytest.fixture(scope="module")
def hier():
    pos, cells = make_grid_mesh(16, 12)
    edges = to_flat_edge(cells, "tri")
    levels = build_bistride_levels(edges, DEPTH, pos.shape[0], pos)
    return pad_levels(levels, pad_multiple=128, pos=pos)


def _rand_nodes(rng, level, c):
    x = np.zeros((level.n_pad_nodes, c), np.float32)
    x[: level.n_nodes] = rng.standard_normal((level.n_nodes, c))
    return jnp.asarray(x)


@pytest.mark.parametrize("c", [128, 2])
@pytest.mark.parametrize("lvl", [0, 1, 2])
def test_fused_matches_conv_pool(hier, rng, lvl, c):
    level, t = hier.levels[lvl], hier.transitions[lvl]
    x = _rand_nodes(rng, level, c)
    ref = pool_nodes(t, edge_conv_down(level, x, None, "ell"))
    got = trans_down(t, x, "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)

    y = _rand_nodes(rng, hier.levels[lvl + 1], c)
    ref_u = edge_conv_up(level, unpool_nodes(t, y), None, "ell")
    got_u = trans_up(t, y, "pallas")
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), rtol=1e-6, atol=1e-6)


def test_fused_gradients_match(hier, rng):
    level, t = hier.levels[0], hier.transitions[0]
    x = _rand_nodes(rng, level, 128)
    tar = _rand_nodes(rng, hier.levels[1], 128)
    g_fused = jax.grad(lambda v: jnp.sum((trans_down(t, v, "pallas") - tar) ** 2))(x)
    g_ref = jax.grad(
        lambda v: jnp.sum((pool_nodes(t, edge_conv_down(level, v, None, "ell")) - tar) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=2e-5, atol=2e-5)

    y = _rand_nodes(rng, hier.levels[1], 128)
    tar2 = _rand_nodes(rng, level, 128)
    gu_fused = jax.grad(lambda v: jnp.sum((trans_up(t, v, "pallas") - tar2) ** 2))(y)
    gu_ref = jax.grad(
        lambda v: jnp.sum(
            (edge_conv_up(level, unpool_nodes(t, v), None, "ell") - tar2) ** 2
        )
    )(y)
    np.testing.assert_allclose(np.asarray(gu_fused), np.asarray(gu_ref), rtol=2e-5, atol=2e-5)


def test_fused_batched(hier, rng):
    level, t = hier.levels[0], hier.transitions[0]
    xb = jnp.asarray(
        rng.standard_normal((3, level.n_pad_nodes, 128)).astype(np.float32)
        * np.asarray(level.node_mask)
    )
    ref = pool_nodes(t, edge_conv_down(level, xb, None, "ell"))
    got = trans_down(t, xb, "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_sparse_op_matches_dense_op(hier, rng):
    """Small graphs take the dense-matmul branch by default; the sparse
    gather+segment-sum operator path (what large meshes run) must agree
    with it, fwd and grad — strip `dense` to force the sparse branch."""
    level, t = hier.levels[0], hier.transitions[0]
    assert t.down_op.dense is not None, "tiny op should carry a dense form"
    t_sparse = t.replace(
        down_op=t.down_op.replace(dense=None),
        up_op=t.up_op.replace(dense=None),
    )
    x = _rand_nodes(rng, level, 128)
    np.testing.assert_allclose(
        np.asarray(trans_down(t, x, "pallas")),
        np.asarray(trans_down(t_sparse, x, "pallas")),
        rtol=1e-5, atol=1e-5,
    )
    y = _rand_nodes(rng, hier.levels[1], 128)
    np.testing.assert_allclose(
        np.asarray(trans_up(t, y, "pallas")),
        np.asarray(trans_up(t_sparse, y, "pallas")),
        rtol=1e-5, atol=1e-5,
    )
    g_d = jax.grad(lambda v: jnp.sum(trans_down(t, v, "pallas") ** 2))(x)
    g_s = jax.grad(lambda v: jnp.sum(trans_down(t_sparse, v, "pallas") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_s),
                               rtol=2e-5, atol=2e-5)


def test_trans_ops_survive_cache_roundtrip(hier, tmp_path):
    path = str(tmp_path / "h.npz")
    save_hierarchy(path, hier)
    h2 = load_hierarchy(path)
    for t1, t2 in zip(hier.transitions, h2.transitions):
        assert t2.down_op is not None and t2.up_op is not None
        np.testing.assert_array_equal(t1.down_op.senders, t2.down_op.senders)
        np.testing.assert_array_equal(t1.up_op.receivers, t2.up_op.receivers)
        np.testing.assert_allclose(t1.down_op.ew, t2.down_op.ew)
        assert t2.down_op.n_in_pad == t1.down_op.n_in_pad
        if t1.down_op.dense is not None:
            np.testing.assert_allclose(t1.down_op.dense, t2.down_op.dense)


def test_full_forward_pallas_matches_ell(hier, rng):
    """The model forward with fused transitions (pallas) must match the
    parity-oracle ell path end to end."""
    from bsms_gnn_tpu.config import ModelConfig
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    cfg = ModelConfig(
        latent_dim=128, hidden_layer=2, unet_depth=DEPTH, out_dim=2,
        pos_dim=2, accumulation_steps=0, aggregation="pallas",
    )
    sim = init_simulator(jax.random.PRNGKey(0), cfg)
    n_pad = hier.levels[0].n_pad_nodes
    n = hier.levels[0].n_nodes
    pos, _ = make_grid_mesh(16, 12)
    node_in = np.zeros((n_pad, 5), np.float32)
    node_in[:n, :2] = rng.standard_normal((n, 2))
    node_in[:n, 2:4] = pos
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = 1.0
    args = (sim.params, sim.norm_in, sim.norm_out, hier,
            jnp.asarray(node_in), jnp.asarray(mask))
    import dataclasses

    out_p = simulator_forward(*args, cfg)
    out_e = simulator_forward(*args, dataclasses.replace(cfg, aggregation="ell"))
    np.testing.assert_allclose(
        np.asarray(out_p)[:n], np.asarray(out_e)[:n], rtol=2e-4, atol=2e-5
    )


@pytest.fixture(scope="module")
def hier_win():
    """Windowed hierarchy on a larger grid (window << N so real residual
    edges exist on level 0)."""
    pos, cells = make_grid_mesh(28, 24)
    from bsms_gnn_tpu.graph.order import reorder_mesh

    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    levels = build_bistride_levels(edges, 2, pos.shape[0], pos)
    return pad_levels(levels, pad_multiple=128, pos=pos, window=128)


@pytest.mark.parametrize("c", [128, 2])
@pytest.mark.parametrize("lvl", [0, 1])
def test_windowed_fused_matches_conv_pool(hier_win, rng, lvl, c):
    """Windowed TransOps (in-kernel selection + skip-empty residual) must
    match the explicit windowed conv -> pool / unpool -> conv sequence."""
    level, t = hier_win.levels[lvl], hier_win.transitions[lvl]
    assert t.down_op is not None and t.down_op.window > 0
    x = _rand_nodes(rng, level, c)
    ref = pool_nodes(t, edge_conv_down(level, x, None, "ell"))
    got = trans_down(t, x, "pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    y = _rand_nodes(rng, hier_win.levels[lvl + 1], c)
    ref_u = edge_conv_up(level, unpool_nodes(t, y), None, "ell")
    got_u = trans_up(t, y, "pallas")
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-5)


def test_windowed_fused_has_residual_and_grads(hier_win, rng):
    t = hier_win.transitions[0]
    # The 128-wide window on a 672-node level must leave residual entries —
    # otherwise this test isn't exercising the accumulate path.
    assert t.down_op.resid is not None
    level = hier_win.levels[0]
    x = _rand_nodes(rng, level, 128)
    tar = _rand_nodes(rng, hier_win.levels[1], 128)
    g_fused = jax.grad(lambda v: jnp.sum((trans_down(t, v, "pallas") - tar) ** 2))(x)
    g_ref = jax.grad(
        lambda v: jnp.sum(
            (pool_nodes(t, edge_conv_down(level, v, None, "ell")) - tar) ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
