"""Fused edge-MLP+aggregate kernel tests (interpret mode): forward parity
with the unfused path, full gradient parity (pre, weights, biases), batched
mode, and GMP-level integration."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.ops.dense import init_mlp, mlp_apply_tail
from bsms_gnn_tpu.ops.message import init_gmp, gmp_apply
from bsms_gnn_tpu.ops.scatter import aggregate_recv
from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_mlp_aggregate


@pytest.fixture(scope="module", params=[128, 512], ids=["eb128", "eb512"])
def setup(request):
    pos, cells = make_grid_mesh(10, 10)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(
        edges, 1, pos.shape[0], pos, pad_multiple=128,
        edge_block=request.param,
    )
    lvl = h.levels[0]
    assert lvl.edge_block == request.param
    mlp = init_mlp(jax.random.PRNGKey(0), 259, 128, 128, hidden_layers=3, layer_normalized=True)
    return lvl, mlp, pos


def _unfused(lvl, mlp, pre):
    e = mlp_apply_tail(mlp, pre)
    return aggregate_recv(lvl, e, "ell")


def test_fused_forward_matches_unfused(setup, rng):
    lvl, mlp, _ = setup
    pre = jnp.asarray(rng.standard_normal((lvl.n_pad_edges, 128)).astype(np.float32))
    out = fused_edge_mlp_aggregate(lvl, pre, mlp.weights[1:], mlp.biases[1:])
    assert out is not None
    want = _unfused(lvl, mlp, pre)
    n = lvl.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(want)[:n], rtol=1e-4, atol=1e-4
    )


def test_fused_grads_match_unfused(setup, rng):
    lvl, mlp, _ = setup
    pre = jnp.asarray(rng.standard_normal((lvl.n_pad_edges, 128)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32))
    ws = tuple(mlp.weights[1:])
    bs = tuple(mlp.biases[1:])

    def loss_fused(pre, ws, bs):
        return jnp.vdot(fused_edge_mlp_aggregate(lvl, pre, ws, bs), cot)

    def loss_unfused(pre, ws, bs):
        m = mlp.replace(weights=(mlp.weights[0],) + ws, biases=(mlp.biases[0],) + bs)
        return jnp.vdot(_unfused(lvl, m, pre), cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(pre, ws, bs)
    gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(pre, ws, bs)

    slots = np.flatnonzero(np.asarray(lvl.edge_mask) > 0)
    np.testing.assert_allclose(
        np.asarray(gf[0])[slots], np.asarray(gu[0])[slots], rtol=1e-3, atol=1e-4
    )
    for a, b in zip(gf[1], gu[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
    for a, b in zip(gf[2], gu[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_fused_batched(setup, rng):
    lvl, mlp, _ = setup
    preb = jnp.asarray(rng.standard_normal((2, lvl.n_pad_edges, 128)).astype(np.float32))
    out = fused_edge_mlp_aggregate(lvl, preb, mlp.weights[1:], mlp.biases[1:])
    assert out is not None and out.shape == (2, lvl.n_pad_nodes, 128)
    single = fused_edge_mlp_aggregate(lvl, preb[0], mlp.weights[1:], mlp.biases[1:])
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(single), rtol=1e-5, atol=1e-5
    )


def test_gmp_fused_method_matches_ell(setup, rng):
    lvl, _, pos = setup
    params = init_gmp(jax.random.PRNGKey(1), latent_dim=128, hidden_layer=3, pos_dim=2)
    n = lvl.n_nodes
    x = np.zeros((lvl.n_pad_nodes, 128), np.float32)
    x[:n] = rng.standard_normal((n, 128)).astype(np.float32)
    posp = np.zeros((lvl.n_pad_nodes, 2), np.float32)
    posp[:n] = pos
    got = gmp_apply(params, lvl, jnp.asarray(x), jnp.asarray(posp), "fused")
    want = gmp_apply(params, lvl, jnp.asarray(x), jnp.asarray(posp), "ell")
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want)[:n], rtol=1e-3, atol=1e-4
    )


def test_fused_fallback_nonsquare(setup):
    lvl, _, _ = setup
    mlp_small = init_mlp(jax.random.PRNGKey(2), 64, 64, 64, hidden_layers=1)
    pre = jnp.ones((lvl.n_pad_edges, 64), jnp.float32)
    assert fused_edge_mlp_aggregate(lvl, pre, mlp_small.weights[1:], mlp_small.biases[1:]) is None


def test_trainer_pallas_matches_ell_over_steps():
    """Full train-step integration: the pallas (fused) path must track the
    ell path's losses and parameter updates over several steps."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.training import Trainer

    def run(agg):
        cfg = load_config([
            "model.unet_depth=2", "model.latent_dim=128", "model.hidden_layer=3",
            "model.accumulation_steps=1", f"model.aggregation={agg}",
            "opt.warmup_steps=2", "opt.decay_steps=20",
        ])
        pos, cells = make_grid_mesh(8, 8)
        edges = to_flat_edge(cells, "tri")
        h = build_hierarchy(edges, 2, pos.shape[0], pos, pad_multiple=128)
        n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
        rng = np.random.default_rng(5)
        B, c = 2, 3
        node_in = np.zeros((B, n_pad, c + 3), np.float32)
        node_in[:, :n, :c] = rng.standard_normal((B, n, c))
        node_in[:, :n, c:c + 2] = pos
        node_tar = np.zeros((B, n_pad, c), np.float32)
        node_tar[:, :n] = node_in[:, :n, :c] + 0.05
        mask = np.zeros((B, n_pad, 1), np.float32)
        mask[:, :n] = 1.0
        tr = Trainer(cfg)
        key = jax.random.PRNGKey(9)
        losses = [
            float(tr.iter(h, jnp.asarray(node_in), jnp.asarray(node_tar),
                          jnp.asarray(mask), jax.random.fold_in(key, i)))
            for i in range(4)
        ]
        return losses, tr.state.sim.params

    l_ell, p_ell = run("ell")
    for method in ("pallas", "fused"):
        l_m, p_m = run(method)
        np.testing.assert_allclose(l_m, l_ell, rtol=1e-3, atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_ell)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
    # Sanity: losses actually evolve (the step is doing real work).
    assert len({round(x, 6) for x in l_ell}) > 1


def test_fused_bf16_mode_close_to_f32(setup, rng):
    """bf16 `pre` selects the single-pass bf16 MXU path; results must stay
    within bf16 rounding of the f32 kernel, and grads must stay finite and
    close (the large-scale inference/training recipe relies on this mode)."""
    lvl, mlp, _ = setup
    pre32 = jnp.asarray(
        rng.standard_normal((lvl.n_pad_edges, 128)).astype(np.float32)
    )
    ws, bs = tuple(mlp.weights[1:]), tuple(mlp.biases[1:])
    out32 = fused_edge_mlp_aggregate(lvl, pre32, ws, bs)
    out16 = fused_edge_mlp_aggregate(lvl, pre32.astype(jnp.bfloat16), ws, bs)
    assert out16.dtype == jnp.float32  # f32 accumulation
    n = lvl.n_nodes
    np.testing.assert_allclose(
        np.asarray(out16)[:n], np.asarray(out32)[:n], rtol=0.1, atol=0.15
    )

    cot = jnp.asarray(
        rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32)
    )

    def loss(pre, ws, bs):
        return jnp.vdot(fused_edge_mlp_aggregate(lvl, pre, ws, bs), cot)

    g16 = jax.grad(loss, argnums=(0, 1, 2))(pre32.astype(jnp.bfloat16), ws, bs)
    g32 = jax.grad(loss, argnums=(0, 1, 2))(pre32, ws, bs)
    assert g16[0].dtype == jnp.bfloat16
    # bf16-rounded `pre` flips ReLU masks right at the boundary, so isolated
    # elements legitimately differ by O(1); require directional agreement
    # and matching scale rather than elementwise closeness.
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a, b = np.asarray(a, np.float32).ravel(), np.asarray(b, np.float32).ravel()
        assert np.isfinite(a).all()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99
        assert 0.9 < np.linalg.norm(a) / (np.linalg.norm(b) + 1e-12) < 1.1


def test_fused_edge_phase_v2_matches_unfused(setup, rng):
    """v2 kernel (in-kernel receiver gather + pre assembly): forward parity
    with the composed unfused expression and full gradient parity (zi, xj,
    weights, biases)."""
    from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase
    from bsms_gnn_tpu.ops.scatter import gather_recv

    lvl, mlp, _ = setup
    zi = jnp.asarray(rng.standard_normal((lvl.n_pad_edges, 128)).astype(np.float32))
    xj = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32))
    ws, bs = tuple(mlp.weights[1:]), tuple(mlp.biases[1:])

    def unfused(zi, xj, ws, bs):
        pre = zi + gather_recv(lvl, xj, "ell")
        e = mlp_apply_tail(mlp.replace(weights=(mlp.weights[0],) + tuple(ws),
                                       biases=(mlp.biases[0],) + tuple(bs)),
                           pre)
        return aggregate_recv(lvl, e, "ell")

    out = fused_edge_phase(lvl, zi, xj, ws, bs)
    assert out is not None
    want = unfused(zi, xj, ws, bs)
    n = lvl.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(want)[:n], rtol=1e-4, atol=1e-4
    )

    cot = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32))
    cot = cot * jnp.asarray(lvl.node_mask)  # pad-node cotangents are masked

    g_f = jax.grad(
        lambda a, b, w, c_: jnp.vdot(fused_edge_phase(lvl, a, b, w, c_), cot),
        argnums=(0, 1, 2, 3),
    )(zi, xj, ws, bs)
    g_u = jax.grad(
        lambda a, b, w, c_: jnp.vdot(unfused(a, b, w, c_), cot),
        argnums=(0, 1, 2, 3),
    )(zi, xj, ws, bs)
    real_e = np.flatnonzero(np.asarray(lvl.edge_mask) > 0)
    np.testing.assert_allclose(
        np.asarray(g_f[0])[real_e], np.asarray(g_u[0])[real_e],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_f[1])[: lvl.n_nodes], np.asarray(g_u[1])[: lvl.n_nodes],
        rtol=1e-4, atol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(g_f[2:]), jax.tree.leaves(g_u[2:])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_fused_edge_phase_v2_batched(setup, rng):
    from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase

    lvl, mlp, _ = setup
    zi = jnp.asarray(
        rng.standard_normal((2, lvl.n_pad_edges, 128)).astype(np.float32)
    )
    xj = jnp.asarray(
        rng.standard_normal((2, lvl.n_pad_nodes, 128)).astype(np.float32)
    )
    ws, bs = tuple(mlp.weights[1:]), tuple(mlp.biases[1:])
    out = fused_edge_phase(lvl, zi, xj, ws, bs)
    assert out is not None and out.shape == (2, lvl.n_pad_nodes, 128)
    single = fused_edge_phase(lvl, zi[1], xj[1], ws, bs)
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(single), rtol=1e-6, atol=1e-6
    )


def test_fused_under_remat(setup, rng):
    """jax.checkpoint re-traces the forward inside the backward; the fused
    custom-VJP pair must not capture outer-trace chunk tables (regression:
    UnexpectedTracerError in the remat train mode at 1M scale)."""
    from bsms_gnn_tpu.ops.message import gmp_apply

    lvl, _, _ = setup
    p = init_gmp(jax.random.PRNGKey(3), 128, 3, 2)
    x = jnp.asarray(rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((lvl.n_pad_nodes, 128)).astype(np.float32)
    )

    @functools.partial(jax.jit, static_argnums=1)
    def loss(x, method):
        f = jax.checkpoint(lambda v: gmp_apply(p, lvl, v, None, method))
        return jnp.vdot(f(x), cot)

    g_e = jax.grad(loss)(x, "ell")
    n = lvl.n_nodes
    for method in ("fused", "pallas"):
        g_m = jax.grad(loss)(x, method)
        np.testing.assert_allclose(
            np.asarray(g_m)[:n], np.asarray(g_e)[:n], rtol=1e-4, atol=1e-4
        )

    # The transition-conv adjoint pair under checkpoint as well.
    from bsms_gnn_tpu.ops.message import edge_conv_down

    ew = jnp.asarray(
        (rng.standard_normal(lvl.n_pad_edges)
         * np.asarray(lvl.edge_mask)).astype(np.float32)
    )

    @functools.partial(jax.jit, static_argnums=1)
    def closs(x, method):
        f = jax.checkpoint(lambda v: edge_conv_down(lvl, v, ew, method))
        return jnp.vdot(f(x), cot)

    gc_e = jax.grad(closs)(x, "ell")
    gc_p = jax.grad(closs)(x, "pallas")
    np.testing.assert_allclose(
        np.asarray(gc_p)[:n], np.asarray(gc_e)[:n], rtol=1e-4, atol=1e-4
    )
