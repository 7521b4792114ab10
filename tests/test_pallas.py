"""Pallas segment-sum kernel tests (interpret mode on CPU): forward parity
with the ELL/segment paths, gradient parity, and fallback conditions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.ops.scatter import aggregate_recv
from bsms_gnn_tpu.ops.pallas.segment_sum import segment_sum_pallas


@pytest.fixture(scope="module", params=[128, 512], ids=["eb128", "eb512"])
def level(request):
    pos, cells = make_grid_mesh(12, 12)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(
        edges, 1, pos.shape[0], pos, pad_multiple=128,
        edge_block=request.param,
    )
    assert h.levels[0].edge_block == request.param
    assert h.levels[0].n_pad_edges % request.param == 0
    return h.levels[0]


def test_pallas_forward_matches_ell(level, rng):
    feat = jnp.asarray(
        rng.standard_normal((level.n_pad_edges, 128)).astype(np.float32)
    )
    out = segment_sum_pallas(level, feat)
    assert out is not None
    want = aggregate_recv(level, feat, "ell")
    n = level.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(want)[:n], rtol=1e-5, atol=1e-5
    )
    # Pallas also accumulates pad edges onto the pad node (segment
    # semantics); just check finiteness there.
    assert np.all(np.isfinite(np.asarray(out)))


def test_pallas_method_via_aggregate(level, rng):
    feat = jnp.asarray(
        rng.standard_normal((level.n_pad_edges, 128)).astype(np.float32)
    )
    out = aggregate_recv(level, feat, "pallas")
    want = aggregate_recv(level, feat, "segment")
    np.testing.assert_allclose(
        np.asarray(out)[: level.n_nodes],
        np.asarray(want)[: level.n_nodes],
        rtol=1e-5, atol=1e-5,
    )


def test_pallas_grad_matches(level, rng):
    feat = jnp.asarray(
        rng.standard_normal((level.n_pad_edges, 128)).astype(np.float32)
    )
    cot = jnp.asarray(
        rng.standard_normal((level.n_pad_nodes, 128)).astype(np.float32)
    )
    g_p = jax.grad(lambda f: jnp.vdot(aggregate_recv(level, f, "pallas"), cot))(feat)
    g_s = jax.grad(lambda f: jnp.vdot(aggregate_recv(level, f, "segment"), cot))(feat)
    slots = np.flatnonzero(np.asarray(level.edge_mask) > 0)
    np.testing.assert_allclose(
        np.asarray(g_p)[slots], np.asarray(g_s)[slots], rtol=1e-5, atol=1e-5
    )


def test_pallas_fallback_conditions(level, rng):
    # C not multiple of 128 → fallback (returns None).
    feat = jnp.ones((level.n_pad_edges, 64), jnp.float32)
    assert segment_sum_pallas(level, feat) is None
    # aggregate_recv still works through the fallback.
    out = aggregate_recv(level, jnp.ones((2, level.n_pad_edges, 64)), "pallas")
    assert out.shape == (2, level.n_pad_nodes, 64)


def test_pallas_batched_matches_single(level, rng):
    featb = jnp.asarray(
        rng.standard_normal((2, level.n_pad_edges, 128)).astype(np.float32)
    )
    out = segment_sum_pallas(level, featb)
    assert out is not None and out.shape == (2, level.n_pad_nodes, 128)
    single = segment_sum_pallas(level, featb[0])
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(single), rtol=1e-6, atol=1e-6
    )


def test_reverse_perm_and_send_aggregation(level, rng):
    # reverse_perm is an involution on real slots mapping (s,r)→(r,s).
    from bsms_gnn_tpu.ops.pallas.segment_sum import segment_sum_send_pallas

    rp = np.asarray(level.reverse_perm)
    real = np.asarray(level.edge_mask) > 0
    s_arr, r_arr = np.asarray(level.senders), np.asarray(level.receivers)
    idx = np.flatnonzero(real)
    np.testing.assert_array_equal(rp[rp[idx]], idx)
    np.testing.assert_array_equal(s_arr[rp[idx]], r_arr[idx])
    np.testing.assert_array_equal(r_arr[rp[idx]], s_arr[idx])

    feat = jnp.asarray(
        rng.standard_normal((level.n_pad_edges, 128)).astype(np.float32)
    )
    out = segment_sum_send_pallas(level, feat)
    assert out is not None
    want = aggregate_recv  # silence lint
    from bsms_gnn_tpu.ops.scatter import aggregate_send

    want = aggregate_send(level, feat, "ell")
    n = level.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(want)[:n], rtol=1e-5, atol=1e-5
    )
    # Grad parity on real slots.
    cot = jnp.asarray(rng.standard_normal((level.n_pad_nodes, 128)).astype(np.float32))
    g_p = jax.grad(lambda f: jnp.vdot(aggregate_send(level, f, "pallas"), cot))(feat)
    g_s = jax.grad(lambda f: jnp.vdot(aggregate_send(level, f, "segment"), cot))(feat)
    np.testing.assert_allclose(
        np.asarray(g_p)[idx], np.asarray(g_s)[idx], rtol=1e-5, atol=1e-5
    )


def test_conv_adjoint_pair_matches_ell(level, rng):
    """The pallas/fused conv fast path (ops/message.py adjoint pair):
    forward parity for down AND up convs vs the ELL path, and gradient
    parity through the custom-VJP pair (convᵀ_down = conv_up)."""
    from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up

    n = level.n_nodes
    x = jnp.asarray(rng.standard_normal((level.n_pad_nodes, 128)).astype(np.float32))
    ew = rng.standard_normal(level.n_pad_edges).astype(np.float32)
    ew *= np.asarray(level.edge_mask).astype(np.float32)  # pad slots carry 0
    ew = jnp.asarray(ew)

    for conv in (edge_conv_down, edge_conv_up):
        fast = conv(level, x, ew, "pallas")
        want = conv(level, x, ew, "ell")
        np.testing.assert_allclose(
            np.asarray(fast)[:n], np.asarray(want)[:n], rtol=1e-5, atol=1e-5
        )

    cot = jnp.asarray(rng.standard_normal((level.n_pad_nodes, 128)).astype(np.float32))
    for conv in (edge_conv_down, edge_conv_up):
        g_fast = jax.grad(lambda v: jnp.vdot(conv(level, v, ew, "pallas"), cot))(x)
        g_ell = jax.grad(lambda v: jnp.vdot(conv(level, v, ew, "ell"), cot))(x)
        np.testing.assert_allclose(
            np.asarray(g_fast)[:n], np.asarray(g_ell)[:n], rtol=1e-4, atol=1e-4
        )

    # Batched [B, N, C] goes through the same fast path.
    xb = jnp.stack([x, 2.0 * x])
    for conv in (edge_conv_down, edge_conv_up):
        fastb = conv(level, xb, ew, "pallas")
        single = conv(level, x, ew, "pallas")
        np.testing.assert_allclose(
            np.asarray(fastb[0]), np.asarray(single), rtol=1e-6, atol=1e-6
        )


def test_fused_agg_node_phase_matches_unfused(level, rng):
    """ops/pallas/agg_node.py: aggregation + node MLP + LN + residual in one
    kernel must match segment-sum followed by the node-phase math (values
    AND grads to feat/x/weights), masked to real nodes."""
    from bsms_gnn_tpu.ops.dense import init_mlp, mlp_apply_tail, dense
    from bsms_gnn_tpu.ops.pallas.agg_node import fused_aggregate_node_phase

    c = 128
    mlp = init_mlp(jax.random.PRNGKey(4), 2 * c, c, c, 2, True)
    feat = jnp.asarray(
        rng.standard_normal((level.n_pad_edges, c)).astype(np.float32)
    )
    x = jnp.asarray(
        (rng.standard_normal((level.n_pad_nodes, c))
         * np.asarray(level.node_mask)).astype(np.float32)
    )
    mask = jnp.asarray(level.node_mask)

    def unfused(feat, x, mlp):
        aggr = aggregate_recv(level, feat, "segment")
        wn = mlp.weights[0]
        pre = dense(x, wn[:c], mlp.biases[0]) + dense(aggr, wn[c:], 0.0)
        return mlp_apply_tail(mlp, pre) + x

    out = fused_aggregate_node_phase(level, feat, x, mlp)
    assert out is not None
    want = unfused(feat, x, mlp)
    n = level.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(want)[:n], rtol=2e-5, atol=2e-5
    )

    def loss_fused(feat, x, mlp):
        return jnp.sum(jnp.square(
            fused_aggregate_node_phase(level, feat, x, mlp) * mask
        ))

    def loss_unfused(feat, x, mlp):
        return jnp.sum(jnp.square(unfused(feat, x, mlp) * mask))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(feat, x, mlp)
    gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(feat, x, mlp)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gu)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-4, atol=2e-5
        )


def test_fused_agg_node_phase_batched(level, rng):
    from bsms_gnn_tpu.ops.dense import init_mlp, mlp_apply_tail, dense
    from bsms_gnn_tpu.ops.pallas.agg_node import fused_aggregate_node_phase

    c = 128
    mlp = init_mlp(jax.random.PRNGKey(5), 2 * c, c, c, 2, True)
    feat = jnp.asarray(
        rng.standard_normal((3, level.n_pad_edges, c)).astype(np.float32)
    )
    x = jnp.asarray(
        (rng.standard_normal((3, level.n_pad_nodes, c))
         * np.asarray(level.node_mask)).astype(np.float32)
    )
    out = fused_aggregate_node_phase(level, feat, x, mlp)
    assert out is not None
    aggr = aggregate_recv(level, feat, "segment")
    wn = mlp.weights[0]
    pre = dense(x, wn[:c], mlp.biases[0]) + dense(aggr, wn[c:], 0.0)
    want = mlp_apply_tail(mlp, pre) + x
    n = level.n_nodes
    np.testing.assert_allclose(
        np.asarray(out)[:, :n], np.asarray(want)[:, :n], rtol=2e-5, atol=2e-5
    )
