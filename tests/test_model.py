"""Normalizer + simulator tests: accumulation math vs the reference
recurrence, forward shape/mask semantics, warmup behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.models import (
    init_normalizer,
    normalizer_accumulate,
    normalize,
    denormalize,
    normalizer_mean,
    normalizer_std,
    init_simulator,
    simulator_forward,
    simulator_warmup,
)


def _reference_normalizer_update(w, ex, ex2, data, unit=1e6):
    """The recurrence from reference normalizer.py:55-71 in NumPy f64."""
    data = data.reshape(-1, ex.shape[0]).astype(np.float64)
    dw = data.shape[0] / unit
    neww = w + dw
    ex = (ex * w + data.mean(0) * dw) / neww
    ex2 = (ex2 * w + (data**2).mean(0) * dw) / neww
    return neww, ex, ex2


def test_normalizer_matches_reference_recurrence(rng):
    size = 3
    st = init_normalizer(size, dtype=jnp.float64) if jax.config.jax_enable_x64 else init_normalizer(size)
    w, ex, ex2 = 0.0, np.zeros(size), np.zeros(size)
    for i in range(5):
        data = rng.standard_normal((40, size)).astype(np.float32) * (i + 1)
        st = normalizer_accumulate(st, jnp.asarray(data))
        w, ex, ex2 = _reference_normalizer_update(w, ex, ex2, data)
    np.testing.assert_allclose(np.asarray(st.acc_weight), w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.e_x), ex, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.e_x2), ex2, rtol=1e-4, atol=1e-6)
    assert float(st.num_accumulations) == 5.0

    std_ref = np.maximum(np.nan_to_num(np.sqrt(ex2 - ex**2)), 1e-8)
    np.testing.assert_allclose(np.asarray(normalizer_std(st)), std_ref, rtol=1e-3)

    x = rng.standard_normal((7, size)).astype(np.float32)
    norm = normalize(st, jnp.asarray(x))
    back = denormalize(st, norm)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-4)


def test_normalizer_mask_excludes_rows(rng):
    size = 2
    st_m = init_normalizer(size)
    st_u = init_normalizer(size)
    data = rng.standard_normal((10, size)).astype(np.float32)
    mask = np.zeros((10, 1), np.float32)
    mask[:6] = 1.0
    st_m = normalizer_accumulate(st_m, jnp.asarray(data), jnp.asarray(mask))
    st_u = normalizer_accumulate(st_u, jnp.asarray(data[:6]))
    np.testing.assert_allclose(np.asarray(st_m.e_x), np.asarray(st_u.e_x), rtol=1e-5)
    np.testing.assert_allclose(
        float(st_m.acc_weight), float(st_u.acc_weight), rtol=1e-6
    )


def test_normalizer_caps_accumulation(rng):
    st = init_normalizer(1, max_accumulations=2)
    for _ in range(4):
        st = normalizer_accumulate(st, jnp.ones((5, 1)))
    assert float(st.num_accumulations) == 2.0


def _tiny_setup(batch=None):
    cfg = load_config(["model.unet_depth=2", "model.latent_dim=16",
                       "model.hidden_layer=1", "datasets.pad_multiple=16"])
    pos, cells = make_grid_mesh(7, 7)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 2, pos.shape[0], pos, pad_multiple=16)
    n_pad = h.levels[0].n_pad_nodes
    n = pos.shape[0]
    rng = np.random.default_rng(7)
    c_in = cfg.model.out_dim + cfg.model.pos_dim + 1
    shape = (n_pad, c_in) if batch is None else (batch, n_pad, c_in)
    node_in = np.zeros(shape, np.float32)
    node_in[..., :n, : cfg.model.out_dim] = rng.standard_normal(
        (shape[:-2] + (n, cfg.model.out_dim))
    )
    node_in[..., :n, cfg.model.out_dim:cfg.model.out_dim + 2] = pos.astype(np.float32)
    node_tar = np.zeros(shape[:-1] + (cfg.model.out_dim,), np.float32)
    node_tar[..., :n, :] = rng.standard_normal(shape[:-2] + (n, cfg.model.out_dim))
    mask = np.zeros(shape[:-1] + (1,), np.float32)
    mask[..., :n, :] = 1.0
    return cfg, h, node_in, node_tar, mask, n


def test_simulator_forward_shapes_and_mask():
    cfg, h, node_in, node_tar, mask, n = _tiny_setup()
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    pred = simulator_forward(
        state.params, state.norm_in, state.norm_out, h,
        jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
    )
    assert pred.shape == node_tar.shape
    # Masked (invalid) nodes predict exactly their input state: delta zeroed.
    pred_np = np.asarray(pred)
    np.testing.assert_allclose(
        pred_np[n:], node_in[n:, : cfg.model.out_dim], atol=1e-6
    )
    assert np.all(np.isfinite(pred_np))


def test_simulator_forward_batched_consistency():
    cfg, h, node_in, node_tar, mask, n = _tiny_setup(batch=3)
    state = init_simulator(jax.random.PRNGKey(1), cfg.model)
    pred_b = simulator_forward(
        state.params, state.norm_in, state.norm_out, h,
        jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
    )
    pred_0 = simulator_forward(
        state.params, state.norm_in, state.norm_out, h,
        jnp.asarray(node_in[0]), jnp.asarray(mask[0]), cfg.model,
    )
    np.testing.assert_allclose(
        np.asarray(pred_b[0]), np.asarray(pred_0), rtol=2e-4, atol=2e-4
    )


def test_simulator_warmup_accumulates():
    cfg, h, node_in, node_tar, mask, n = _tiny_setup()
    state = init_simulator(jax.random.PRNGKey(2), cfg.model)
    pad_mask = np.asarray(h.levels[0].node_mask)
    st2 = simulator_warmup(state, jnp.asarray(node_in), jnp.asarray(node_tar),
                           cfg.model, jnp.asarray(pad_mask))
    assert float(st2.norm_in.num_accumulations) == 1.0
    assert float(st2.norm_out.num_accumulations) == 1.0
    # Mean over valid rows of the latent input's first channel.
    want = node_in[:n, 0].mean()
    np.testing.assert_allclose(float(st2.norm_in.e_x[0]), want, rtol=1e-4)


def test_simulator_remat_matches():
    cfg, h, node_in, node_tar, mask, n = _tiny_setup()
    state = init_simulator(jax.random.PRNGKey(4), cfg.model)
    base = simulator_forward(
        state.params, state.norm_in, state.norm_out, h,
        jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
    )
    cfg.model.remat = True
    rem = simulator_forward(
        state.params, state.norm_in, state.norm_out, h,
        jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(rem), rtol=1e-5, atol=1e-6)
    # Gradients flow through the rematerialized processor.
    def loss(p):
        out = simulator_forward(p, state.norm_in, state.norm_out, h,
                                jnp.asarray(node_in), jnp.asarray(mask), cfg.model)
        return jnp.sum(out * out)
    g = jax.grad(loss)(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g))


def test_selective_remat_grads_match_full_remat():
    """remat_min_nodes checkpoints only the levels at/above the threshold;
    loss and gradients must equal both full remat and no remat."""
    cfg, h, node_in, node_tar, mask, n = _tiny_setup()
    state = init_simulator(jax.random.PRNGKey(4), cfg.model)

    def grads(remat, min_nodes=0):
        cfg.model.remat = remat
        cfg.model.remat_min_nodes = min_nodes

        def loss(p):
            out = simulator_forward(p, state.norm_in, state.norm_out, h,
                                    jnp.asarray(node_in), jnp.asarray(mask),
                                    cfg.model)
            return jnp.sum(out * out)

        return jax.tree_util.tree_leaves(jax.grad(loss)(state.params))

    # Threshold between level sizes so some GMPs checkpoint and some don't.
    mid = h.levels[1].n_pad_nodes
    full, sel, off = grads(True), grads(True, mid), grads(False)
    for a, b in zip(full, sel):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(full, off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
