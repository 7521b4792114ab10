"""Multi-chip SPMD tests on the 8-device virtual CPU mesh: data-parallel and
edge-partitioned steps must be numerically equivalent to the single-device
trainer (same batch, same key → same loss and updated params)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.hierarchy import build_hierarchy
from bsms_gnn_tpu.parallel import (
    make_mesh,
    make_spmd_train_step,
    replicate_state,
    shard_batch,
    shard_hierarchy,
)
from bsms_gnn_tpu.training import Trainer


def _setup(agg="ell"):
    cfg = load_config([
        "model.unet_depth=2", "model.latent_dim=16", "model.hidden_layer=1",
        "model.accumulation_steps=1", f"model.aggregation={agg}",
        "opt.warmup_steps=2", "opt.decay_steps=20",
    ])
    pos, cells = make_grid_mesh(9, 9)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 2, pos.shape[0], pos, pad_multiple=32)
    n_pad = h.levels[0].n_pad_nodes
    n = pos.shape[0]
    rng = np.random.default_rng(11)
    B = 8
    c = cfg.model.out_dim
    node_in = np.zeros((B, n_pad, c + 3), np.float32)
    node_in[:, :n, :c] = rng.standard_normal((B, n, c))
    node_in[:, :n, c:c + 2] = pos
    node_tar = np.zeros((B, n_pad, c), np.float32)
    node_tar[:, :n] = node_in[:, :n, :c] + 0.05
    mask = np.zeros((B, n_pad, 1), np.float32)
    mask[:, :n] = 1.0
    return cfg, h, jnp.asarray(node_in), jnp.asarray(node_tar), jnp.asarray(mask)


def _run_single(cfg, h, ni, nt, nm, steps=3):
    tr = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    losses = [
        float(tr.iter(h, ni, nt, nm, jax.random.fold_in(key, i)))
        for i in range(steps)
    ]
    return tr, losses


@pytest.mark.parametrize("shape,agg", [((8, 1), "ell"), ((2, 4), "ell"), ((2, 4), "segment")])
def test_spmd_matches_single_device(shape, agg):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg, h, ni, nt, nm = _setup(agg)
    tr_ref, losses_ref = _run_single(cfg, h, ni, nt, nm)

    mesh = make_mesh(*shape)
    tr = Trainer(cfg)
    h_dev = shard_hierarchy(h, mesh)
    step = make_spmd_train_step(tr, mesh, h)
    state = replicate_state(mesh, tr.state)
    ni_s, nt_s, nm_s = shard_batch(mesh, ni, nt, nm)
    key = jax.random.PRNGKey(5)
    losses = []
    for i in range(3):
        state, loss = step(state, h_dev, ni_s, nt_s, nm_s, jax.random.fold_in(key, i))
        losses.append(float(loss))

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.sim.params),
        jax.tree_util.tree_leaves(tr_ref.state.sim.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
    # Normalizer accumulated identically (warmup step 0).
    np.testing.assert_allclose(
        np.asarray(state.sim.norm_in.e_x),
        np.asarray(tr_ref.state.sim.norm_in.e_x),
        rtol=1e-4, atol=1e-6,
    )


def test_batch_sharded_across_devices():
    cfg, h, ni, nt, nm = _setup()
    mesh = make_mesh(8, 1)
    ni_s, _, _ = shard_batch(mesh, ni, nt, nm)
    assert len(ni_s.sharding.device_set) == 8


def test_global_mesh_and_multihost_single_process():
    from bsms_gnn_tpu.parallel.multihost import global_mesh, init_multihost

    init_multihost()  # single-process: must be a no-op, not an error
    mesh = global_mesh(graph=2)
    assert mesh.shape["graph"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2
