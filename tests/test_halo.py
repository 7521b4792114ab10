"""Explicit halo-exchange edge partitioning (shard_map) must match the
single-device model exactly: partition round-trip, forward, loss, gradients,
one full train step incl. the normalizer warmup, on the 8-virtual-device CPU
mesh (SURVEY.md §5.7, BASELINE.md edge-partitioned north star)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.config import Config, DatasetConfig, ModelConfig, OptConfig
from bsms_gnn_tpu.graph.bistride import build_bistride_levels
from bsms_gnn_tpu.graph.hierarchy import pad_levels
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.models.simulator import simulator_forward
from bsms_gnn_tpu.parallel import (
    build_partition,
    make_halo_forward,
    make_halo_train_step,
    make_mesh,
    partition_nodes,
    unpartition_nodes,
)
from bsms_gnn_tpu.parallel.halo import (
    aggregate_recv as h_aggregate_recv,
    aggregate_send as h_aggregate_send,
    gather_send as h_gather_send,
)
from bsms_gnn_tpu.training import Trainer

OUT = 3


def _cfg(**model_kw):
    model = dict(
        unet_depth=2, latent_dim=16, hidden_layer=1, out_dim=OUT,
        accumulation_steps=1, aggregation="ell",
    )
    model.update(model_kw)
    return Config(
        datasets=DatasetConfig(noise_level=[0.0] * OUT),
        model=ModelConfig(**model),
        opt=OptConfig(warmup_steps=2, decay_steps=20),
    )


def _setup(n_shards=4, local_layouts=False, window=0, replicate_floor=0,
           ghost_floor=0, **model_kw):
    cfg = _cfg(**model_kw)
    pos, cells = make_grid_mesh(9, 9)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels = build_bistride_levels(edges, cfg.model.unet_depth, n, pos)
    h = pad_levels(levels, pad_multiple=32, pos=pos)
    n_pad = h.levels[0].n_pad_nodes
    plan = build_partition(levels, n_shards, n_pad, pos, block=32,
                           local_layouts=local_layouts, window=window,
                           replicate_floor=replicate_floor,
                           ghost_floor=ghost_floor)

    rng = np.random.default_rng(3)
    node_in = np.zeros((n_pad, OUT + 3), np.float32)
    node_in[:n, :OUT] = rng.standard_normal((n, OUT))
    node_in[:n, OUT:OUT + 2] = pos
    node_tar = np.zeros((n_pad, OUT), np.float32)
    node_tar[:n] = node_in[:n, :OUT] + 0.05 * rng.standard_normal((n, OUT))
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = 1.0
    return cfg, h, plan, n, node_in, node_tar, mask


def test_partition_round_trip():
    _, _, plan, n, node_in, _, _ = _setup()
    sh = partition_nodes(plan, node_in)
    assert sh.shape[0] == 4
    back = unpartition_nodes(plan, sh)
    np.testing.assert_array_equal(back, node_in)


def test_halo_primitives_match_global():
    """gather_send / aggregate_recv / aggregate_send on the partitioned
    level equal the global dense-graph operations."""
    _, h, plan, n, _, _, _ = _setup()
    level_g = h.levels[0]
    level_s = plan.hierarchy.levels[0]
    rng = np.random.default_rng(0)
    c = 5
    x = np.zeros((plan.n_global, c), np.float32)
    x[:n] = rng.standard_normal((n, c))

    mesh = make_mesh(1, 4)
    x_sh = jnp.asarray(partition_nodes(plan, x))
    from jax.sharding import PartitionSpec as P

    spec = jax.tree_util.tree_map(lambda _: P("graph"), level_s)

    def agg_roundtrip(lvl_s, xs):
        lvl = jax.tree_util.tree_map(lambda a: a[0], lvl_s)
        xe = h_gather_send(lvl, xs[0], "graph")
        down = h_aggregate_recv(lvl, xe, "graph")
        up = h_aggregate_send(lvl, xe, "graph")
        return down[None], up[None]

    down_s, up_s = jax.shard_map(
        agg_roundtrip, mesh=mesh,
        in_specs=(spec, P("graph")), out_specs=(P("graph"), P("graph")),
        check_vma=False,
    )(level_s, x_sh)

    # Global reference: for each node, sum of x[sender] over in-edges /
    # out-edges.
    snd, rcv = level_g.senders, level_g.receivers
    em = level_g.edge_mask
    xe = x[snd] * em[:, None]
    down_g = np.zeros_like(x)
    np.add.at(down_g, rcv, xe)
    up_g = np.zeros_like(x)
    np.add.at(up_g, snd, xe)

    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(down_s))[:n], down_g[:n],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(up_s))[:n], up_g[:n],
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("c", [5, 128])
def test_ghost_primitives_match_global(c):
    """The ghost-edge kernel layout (build_partition(local_layouts=True)):
    gather_send / aggregate_recv / aggregate_send under shard_map equal the
    global dense-graph operations. c=128 drives the Pallas segment kernels
    (interpret mode on CPU); c=5 drives the XLA fallbacks."""
    _, h, plan, n, _, _, _ = _setup(local_layouts=True)
    level_g = h.levels[0]
    level_s = plan.hierarchy.levels[0]
    assert level_s.local is not None
    rng = np.random.default_rng(0)
    x = np.zeros((plan.n_global, c), np.float32)
    x[:n] = rng.standard_normal((n, c))

    mesh = make_mesh(1, 4)
    x_sh = jnp.asarray(partition_nodes(plan, x))
    from jax.sharding import PartitionSpec as P

    spec = jax.tree_util.tree_map(lambda _: P("graph"), level_s)

    def agg_roundtrip(lvl_s, xs):
        lvl = jax.tree_util.tree_map(lambda a: a[0], lvl_s)
        xe = h_gather_send(lvl, xs[0], "graph")
        down = h_aggregate_recv(lvl, xe, "graph")
        up = h_aggregate_send(lvl, xe, "graph")
        return down[None], up[None]

    down_s, up_s = jax.shard_map(
        agg_roundtrip, mesh=mesh,
        in_specs=(spec, P("graph")), out_specs=(P("graph"), P("graph")),
        check_vma=False,
    )(level_s, x_sh)

    snd, rcv = level_g.senders, level_g.receivers
    em = level_g.edge_mask
    xe = x[snd] * em[:, None]
    down_g = np.zeros_like(x)
    np.add.at(down_g, rcv, xe)
    up_g = np.zeros_like(x)
    np.add.at(up_g, snd, xe)

    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(down_s))[:n], down_g[:n],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(up_s))[:n], up_g[:n],
        rtol=1e-5, atol=1e-5,
    )


def test_ghost_conv_pair_matches_global():
    """Ghost transition convs (one ext gather + local kernel each way)
    against the global weighted conv, values and adjointness."""
    _, h, plan, n, _, _, _ = _setup(local_layouts=True)
    from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up
    from jax.sharding import PartitionSpec as P

    level_g = h.levels[0]
    level_s = plan.hierarchy.levels[0]
    rng = np.random.default_rng(1)
    c = 4
    x = np.zeros((plan.n_global, c), np.float32)
    x[:n] = rng.standard_normal((n, c))
    mesh = make_mesh(1, 4)
    x_sh = jnp.asarray(partition_nodes(plan, x))
    spec = jax.tree_util.tree_map(lambda _: P("graph"), level_s)

    def convs(lvl_s, xs):
        lvl = jax.tree_util.tree_map(lambda a: a[0], lvl_s)
        d = edge_conv_down(lvl, xs[0], None, "halo:graph")
        u = edge_conv_up(lvl, xs[0], None, "halo:graph")
        return d[None], u[None]

    down_s, up_s = jax.shard_map(
        convs, mesh=mesh, in_specs=(spec, P("graph")),
        out_specs=(P("graph"), P("graph")), check_vma=False,
    )(level_s, x_sh)

    down_ref = np.asarray(edge_conv_down(level_g, jnp.asarray(x), None, "ell"))
    up_ref = np.asarray(edge_conv_up(level_g, jnp.asarray(x), None, "ell"))
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(down_s))[:n], down_ref[:n],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(up_s))[:n], up_ref[:n],
        rtol=1e-5, atol=1e-5,
    )


def test_ghost_windowed_conv_matches_global():
    """Windowed ghost layouts (build_partition(window=128)): the per-shard
    transition convs run the windowed one-hot kernel + residual accumulate
    on the extended tables; values must match the global ell conv."""
    _, h, plan, n, _, _, _ = _setup(local_layouts=True, window=128)
    from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up
    from jax.sharding import PartitionSpec as P

    level_g = h.levels[0]
    level_s = plan.hierarchy.levels[0]
    assert level_s.local.window > 0
    rng = np.random.default_rng(2)
    c = 128  # kernel-eligible width
    x = np.zeros((plan.n_global, c), np.float32)
    x[:n] = rng.standard_normal((n, c))
    mesh = make_mesh(1, 4)
    x_sh = jnp.asarray(partition_nodes(plan, x))
    spec = jax.tree_util.tree_map(lambda _: P("graph"), level_s)

    def convs(lvl_s, xs):
        lvl = jax.tree_util.tree_map(lambda a: a[0], lvl_s)
        d = edge_conv_down(lvl, xs[0], None, "halo:graph")
        u = edge_conv_up(lvl, xs[0], None, "halo:graph")
        return d[None], u[None]

    down_s, up_s = jax.shard_map(
        convs, mesh=mesh, in_specs=(spec, P("graph")),
        out_specs=(P("graph"), P("graph")), check_vma=False,
    )(level_s, x_sh)

    down_ref = np.asarray(edge_conv_down(level_g, jnp.asarray(x), None, "ell"))
    up_ref = np.asarray(edge_conv_up(level_g, jnp.asarray(x), None, "ell"))
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(down_s))[:n], down_ref[:n],
        rtol=5e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        unpartition_nodes(plan, np.asarray(up_s))[:n], up_ref[:n],
        rtol=5e-5, atol=1e-5,
    )


def test_ghost_fused_forward_matches_single_device():
    """Full sharded forward with the windowed fused GMP edge phase per
    shard (aggregation=fused on a windowed ghost plan) vs the single-device
    ell model."""
    import dataclasses

    cfg, h, plan, n, node_in, _, mask = _setup(
        local_layouts=True, window=128, latent_dim=128,
        aggregation="fused",
    )
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)
    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))

    ref_cfg = dataclasses.replace(cfg.model, aggregation="ell")
    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), ref_cfg,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-3, atol=2e-4)


def test_ghost_fused_world_edges_forward():
    """Contact-case recipe on shards: world-space dynamic fibers through the
    v4 windowed fused edge phase per shard vs the single-device ell model."""
    import dataclasses

    cfg, h, plan, n, node_in, _, mask = _setup(
        local_layouts=True, window=128, latent_dim=128,
        aggregation="fused", world_edges=True, world_dim=2,
    )
    # world_edges: the first world_dim output channels are world positions.
    pos, _ = make_grid_mesh(9, 9)
    node_in = node_in.copy()
    node_in[:n, :2] = pos * 1.03 + 0.01

    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)
    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))

    ref_cfg = dataclasses.replace(cfg.model, aggregation="ell")
    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), ref_cfg,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-3, atol=2e-4)


def test_halo_rollout_matches_single_device():
    """Sharded closed-loop rollout (ghost layout) vs rollout_trajectory."""
    from bsms_gnn_tpu.parallel import make_halo_rollout
    from bsms_gnn_tpu.training import rollout_trajectory

    cfg, h, plan, n, node_in, _, mask = _setup(local_layouts=True)
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    n_steps = 4
    ro = make_halo_rollout(tr, mesh, plan, n_steps)
    preds_sh = ro(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )  # [S, T, N_loc, C]
    preds = unpartition_nodes(plan, np.asarray(preds_sh))  # [T, N_pad, C]

    preds_ref = np.asarray(rollout_trajectory(
        tr.state.sim, h, jnp.asarray(node_in), jnp.asarray(mask), n_steps,
        cfg.model,
    ))
    np.testing.assert_allclose(
        preds[:, :n], preds_ref[:, :n], rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("local_layouts", [False, True])
def test_halo_forward_matches_single_device(local_layouts):
    cfg, h, plan, n, node_in, _, mask = _setup(local_layouts=local_layouts)
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)

    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))

    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("local_layouts", [False, True])
@pytest.mark.parametrize("floor", [25, 45])
def test_replicated_forward_matches_single_device(local_layouts, floor):
    """Deep-level replication (replicate_floor): levels at/below the node
    floor are held in full on every shard (BASELINE.md row 3's padding
    fix). floor=25 replicates only the bottom level (boundary transition at
    depth 1); floor=45 replicates levels 1+2 (boundary at depth 0 plus a
    fully-replicated transition). Forward must match the single-device
    model exactly."""
    cfg, h, plan, n, node_in, _, mask = _setup(
        local_layouts=local_layouts, replicate_floor=floor
    )
    flags = [lvl.replicated for lvl in plan.hierarchy.levels]
    assert flags == ([False, False, True] if floor == 25
                     else [False, True, True])
    n_boundary = sum(
        t.pool_mask is not None for t in plan.hierarchy.transitions
    )
    assert n_boundary == 1
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)
    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))
    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-4, atol=1e-5)


def test_replicated_fused_forward_matches_single_device():
    """Replication composed with the windowed fused ghost path (the
    production multichip configuration)."""
    import dataclasses

    cfg, h, plan, n, node_in, _, mask = _setup(
        local_layouts=True, window=128, latent_dim=128,
        aggregation="fused", replicate_floor=25,
    )
    assert plan.hierarchy.levels[-1].replicated
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)
    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))
    ref_cfg = dataclasses.replace(cfg.model, aggregation="ell")
    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), ref_cfg,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-3, atol=2e-4)


def test_ghost_floor_mixed_forward_and_train_matches_single_device():
    """ghost_floor: shallow levels keep the ghost-edge kernel layout while
    deep (near-dense) levels use the plain halo layout — the production
    S=8 configuration at 1M (PARITY.md round-4 scaling section). Forward
    AND a 3-step train trajectory must match the single-device model."""
    cfg, h, plan, n, node_in, node_tar, mask = _setup(
        local_layouts=True, ghost_floor=45
    )
    levels = plan.hierarchy.levels
    assert levels[0].local is not None  # shallow: ghost layout
    assert levels[-1].local is None  # deep: plain halo layout
    tr = Trainer(cfg)
    mesh = make_mesh(1, 4)
    fwd = make_halo_forward(tr, mesh, plan)
    pred_sh = fwd(
        tr.state.sim,
        jnp.asarray(partition_nodes(plan, node_in)),
        jnp.asarray(partition_nodes(plan, mask)),
    )
    pred_halo = unpartition_nodes(plan, np.asarray(pred_sh))
    pred_ref = np.asarray(
        simulator_forward(
            tr.state.sim.params, tr.state.sim.norm_in, tr.state.sim.norm_out,
            h, jnp.asarray(node_in), jnp.asarray(mask), cfg.model,
        )
    )
    np.testing.assert_allclose(pred_halo[:n], pred_ref[:n], rtol=2e-4, atol=1e-5)

    tr_ref = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    losses_ref = [
        float(tr_ref.iter(h, jnp.asarray(node_in), jnp.asarray(node_tar),
                          jnp.asarray(mask), jax.random.fold_in(key, i)))
        for i in range(3)
    ]
    tr2 = Trainer(cfg)
    step = make_halo_train_step(tr2, mesh, plan)
    state = tr2.state
    ni = jnp.asarray(partition_nodes(plan, node_in))
    nt = jnp.asarray(partition_nodes(plan, node_tar))
    nm = jnp.asarray(partition_nodes(plan, mask))
    losses = []
    for i in range(3):
        state, loss = step(state, ni, nt, nm, jax.random.fold_in(key, i))
        losses.append(float(loss))
    np.testing.assert_allclose(losses, losses_ref, rtol=1e-4)


@pytest.mark.parametrize("n_shards,floor", [(2, 25), (4, 45), (8, 25)])
def test_replicated_train_step_matches_single_device(n_shards, floor):
    """Replicated deep levels: warmup + two optimizer steps must reproduce
    the unpartitioned trainer (loss, params, normalizer stats) — the
    gradient path crosses the boundary psum in both directions."""
    cfg, h, plan, n, node_in, node_tar, mask = _setup(
        n_shards, replicate_floor=floor
    )
    tr_ref = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    losses_ref = [
        float(tr_ref.iter(h, jnp.asarray(node_in), jnp.asarray(node_tar),
                          jnp.asarray(mask), jax.random.fold_in(key, i)))
        for i in range(3)
    ]

    tr = Trainer(cfg)
    mesh = make_mesh(1, n_shards)
    step = make_halo_train_step(tr, mesh, plan)
    state = tr.state
    ni = jnp.asarray(partition_nodes(plan, node_in))
    nt = jnp.asarray(partition_nodes(plan, node_tar))
    nm = jnp.asarray(partition_nodes(plan, mask))
    losses = []
    for i in range(3):
        state, loss = step(state, ni, nt, nm, jax.random.fold_in(key, i))
        losses.append(float(loss))

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.sim.params),
        jax.tree_util.tree_leaves(tr_ref.state.sim.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize(
    "n_shards,local_layouts",
    [(2, False), (4, False), (8, False), (2, True), (4, True), (8, True)],
)
def test_halo_train_step_matches_single_device(n_shards, local_layouts):
    """Warmup step (normalizer stats) + two optimizer steps: loss, params,
    and statistics must match the unpartitioned trainer."""
    cfg, h, plan, n, node_in, node_tar, mask = _setup(n_shards, local_layouts)

    tr_ref = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    losses_ref = [
        float(tr_ref.iter(h, jnp.asarray(node_in), jnp.asarray(node_tar),
                          jnp.asarray(mask), jax.random.fold_in(key, i)))
        for i in range(3)
    ]

    tr = Trainer(cfg)
    mesh = make_mesh(1, n_shards)
    step = make_halo_train_step(tr, mesh, plan)
    state = tr.state
    ni = jnp.asarray(partition_nodes(plan, node_in))
    nt = jnp.asarray(partition_nodes(plan, node_tar))
    nm = jnp.asarray(partition_nodes(plan, mask))
    losses = []
    for i in range(3):
        state, loss = step(state, ni, nt, nm, jax.random.fold_in(key, i))
        losses.append(float(loss))

    np.testing.assert_allclose(losses, losses_ref, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.sim.params),
        jax.tree_util.tree_leaves(tr_ref.state.sim.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.sim.norm_in.e_x),
        np.asarray(tr_ref.state.sim.norm_in.e_x),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(state.sim.norm_out.e_x2),
        np.asarray(tr_ref.state.sim.norm_out.e_x2),
        rtol=1e-5, atol=1e-7,
    )


def test_ghost_floor_remat_train_matches_noremat():
    """Regression (round 5): remat + mixed ghost/plain halo hierarchy. The
    plain-path custom VJPs used to read `level` from the bwd closure, which
    leaks checkpoint-scope tracers when jax.checkpoint re-traces the
    forward inside the backward (UnexpectedTracerError at any ghost_floor
    plan with model.remat=true — the production 1M S=8 config). Levels now
    ride the residuals. The remat step must run AND match the no-remat
    step's loss exactly."""
    losses = {}
    for remat in (False, True):
        cfg, h, plan, n, node_in, node_tar, mask = _setup(
            local_layouts=True, ghost_floor=45, remat=remat,
            aggregation="fused",
        )
        tr = Trainer(cfg)
        mesh = make_mesh(1, 4)
        step = make_halo_train_step(tr, mesh, plan)
        ni = jnp.asarray(partition_nodes(plan, node_in))
        nt = jnp.asarray(partition_nodes(plan, node_tar))
        nm = jnp.asarray(partition_nodes(plan, mask))
        state = tr.state
        key = jax.random.PRNGKey(7)
        ls = []
        for i in range(3):
            state, loss = step(state, ni, nt, nm, jax.random.fold_in(key, i))
            ls.append(float(loss))
        losses[remat] = ls
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)
