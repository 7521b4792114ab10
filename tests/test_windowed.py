"""Windowed one-hot gather conv (ops/pallas/windowed.py): parity with the
gathered path, residual handling, gradients, Morton reordering, and cache
round-trip of the windowed layout.

The op under test replaces the transition conv's random row gather
(reference `WeightedEdgeConv`, src/ops/basic.py:101-141) with MXU selection
from VMEM-resident source windows — numerics must match the ELL oracle."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_grid_mesh

from bsms_gnn_tpu.graph.hierarchy import (
    build_hierarchy,
    load_hierarchy,
    save_hierarchy,
)
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.graph.order import morton_perm, reorder_mesh
from bsms_gnn_tpu.ops.message import edge_conv_down, edge_conv_up

C = 128


def _setup(nx=40, ny=40, window=512, morton=True):
    pos, cells = make_grid_mesh(nx, ny)
    if morton:
        pos, cells, _, _ = reorder_mesh(pos, cells)
    else:
        # Small base window so 4x escalation still can't span the node set.
        window = 128
        # Scramble node ids so most edges fall OUTSIDE every window —
        # exercises the residual sub-level hard (a row-major grid already
        # has near-perfect id locality).
        rng = np.random.default_rng(11)
        perm = rng.permutation(len(pos))
        inv = np.empty(len(pos), np.int64)
        inv[perm] = np.arange(len(pos))
        pos, cells = pos[perm], inv[cells.astype(np.int64)].astype(cells.dtype)
    edges = to_flat_edge(cells, "tri")
    h_w = build_hierarchy(edges, 2, pos.shape[0], pos, window=window)
    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)
    return h_w, h_0


def _rand_x(level, dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((level.n_pad_nodes, C)).astype(dtype)
    return jnp.asarray(x * np.asarray(level.node_mask, dtype))


@pytest.mark.parametrize("conv", [edge_conv_down, edge_conv_up])
@pytest.mark.parametrize("morton", [True, False])
def test_windowed_conv_matches_ell(conv, morton):
    """Windowed + residual sum equals the ELL oracle on real rows — with a
    non-Morton mesh most edges land in the residual level, exercising that
    path hard."""
    h_w, h_0 = _setup(morton=morton)
    lw, l0 = h_w.levels[0], h_0.levels[0]
    if not morton:
        assert lw.resid is not None and lw.resid.n_edges > lw.n_edges // 4
    x = _rand_x(lw)
    a = np.asarray(jax.jit(lambda x: conv(lw, x, None, "pallas"))(x))
    x0 = x[: l0.n_pad_nodes]
    b = np.asarray(jax.jit(lambda x: conv(l0, x, None, "ell"))(x0))
    n = lw.n_nodes
    np.testing.assert_allclose(a[:n], b[:n], rtol=2e-5, atol=1e-6)


def test_windowed_conv_bf16():
    h_w, h_0 = _setup()
    lw, l0 = h_w.levels[0], h_0.levels[0]
    x = _rand_x(lw, np.float32)
    out_w = jax.jit(
        lambda x: edge_conv_down(lw, x.astype(jnp.bfloat16), None, "pallas")
    )(x)
    ref = jax.jit(
        lambda x: edge_conv_down(l0, x, None, "ell")
    )(x[: l0.n_pad_nodes])
    n = lw.n_nodes
    np.testing.assert_allclose(
        np.asarray(out_w, np.float32)[:n], np.asarray(ref)[:n],
        rtol=3e-2, atol=3e-2,
    )


def test_windowed_conv_grad_matches_ell():
    h_w, h_0 = _setup()
    lw, l0 = h_w.levels[0], h_0.levels[0]
    x = _rand_x(lw)

    def loss_w(x):
        d = edge_conv_down(lw, x, None, "pallas")
        return jnp.sum(edge_conv_up(lw, d, None, "pallas") ** 2)

    def loss_0(x):
        d = edge_conv_down(l0, x, None, "ell")
        return jnp.sum(edge_conv_up(l0, d, None, "ell") ** 2)

    gw = np.asarray(jax.jit(jax.grad(loss_w))(x))
    g0 = np.asarray(jax.jit(jax.grad(loss_0))(x[: l0.n_pad_nodes]))
    n = lw.n_nodes
    np.testing.assert_allclose(gw[:n], g0[:n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("morton", [True, False])
@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_windowed_send_sum_matches_oracle(morton, dtype):
    """Transposed windowed kernel (gather-free sender-sum of per-edge
    values, used by the fused v3/v4 backwards for d_xwi) vs a NumPy oracle
    over in-window slots — incl. the batched (vmapped) form."""
    from bsms_gnn_tpu.ops.pallas.windowed import windowed_send_sum_raw

    h_w, _ = _setup(morton=morton)
    lvl = h_w.levels[0]
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((lvl.n_pad_edges, C)).astype(np.float32)
    if dtype == "bfloat16":
        vals_j = jnp.asarray(vals).astype(jnp.bfloat16)
        vals = np.asarray(vals_j, np.float32)
    else:
        vals_j = jnp.asarray(vals)

    sw = np.asarray(lvl.send_win)
    senders = np.asarray(lvl.senders)
    w = lvl.window
    oracle = np.zeros((lvl.n_pad_nodes, C), np.float64)
    in_win = sw < w
    np.add.at(oracle, senders[in_win], vals[in_win].astype(np.float64))

    out = np.asarray(jax.jit(
        lambda v: windowed_send_sum_raw(lvl, v))(vals_j))
    assert out.shape == (lvl.n_pad_nodes, C)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == "bfloat16" else dict(
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out, oracle.astype(np.float32), **tol)

    batched = jnp.stack([vals_j, 2.0 * vals_j])
    outb = np.asarray(jax.jit(
        lambda v: windowed_send_sum_raw(lvl, v))(batched))
    np.testing.assert_allclose(outb[0], oracle.astype(np.float32), **tol)
    np.testing.assert_allclose(outb[1], 2 * oracle.astype(np.float32),
                               **tol)


def test_windowed_layout_invariants():
    h_w, _ = _setup()
    for g in h_w.levels:
        assert g.window in (512, 1024, 2048)  # base, may auto-escalate
        assert g.send_win.shape == (g.n_pad_edges,)
        assert g.win_base.shape == (g.n_pad_edges // g.edge_block,)
        wh = g.window // 2
        assert g.n_pad_nodes % wh == 0
        assert int(g.win_base.max()) + 2 <= g.n_pad_nodes // wh
        # in-window slots decode back to the true sender
        sw = g.send_win
        covered = sw < g.window
        chunk_of_slot = np.arange(g.n_pad_edges) // g.edge_block
        base_rows = g.win_base[chunk_of_slot] * wh
        dec = base_rows + sw
        real = g.edge_mask > 0
        both = covered & real
        np.testing.assert_array_equal(dec[both], g.senders[both])
        # every real edge is either windowed or in the residual level
        n_res = 0 if g.resid is None else g.resid.n_edges
        assert both.sum() + n_res == g.n_edges
        # residual edge set is symmetric (its own _pad_level asserted it)
        if g.resid is not None:
            assert g.resid.n_pad_nodes == g.n_pad_nodes
        # ew_rev is ew permuted to the reverse slot
        np.testing.assert_array_equal(g.ew_rev, g.ew[g.reverse_perm])


def test_windowed_cache_roundtrip(tmp_path):
    h_w, _ = _setup(nx=20, ny=20)
    path = os.path.join(str(tmp_path), "wh.npz")
    save_hierarchy(path, h_w)
    h2 = load_hierarchy(path)
    for a, b in zip(h_w.levels, h2.levels):
        assert a.window == b.window
        np.testing.assert_array_equal(a.send_win, b.send_win)
        np.testing.assert_array_equal(a.win_base, b.win_base)
        np.testing.assert_array_equal(a.ew_rev, b.ew_rev)
        assert (a.resid is None) == (b.resid is None)
        if a.resid is not None:
            np.testing.assert_array_equal(a.resid.senders, b.resid.senders)
            np.testing.assert_array_equal(a.resid.ew, b.resid.ew)


def test_morton_reorder_preserves_mesh():
    pos, cells = make_grid_mesh(12, 12)
    pos2, cells2, (aux,), perm = reorder_mesh(
        pos, cells, [np.arange(len(pos))]
    )
    # aux carries old ids: positions must follow
    np.testing.assert_array_equal(pos2, pos[aux])
    # edge set is the same up to relabeling
    e1 = to_flat_edge(cells, "tri")
    e2 = to_flat_edge(cells2, "tri")
    inv = np.empty(len(pos), np.int64)
    inv[perm] = np.arange(len(pos))
    relabeled = np.sort(inv[e1].T.tolist(), axis=0)
    assert {tuple(c) for c in np.asarray(e2).T.tolist()} == {
        tuple(c) for c in inv[e1].T.tolist()
    }
    # morton_perm is a permutation
    assert np.array_equal(np.sort(morton_perm(pos)), np.arange(len(pos)))


def test_windowed_simulator_forward_matches_default():
    """Full flagship forward on a windowed Morton hierarchy equals the
    default layout (real rows)."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    pos, cells = make_grid_mesh(24, 24)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    cfg = load_config([
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.aggregation=pallas",
    ])
    h_w = build_hierarchy(edges, 2, pos.shape[0], pos, window=256)
    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    n = pos.shape[0]
    c = cfg.model.out_dim

    def make_in(n_pad):
        rng = np.random.default_rng(7)
        ni = np.zeros((n_pad, c + 3), np.float32)
        ni[:n, :c] = rng.standard_normal((n, c))
        ni[:n, c : c + 2] = pos
        m = np.zeros((n_pad, 1), np.float32)
        m[:n] = 1.0
        return jnp.asarray(ni), jnp.asarray(m)

    outs = []
    for h in (h_w, h_0):
        ni, m = make_in(h.levels[0].n_pad_nodes)
        fwd = jax.jit(
            lambda ni, m, h=h: simulator_forward(
                state.params, state.norm_in, state.norm_out, h, ni, m,
                cfg.model,
            )
        )
        outs.append(np.asarray(fwd(ni, m))[:n])
    np.testing.assert_allclose(outs[0], outs[1], rtol=5e-5, atol=1e-5)


@pytest.mark.parametrize("morton", [True, False])
def test_fused_v3_gmp_matches_ell(morton):
    """fused GMP on a windowed layout (v3: both gathers in-kernel + mini
    residual pass) equals the ELL path — forward and gradients."""
    import functools

    from bsms_gnn_tpu.ops.message import gmp_apply, init_gmp

    h_w, h_0 = _setup(morton=morton)
    lw, l0 = h_w.levels[0], h_0.levels[0]
    p = init_gmp(jax.random.PRNGKey(3), C, 2, 2)
    x = _rand_x(lw, seed=5)
    cot = _rand_x(lw, seed=6)

    @functools.partial(jax.jit, static_argnums=(1, 2))
    def loss(x, method, win):
        lvl = lw if win else l0
        return jnp.vdot(gmp_apply(p, lvl, x, None, method),
                        cot[: lvl.n_pad_nodes])

    n = lw.n_nodes
    out_w = np.asarray(jax.jit(
        lambda v: gmp_apply(p, lw, v, None, "fused"))(x))
    out_e = np.asarray(jax.jit(
        lambda v: gmp_apply(p, l0, v, None, "ell"))(x[: l0.n_pad_nodes]))
    np.testing.assert_allclose(out_w[:n], out_e[:n], rtol=5e-5, atol=1e-5)

    g_w = np.asarray(jax.grad(loss)(x, "fused", True))
    g_e = np.asarray(jax.grad(loss)(x[: l0.n_pad_nodes], "ell", False))
    np.testing.assert_allclose(g_w[:n], g_e[:n], rtol=1e-4, atol=1e-4)


def test_fused_v3_under_remat():
    """v3 custom-VJP pair must not capture outer-trace tables
    (jax.checkpoint re-traces the forward inside the backward)."""
    import functools

    from bsms_gnn_tpu.ops.message import gmp_apply, init_gmp

    h_w, _ = _setup(nx=24, ny=24, window=256)
    lw = h_w.levels[0]
    p = init_gmp(jax.random.PRNGKey(3), C, 2, 2)
    x = _rand_x(lw, seed=5)
    cot = _rand_x(lw, seed=6)

    @jax.jit
    def loss(x):
        f = jax.checkpoint(lambda v: gmp_apply(p, lw, v, None, "fused"))
        return jnp.vdot(f(x), cot)

    @jax.jit
    def loss_ell(x):
        f = jax.checkpoint(lambda v: gmp_apply(p, lw, v, None, "ell"))
        return jnp.vdot(f(x), cot)

    g = np.asarray(jax.grad(loss)(x))
    g_e = np.asarray(jax.grad(loss_ell)(x))
    n = lw.n_nodes
    np.testing.assert_allclose(g[:n], g_e[:n], rtol=1e-4, atol=1e-4)


def test_skip_empty_resid_and_accum_kernel():
    """Residual sub-levels are skip-empty (no slots for empty node blocks);
    the accumulate kernel must add their contribution exactly and the plain
    segment kernel must refuse them."""
    from bsms_gnn_tpu.ops.pallas import (
        segment_sum_accum,
        segment_sum_accum_raw,
        segment_sum_raw,
    )

    h_w, _ = _setup(morton=False)  # scrambled: big residual
    r = h_w.levels[0].resid
    assert r is not None and r.skip_empty
    # skip-empty layouts drop the one-chunk-per-block minimum: the padded
    # size is exactly the per-NONEMPTY-block chunk round-up.
    counts = np.bincount(np.asarray(r.receivers)[np.asarray(r.edge_mask) > 0],
                         minlength=r.n_pad_nodes)
    blocks = counts.reshape(-1, 128).sum(axis=1)
    eb = r.edge_block
    assert r.n_pad_edges == int((-(-blocks // eb) * eb).sum())
    assert segment_sum_raw(r, jnp.zeros((r.n_pad_edges, C))) is None

    rng = np.random.default_rng(2)
    feat = jnp.asarray(
        rng.standard_normal((r.n_pad_edges, C)).astype(np.float32)
        * np.asarray(r.edge_mask)[:, None]
    )
    acc = jnp.asarray(
        rng.standard_normal((r.n_pad_nodes, C)).astype(np.float32)
    )
    out = np.asarray(segment_sum_accum_raw(r, feat, acc))
    # oracle: np.add.at
    exp = np.asarray(acc).copy()
    np.add.at(exp, np.asarray(r.receivers), np.asarray(feat))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)

    # differentiable wrapper: d_acc = g, d_feat = g[receivers]
    def loss(f, a):
        return jnp.sum(segment_sum_accum(r, f, a) ** 2)

    gf, ga = jax.grad(loss, argnums=(0, 1))(feat, acc)
    g_out = 2 * out
    np.testing.assert_allclose(np.asarray(ga), g_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gf), g_out[np.asarray(r.receivers)], rtol=1e-5, atol=1e-5
    )


def test_dataset_window_config_end_to_end(tmp_path):
    """datasets.window Morton-reorders trajectories at ingest and builds
    windowed hierarchies; predictions match the unwindowed reader up to the
    stored node permutation."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data import generate_synthetic_dataset
    from bsms_gnn_tpu.data.trajectory import TrajectoryReader
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    root = str(tmp_path)
    generate_synthetic_dataset(
        root, "synthetic_airfoil", n_train=1, n_test=0, n_nodes=300,
        n_frames=4, consistent_mesh=True, with_density=True, seed=3,
    )
    import glob

    f = sorted(glob.glob(os.path.join(root, "synthetic_airfoil", "train", "*.h5")))[0]

    cfg_w = load_config([
        "datasets=synthetic_airfoil", "datasets.unet_depth=2",
        "model.unet_depth=2", "model.latent_dim=128",
        "datasets.window=256", "model.aggregation=pallas",
    ])
    cfg_0 = load_config([
        "datasets=synthetic_airfoil", "datasets.unet_depth=2",
        "model.unet_depth=2", "model.latent_dim=128",
        "model.aggregation=pallas",
    ])
    rd_w = TrajectoryReader(cfg_w.datasets, f)
    rd_0 = TrajectoryReader(cfg_0.datasets, f)
    assert rd_w.hierarchy.levels[0].window == 256
    assert rd_w.node_perm is not None and rd_0.node_perm is None
    n = rd_0.n_nodes
    # reordered fields carry the same data
    np.testing.assert_allclose(
        rd_w.node_in[0, : n], rd_0.node_in[0, rd_w.node_perm], atol=0
    )

    state = init_simulator(jax.random.PRNGKey(0), cfg_w.model)

    def fwd(rd, cfg):
        ni = jnp.asarray(rd.node_in[0])
        m = jnp.asarray(rd.node_mask[0])
        return np.asarray(
            jax.jit(
                lambda ni, m: simulator_forward(
                    state.params, state.norm_in, state.norm_out,
                    rd.hierarchy, ni, m, cfg.model,
                )
            )(ni, m)
        )

    p_w = fwd(rd_w, cfg_w)
    p_0 = fwd(rd_0, cfg_0)
    np.testing.assert_allclose(
        p_w[:n], p_0[rd_w.node_perm], rtol=5e-5, atol=1e-5
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_trainer_fused_windowed_remat(dtype):
    """The 1M production recipe (Trainer + aggregation=fused + windowed
    layout + remat) end-to-end on CPU interpret kernels, batched inputs:
    losses must track the ELL trainer closely and descend."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.training import Trainer

    pos, cells = make_grid_mesh(16, 16)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h_w = build_hierarchy(edges, 2, pos.shape[0], pos, window=256)
    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)

    def ov(agg):
        return load_config([
            "model.unet_depth=2", "model.latent_dim=128",
            "model.hidden_layer=1", "model.accumulation_steps=1",
            f"model.aggregation={agg}", "model.remat=true",
            f"model.compute_dtype={dtype}",
            "datasets.noise_level=[0.0,0.0,0.0]",
            "opt.warmup_steps=2", "opt.decay_steps=30",
        ])

    def data(h):
        n = pos.shape[0]
        n_pad = h.levels[0].n_pad_nodes
        rng = np.random.default_rng(3)
        c = 3
        ni = np.zeros((2, n_pad, c + 3), np.float32)
        ni[:, :n, :c] = rng.standard_normal((2, n, c))
        ni[:, :n, c:c + 2] = pos
        nt = np.zeros((2, n_pad, c), np.float32)
        nt[:, :n] = ni[:, :n, :c] + 0.1 * np.sin(pos[None, :, :1])
        m = np.zeros((2, n_pad, 1), np.float32)
        m[:, :n] = 1.0
        return jnp.asarray(ni), jnp.asarray(nt), jnp.asarray(m)

    losses = {}
    for agg, h in (("fused", h_w), ("ell", h_0)):
        tr = Trainer(ov(agg))
        ni, nt, m = data(h)
        key = jax.random.PRNGKey(7)
        losses[agg] = [
            float(tr.iter(h, ni, nt, m, jax.random.fold_in(key, i)))
            for i in range(8)
        ]
    tol = 5e-3 if dtype == "float32" else 1e-1
    np.testing.assert_allclose(losses["fused"], losses["ell"], rtol=tol,
                               atol=tol)
    assert losses["fused"][-1] < losses["fused"][2]  # post-warmup descent


@pytest.mark.parametrize("morton", [True, False])
def test_fused_v4_dyn_gmp_matches_ell(morton):
    """v4 (windowed + dynamic world-space fibers, both gathers + Δworld in
    kernel) equals the ELL dyn path — forward, x-grads, and param grads.
    World positions are stop-gradient in v4 (data, never reach params)."""
    import functools

    from bsms_gnn_tpu.ops.message import gmp_apply, init_gmp

    h_w, h_0 = _setup(morton=morton)
    lw, l0 = h_w.levels[0], h_0.levels[0]
    wd = 3
    p = init_gmp(jax.random.PRNGKey(3), C, 2, 2, fiber_dims=(wd, 2))
    x = _rand_x(lw, seed=5)
    cot = _rand_x(lw, seed=6)
    rng = np.random.default_rng(9)
    wp = np.zeros((lw.n_pad_nodes, wd), np.float32)
    wp[: lw.n_nodes] = rng.standard_normal((lw.n_nodes, wd))
    wp = jnp.asarray(wp)

    def loss(x, p_, lvl, method):
        return jnp.vdot(
            gmp_apply(p_, lvl, x, wp[: lvl.n_pad_nodes], method, None, (wd,)),
            cot[: lvl.n_pad_nodes],
        )

    n = lw.n_nodes
    out_w = np.asarray(jax.jit(
        lambda v: gmp_apply(p, lw, v, wp, "fused", None, (wd,)))(x))
    out_e = np.asarray(jax.jit(
        lambda v: gmp_apply(p, l0, v, wp[: l0.n_pad_nodes], "ell", None,
                            (wd,)))(x[: l0.n_pad_nodes]))
    np.testing.assert_allclose(out_w[:n], out_e[:n], rtol=5e-5, atol=1e-5)

    g_w = jax.grad(loss, argnums=(0, 1))(x, p, lw, "fused")
    g_e = jax.grad(loss, argnums=(0, 1))(x[: l0.n_pad_nodes], p, l0, "ell")
    np.testing.assert_allclose(
        np.asarray(g_w[0])[:n], np.asarray(g_e[0])[:n], rtol=2e-4, atol=2e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_w[1]), jax.tree_util.tree_leaves(g_e[1])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_trainer_world_edges_fused_windowed():
    """Contact-case production recipe: Trainer + world_edges + fused v4 +
    windowed layout; losses track the ELL trainer and descend."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.training import Trainer

    pos, cells = make_grid_mesh(14, 14)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h_w = build_hierarchy(edges, 2, pos.shape[0], pos, window=256)
    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)

    def ov(agg):
        return load_config([
            "model.unet_depth=2", "model.latent_dim=128",
            "model.hidden_layer=1", "model.accumulation_steps=1",
            f"model.aggregation={agg}", "model.world_edges=true",
            "model.out_dim=3", "model.world_dim=3",
            "datasets.noise_level=[0.0,0.0,0.0]",
            "opt.warmup_steps=2", "opt.decay_steps=30",
        ])

    def data(h):
        n = pos.shape[0]
        n_pad = h.levels[0].n_pad_nodes
        rng = np.random.default_rng(3)
        c = 3  # world_pos channels
        ni = np.zeros((1, n_pad, c + 3), np.float32)
        ni[:, :n, :2] = pos  # world x,y = mesh pos
        ni[:, :n, 2] = 0.05 * rng.standard_normal(n)  # world z
        ni[:, :n, c:c + 2] = pos
        nt = np.asarray(ni[..., :c])
        nt[:, :n, 2] += 0.1 * np.sin(pos[:, 0])
        m = np.zeros((1, n_pad, 1), np.float32)
        m[:, :n] = 1.0
        return jnp.asarray(ni), jnp.asarray(nt), jnp.asarray(m)

    losses = {}
    for agg, h in (("fused", h_w), ("ell", h_0)):
        tr = Trainer(ov(agg))
        ni, nt, m = data(h)
        key = jax.random.PRNGKey(7)
        losses[agg] = [
            float(tr.iter(h, ni, nt, m, jax.random.fold_in(key, i)))
            for i in range(8)
        ]
    np.testing.assert_allclose(losses["fused"], losses["ell"], rtol=5e-3,
                               atol=5e-3)
    assert losses["fused"][-1] < losses["fused"][2]


def test_windowed_fused_under_gspmd_shards():
    """A GSPMD-sharded windowed hierarchy (edge arrays over the 'graph'
    axis) still runs the fused v3 kernels and matches single-device."""
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.parallel.edge_shard import shard_hierarchy
    from bsms_gnn_tpu.parallel.mesh import make_mesh

    pos, cells = make_grid_mesh(24, 24)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 2, pos.shape[0], pos, window=256)
    cfg = load_config(["model.unet_depth=2", "datasets.unet_depth=2",
                       "model.aggregation=fused"])
    state = init_simulator(jax.random.PRNGKey(0), cfg.model)
    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c = cfg.model.out_dim
    rng = np.random.default_rng(7)
    ni = np.zeros((n_pad, c + 3), np.float32)
    ni[:n, :c] = rng.standard_normal((n, c))
    ni[:n, c:c + 2] = pos
    m = np.zeros((n_pad, 1), np.float32)
    m[:n] = 1.0
    ni, m = jnp.asarray(ni), jnp.asarray(m)

    def fwd(hh):
        return np.asarray(jax.jit(
            lambda ni, m: simulator_forward(
                state.params, state.norm_in, state.norm_out, hh, ni, m,
                cfg.model,
            )
        )(ni, m))

    ref = fwd(h)
    out = fwd(shard_hierarchy(h, make_mesh(2, 4)))
    np.testing.assert_allclose(out[:n], ref[:n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dtype", [None, "bfloat16"])
def test_fused_node_phase_matches_oracle(dtype):
    """ops/pallas/node_mlp.py equals the XLA node phase (split first layer
    + tail + LN + residual) in values and all gradients."""
    import jax.numpy as jnp

    from bsms_gnn_tpu.ops.dense import dense, init_mlp, mlp_apply_tail
    from bsms_gnn_tpu.ops.pallas.node_mlp import fused_node_phase

    cd = jnp.bfloat16 if dtype == "bfloat16" else None
    rng = np.random.default_rng(0)
    n, c = 384, 128  # 384 = 3 x 128 (exercises the rb fallback)
    mlp = init_mlp(jax.random.PRNGKey(1), 2 * c, c, c, hidden_layers=2)
    x = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    aggr = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    if cd is not None:
        x, aggr = x.astype(cd), aggr.astype(cd)

    def oracle(x, aggr, mlp):
        wn = mlp.weights[0]
        pre = (dense(x, wn[:c], mlp.biases[0], cd)
               + dense(aggr, wn[c:], 0.0, cd))
        return mlp_apply_tail(mlp, pre, cd) + x

    got = fused_node_phase(x, aggr, mlp, cd)
    assert got is not None
    want = oracle(x, aggr, mlp)
    tol = 2e-2 if cd is not None else 2e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )

    cot = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))

    def loss_f(x, aggr, mlp):
        return jnp.vdot(fused_node_phase(x, aggr, mlp, cd).astype(jnp.float32), cot)

    def loss_o(x, aggr, mlp):
        return jnp.vdot(oracle(x, aggr, mlp).astype(jnp.float32), cot)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, aggr, mlp)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(x, aggr, mlp)
    if cd is None:
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(go)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-4, atol=5e-4,
            )
    else:
        # bf16: the kernel keeps f32 BETWEEN layers while the XLA path
        # rounds every intermediate to bf16, so their grads differ through
        # ReLU-boundary flips. The honest property: measured against the
        # f32 ground truth, the kernel's bf16 error is no worse than the
        # XLA bf16 path's (x1.5 slack).
        def loss_o32(x, aggr, mlp):
            nonlocal cd
            saved, cd = cd, None
            try:
                return jnp.vdot(oracle(x.astype(jnp.float32),
                                       aggr.astype(jnp.float32), mlp), cot)
            finally:
                cd = saved

        g32 = jax.grad(loss_o32, argnums=(0, 1, 2))(x, aggr, mlp)
        for a, b, r in zip(jax.tree_util.tree_leaves(gf),
                           jax.tree_util.tree_leaves(go),
                           jax.tree_util.tree_leaves(g32)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            r = np.asarray(r, np.float32)
            err_kernel = np.abs(a - r).mean()
            err_xla = np.abs(b - r).mean()
            assert err_kernel <= 1.5 * err_xla + 1e-3, (err_kernel, err_xla)

    # batched
    xb = jnp.stack([x, x * 0.5])
    ab = jnp.stack([aggr, aggr * 2.0])
    got_b = fused_node_phase(xb, ab, mlp, cd)
    np.testing.assert_allclose(
        np.asarray(got_b[0], np.float32), np.asarray(got, np.float32),
        rtol=tol, atol=tol,
    )


def test_window_clamps_to_tiny_levels():
    """Deep hierarchies have levels smaller than the window: the per-level
    window clamps to n_pad (base 0 covers everything, win_base never
    negative — a negative half-window block index is UB on hardware)."""
    pos, cells = make_grid_mesh(30, 30)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    h = build_hierarchy(edges, 4, pos.shape[0], pos, window=512)
    h0 = build_hierarchy(edges, 4, pos.shape[0], pos)
    for g, g0 in zip(h.levels, h0.levels):
        assert int(g.win_base.min()) >= 0
        assert g.window <= max(512, g.n_pad_nodes)
        if g.n_pad_nodes < 512:
            assert g.window == g.n_pad_nodes and g.resid is None
        x = _rand_x(g, seed=g.n_nodes)
        a = np.asarray(edge_conv_down(g, x, None, "pallas"))
        b = np.asarray(
            edge_conv_down(g0, x[: g0.n_pad_nodes], None, "ell"))
        np.testing.assert_allclose(
            a[: g.n_nodes], b[: g.n_nodes], rtol=2e-5, atol=1e-6)


def test_dataset_window_with_buckets(tmp_path):
    """datasets.window combined with size-bucketed variable meshes: the
    planner measures the Morton-reordered graphs (same "_mrt" levels cache
    as the reader), node buckets align to window/2, windowed hierarchies
    build per trajectory, and predictions match the unwindowed reader up to
    the stored permutation. Training streams both bucket shapes."""
    import glob
    import shutil

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data import TrajectorySampler, generate_synthetic_dataset
    from bsms_gnn_tpu.data.pipeline import plan_buckets
    from bsms_gnn_tpu.data.trajectory import TrajectoryReader
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward
    from bsms_gnn_tpu.training import Trainer

    root = str(tmp_path)
    small = generate_synthetic_dataset(
        root + "/small", "synthetic_cylinder_flow", n_train=2, n_test=1,
        n_nodes=150, n_frames=5, consistent_mesh=False, with_density=False,
        seed=5,
    )
    big = generate_synthetic_dataset(
        root + "/big", "synthetic_cylinder_flow", n_train=2, n_test=1,
        n_nodes=520, n_frames=5, consistent_mesh=False, with_density=False,
        seed=6,
    )
    base = os.path.join(root, "synthetic_cylinder_flow")
    for split in ("train", "test"):
        os.makedirs(os.path.join(base, split), exist_ok=True)
        idx = 0
        for src in (small, big):
            for f in sorted(os.listdir(os.path.join(src, split))):
                shutil.copy(os.path.join(src, split, f),
                            os.path.join(base, split, f"{idx}.h5"))
                idx += 1

    over = [
        "datasets=cylinder_flow", "datasets.unet_depth=2",
        "model.unet_depth=2", "model.latent_dim=128",
        "datasets.pad_multiple=32", "datasets.size_buckets=2",
        "model.aggregation=pallas",
    ]
    cfg_w = load_config(over + ["datasets.window=128"])
    cfg_0 = load_config(over)
    for c in (cfg_w, cfg_0):
        c.datasets.name = "synthetic_cylinder_flow"
        c.datasets.root = root

    plan = plan_buckets(cfg_w.datasets, "train")
    assert len(plan.groups) == 2
    for g in plan.groups:
        for nb in g["node_buckets"]:
            assert nb % 64 == 0  # window/2 alignment

    f = sorted(glob.glob(os.path.join(base, "test", "*.h5")))[0]
    rd_w = TrajectoryReader(cfg_w.datasets, f, **plan.for_file(f))
    assert rd_w.hierarchy.levels[0].window > 0
    assert rd_w.node_perm is not None
    rd_0 = TrajectoryReader(cfg_0.datasets, f)
    n = rd_0.n_nodes

    state = init_simulator(jax.random.PRNGKey(0), cfg_w.model)

    def fwd(rd, cfg):
        ni = jnp.asarray(rd.node_in[0])
        m = jnp.asarray(rd.node_mask[0])
        return np.asarray(
            jax.jit(
                lambda ni, m: simulator_forward(
                    state.params, state.norm_in, state.norm_out,
                    rd.hierarchy, ni, m, cfg.model,
                )
            )(ni, m)
        )

    p_w = fwd(rd_w, cfg_w)
    p_0 = fwd(rd_0, cfg_0)
    np.testing.assert_allclose(p_w[:n], p_0[rd_w.node_perm], rtol=5e-5,
                               atol=1e-5)

    # Training mechanics across both bucket shapes (tiny width for speed).
    cfg_t = load_config([
        "datasets=cylinder_flow", "datasets.unet_depth=2",
        "model.unet_depth=2", "model.latent_dim=16", "model.hidden_layer=1",
        "model.accumulation_steps=1", "datasets.pad_multiple=32",
        "datasets.size_buckets=2", "datasets.window=128",
        "opt.warmup_steps=2", "opt.decay_steps=20", "batch=2",
    ])
    cfg_t.datasets.name = "synthetic_cylinder_flow"
    cfg_t.datasets.root = root
    tr = Trainer(cfg_t)
    s = TrajectorySampler(cfg_t.datasets, batch_size=2, num_workers=1,
                          mode="train")
    key = jax.random.PRNGKey(0)
    seen = set()
    sigs = set()
    try:
        for i in range(6):
            b = next(s)
            seen.add(b.node_in.shape[1])
            sigs.add(tuple(
                tuple(a.shape) for a in jax.tree_util.tree_leaves(b.hierarchy)
            ))
            loss = float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            ))
            assert np.isfinite(loss)
    finally:
        s.close()
    assert len(seen) >= 2, f"only one bucket shape sampled: {seen}"
    # EVERY shape is bucket-pinned (ELL widths, residual sub-layouts):
    # one program per group, even on windowed layouts.
    assert len(sigs) <= 2, f"{len(sigs)} distinct hierarchy shapes for 2 groups"


# ---------------------------------------------------------------------------
# Per-level window widths + offline auto-tuner (choose_windows)
# ---------------------------------------------------------------------------


def _scalar_vote(senders, edge_mask, n_pad, window, edge_block):
    """The original per-chunk python-loop vote (pre-vectorization) — the
    behavioral reference for hierarchy._window_vote."""
    wh = window // 2
    e_pad = len(senders)
    num_chunks = e_pad // edge_block
    max_base = n_pad // wh - 2
    real = np.asarray(edge_mask) > 0
    s64 = np.asarray(senders).astype(np.int64)
    base = np.zeros(num_chunks, np.int64)
    s_chunks = s64.reshape(num_chunks, edge_block)
    r_chunks = real.reshape(num_chunks, edge_block)
    for i in range(num_chunks):
        s_i = s_chunks[i][r_chunks[i]]
        if len(s_i) == 0:
            continue
        cand = np.concatenate([s_i // wh - 1, s_i // wh])
        cand = cand[(cand >= 0) & (cand <= max_base)]
        vals, cnts = np.unique(cand, return_counts=True)
        base[i] = vals[np.argmax(cnts)]
    return base


@pytest.mark.parametrize("morton", [True, False])
def test_window_vote_matches_scalar_reference(morton):
    from bsms_gnn_tpu.graph.hierarchy import _window_vote

    h_w, _ = _setup(morton=morton)
    for g in h_w.levels:
        w = g.window
        base, covered = _window_vote(
            np.asarray(g.senders), np.asarray(g.edge_mask),
            np.asarray(g.reverse_perm), g.n_pad_nodes, w, g.edge_block,
        )
        ref = _scalar_vote(g.senders, g.edge_mask, g.n_pad_nodes, w,
                           g.edge_block)
        np.testing.assert_array_equal(base, ref)
        # covered edges really are in their chunk's window
        lo = np.repeat(base, g.edge_block) * (w // 2)
        s = np.asarray(g.senders, np.int64)
        assert np.all((s[covered] >= lo[covered])
                      & (s[covered] < lo[covered] + w))


def test_per_level_window_list():
    """Mixed per-level widths build, record per level, and match the plain
    hierarchy's conv numerics on every level."""
    pos, cells = make_grid_mesh(40, 40)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")
    wins = [512, 256, 128]
    h_m = build_hierarchy(edges, 2, pos.shape[0], pos, window=wins)
    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)
    for l, (lw, l0) in enumerate(zip(h_m.levels, h_0.levels)):
        assert lw.window == min(wins[l], lw.n_pad_nodes)
        x = _rand_x(lw, seed=l)
        a = np.asarray(
            jax.jit(lambda x: edge_conv_down(lw, x, None, "pallas"))(x)
        )
        b = np.asarray(
            jax.jit(lambda x: edge_conv_down(l0, x[: l0.n_pad_nodes], None,
                                             "ell"))(x[: l0.n_pad_nodes])
        )
        n = lw.n_nodes
        np.testing.assert_allclose(a[:n], b[:n], rtol=2e-5, atol=1e-6)


def test_choose_windows_auto_cache_roundtrip(tmp_path):
    """window='auto' picks per-level cost-minimizing widths offline, builds
    a parity-exact hierarchy, and round-trips through the npz cache."""
    from bsms_gnn_tpu.graph.hierarchy import (
        AUTO_WINDOW_CANDIDATES,
        choose_windows,
        load_or_build_hierarchy,
        window_coverage,
    )

    pos, cells = make_grid_mesh(40, 40)
    pos, cells, _, _ = reorder_mesh(pos, cells)
    edges = to_flat_edge(cells, "tri")

    probe = build_hierarchy(edges, 2, pos.shape[0], pos,
                            window=AUTO_WINDOW_CANDIDATES[-1])
    wins = choose_windows(probe)
    assert len(wins) == 3
    assert all(w in AUTO_WINDOW_CANDIDATES for w in wins)
    # A Morton-ordered grid covers well at small W: the tuner must not pick
    # the widest candidate for level 0 (selection cost scales with W).
    assert wins[0] < AUTO_WINDOW_CANDIDATES[-1]
    for g, w in zip(probe.levels, wins):
        cov = window_coverage(g, min(w, g.n_pad_nodes))
        assert cov > 0.5

    h_a = load_or_build_hierarchy(
        str(tmp_path), "grid", edges, 2, pos.shape[0], pos, window="auto"
    )
    h_b = load_or_build_hierarchy(  # cache hit
        str(tmp_path), "grid", edges, 2, pos.shape[0], pos, window="auto"
    )
    for ga, gb in zip(h_a.levels, h_b.levels):
        assert ga.window == gb.window
        np.testing.assert_array_equal(ga.senders, gb.senders)

    h_0 = build_hierarchy(edges, 2, pos.shape[0], pos)
    for lw, l0 in zip(h_a.levels, h_0.levels):
        x = _rand_x(lw, seed=3)
        a = np.asarray(
            jax.jit(lambda x: edge_conv_down(lw, x, None, "pallas"))(x)
        )
        b = np.asarray(
            jax.jit(lambda x: edge_conv_down(l0, x[: l0.n_pad_nodes], None,
                                             "ell"))(x[: l0.n_pad_nodes])
        )
        n = lw.n_nodes
        np.testing.assert_allclose(a[:n], b[:n], rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("morton", [True, False])
def test_fused_v5_interleaved_matches_v3(morton, k):
    """K-way chunk-interleaved fused edge phase (v5) equals the v3 pair —
    forward and all gradients (x, wf8, tail weights/biases) — including
    stream-boundary blocks (visited by two streams) and the dead-repeat
    tail of the last stream."""
    import functools

    from bsms_gnn_tpu.ops.pallas.fused_gmp import (
        fused_edge_phase_win,
        fused_edge_phase_win_k,
    )
    from bsms_gnn_tpu.ops.message import init_gmp

    h_w, _ = _setup(morton=morton)
    lw = h_w.levels[0]
    rng = np.random.default_rng(7)
    c = C
    xwi = _rand_x(lw, seed=5)
    xj = _rand_x(lw, seed=8)
    wf8 = jnp.asarray(rng.standard_normal((8, c)).astype(np.float32))
    ws = tuple(
        jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05)
        for _ in range(3)
    )
    bs = tuple(
        jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.05)
        for _ in range(3)
    )
    cot = _rand_x(lw, seed=9)

    out3 = np.asarray(jax.jit(
        lambda a, b, w: fused_edge_phase_win(lw, a, b, w, ws, bs)
    )(xwi, xj, wf8))
    out5 = np.asarray(jax.jit(
        lambda a, b, w: fused_edge_phase_win_k(lw, a, b, w, ws, bs, k,
                                               min_density=0)
    )(xwi, xj, wf8))
    n = lw.n_nodes
    np.testing.assert_allclose(out5[:n], out3[:n], rtol=2e-5, atol=2e-5)

    def loss(fn, a, b, w, ws, bs):
        return jnp.vdot(fn(lw, a, b, w, ws, bs), cot)

    g3 = jax.jit(jax.grad(
        functools.partial(loss, fused_edge_phase_win), argnums=(0, 1, 2, 3, 4)
    ))(xwi, xj, wf8, ws, bs)
    g5 = jax.jit(jax.grad(
        functools.partial(
            loss, lambda lvl, a, b, w, ws, bs:
            fused_edge_phase_win_k(lvl, a, b, w, ws, bs, k, min_density=0)
        ), argnums=(0, 1, 2, 3, 4)
    ))(xwi, xj, wf8, ws, bs)
    for t3, t5 in zip(jax.tree.leaves(g3), jax.tree.leaves(g5)):
        np.testing.assert_allclose(
            np.asarray(t5)[:n] if t5.shape[:1] == (lw.n_pad_nodes,)
            else np.asarray(t5),
            np.asarray(t3)[:n] if t3.shape[:1] == (lw.n_pad_nodes,)
            else np.asarray(t3),
            # dW accumulates O(nc) chunk outer products whose order differs
            # between the stacked (v5) and per-chunk (v3) tail chains —
            # pure f32 rounding, values O(100).
            rtol=2e-3, atol=5e-4,
        )
