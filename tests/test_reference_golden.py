"""Golden end-to-end parity against the ACTUAL reference PyTorch model.

Unlike `tests/reference_math.py` (a re-derived NumPy oracle) and
`tests/test_torch_parity.py` (piecewise torch ops), these tests import the
reference's own modules from /root/reference/src — `models/model.py`,
`ops/BSMS.py`, `ops/basic.py`, `utils/normalizer.py`,
`graph_wrappers/bsms_graph_wrapper.py`, `trainer/trainer.py`,
`utils/rollout_utils.py` — copy weights JAX→torch, and assert:

  * the bi-stride hierarchy builders produce identical levels;
  * per-layer activations (encode out, every down/bottom/up GMP out, decode
    out) match in FLOAT64 through the whole U-Net;
  * normalizer statistics accumulate identically;
  * the full model forward (normalize → encode/process/decode → denormalize
    delta → mask → integrate) matches;
  * one full train step's loss AND gradients match (reference
    `Trainer._loss_fn` + backward vs our `value_and_grad`);
  * a closed-loop 10-step rollout (reference `rollout_one_traj`) matches.

A drift in any convention (edge direction, cal_ew normalization, pooling
order, normalizer recurrence, IC clamping) fails these tests.

Missing third-party deps of the reference (wandb, pytz, sparse_dot_mkl,
torchsummary) are stubbed; `dot_product_mkl` is replaced by SciPy's CSR
matmul, which computes the same product the MKL call does.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
def enable_x64():
    return jax.enable_x64(True)

from bsms_gnn_tpu.config import Config, DatasetConfig, ModelConfig, OptConfig
from bsms_gnn_tpu.graph.bistride import build_bistride_levels
from bsms_gnn_tpu.graph.hierarchy import pad_levels
from bsms_gnn_tpu.graph.mesh import to_flat_edge
from bsms_gnn_tpu.models.simulator import (
    SimulatorState,
    init_simulator,
    simulator_forward,
    simulator_warmup,
)
from bsms_gnn_tpu.ops.bsgmp import bsgmp_apply
from bsms_gnn_tpu.ops.dense import mlp_apply
from bsms_gnn_tpu.training.rollout import rollout_trajectory
from bsms_gnn_tpu.training.trainer import Trainer, masked_rmse

from conftest import make_grid_mesh

REF_SRC = "/root/reference/src"


def _install_stubs():
    """Stub the reference's unavailable third-party imports."""
    if "wandb" not in sys.modules:
        w = types.ModuleType("wandb")
        w.log = lambda *a, **k: None
        w.init = lambda *a, **k: None
        w.Image = object
        sys.modules["wandb"] = w
    if "pytz" not in sys.modules:
        import datetime as _dt

        p = types.ModuleType("pytz")
        p.timezone = lambda name: _dt.timezone.utc
        sys.modules["pytz"] = p
    if "sparse_dot_mkl" not in sys.modules:
        m = types.ModuleType("sparse_dot_mkl")
        m.dot_product_mkl = lambda a, b: a @ b  # SciPy CSR product == MKL product
        sys.modules["sparse_dot_mkl"] = m
    if "torchsummary" not in sys.modules:
        t = types.ModuleType("torchsummary")
        t.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = t


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from graph_wrappers import BistrideMultiLayerGraph
    from models.model import BSMS_Simulator
    from trainer.trainer import Trainer as RefTrainer
    from utils.normalizer import Normalizer
    from utils.rollout_utils import rollout_one_traj

    return types.SimpleNamespace(
        BSMS_Simulator=BSMS_Simulator,
        BistrideMultiLayerGraph=BistrideMultiLayerGraph,
        RefTrainer=RefTrainer,
        Normalizer=Normalizer,
        rollout_one_traj=rollout_one_traj,
    )


# ---------------------------------------------------------------------------
# Problem setup: a 16x12 triangulated grid, depth-3 hierarchy, small model.
# ---------------------------------------------------------------------------

LATENT, HIDDEN, DEPTH, OUT_DIM, POS_DIM = 32, 2, 3, 2, 2


def _model_cfg(**kw) -> ModelConfig:
    base = dict(
        latent_dim=LATENT,
        hidden_layer=HIDDEN,
        unet_depth=DEPTH,
        out_dim=OUT_DIM,
        pos_dim=POS_DIM,
        accumulation_steps=0,
        aggregation="ell",
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    pos, cells = make_grid_mesh(16, 12)
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]

    levels = build_bistride_levels(edges, DEPTH, n, pos)
    hierarchy = pad_levels(levels, pad_multiple=128, pos=pos)
    n_pad = hierarchy.levels[0].n_pad_nodes

    node_type = (rng.random(n) < 0.2).astype(np.float64)  # ~20% Dirichlet
    mask = (node_type == 0).astype(np.float64)[:, None]
    fields = rng.standard_normal((n, OUT_DIM))
    node_in = np.concatenate([fields, pos, node_type[:, None]], axis=-1)
    node_tar = fields + 0.1 * rng.standard_normal((n, OUT_DIM))

    def pad_rows(a):
        out = np.zeros((n_pad,) + a.shape[1:], a.dtype)
        out[:n] = a
        return out

    return types.SimpleNamespace(
        rng=rng,
        pos=pos,
        edges=edges,
        n=n,
        n_pad=n_pad,
        levels=levels,
        hierarchy=hierarchy,
        node_type=node_type,
        mask=mask,
        node_in=node_in,
        node_tar=node_tar,
        pad_rows=pad_rows,
    )


def _torch_levels(levels):
    """Reference-side (batched, consistent-mesh) m_gs / m_ids tensors."""
    m_gs = [torch.tensor(g.flat_edges, dtype=torch.long)[None] for g in levels.graphs]
    m_ids = [torch.tensor(i, dtype=torch.long)[None] for i in levels.ids]
    return m_gs, m_ids


# ---------------------------------------------------------------------------
# Weight copying JAX → torch
# ---------------------------------------------------------------------------


def _linears(torch_mlp):
    return [m for m in torch_mlp.seq if isinstance(m, torch.nn.Linear)]


def _copy_mlp(jax_mlp, torch_mlp):
    lins = _linears(torch_mlp)
    assert len(lins) == len(jax_mlp.weights)
    for lin, w, b in zip(lins, jax_mlp.weights, jax_mlp.biases):
        lin.weight.data = torch.tensor(np.asarray(w).T.copy(), dtype=lin.weight.dtype)
        lin.bias.data = torch.tensor(np.asarray(b).copy(), dtype=lin.bias.dtype)


def _copy_gmp(jax_gmp, torch_gmp):
    _copy_mlp(jax_gmp.mlp_edge, torch_gmp.mlp_edge)
    _copy_mlp(jax_gmp.mlp_node, torch_gmp.mlp_node)


def _copy_sim_params(params, torch_model):
    _copy_mlp(params.encode, torch_model.encode)
    _copy_mlp(params.decode, torch_model.decode)
    for i in range(DEPTH):
        _copy_gmp(params.process.down_gmps[i], torch_model.process.down_gmps[i])
        _copy_gmp(params.process.up_gmps[i], torch_model.process.up_gmps[i])
    _copy_gmp(params.process.bottom_gmp, torch_model.process.bottom_gmp)


def _copy_normalizer_stats(norm_state, torch_norm):
    torch_norm._acc_weight.data = torch.tensor(
        [float(norm_state.acc_weight)], dtype=torch.float64
    )
    torch_norm._num_accumulations.data = torch.tensor(
        [float(norm_state.num_accumulations)], dtype=torch.float64
    )
    torch_norm._E_data.data = torch.tensor(
        np.asarray(norm_state.e_x, np.float64), dtype=torch.float64
    )
    torch_norm._E_data_squared.data = torch.tensor(
        np.asarray(norm_state.e_x2, np.float64), dtype=torch.float64
    )


@pytest.fixture(scope="module")
def models(ref, problem):
    """A JAX simulator and the reference torch model with identical weights
    and identically-accumulated normalizer statistics."""
    cfg = _model_cfg()
    sim = init_simulator(jax.random.PRNGKey(3), cfg)

    torch_cfg = types.SimpleNamespace(
        out_dim=OUT_DIM,
        latent_dim=LATENT,
        hidden_layer=HIDDEN,
        unet_depth=DEPTH,
        pos_dim=POS_DIM,
        consistent_mesh=True,
        accumulation_steps=0,
    )
    tm = ref.BSMS_Simulator(torch_cfg)
    _copy_sim_params(sim.params, tm)

    # Accumulate two batches of statistics through BOTH warmup paths, then
    # assert they agree and sync the (f64) torch buffers to our values so the
    # downstream forward comparison sees bit-identical statistics.
    p = problem
    pad_mask = jnp.asarray(p.hierarchy.levels[0].node_mask)
    for shift in (0.0, 0.5):
        node_in = p.node_in + shift
        node_tar = p.node_tar + 2 * shift
        sim = simulator_warmup(
            sim,
            jnp.asarray(p.pad_rows(node_in), jnp.float32),
            jnp.asarray(p.pad_rows(node_tar), jnp.float32),
            cfg,
            pad_mask,
        )
        m_gs, m_ids = _torch_levels(p.levels)
        data = (
            torch.tensor(node_in, dtype=torch.float32)[None],
            torch.tensor(node_tar, dtype=torch.float32)[None],
            torch.tensor(p.mask, dtype=torch.float32)[None],
            m_gs,
            m_ids,
        )
        tm(data, consistent_mesh=True, warmup=True)

    # Reference accumulates in f64 from f32 row means; ours accumulates in
    # f32 — agreement to f32 roundoff proves the recurrence matches.
    np.testing.assert_allclose(
        np.asarray(sim.norm_in.e_x),
        tm._inputNormalizer._E_data.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sim.norm_out.e_x2),
        tm._targetNormalizer._E_data_squared.numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    assert float(tm._inputNormalizer._num_accumulations) == 2.0
    assert float(sim.norm_in.num_accumulations) == 2.0

    _copy_normalizer_stats(sim.norm_in, tm._inputNormalizer)
    _copy_normalizer_stats(sim.norm_out, tm._targetNormalizer)
    return types.SimpleNamespace(cfg=cfg, sim=sim, torch_model=tm)


# ---------------------------------------------------------------------------
# 1. Hierarchy builder parity
# ---------------------------------------------------------------------------


def test_hierarchy_matches_reference_builder(ref, problem):
    """Our multi-seed-BFS builder reproduces the reference's per-cluster
    builder exactly: same kept ids (both sorted), same per-level edge sets.
    Ref: `bsms_graph_wrapper.py:30-104`."""
    p = problem
    mlg = ref.BistrideMultiLayerGraph(p.edges, DEPTH, p.n, p.pos)
    _, ref_flat_es, ref_ids = mlg.get_multi_layer_graphs()

    assert len(ref_ids) == len(p.levels.ids)
    for mine, theirs in zip(p.levels.ids, ref_ids):
        np.testing.assert_array_equal(mine, np.asarray(theirs))

    for l, (g, ref_e) in enumerate(zip(p.levels.graphs, ref_flat_es)):
        mine = set(map(tuple, g.flat_edges.T.tolist()))
        theirs = set(map(tuple, np.asarray(ref_e).T.tolist()))
        assert mine == theirs, f"level {l} edge sets differ"


# ---------------------------------------------------------------------------
# 2. Per-layer activations in float64
# ---------------------------------------------------------------------------


def test_per_layer_activations_f64(ref, problem, models):
    """encode → every down/bottom/up GMP → decode, all in f64, against the
    reference torch modules run in double. Ref: `model.py:83-106`,
    `BSMS.py:39-104`, `basic.py:26-98`."""
    p = problem
    tm = models.torch_model.double()

    x64 = p.rng.standard_normal((p.n, OUT_DIM + 1))
    taps = {}

    with enable_x64():
        params64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), models.sim.params
        )
        h = mlp_apply(params64.encode, jnp.asarray(p.pad_rows(x64)))
        enc_mine = np.asarray(h)
        h = bsgmp_apply(
            params64.process,
            p.hierarchy,
            h,
            jnp.asarray(p.pad_rows(p.pos)),
            tap=lambda name, v: taps.__setitem__(name, np.asarray(v)),
        )
        out_mine = np.asarray(mlp_apply(params64.decode, h))

    ref_taps = {}

    def hook(name):
        def fn(module, inputs, output):
            ref_taps[name] = output.detach().numpy()

        return fn

    handles = []
    for i in range(DEPTH):
        handles.append(tm.process.down_gmps[i].register_forward_hook(hook(f"down{i}")))
        handles.append(tm.process.up_gmps[i].register_forward_hook(hook(f"up{i}")))
    handles.append(tm.process.bottom_gmp.register_forward_hook(hook("bottom")))

    m_gs = [torch.tensor(g.flat_edges, dtype=torch.long) for g in p.levels.graphs]
    m_ids = [torch.tensor(i, dtype=torch.long) for i in p.levels.ids]
    with torch.no_grad():
        th = tm.encode(torch.tensor(x64, dtype=torch.float64))
        enc_ref = th.numpy()
        th = tm.process(th, m_ids, m_gs, torch.tensor(p.pos, dtype=torch.float64))
        out_ref = tm.decode(th).numpy()
    for hnd in handles:
        hnd.remove()

    tol = dict(rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(enc_mine[: p.n], enc_ref, **tol)
    # Per-level sizes: down{i}/up{i} live on level i's node set.
    sizes = [g.num_nodes for g in p.levels.graphs]
    for name, want in ref_taps.items():
        lvl = DEPTH if name == "bottom" else int(name[-1])
        if name.startswith("up"):
            lvl = DEPTH - 1 - int(name[2:])
        got = taps[name][: sizes[lvl]]
        np.testing.assert_allclose(got, want, err_msg=name, **tol)
    np.testing.assert_allclose(out_mine[: p.n], out_ref, **tol)
    tm.float()  # restore for other tests


# ---------------------------------------------------------------------------
# 3. Full model forward (with normalizers) in f32
# ---------------------------------------------------------------------------


def test_full_forward_matches_reference(problem, models):
    """The complete `_forward` path (ref `model.py:127-164`) including both
    normalizers, delta masking, and state integration."""
    p = problem
    pred_mine = np.asarray(
        simulator_forward(
            models.sim.params,
            models.sim.norm_in,
            models.sim.norm_out,
            p.hierarchy,
            jnp.asarray(p.pad_rows(p.node_in), jnp.float32),
            jnp.asarray(p.pad_rows(p.mask), jnp.float32),
            models.cfg,
        )
    )

    m_gs, m_ids = _torch_levels(p.levels)
    data = (
        torch.tensor(p.node_in, dtype=torch.float32)[None],
        torch.tensor(p.node_tar, dtype=torch.float32)[None],
        torch.tensor(p.mask, dtype=torch.float32)[None],
        m_gs,
        m_ids,
    )
    with torch.no_grad():
        pred_ref = models.torch_model(data, consistent_mesh=True, warmup=False)
    np.testing.assert_allclose(
        pred_mine[: p.n], pred_ref[0].numpy(), rtol=5e-4, atol=5e-5
    )


# ---------------------------------------------------------------------------
# 4. Train step: loss and gradients
# ---------------------------------------------------------------------------


def test_train_step_loss_and_grads(ref, problem, models):
    """One supervised step: reference `Trainer._loss_fn` (`trainer.py:79-98`)
    + backward vs our `value_and_grad` of `masked_rmse` — losses AND every
    parameter gradient must agree."""
    p = problem
    tm = models.torch_model
    torch_cfg = types.SimpleNamespace(consistent_mesh=True, accumulation_steps=0)
    opt_cfg = types.SimpleNamespace(
        peak_lr=1e-4, weight_decay=1e-4, warmup_steps=10, decay_steps=100, gnorm_clip=1.0
    )
    trainer = ref.RefTrainer(tm, torch_cfg, opt_cfg)

    m_gs, m_ids = _torch_levels(p.levels)
    data = (
        torch.tensor(p.node_in, dtype=torch.float32)[None],
        torch.tensor(p.node_tar, dtype=torch.float32)[None],
        torch.tensor(p.mask, dtype=torch.float32)[None],
        m_gs,
        m_ids,
    )
    tm.zero_grad()
    loss_ref = trainer._loss_fn(data)
    loss_ref.backward()

    node_in = jnp.asarray(p.pad_rows(p.node_in), jnp.float32)
    node_tar = jnp.asarray(p.pad_rows(p.node_tar), jnp.float32)
    node_mask = jnp.asarray(p.pad_rows(p.mask), jnp.float32)

    def loss_fn(params):
        pred = simulator_forward(
            params,
            models.sim.norm_in,
            models.sim.norm_out,
            p.hierarchy,
            node_in,
            node_mask,
            models.cfg,
        )
        return masked_rmse(pred, node_tar, node_mask)

    loss_mine, grads = jax.value_and_grad(loss_fn)(models.sim.params)
    np.testing.assert_allclose(float(loss_mine), float(loss_ref.detach()), rtol=1e-5)

    def compare_mlp(jax_mlp, torch_mlp, tag):
        for k, (w, b, lin) in enumerate(
            zip(jax_mlp.weights, jax_mlp.biases, _linears(torch_mlp))
        ):
            gw_ref = lin.weight.grad.numpy().T
            gb_ref = lin.bias.grad.numpy()
            scale = max(np.abs(gw_ref).max(), 1e-8)
            np.testing.assert_allclose(
                np.asarray(w), gw_ref, rtol=2e-3, atol=2e-4 * scale,
                err_msg=f"{tag}.w{k}",
            )
            np.testing.assert_allclose(
                np.asarray(b), gb_ref, rtol=2e-3, atol=2e-4 * max(np.abs(gb_ref).max(), 1e-8),
                err_msg=f"{tag}.b{k}",
            )

    compare_mlp(grads.encode, tm.encode, "encode")
    compare_mlp(grads.decode, tm.decode, "decode")
    for i in range(DEPTH):
        compare_mlp(grads.process.down_gmps[i].mlp_edge, tm.process.down_gmps[i].mlp_edge, f"down{i}.edge")
        compare_mlp(grads.process.down_gmps[i].mlp_node, tm.process.down_gmps[i].mlp_node, f"down{i}.node")
        compare_mlp(grads.process.up_gmps[i].mlp_edge, tm.process.up_gmps[i].mlp_edge, f"up{i}.edge")
        compare_mlp(grads.process.up_gmps[i].mlp_node, tm.process.up_gmps[i].mlp_node, f"up{i}.node")
    compare_mlp(grads.process.bottom_gmp.mlp_edge, tm.process.bottom_gmp.mlp_edge, "bottom.edge")
    compare_mlp(grads.process.bottom_gmp.mlp_node, tm.process.bottom_gmp.mlp_node, "bottom.node")
    tm.zero_grad()


# ---------------------------------------------------------------------------
# 5. Closed-loop rollout
# ---------------------------------------------------------------------------


def test_rollout_matches_reference(ref, problem, models):
    """10 autoregressive steps through the reference `rollout_one_traj`
    (`rollout_utils.py:14-64`) vs our `lax.scan` rollout, including the
    static-tail reattachment and the Dirichlet IC clamp."""
    p = problem
    steps = 10

    ic = torch.tensor(p.node_in, dtype=torch.float32)[None]
    results = torch.zeros((steps, p.n, OUT_DIM))
    mask_t = torch.tensor(p.mask, dtype=torch.float32)[None]
    m_gs, m_ids = _torch_levels(p.levels)
    fake_trainer = types.SimpleNamespace(model=models.torch_model)
    with torch.no_grad():
        ref_out = ref.rollout_one_traj(
            fake_trainer, ic, results, mask_t, m_gs, m_ids, None
        ).numpy()

    sim = models.sim
    preds = np.asarray(
        rollout_trajectory(
            SimulatorState(params=sim.params, norm_in=sim.norm_in, norm_out=sim.norm_out),
            p.hierarchy,
            jnp.asarray(p.pad_rows(p.node_in), jnp.float32),
            jnp.asarray(p.pad_rows(p.mask), jnp.float32),
            steps,
            models.cfg,
        )
    )
    np.testing.assert_allclose(preds[:, : p.n], ref_out, rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# 6. Noise injection vs the reference formula
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gamma", [1.0, 0.1])
def test_noise_injection_matches_reference_formula(problem, gamma):
    """`Trainer._inject_noise` implements `datasets/base.py:274-289`:
    noise ~ N(0, noise_level) per channel, zeroed where mask == 0, added to
    the input fields, with (1-gamma)*noise absorbed into the target.
    gamma=0.1 covers the flag_simple target-absorption case."""
    p = problem
    noise_level = [0.3, 0.05]
    cfg = Config(
        datasets=DatasetConfig(noise_level=noise_level, noise_gamma=gamma),
        model=_model_cfg(),
        opt=OptConfig(),
    )
    trainer = Trainer(cfg)
    key = jax.random.PRNGKey(11)

    node_in = jnp.asarray(p.pad_rows(p.node_in), jnp.float32)
    node_tar = jnp.asarray(p.pad_rows(p.node_tar), jnp.float32)
    node_mask = jnp.asarray(p.pad_rows(p.mask), jnp.float32)
    got_in, got_tar = trainer._inject_noise(key, node_in, node_tar, node_mask)

    # Reference formula, evaluated with the same sampled noise.
    raw = np.asarray(jax.random.normal(key, node_tar.shape, jnp.float32))
    noise = raw * np.asarray(noise_level, np.float32)
    noise = np.where(np.asarray(node_mask) == 0, 0.0, noise)
    want_in = np.asarray(node_in).copy()
    want_in[..., : len(noise_level)] += noise
    want_tar = np.asarray(node_tar) + (1.0 - gamma) * noise

    np.testing.assert_allclose(np.asarray(got_in), want_in, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(got_tar), want_tar, rtol=1e-6, atol=1e-7)
    # Dirichlet rows must be untouched.
    dirichlet = np.asarray(node_mask)[..., 0] == 0
    np.testing.assert_array_equal(
        np.asarray(got_in)[dirichlet], np.asarray(node_in)[dirichlet]
    )
