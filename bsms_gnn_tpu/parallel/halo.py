"""Online halo-exchange ops + the `shard_map` train step.

The four data-movement primitives of the message-passing hot loop
(reference `src/ops/basic.py:66-98,127-140`, `src/utils/basic.py:324-343`)
on an edge-partitioned `HaloLevel` (see `parallel/partition.py`):

  gather_send      x[senders]: one `all_to_all` ships each shard's boundary
                   rows ("halo") to every consumer, then a local gather over
                   the extended table [x_local ; halo rows].
  aggregate_recv   Σ over edges by receiver: purely local segment-sum (every
                   edge is owned by its receiver's shard).
  gather_recv      x[receivers]: purely local gather.
  aggregate_send   Σ over edges by sender: local segment-sum into the
                   extended table, then the adjoint `all_to_all` returns
                   remote contributions to their owners.

gather_send and aggregate_send are exact adjoints, so each is the other's
custom VJP — gradients cross shards through the same single all_to_all per
level, with no scatters anywhere. XLA's async collectives can overlap the
halo exchange with the node-local compute that precedes each gather (the
per-node first-layer matmuls in `gmp_apply` are independent of the halo).

The train step mirrors `training/trainer.py` semantics exactly (loss,
warmup gate, noise, AdamW) with global sums assembled by `psum` — the
correct realization of the reference's dead `Normalizer.synchronize`
(`src/utils/normalizer.py:92-114`) and DataParallel path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsms_gnn_tpu.parallel.partition import HaloLevel, PartitionPlan

shard_map = jax.shard_map


# ---------------------------------------------------------------------------
# Halo primitives (called inside shard_map; `axis` is the mesh axis name)
# ---------------------------------------------------------------------------


def _halo_rows(x, halo_send, axis):
    """Ship boundary rows: local [N_loc, C] → received halo [S*H, C]."""
    sent = jnp.take(x, halo_send, axis=-2)  # [S, H, C] (dest-major)
    recv = jax.lax.all_to_all(sent, axis, split_axis=0, concat_axis=0, tiled=True)
    return recv.reshape(recv.shape[:-3] + (-1, x.shape[-1]))


def _halo_return(contrib, halo_send, n_loc, axis):
    """Adjoint of `_halo_rows`: contributions [S*H, C] grouped by owner go
    back via all_to_all and accumulate into local rows at halo_send."""
    s = halo_send.shape[0]
    blk = contrib.reshape(contrib.shape[:-2] + (s, -1) + contrib.shape[-1:])
    back = jax.lax.all_to_all(blk, axis, split_axis=0, concat_axis=0, tiled=True)
    flat = back.reshape(back.shape[:-3] + (-1,) + back.shape[-1:])
    idx = halo_send.reshape(-1)
    if flat.ndim == 2:
        return jax.ops.segment_sum(flat, idx, num_segments=n_loc)
    moved = jnp.moveaxis(flat, -2, 0)
    out = jax.ops.segment_sum(moved, idx, num_segments=n_loc)
    return jnp.moveaxis(out, 0, -2)


def _seg_sum(feat, index, n_out):
    if feat.ndim == 2:
        return jax.ops.segment_sum(feat, index, num_segments=n_out)
    moved = jnp.moveaxis(feat, -2, 0)
    out = jax.ops.segment_sum(moved, index, num_segments=n_out)
    return jnp.moveaxis(out, 0, -2)


# ---------------------------------------------------------------------------
# Ghost-edge kernel path (HaloLevel.local is set — see parallel/partition.py
# `_attach_ghost_layout`). The per-shard layout is a true symmetric
# LevelGraph over the extended table [x_loc ; halo ; pad], so the
# single-chip Pallas kernels aggregate per shard; ghost slots (reversed
# boundary twins) make sender-side sums complete locally — the forward
# needs ONE all_to_all per sender gather and nothing else.
# ---------------------------------------------------------------------------


def _is_ghost(level) -> bool:
    return getattr(level, "local", None) is not None


def _ext_assemble(level: HaloLevel, x, axis: str):
    """[..., N_loc, C] → [..., N_ext_pad, C]: local rows, received halo
    rows (one all_to_all), zero pad rows (incl. the layout's pad node).
    Replicated levels (every shard holds the full level) have no halo —
    zero-fill the (unreferenced) halo slots instead of communicating."""
    lg = level.local
    if level.replicated:
        return _pad_rows(x, lg.n_pad_nodes)
    halo = _halo_rows(x, level.halo_send, axis)
    pad = lg.n_pad_nodes - x.shape[-2] - halo.shape[-2]
    zeros = jnp.zeros(x.shape[:-2] + (pad, x.shape[-1]), x.dtype)
    return jnp.concatenate([x, halo, zeros], axis=-2)


def _pad_rows(x, n_rows: int):
    """Zero-pad axis -2 up to n_rows."""
    pad = n_rows - x.shape[-2]
    zeros = jnp.zeros(x.shape[:-2] + (pad, x.shape[-1]), x.dtype)
    return jnp.concatenate([x, zeros], axis=-2)


def _kernel_recv_sum(lg, feat):
    """Receiver segment-sum over the local layout (Pallas when supported,
    XLA segment-sum fallback for narrow test widths). Returns [..., N_ext_pad, C]."""
    from bsms_gnn_tpu.ops.pallas import segment_sum_pallas

    out = segment_sum_pallas(lg, feat)
    if out is None:
        out = _seg_sum(feat, lg.receivers, lg.n_pad_nodes)
    return out


def _kernel_send_sum(lg, feat):
    """Sender segment-sum over the local layout (reverse-perm Pallas trick
    on the symmetric ghost layout)."""
    from bsms_gnn_tpu.ops.pallas import segment_sum_send_pallas

    out = segment_sum_send_pallas(lg, feat)
    if out is None:
        out = _seg_sum(feat, lg.senders, lg.n_pad_nodes)
    return out


# NOTE on custom-VJP structure (all primitives below): `level` rides as an
# explicit argument with a None cotangent, threaded through the residuals —
# NEVER read from the closure inside `bwd`. jax.checkpoint re-traces the
# forward during the backward pass; a bwd that closes over level leaves
# captured in a different trace leaks that trace's tracers (it broke
# remat + ghost_floor plans; regression: tests/test_halo.py remat cases).
# `axis` (a static string) and input dtypes are safe captures.


def _gather_send_ghost(level: HaloLevel, x, axis: str):
    in_dtype = x.dtype

    @jax.custom_vjp
    def g(level, x):
        lg = level.local
        return jnp.take(_ext_assemble(level, x, axis), lg.senders, axis=-2)

    def fwd(level, x):
        lg = level.local
        out = jnp.take(_ext_assemble(level, x, axis), lg.senders, axis=-2)
        return out, level

    def bwd(level, ct):
        lg = level.local
        n_loc = level.n_pad_nodes
        full = _kernel_send_sum(lg, ct)
        local = full[..., :n_loc, :]
        if level.replicated:  # no halo slots were referenced
            return None, local.astype(in_dtype)
        nh = level.halo_send.shape[0] * level.halo_send.shape[1]
        remote = _halo_return(
            full[..., n_loc : n_loc + nh, :], level.halo_send, n_loc, axis
        )
        return None, (local + remote).astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(level, x)


def _gather_recv_ghost(level: HaloLevel, x, axis: str):
    """x[receivers] with ghost slots clamped to the local pad row (zeros).
    Ghost edge outputs are structurally dead in receiver aggregation (they
    land on discarded ext rows), so the clamp never reaches a real value —
    and the adjoint drops exactly those dead cotangents. Do NOT compose
    this with `aggregate_send` for the up conv; use `conv_up_ghost`."""
    in_dtype = x.dtype

    @jax.custom_vjp
    def g(level, x):
        return jnp.take(x, level.recv_clamped, axis=-2)

    def fwd(level, x):
        return jnp.take(x, level.recv_clamped, axis=-2), level

    def bwd(level, ct):
        full = _kernel_recv_sum(level.local, ct)
        return None, full[..., : level.n_pad_nodes, :].astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(level, x)


def _aggregate_recv_ghost(level: HaloLevel, feat, axis: str):
    """Σ over owned edges by (local) receiver — ghost contributions land on
    ext rows ≥ N_loc and are sliced away. Purely local."""
    in_dtype = feat.dtype

    @jax.custom_vjp
    def g(level, feat):
        return _kernel_recv_sum(level.local, feat)[..., : level.n_pad_nodes, :]

    def fwd(level, feat):
        out = _kernel_recv_sum(level.local, feat)[..., : level.n_pad_nodes, :]
        return out, level

    def bwd(level, ct):
        lg = level.local
        ct_ext = _pad_rows(ct, lg.n_pad_nodes)
        return None, jnp.take(ct_ext, lg.receivers, axis=-2).astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(level, feat)


def _aggregate_send_ghost(level: HaloLevel, feat, axis: str):
    """Σ over ALL slots (owned + ghost) by sender: ghost slots carry the
    remote-owned out-edges, so local sender rows are globally complete with
    ZERO communication (the collective moved into the feature gather)."""
    in_dtype = feat.dtype

    @jax.custom_vjp
    def g(level, feat):
        return _kernel_send_sum(level.local, feat)[..., : level.n_pad_nodes, :]

    def fwd(level, feat):
        out = _kernel_send_sum(level.local, feat)[..., : level.n_pad_nodes, :]
        return out, level

    def bwd(level, ct):
        lg = level.local
        ct_ext = _pad_rows(ct, lg.n_pad_nodes)
        return None, jnp.take(ct_ext, lg.senders, axis=-2).astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(level, feat)


def _conv_ghost_raw(level: HaloLevel, x, axis: str, up: bool):
    """Transition conv on the ghost layout: Σ ew_e·x[send_e] by receiver
    (down), and for up the RECEIVER-sum of x[senders]·ew∘reverse (symmetric
    layout, offline `ew_rev` — Σ_{send(e)=n} ew_e·x[recv_e] rides each
    edge's twin) — one ext gather + the local streaming kernel either way,
    no sender-side collective at all (vs. the non-ghost path's return
    all_to_all). On layouts built with `window` > 0 the gather itself moves
    in-kernel (windowed one-hot selection + in-place residual accumulate —
    ops/message.py::_windowed_conv)."""
    lg = level.local
    ew = (lg.ew_rev if up else lg.ew).astype(x.dtype)
    ext = _ext_assemble(level, x, axis)
    out = None
    if lg.window:
        from bsms_gnn_tpu.ops.message import _windowed_conv

        out = _windowed_conv(lg, ext, ew, up=up)
    if out is None:
        msg = jnp.take(ext, lg.senders, axis=-2)
        out = _kernel_recv_sum(lg, msg * ew[..., None])
    return out[..., : level.n_pad_nodes, :].astype(x.dtype)


def _conv_down_ghost_raw(level: HaloLevel, x, axis: str):
    return _conv_ghost_raw(level, x, axis, up=False)


def _conv_up_ghost_raw(level: HaloLevel, x, axis: str):
    return _conv_ghost_raw(level, x, axis, up=True)


def conv_down_ghost(level: HaloLevel, x, axis: str):
    """Transition down conv with the level's own offline weights, as a
    custom-VJP adjoint pair (convᵀ_down = conv_up globally — the same
    argument as ops/message.py::_make_lvl_conv_pair, which holds for the
    composed global operator here)."""

    @jax.custom_vjp
    def down(level, x):
        return _conv_down_ghost_raw(level, x, axis)

    def fwd(level, x):
        return _conv_down_ghost_raw(level, x, axis), level

    def bwd(level, g):
        return None, _conv_up_ghost_raw(level, g, axis)

    down.defvjp(fwd, bwd)
    return down(level, x)


def conv_up_ghost(level: HaloLevel, x, axis: str):
    @jax.custom_vjp
    def up(level, x):
        return _conv_up_ghost_raw(level, x, axis)

    def fwd(level, x):
        return _conv_up_ghost_raw(level, x, axis), level

    def bwd(level, g):
        return None, _conv_down_ghost_raw(level, g, axis)

    up.defvjp(fwd, bwd)
    return up(level, x)


def gather_send(level: HaloLevel, x, axis: str):
    """x: [..., N_loc, C] → [..., E_loc, C] edge-sender features."""
    if _is_ghost(level):
        return _gather_send_ghost(level, x, axis)

    @jax.custom_vjp
    def g(level, x):
        return _gather_send_plain_raw(level, x, axis)

    def fwd(level, x):
        return _gather_send_plain_raw(level, x, axis), level

    def bwd(level, ct):
        return None, _aggregate_send_impl(level, ct, axis)

    g.defvjp(fwd, bwd)
    return g(level, x)


def _gather_send_plain_raw(level: HaloLevel, x, axis: str):
    if level.replicated:  # all senders local: no halo exchange
        return jnp.take(x, level.senders_ext, axis=-2)
    halo = _halo_rows(x, level.halo_send, axis)
    ext = jnp.concatenate([x, halo], axis=-2)
    return jnp.take(ext, level.senders_ext, axis=-2)


def _aggregate_send_impl(level: HaloLevel, feat, axis: str):
    n_loc = level.n_pad_nodes
    if level.replicated:  # all senders local: no return collective
        return _seg_sum(feat, level.senders_ext, n_loc)
    s, h = level.halo_send.shape  # local view: [S_dest, H]
    partial_ext = _seg_sum(feat, level.senders_ext, n_loc + s * h)
    local = partial_ext[..., :n_loc, :]
    remote = _halo_return(partial_ext[..., n_loc:, :], level.halo_send, n_loc, axis)
    return local + remote


def aggregate_send(level: HaloLevel, feat, axis: str):
    """Σ_{e: send(e)=n} feat[e] (up-pass reverse conv target)."""
    if _is_ghost(level):
        return _aggregate_send_ghost(level, feat, axis)

    @jax.custom_vjp
    def g(level, feat):
        return _aggregate_send_impl(level, feat, axis)

    def fwd(level, feat):
        return _aggregate_send_impl(level, feat, axis), level

    def bwd(level, ct):
        return None, _gather_send_plain_raw(level, ct, axis)

    g.defvjp(fwd, bwd)
    return g(level, feat)


def gather_recv(level: HaloLevel, x, axis: str):
    """x[receivers] — local."""
    if _is_ghost(level):
        return _gather_recv_ghost(level, x, axis)

    @jax.custom_vjp
    def g(level, x):
        return jnp.take(x, level.receivers, axis=-2)

    def fwd(level, x):
        return jnp.take(x, level.receivers, axis=-2), level

    def bwd(level, ct):
        return None, _seg_sum(ct, level.receivers, level.n_pad_nodes)

    g.defvjp(fwd, bwd)
    return g(level, x)


def aggregate_recv(level: HaloLevel, feat, axis: str):
    """Σ_{e: recv(e)=n} feat[e] — local (edges are receiver-owned)."""
    if _is_ghost(level):
        return _aggregate_recv_ghost(level, feat, axis)

    @jax.custom_vjp
    def g(level, feat):
        return _seg_sum(feat, level.receivers, level.n_pad_nodes)

    def fwd(level, feat):
        return _seg_sum(feat, level.receivers, level.n_pad_nodes), level

    def bwd(level, ct):
        return None, jnp.take(ct, level.receivers, axis=-2)

    g.defvjp(fwd, bwd)
    return g(level, feat)


# ---------------------------------------------------------------------------
# Sharded train / eval steps
# ---------------------------------------------------------------------------


def _local(tree):
    """Strip the leading shard axis shard_map leaves on every sliced leaf."""
    return jax.tree_util.tree_map(lambda a: a[0], tree)


def _halo_method(cfg, plan: PartitionPlan, axis: str) -> str:
    """Aggregation method string for the sharded step: ghost layouts with
    `aggregation: fused` run the windowed fused GMP edge phase per shard."""
    ghosted = plan.hierarchy.levels[0].local is not None
    if ghosted and cfg.model.aggregation == "fused":
        return f"halo:{axis}:fused"
    return f"halo:{axis}"


def _put_sharded(tree, mesh: Mesh, axis: str):
    """Shard a host-replicated pytree over `axis` (leading dim). Uses
    make_array_from_callback — every process supplies its addressable
    shards from its (identical) host copy — instead of a multihost
    device_put, whose cross-process equality verification is both a
    collective round-trip and flaky on f64 leaves under x64-off
    canonicalization."""

    def put(a):
        arr = np.asarray(a)
        dt = jax.dtypes.canonicalize_dtype(arr.dtype)
        if dt != arr.dtype:
            arr = arr.astype(dt)
        sh = NamedSharding(mesh, P(axis))
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    return jax.tree_util.tree_map(put, tree)


def masked_rmse_psum(pred, tar, mask, axis: str):
    """√(Σ mask·se / Σ mask / C) with globally-psummed sums — identical to
    the reference loss (`trainer.py:96-97`) on the unpartitioned batch."""
    se = jnp.square(pred - tar)
    num = jax.lax.psum(jnp.sum(se * mask), axis)
    den = jax.lax.psum(jnp.sum(mask), axis)
    return jnp.sqrt(num / den / se.shape[-1])


def make_halo_train_step(trainer, mesh: Mesh, plan: PartitionPlan,
                         axis: str = "graph") -> Callable:
    """Compile the trainer's step over edge-partitioned node shards.

    Returns step(state, node_in, node_tar, node_mask, key) → (state, loss),
    where node arrays are shard-major [S, ..., N_loc, C] from
    `partition_nodes`. State replicates; loss is the exact global loss.
    """
    from bsms_gnn_tpu.models.normalizer import (
        normalizer_apply_sums,
        normalizer_row_sums,
    )
    from bsms_gnn_tpu.models.simulator import (
        SimulatorState,
        simulator_forward,
        split_node_input,
        target_delta,
    )
    from bsms_gnn_tpu.training.trainer import TrainState

    cfg = trainer.cfg
    mcfg = dataclasses.replace(cfg.model, aggregation=_halo_method(cfg, plan, axis))
    hier = plan.hierarchy

    def inner(state, hier_s, node_in, node_tar, node_mask, key):
        h = _local(hier_s)
        node_in, node_tar, node_mask = node_in[0], node_tar[0], node_mask[0]

        # Per-shard independent noise (statistically identical to the
        # single-device draw; zero noise_level reproduces it exactly).
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        noise = (
            jax.random.normal(shard_key, node_tar.shape, node_tar.dtype)
            * jnp.asarray(trainer._noise_level)
        )
        noise = jnp.where(node_mask == 0, 0.0, noise)
        c = trainer._noise_level.shape[0]
        node_in = node_in.at[..., :c].add(noise)
        node_tar = node_tar + (1.0 - trainer._noise_gamma) * noise

        pad_mask = jnp.broadcast_to(h.levels[0].node_mask, node_mask.shape)

        def warmup_branch(args):
            state, node_in, node_tar = args
            latent_input, _, _ = split_node_input(node_in, mcfg.pos_dim)
            delta = target_delta(latent_input, node_tar, mcfg.pos_dim)
            sums_in = normalizer_row_sums(state.sim.norm_in, latent_input, pad_mask)
            sums_out = normalizer_row_sums(state.sim.norm_out, delta, pad_mask)
            sums_in = jax.lax.psum(sums_in, axis)
            sums_out = jax.lax.psum(sums_out, axis)
            sim = SimulatorState(
                params=state.sim.params,
                norm_in=normalizer_apply_sums(state.sim.norm_in, *sums_in),
                norm_out=normalizer_apply_sums(state.sim.norm_out, *sums_out),
            )
            loss = masked_rmse_psum(
                jnp.zeros_like(node_tar), node_tar, node_mask, axis
            )
            return TrainState(sim=sim, opt_state=state.opt_state,
                              step=state.step + 1), loss

        def train_branch(args):
            state, node_in, node_tar = args

            def loss_fn(params):
                pred = simulator_forward(
                    params, state.sim.norm_in, state.sim.norm_out, h,
                    node_in, node_mask, mcfg, trainer.compute_dtype,
                )
                return masked_rmse_psum(pred, node_tar, node_mask, axis)

            loss, grads = jax.value_and_grad(loss_fn)(state.sim.params)
            grads = jax.lax.psum(grads, axis)
            updates, new_opt = trainer.tx.update(
                grads, state.opt_state, state.sim.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.sim.params, updates
            )
            sim = SimulatorState(
                params=new_params, norm_in=state.sim.norm_in,
                norm_out=state.sim.norm_out,
            )
            return TrainState(sim=sim, opt_state=new_opt,
                              step=state.step + 1), loss

        return jax.lax.cond(
            state.step < mcfg.accumulation_steps,
            warmup_branch, train_branch, (state, node_in, node_tar),
        )

    hier_spec = jax.tree_util.tree_map(lambda _: P(axis), hier)
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), hier_spec, P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    hier_dev = _put_sharded(hier, mesh, axis)

    n_shards = hier.levels[0].n_shards

    # hier_dev rides as an ARGUMENT: jit may not close over arrays that
    # span non-addressable devices (multi-process meshes).
    @partial(jax.jit, donate_argnums=(0,))
    def jit_step(state, hier_arg, node_in, node_tar, node_mask, key):
        return mapped(state, hier_arg, node_in, node_tar, node_mask, key)

    def step(state, node_in, node_tar, node_mask, key):
        for name, a in (("node_in", node_in), ("node_tar", node_tar),
                        ("node_mask", node_mask)):
            if a.shape[0] != n_shards:
                raise ValueError(
                    f"{name} must be shard-major [S={n_shards}, ..., N_loc, C] "
                    f"(use partition_nodes), got shape {a.shape}"
                )
        return jit_step(state, hier_dev, node_in, node_tar, node_mask, key)

    # Introspection handles (benchmarks/scaling_model.py reads the compiled
    # HLO's collective inventory off these).
    step._jit = jit_step
    step._hier_dev = hier_dev
    return step


def make_halo_forward(trainer, mesh: Mesh, plan: PartitionPlan,
                      axis: str = "graph") -> Callable:
    """Jitted sharded inference: (sim_state, node_in [S,...], node_mask) →
    shard-major predictions."""
    from bsms_gnn_tpu.models.simulator import simulator_forward

    mcfg = dataclasses.replace(
        trainer.cfg.model, aggregation=_halo_method(trainer.cfg, plan, axis)
    )
    hier = plan.hierarchy

    def inner(sim, hier_s, node_in, node_mask):
        h = _local(hier_s)
        pred = simulator_forward(
            sim.params, sim.norm_in, sim.norm_out, h,
            node_in[0], node_mask[0], mcfg, trainer.compute_dtype,
        )
        return pred[None]

    hier_spec = jax.tree_util.tree_map(lambda _: P(axis), hier)
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), hier_spec, P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    hier_dev = _put_sharded(hier, mesh, axis)

    @jax.jit
    def _fwd(sim, hier_arg, node_in, node_mask):
        return mapped(sim, hier_arg, node_in, node_mask)

    def fwd(sim, node_in, node_mask):
        return _fwd(sim, hier_dev, node_in, node_mask)

    return fwd


def make_halo_rollout(trainer, mesh: Mesh, plan: PartitionPlan, n_steps: int,
                      axis: str = "graph") -> Callable:
    """Jitted sharded closed-loop rollout (training/rollout.py::
    rollout_trajectory under shard_map): (sim_state, ic [S, N_loc, C_in],
    node_mask [S, N_loc, 1]) → shard-major predictions [S, T, N_loc, C].
    The autoregressive state stays sharded on device across all T steps —
    only the per-level halo rows cross chips each step."""
    from bsms_gnn_tpu.models.simulator import simulator_forward

    mcfg = dataclasses.replace(
        trainer.cfg.model, aggregation=_halo_method(trainer.cfg, plan, axis)
    )
    hier = plan.hierarchy

    def inner(sim, hier_s, ic_s, mask_s):
        h = _local(hier_s)
        ic, node_mask = ic_s[0], mask_s[0]
        c_out = ic.shape[-1] - mcfg.pos_dim - 1
        pos_type = ic[..., c_out:]

        def step(current_input, _):
            pred = simulator_forward(
                sim.params, sim.norm_in, sim.norm_out, h,
                current_input, node_mask, mcfg, trainer.compute_dtype,
            )
            nxt = jnp.concatenate([pred, pos_type], axis=-1)
            nxt = jnp.where(node_mask == 0, ic, nxt)
            return nxt, pred

        _, preds = jax.lax.scan(step, ic, None, length=n_steps)
        return preds[None]  # [1, T, N_loc, C] → global [S, T, N_loc, C]

    hier_spec = jax.tree_util.tree_map(lambda _: P(axis), hier)
    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), hier_spec, P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    hier_dev = _put_sharded(hier, mesh, axis)

    @jax.jit
    def _rollout(sim, hier_arg, ic, node_mask):
        return mapped(sim, hier_arg, ic, node_mask)

    def rollout(sim, ic, node_mask):
        return _rollout(sim, hier_dev, ic, node_mask)

    return rollout
