"""Scatter-free edge↔node data movement.

Replaces the reference's hot primitive — shape-expanded `scatter_add_`
(`src/utils/basic.py:324-343`) feeding every message-passing block — with a
TPU-native formulation:

  forward  aggregate = ELL gather (node's padded incident-edge slots) + dense
            sum over the K axis — pure gathers + VPU reduction;
  backward aggregate = gather of node cotangents by edge index;
  forward  edge gather = gather by sender/receiver index;
  backward edge gather = ELL sum via the dual table.

So both directions of both ops are gathers — XLA never emits a scatter in the
train step. A sorted `segment_sum` path is kept for parity checks and as a
fallback (receiver-sorted edges come from the offline builder).

All ops accept features with arbitrary leading batch dims: x is
[..., N_pad, C], edge features are [..., E_pad, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.graph.hierarchy import LevelGraph

# ---------------------------------------------------------------------------
# Internals
# ---------------------------------------------------------------------------


def _take(x, idx):
    return jnp.take(x, idx, axis=-2)


def _ell_sum(feat, ell):
    """Sum edge features into nodes via an ELL table.

    feat: [..., E_pad, C]; ell: [N_pad, K] with pad slots == E_pad.
    A zero row is appended at index E_pad so pad slots contribute nothing.
    """
    zero = jnp.zeros(feat.shape[:-2] + (1, feat.shape[-1]), feat.dtype)
    padf = jnp.concatenate([feat, zero], axis=-2)
    n, k = ell.shape
    g = jnp.take(padf, ell.reshape(-1), axis=-2)
    g = g.reshape(feat.shape[:-2] + (n, k, feat.shape[-1]))
    return g.sum(axis=-2)


def _seg_sum(feat, index, n_out):
    """Segment-sum fallback; segments run over axis -2 (pad edges land on
    the pad node)."""
    if feat.ndim == 2:
        return jax.ops.segment_sum(feat, index, num_segments=n_out)
    moved = jnp.moveaxis(feat, -2, 0)
    out = jax.ops.segment_sum(moved, index, num_segments=n_out)
    return jnp.moveaxis(out, 0, -2)


# ---------------------------------------------------------------------------
# custom-VJP pairs
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_edges(x, idx, dual_ell):
    """x[..., N, C] → [..., E, C] by idx; backward is an ELL sum."""
    return _take(x, idx)


def _gather_edges_fwd(x, idx, dual_ell):
    return _take(x, idx), (idx, dual_ell, x.shape[-2])


def _gather_edges_bwd(res, g):
    _, dual_ell, n = res
    return (_ell_sum(g, dual_ell), None, None)


_gather_edges.defvjp(_gather_edges_fwd, _gather_edges_bwd)


@jax.custom_vjp
def _aggregate_edges(feat, ell, dual_idx):
    """[..., E, C] → [..., N, C] summing by ELL rows; backward gathers node
    cotangents back onto edges by dual_idx."""
    return _ell_sum(feat, ell)


def _aggregate_edges_fwd(feat, ell, dual_idx):
    return _ell_sum(feat, ell), (dual_idx,)


def _aggregate_edges_bwd(res, g):
    (dual_idx,) = res
    return (_take(g, dual_idx), None, None)


_aggregate_edges.defvjp(_aggregate_edges_fwd, _aggregate_edges_bwd)


# ---------------------------------------------------------------------------
# Public API. `method`:
#   "ell"          — ELL gather + dense sum, scatter-free VJPs (default);
#   "segment"      — sorted segment-sum (parity oracle / fallback);
#   "pallas"       — Pallas kernel when available, else "ell";
#   "halo:<axis>"  — inside `shard_map` on an edge-partitioned `HaloLevel`
#                    (parallel/partition.py): local segment-sums plus one
#                    all_to_all halo exchange per sender-side op (the
#                    explicit graph-parallel path, SURVEY.md §5.7).
# ---------------------------------------------------------------------------


def _halo_axis(method: str):
    # "halo:<axis>" or "halo:<axis>:fused" (ghost layouts + fused GMP edge
    # phase) — the axis is always the second segment.
    return method.split(":")[1] if method.startswith("halo:") else None


def _gather_with_pallas_bwd(level: LevelGraph, x, to_sender: bool):
    """Gather whose backward aggregates edge cotangents through the Pallas
    segment-sum (falling back to ELL for unsupported widths). Keeps
    million-edge training free of [N, K, C] ELL materializations.

    `level` is an explicit custom-VJP argument (None cotangent) so the
    backward reads its arrays from the residuals — closure capture leaks
    tracers when fwd/bwd trace separately (jax.checkpoint / remat)."""
    in_dtype = x.dtype

    def _run(lvl, x):
        return _take(x, lvl.senders if to_sender else lvl.receivers)

    @jax.custom_vjp
    def g(lvl, x):
        return _run(lvl, x)

    def fwd(lvl, x):
        return _run(lvl, x), lvl

    def bwd(lvl, ct):
        from bsms_gnn_tpu.ops.pallas import (
            segment_sum_accum_raw,
            segment_sum_accum_send_raw,
            segment_sum_pallas,
            segment_sum_send_pallas,
        )

        if to_sender:
            out = segment_sum_send_pallas(lvl, ct)
            if out is None and getattr(lvl, "skip_empty", False):
                # skip-empty layouts (residual sub-levels): accumulate onto
                # zeros — the plain kernel would leave empty blocks
                # undefined, and the ELL fallback materializes [N, K, C].
                zeros = jnp.zeros(
                    ct.shape[:-2] + (lvl.n_pad_nodes, ct.shape[-1]),
                    jnp.float32,
                )
                out = segment_sum_accum_send_raw(lvl, ct, zeros)
            if out is None:
                out = _ell_sum(ct, lvl.send_ell)
        else:
            out = segment_sum_pallas(lvl, ct)
            if out is None and getattr(lvl, "skip_empty", False):
                zeros = jnp.zeros(
                    ct.shape[:-2] + (lvl.n_pad_nodes, ct.shape[-1]),
                    jnp.float32,
                )
                out = segment_sum_accum_raw(lvl, ct, zeros)
            if out is None:
                out = _ell_sum(ct, lvl.recv_ell)
        return None, out.astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(level, x)


def gather_send(level, x, method: str = "ell"):
    """x_i = x[senders] (reference `ops/basic.py:70-72` gather)."""
    axis = _halo_axis(method)
    if axis is not None:
        from bsms_gnn_tpu.parallel import halo

        return halo.gather_send(level, x, axis)
    if method == "segment":
        return _take(x, level.senders)
    if method == "pallas":
        return _gather_with_pallas_bwd(level, x, to_sender=True)
    return _gather_edges(x, level.senders, level.send_ell)


def gather_recv(level, x, method: str = "ell"):
    """x_j = x[receivers]."""
    axis = _halo_axis(method)
    if axis is not None:
        from bsms_gnn_tpu.parallel import halo

        return halo.gather_recv(level, x, axis)
    if method == "segment":
        return _take(x, level.receivers)
    if method == "pallas":
        return _gather_with_pallas_bwd(level, x, to_sender=False)
    return _gather_edges(x, level.receivers, level.recv_ell)


def aggregate_recv(level, feat, method: str = "ell"):
    """Σ_{e: recv(e)=n} feat[e] — the `scatter_sum(…, j)` of
    reference `ops/basic.py:94,138`."""
    axis = _halo_axis(method)
    if axis is not None:
        from bsms_gnn_tpu.parallel import halo

        return halo.aggregate_recv(level, feat, axis)
    if method == "segment":
        return _seg_sum(feat, level.receivers, level.n_pad_nodes)
    if method == "pallas":
        from bsms_gnn_tpu.ops.pallas import segment_sum_pallas

        out = segment_sum_pallas(level, feat)
        if out is not None:
            return out
    return _aggregate_edges(feat, level.recv_ell, level.receivers)


def aggregate_send(level, feat, method: str = "ell"):
    """Σ_{e: send(e)=n} feat[e] — the reverse-direction scatter of the
    up-pass weighted conv (reference `ops/basic.py:136-138` with
    aggragating=False)."""
    axis = _halo_axis(method)
    if axis is not None:
        from bsms_gnn_tpu.parallel import halo

        return halo.aggregate_send(level, feat, axis)
    if method == "segment":
        return _seg_sum(feat, level.senders, level.n_pad_nodes)
    if method == "pallas":
        from bsms_gnn_tpu.ops.pallas import segment_sum_send_pallas

        out = segment_sum_send_pallas(level, feat)
        if out is not None:
            return out
    return _aggregate_edges(feat, level.send_ell, level.senders)
