"""Message passing: GMP block and the non-parametric level-transition conv.

Parity with reference `src/ops/basic.py`:
  * `GMP` (ref :26-98): edge feature [Δpos, ‖Δpos‖, x_i, x_j] → edge MLP →
    sum to receiver → node MLP([x, aggr]) + residual.
  * `WeightedEdgeConv` (ref :101-167): down pass gathers from sender and sums
    to receiver scaled by edge weight; up pass reverses direction reusing the
    cached weights.
  * `cal_ew` (ref :142-167, @torch.no_grad): doubly-normalized transition
    weights. Degree is a static per-level artifact here (precomputed offline)
    instead of being recomputed from edges every step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from bsms_gnn_tpu.graph.hierarchy import LevelGraph
from bsms_gnn_tpu.ops.dense import MLPParams, init_mlp, mlp_apply
from bsms_gnn_tpu.ops.scatter import (
    aggregate_recv,
    aggregate_send,
    gather_recv,
    gather_send,
)


@struct.dataclass
class GMPParams:
    mlp_edge: MLPParams
    mlp_node: MLPParams


def init_gmp(key, latent_dim: int, hidden_layer: int, pos_dim: int) -> GMPParams:
    ke, kn = jax.random.split(key)
    edge_in = 2 * latent_dim + pos_dim + 1
    return GMPParams(
        mlp_edge=init_mlp(ke, edge_in, latent_dim, latent_dim, hidden_layer, True),
        mlp_node=init_mlp(kn, 2 * latent_dim, latent_dim, latent_dim, hidden_layer, True),
    )


def gmp_apply(
    params: GMPParams,
    level: LevelGraph,
    x,
    pos,
    method: str = "ell",
    compute_dtype=None,
):
    """One GMP step. x: [..., N_pad, C]; pos: [..., N_pad, pos_dim] or
    [N_pad, pos_dim] broadcast against batched x (ref `ops/basic.py:87-88`)."""
    x_i = gather_send(level, x, method)
    x_j = gather_recv(level, x, method)
    p_i = gather_send(level, pos, method)
    p_j = gather_recv(level, pos, method)

    direction = p_i - p_j
    norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    fiber = jnp.concatenate([direction, norm], axis=-1)
    if x.ndim == 3 and pos.ndim == 2:
        fiber = jnp.broadcast_to(fiber, x.shape[:-2] + fiber.shape)
    edge_in = jnp.concatenate([fiber, x_i, x_j], axis=-1)

    edge_embedding = mlp_apply(params.mlp_edge, edge_in, compute_dtype)
    aggr = aggregate_recv(level, edge_embedding, method)
    node_in = jnp.concatenate([x, aggr], axis=-1)
    return mlp_apply(params.mlp_node, node_in, compute_dtype) + x


def cal_ew(level: LevelGraph, w, method: str = "ell"):
    """Transition weights (no grad, matching ref @torch.no_grad).

    w: [N_pad, 1] node weights. Returns (ec [E_pad], aggr_w [N_pad, 1]).
    """
    w = jax.lax.stop_gradient(w)
    normed_w = w[..., 0] / level.deg
    w_send = gather_send(level, normed_w[..., None], method)[..., 0]
    aggr_w = aggregate_recv(level, w_send[..., None], method)[..., 0] + 1e-12
    ec = w_send / gather_recv(level, aggr_w[..., None], method)[..., 0]
    return jax.lax.stop_gradient(ec), jax.lax.stop_gradient(aggr_w[..., None])


def edge_conv_down(level: LevelGraph, x, ew, method: str = "ell"):
    """Aggregating pass: msg = x[senders] · ew, summed at receivers."""
    msg = gather_send(level, x, method) * ew[..., None]
    return aggregate_recv(level, msg, method)


def edge_conv_up(level: LevelGraph, x, ew, method: str = "ell"):
    """Returning pass (ref aggragating=False): msg = x[receivers] · ew,
    summed at senders."""
    msg = gather_recv(level, x, method) * ew[..., None]
    return aggregate_send(level, msg, method)
