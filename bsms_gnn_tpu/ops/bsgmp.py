"""BSGMP: the bi-stride graph U-Net processor.

Parity with reference `src/ops/BSMS.py:8-104`, preserving the behavioral
subtleties SURVEY.md §7.3 lists: down pass per level runs GMP → cal_ew →
weighted conv of h and pos → index-select pool (weights cached); the up pass
unpools, reverse-convolves with the *cached fine-level* weights, runs the up
GMP against the *saved fine-level positions*, and adds the U-Net skip.

Level weights `w` are per-node [N_pad, 1] and graph-only (no batch axis),
exactly as in the reference where batched samples share the mesh.
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax import struct

from bsms_gnn_tpu.graph.hierarchy import Hierarchy
from bsms_gnn_tpu.ops.message import (
    GMPParams,
    edge_conv_down,
    edge_conv_up,
    gmp_apply,
    init_gmp,
)
from bsms_gnn_tpu.ops.pool import (
    pool_nodes,
    pool_nodes_boundary,
    unpool_nodes,
    unpool_nodes_boundary,
)
from bsms_gnn_tpu.ops.transition import trans_down, trans_up


@struct.dataclass
class BSGMPParams:
    down_gmps: Tuple[GMPParams, ...]
    up_gmps: Tuple[GMPParams, ...]
    bottom_gmp: GMPParams


def init_bsgmp(
    key, unet_depth: int, latent_dim: int, hidden_layer: int, pos_dim: int,
    fiber_dims=None,
) -> BSGMPParams:
    keys = jax.random.split(key, 2 * unet_depth + 1)
    return BSGMPParams(
        down_gmps=tuple(
            init_gmp(keys[i], latent_dim, hidden_layer, pos_dim, fiber_dims)
            for i in range(unet_depth)
        ),
        up_gmps=tuple(
            init_gmp(keys[unet_depth + i], latent_dim, hidden_layer, pos_dim, fiber_dims)
            for i in range(unet_depth)
        ),
        bottom_gmp=init_gmp(keys[-1], latent_dim, hidden_layer, pos_dim, fiber_dims),
    )


def _use_fused_trans(trans, level, method: str) -> bool:
    """Fused transition operators apply on single-chip pallas/fused paths
    (see trans_down/trans_up): unwindowed levels use the take+segment-sum
    form; windowed levels require windowed TransOps (in-kernel selection —
    a raw `take` would reintroduce the issue-rate-bound row gather the
    windowed layout exists to kill, measured 559 -> 617 ms at 1M).
    Parity-oracle (ell/segment), halo, and bucketed (down_op=None) paths
    keep the explicit conv+pool/unpool+conv sequence."""
    op = getattr(trans, "down_op", None)
    if method not in ("pallas", "fused") or op is None:
        return False
    return level.window == 0 or op.window > 0


def bsgmp_apply(
    params: BSGMPParams,
    hierarchy: Hierarchy,
    h,
    pos=None,
    method: str = "ell",
    compute_dtype=None,
    remat: bool = False,
    tap=None,
    dyn_dims=None,
    remat_min_nodes: int = 0,
):
    """h: [..., N_pad0, C].

    Mesh positions do NOT appear online: the static per-level edge fibers
    and transition weights are precomputed offline on the hierarchy
    (graph/bistride.py — both are pure graph functions the reference
    recomputes every step, `BSMS.py:64-77`). `pos` carries only DYNAMIC
    positional streams (world-space positions for contact cases, widths in
    `dyn_dims`); they ride the same weighted-conv smoothing and pooling the
    reference applies to mesh_pos. With no dynamic stream, `pos` is
    ignored.

    `tap(name, value)`, if given, observes per-level GMP outputs
    ("down{i}" / "bottom" / "up{i}", each the raw GMP output before
    pool/skip-add) for the golden parity tests — only meaningful outside
    jit."""
    depth = hierarchy.depth
    assert len(params.down_gmps) == depth
    dyn = pos if dyn_dims else None

    def gmp_plain(p, level, h_, pos_, method_, dtype_):
        return gmp_apply(p, level, h_, pos_, method_, dtype_, dyn_dims)

    gmp_ck = jax.checkpoint(gmp_plain, static_argnums=(4, 5))

    def gmp(p, level, h_, pos_, method_, dtype_):
        # Selective remat: a GMP's saved residuals are its [N_l, C]
        # node-side pre-transforms (the fused kernels' custom VJPs keep
        # edge intermediates in-kernel), and level sizes halve with depth —
        # so checkpointing the levels below `remat_min_nodes` buys almost
        # no memory while paying a full forward replay. Only levels at or
        # above the threshold are rematerialized.
        if remat and level.n_pad_nodes >= remat_min_nodes:
            return gmp_ck(p, level, h_, pos_, method_, dtype_)
        return gmp_plain(p, level, h_, pos_, method_, dtype_)

    down_outs = []
    down_ps = []

    for i in range(depth):
        level = hierarchy.levels[i]
        trans = hierarchy.transitions[i]
        h = gmp(params.down_gmps[i], level, h, dyn, method, compute_dtype)
        if tap is not None:
            tap(f"down{i}", h)
        down_outs.append(h)
        down_ps.append(dyn)

        # Transition weights: pure graph function, precomputed offline —
        # the reference's per-step no-grad cal_ew (`BSMS.py:73`) costs
        # three data movers per level per step for values that never
        # change. ew=None selects the level's own weights (and the
        # windowed gather-free conv on layouts built with window > 0).
        # On unwindowed pallas/fused layouts the whole conv→pool collapses
        # to ONE fused operator (ops/transition.py) — the dominant saving
        # on dispatch-bound headline meshes; windowed levels keep the
        # in-kernel gather-free conv (a fused op would reintroduce the
        # issue-rate-bound row gather the windowed layout exists to kill).
        if _use_fused_trans(trans, level, method):
            h = trans_down(trans, h, method)
            if dyn is not None:
                dyn = trans_down(trans, dyn, method)
        elif getattr(trans, "pool_mask", None) is not None:
            # Replication boundary (halo plans with replicate_floor): the
            # child level is replicated; one psum assembles it per shard.
            ax = method.split(":")[1]
            h = edge_conv_down(level, h, None, method)
            h = pool_nodes_boundary(trans, h, ax)
            if dyn is not None:
                dyn = edge_conv_down(level, dyn, None, method)
                dyn = pool_nodes_boundary(trans, dyn, ax)
        else:
            h = edge_conv_down(level, h, None, method)
            h = pool_nodes(trans, h)
            if dyn is not None:
                dyn = edge_conv_down(level, dyn, None, method)
                dyn = pool_nodes(trans, dyn)

    h = gmp(params.bottom_gmp, hierarchy.levels[depth], h, dyn, method, compute_dtype)
    if tap is not None:
        tap("bottom", h)

    for i in range(depth):
        d = depth - i - 1
        level = hierarchy.levels[d]
        trans = hierarchy.transitions[d]
        if _use_fused_trans(trans, level, method):
            h = trans_up(trans, h, method)
        elif getattr(trans, "pool_mask", None) is not None:
            h = unpool_nodes_boundary(trans, h)  # local full-child gather
            h = edge_conv_up(level, h, None, method)
        else:
            h = unpool_nodes(trans, h)
            h = edge_conv_up(level, h, None, method)
        h = gmp(params.up_gmps[i], level, h, down_ps[d], method, compute_dtype)
        if tap is not None:
            tap(f"up{i}", h)
        h = h + down_outs[d]

    return h
