"""Offline edge-partitioning of a bi-stride hierarchy for halo-exchange SPMD.

This is the explicit multi-chip decomposition SURVEY.md §5.7 calls the graph
analog of context parallelism (BASELINE.md "edge-partitioned levels, halo
all-to-all"): each level's nodes are split into contiguous shards, each edge
is owned by its RECEIVER's shard (so receiver-side aggregation is purely
local), and the sender features an edge needs from other shards form a
static per-pair "halo" exchanged with one `all_to_all` per gather.

Alignment across levels: a coarse node lives on the shard of the fine node
it was kept from (`assignment[l+1] = assignment[l][kept]`), so pool/unpool
are local gathers — no communication in the level transitions at all. The
only cross-chip traffic in a full U-Net step is the sender halo per level.

Everything here is NumPy precompute; the online ops live in
`bsms_gnn_tpu.parallel.halo`. Reference counterpart: none — the reference
(`src/trainer/trainer.py:15-18`) never partitions the graph; this is the
TPU-native capability BASELINE.md's ≥80% scaling target names.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
from flax import struct

from bsms_gnn_tpu.graph.bistride import (
    BistrideLevels,
    smoothed_positions,
    transition_edge_weights,
)
from bsms_gnn_tpu.graph.csr import CsrGraph
from bsms_gnn_tpu.graph.hierarchy import (
    EDGE_BLOCK,
    NODE_BLOCK,
    LevelGraph,
    Transition,
    _pad_level,
    layout_edge_count,
)


def _pad_to(n: int, multiple: int) -> int:
    return ((max(n, 0) + multiple - 1) // multiple) * multiple


@struct.dataclass
class HaloLevel:
    """One level's per-shard local graph. Every array has leading axis S
    (the shard axis, split by `shard_map`); inside the mapped function each
    leaf is sliced to its local [1, ...] block.

    Local node layout per shard: the shard's real nodes in global order,
    then padding; the LAST local row (n_loc-1) is the pad node. Edge slots
    pad with self-loops on the pad node.

    `senders_ext` indexes the extended local table [x_loc ; halo rows]:
    values < n_loc are local senders; value n_loc + t*H + h means "the h-th
    node shard t ships here" (see `halo_send`).

    `halo_send[s, d, h]` = shard s's local index of the h-th node it ships
    to shard d (pad slots point at s's pad node and ship zeros-by-masking).
    """

    senders_ext: np.ndarray  # [S, E_loc] int32
    receivers: np.ndarray  # [S, E_loc] int32 (local)
    ew: np.ndarray  # [S, E_loc] f64 offline transition weights (pad: 0)
    fiber: np.ndarray  # [S, E_loc, pos_dim+1] f64 offline static edge fiber
    deg: np.ndarray  # [S, N_loc] f32 global out-degree (>=1)
    node_mask: np.ndarray  # [S, N_loc, 1] f32
    edge_mask: np.ndarray  # [S, E_loc] f32
    halo_send: np.ndarray  # [S, S, H] int32
    n_shards: int = struct.field(pytree_node=False)
    halo_width: int = struct.field(pytree_node=False)  # H
    n_nodes: int = struct.field(pytree_node=False)  # total real nodes
    n_edges: int = struct.field(pytree_node=False)  # total real edges
    # Ghost-edge kernel layout (build_partition(local_layouts=True)): a true
    # per-shard LevelGraph over the EXTENDED node space [x_loc ; halo ; pad]
    # whose edge set is each shard's owned (receiver-local) edges PLUS the
    # reversed twins of its cross-shard edges ("ghosts", receivers in halo
    # rows). The symmetrized set makes `reverse_perm` well-defined, so every
    # single-chip Pallas kernel (receiver segment-sum, reverse-perm sender
    # sum, windowed selection) runs unchanged per shard, and sender-side
    # aggregation needs NO return all_to_all (ghost slots carry the
    # remote-owned out-edges locally). When set, the edge-space fields above
    # (senders_ext / receivers / ew / fiber / edge_mask) are this layout's
    # stacked arrays — receivers then live in EXT space — and only the
    # ghost-aware ops in `parallel/halo.py` may consume the level.
    local: Optional[LevelGraph] = None
    # receivers with ghost slots clamped to the local pad row (n_loc - 1,
    # a zero row): the GMP's receiver gather reads this (ghost edge outputs
    # are structurally dead in receiver aggregation — see halo.py).
    recv_clamped: Optional[np.ndarray] = None  # [S, E_pad] int32

    @property
    def n_pad_nodes(self) -> int:  # local padded node count
        return self.deg.shape[-1]

    @property
    def n_pad_edges(self) -> int:
        return self.senders_ext.shape[-1]


@struct.dataclass
class HaloHierarchy:
    levels: Tuple[HaloLevel, ...]
    transitions: Tuple[Transition, ...]  # per-shard local pool/unpool tables

    @property
    def depth(self) -> int:
        return len(self.transitions)


@struct.dataclass
class PartitionPlan:
    """Hierarchy shards + the level-0 node permutation for feature I/O."""

    hierarchy: HaloHierarchy
    perm: np.ndarray  # [S, N_loc0] global row id per local slot (pad -> pad row)
    n_global: int = struct.field(pytree_node=False)  # global PADDED row count
    n_real: int = struct.field(pytree_node=False)  # global real node count


def _partition_level(
    edges: np.ndarray,
    n: int,
    deg_global: np.ndarray,
    ec: np.ndarray,
    lvl_pos: np.ndarray,
    assignment: np.ndarray,
    n_shards: int,
    block: int,
) -> Tuple[HaloLevel, List[np.ndarray], np.ndarray, list]:
    """Build one HaloLevel. Returns (level, owned-node lists, local index of
    each global node, halo lists [dest][owner] -> global sender ids)."""
    s_count = np.bincount(assignment, minlength=n_shards)
    n_loc = _pad_to(int(s_count.max()) + 1, block)
    owned = [np.flatnonzero(assignment == s) for s in range(n_shards)]
    local_of = np.empty(n, np.int64)
    for s in range(n_shards):
        local_of[owned[s]] = np.arange(len(owned[s]))

    snd, rcv = edges[0], edges[1]
    e_owner = assignment[rcv]
    e_counts = np.bincount(e_owner, minlength=n_shards)
    e_loc = _pad_to(max(int(e_counts.max()), 1), block)

    # Halo lists: for each (dest s, owner t != s) the unique remote senders.
    halo_lists = [[np.empty(0, np.int64)] * n_shards for _ in range(n_shards)]
    for s in range(n_shards):
        es = e_owner == s
        remote = snd[es][assignment[snd[es]] != s]
        if len(remote):
            remote = np.unique(remote)
            for t in range(n_shards):
                halo_lists[s][t] = remote[assignment[remote] == t]
    h_max = max(
        (len(halo_lists[s][t]) for s in range(n_shards) for t in range(n_shards)),
        default=0,
    )
    H = max(_pad_to(h_max, 8), 8)

    halo_send = np.full((n_shards, n_shards, H), n_loc - 1, np.int32)
    # Ext slot of global node g for dest shard s: n_loc + t*H + pos.
    ext_slot = {}  # (s, g) -> ext index
    for s in range(n_shards):
        for t in range(n_shards):
            lst = halo_lists[s][t]
            if len(lst):
                halo_send[t, s, : len(lst)] = local_of[lst].astype(np.int32)
                for h, g in enumerate(lst):
                    ext_slot[(s, int(g))] = n_loc + t * H + h

    senders_ext = np.full((n_shards, e_loc), n_loc - 1, np.int32)
    receivers = np.full((n_shards, e_loc), n_loc - 1, np.int32)
    ew = np.zeros((n_shards, e_loc), np.float64)
    p64 = np.asarray(lvl_pos, np.float64)
    d_all = p64[snd] - p64[rcv]
    fib_all = np.concatenate(
        [d_all, np.linalg.norm(d_all, axis=-1, keepdims=True)], axis=-1
    )
    fiber = np.zeros((n_shards, e_loc, fib_all.shape[-1]), np.float64)
    edge_mask = np.zeros((n_shards, e_loc), np.float32)
    for s in range(n_shards):
        es = np.flatnonzero(e_owner == s)
        # Receiver-sorted within the shard (locally contiguous segments).
        es = es[np.argsort(local_of[rcv[es]], kind="stable")]
        k = len(es)
        receivers[s, :k] = local_of[rcv[es]]
        loc_snd = np.empty(k, np.int64)
        snd_s = snd[es]
        is_local = assignment[snd_s] == s
        loc_snd[is_local] = local_of[snd_s[is_local]]
        for i in np.flatnonzero(~is_local):
            loc_snd[i] = ext_slot[(s, int(snd_s[i]))]
        senders_ext[s, :k] = loc_snd
        ew[s, :k] = np.asarray(ec, np.float64)[es]
        fiber[s, :k] = fib_all[es]
        edge_mask[s, :k] = 1.0

    deg = np.ones((n_shards, n_loc), np.float32)
    node_mask = np.zeros((n_shards, n_loc, 1), np.float32)
    for s in range(n_shards):
        k = len(owned[s])
        deg[s, :k] = np.maximum(deg_global[owned[s]], 1.0)
        node_mask[s, :k, 0] = 1.0

    level = HaloLevel(
        senders_ext=senders_ext,
        receivers=receivers,
        ew=ew,
        fiber=fiber,
        deg=deg,
        node_mask=node_mask,
        edge_mask=edge_mask,
        halo_send=halo_send,
        n_shards=n_shards,
        halo_width=H,
        n_nodes=n,
        n_edges=edges.shape[1],
    )
    return level, owned, local_of, halo_lists


def _global_reverse(edges: np.ndarray, n: int) -> np.ndarray:
    """Index of each edge's reverse twin in the global (symmetric) edge
    list — same key-matching as `graph/hierarchy.py::_pad_level`."""
    snd = edges[0].astype(np.int64)
    rcv = edges[1].astype(np.int64)
    key_fwd = snd * n + rcv
    key_rev = rcv * n + snd
    order = np.argsort(key_fwd)
    pos_of_rev = np.searchsorted(key_fwd[order], key_rev)
    assert np.array_equal(key_fwd[order][pos_of_rev], key_rev), (
        "level edge set is not symmetric"
    )
    return order[pos_of_rev]


def _attach_ghost_layout(
    level: HaloLevel,
    edges: np.ndarray,
    ec: np.ndarray,
    lvl_pos: np.ndarray,
    assignment: np.ndarray,
    owned: List[np.ndarray],
    local_of: np.ndarray,
    halo_lists: list,
    edge_block: int,
    window: int = 0,
) -> HaloLevel:
    """Build the per-shard ghost-edge `LevelGraph`s (see `HaloLevel.local`)
    and rebase the level's edge-space fields onto their stacked layout.

    Shard s's local graph lives in EXT coordinates (rows [0, n_loc) = owned
    nodes + local pad, rows [n_loc, n_loc + S·H) = halo slots, then zero pad
    rows) and contains every owned edge plus the reversed twin of each
    cross-shard owned edge — a symmetric set, so `_pad_level` runs
    unchanged and yields `reverse_perm`/`ew_rev`/block-aligned chunks for
    the single-chip Pallas kernels."""
    S, H = level.n_shards, level.halo_width
    n_loc = level.deg.shape[-1]
    n_ext = n_loc + S * H
    align = NODE_BLOCK
    if window:
        # the windowed layout needs n_pad % (window // 2) == 0; window is a
        # power-of-two >= 128, so max() covers both wh | 128 and 128 | wh.
        align = max(NODE_BLOCK, window // 2)
    n_ext_pad = _pad_to(n_ext + 1, align)
    snd = edges[0].astype(np.int64)
    rcv = edges[1].astype(np.int64)
    ec64 = np.asarray(ec, np.float64)
    ec_rev = ec64[_global_reverse(edges, int(assignment.shape[0]))]
    e_owner = assignment[rcv]
    p64 = np.asarray(lvl_pos, np.float64)

    shard_inputs = []
    e_layouts = [0]
    for s in range(S):
        es = np.flatnonzero(e_owner == s)
        snd_s, rcv_s = snd[es], rcv[es]
        is_local = assignment[snd_s] == s
        ext_of = np.full(assignment.shape[0], -1, np.int64)
        ext_pos = np.zeros((n_ext, p64.shape[1]), np.float64)
        o = owned[s]
        ext_pos[local_of[o]] = p64[o]
        for t in range(S):
            lst = halo_lists[s][t]
            if len(lst):
                slots = n_loc + t * H + np.arange(len(lst))
                ext_of[lst] = slots
                ext_pos[slots] = p64[lst]
        lsnd = np.where(is_local, local_of[snd_s], ext_of[snd_s])
        lrcv = local_of[rcv_s]
        cross = np.flatnonzero(~is_local)
        local_edges = np.stack([
            np.concatenate([lsnd, lrcv[cross]]),
            np.concatenate([lrcv, ext_of[snd_s[cross]]]),
        ])
        ec_local = np.concatenate([ec64[es], ec_rev[es[cross]]])
        shard_inputs.append((local_edges, ec_local, ext_pos))
        counts = np.bincount(local_edges[1], minlength=n_ext_pad)
        e_layouts.append(layout_edge_count(counts, n_ext_pad, edge_block))

    emax = max(e_layouts)
    # cresid=None: per-shard compact-residual tables have per-shard shapes
    # and cannot stack leaf-wise across shards (the halo paths use the
    # shape-pinned mini residual layouts instead).
    lgs = [
        _pad_level(
            CsrGraph(le, n_ext), n_ext_pad, emax, ec_l, ext_pos,
            edge_block=edge_block, window=window,
        ).replace(cresid=None)
        for le, ec_l, ext_pos in shard_inputs
    ]
    if window and any(lg.resid is not None for lg in lgs):
        # Residual (out-of-window) sub-layouts must stack too: force one on
        # every shard (possibly empty) at the max residual size.
        resid_emax = max(
            lg.resid.n_pad_edges for lg in lgs if lg.resid is not None
        )
        lgs = [
            _pad_level(
                CsrGraph(le, n_ext), n_ext_pad, emax, ec_l, ext_pos,
                edge_block=edge_block, window=window,
                resid_e_pad_min=resid_emax, force_resid=True,
            )
            for le, ec_l, ext_pos in shard_inputs
        ]

    def _unify_ells(lvls, n_edges_meta):
        e_pad = lvls[0].n_pad_edges
        kin = max(lg.recv_ell.shape[1] for lg in lvls)
        kout = max(lg.send_ell.shape[1] for lg in lvls)
        return [
            lg.replace(
                recv_ell=np.pad(
                    lg.recv_ell, ((0, 0), (0, kin - lg.recv_ell.shape[1])),
                    constant_values=e_pad,
                ),
                send_ell=np.pad(
                    lg.send_ell, ((0, 0), (0, kout - lg.send_ell.shape[1])),
                    constant_values=e_pad,
                ),
                # Static metadata must match across shards for stacking;
                # n_edges records the GLOBAL level edge count.
                n_edges=n_edges_meta,
            )
            for lg in lvls
        ]

    n_edges_meta = int(edges.shape[1])
    lgs = _unify_ells(lgs, n_edges_meta)
    if lgs[0].resid is not None:
        resids = _unify_ells([lg.resid for lg in lgs], n_edges_meta)
        lgs = [lg.replace(resid=r) for lg, r in zip(lgs, resids)]
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *lgs)
    recv_clamped = np.where(
        stacked.receivers < n_loc, stacked.receivers, n_loc - 1
    ).astype(np.int32)
    return level.replace(
        senders_ext=stacked.senders,
        receivers=stacked.receivers,  # EXT space (ghost slots >= n_loc)
        ew=stacked.ew,
        fiber=stacked.fiber,
        edge_mask=stacked.edge_mask,
        local=stacked,
        recv_clamped=recv_clamped,
    )


def build_partition(
    levels: BistrideLevels,
    n_shards: int,
    n_global_pad: int,
    pos: np.ndarray,
    block: int = 128,
    local_layouts: bool = False,
    edge_block: int = EDGE_BLOCK,
    window: int = 0,
) -> PartitionPlan:
    """Partition raw bi-stride levels into an S-shard halo plan.

    `n_global_pad` is the row count of the (padded) global feature arrays
    the caller will feed `partition_nodes` (their pad rows must be zero);
    `pos` is the level-0 mesh position array used for the offline static
    fibers."""
    graphs, ids = levels.graphs, levels.ids
    n0 = graphs[0].num_nodes
    # Contiguous index blocks at level 0 (mesh numbering is usually spatially
    # coherent; a BFS-band or METIS ordering can be applied upstream by
    # permuting the mesh ids).
    per = -(-n0 // n_shards)
    assignment = np.minimum(np.arange(n0) // per, n_shards - 1)

    halo_levels = []
    owned_per_level = []
    local_per_level = []
    assignments = []
    ecs = transition_edge_weights(levels)
    lvl_pos = smoothed_positions(levels, pos)
    for l, g in enumerate(graphs):
        deg_g = g.degrees().astype(np.float32)
        lvl, owned, local_of, halo_lists = _partition_level(
            g.flat_edges, g.num_nodes, deg_g, ecs[l], lvl_pos[l],
            assignment, n_shards, block,
        )
        if local_layouts:
            lvl = _attach_ghost_layout(
                lvl, g.flat_edges, ecs[l], lvl_pos[l], assignment,
                owned, local_of, halo_lists, edge_block, window,
            )
        halo_levels.append(lvl)
        owned_per_level.append(owned)
        local_per_level.append(local_of)
        assignments.append(assignment)
        if l < len(ids):
            assignment = assignment[ids[l]]

    transitions = []
    for l, kept in enumerate(ids):
        n_loc_p = halo_levels[l].n_pad_nodes
        n_loc_c = halo_levels[l + 1].n_pad_nodes
        pool_local = np.full((n_shards, n_loc_c), n_loc_p - 1, np.int32)
        unpool_local = np.full((n_shards, n_loc_p), n_loc_c, np.int32)
        parent_local = local_per_level[l]
        child_local = local_per_level[l + 1]
        child_assign = assignments[l + 1]
        for s in range(n_shards):
            cs = np.flatnonzero(child_assign == s)  # child global ids on s
            pool_local[s, child_local[cs]] = parent_local[kept[cs]].astype(np.int32)
            unpool_local[s, parent_local[kept[cs]]] = child_local[cs].astype(np.int32)
        transitions.append(Transition(pool_ids=pool_local, unpool_inv=unpool_local))

    n_loc0 = halo_levels[0].n_pad_nodes
    assert n_global_pad > n0, "global arrays must carry at least one pad row"
    perm = np.full((n_shards, n_loc0), n_global_pad - 1, np.int64)
    for s in range(n_shards):
        o = owned_per_level[0][s]
        perm[s, : len(o)] = o

    return PartitionPlan(
        hierarchy=HaloHierarchy(
            levels=tuple(halo_levels), transitions=tuple(transitions)
        ),
        perm=perm,
        n_global=n_global_pad,
        n_real=n0,
    )


def partition_nodes(plan: PartitionPlan, x: np.ndarray) -> np.ndarray:
    """Global [..., N_pad, C] → shard-major [S, ..., N_loc, C] (pad slots
    read the global pad row, which is zero by construction)."""
    x = np.asarray(x)
    out = np.take(x, plan.perm.reshape(-1), axis=-2)
    s, n_loc = plan.perm.shape
    out = out.reshape(x.shape[:-2] + (s, n_loc) + x.shape[-1:])
    return np.moveaxis(out, -3, 0) if x.ndim > 2 else out


def unpartition_nodes(plan: PartitionPlan, y: np.ndarray) -> np.ndarray:
    """Shard-major [S, ..., N_loc, C] → global [..., N_pad, C]; global pad
    rows are zeroed."""
    y = np.asarray(y)
    s, n_loc = plan.perm.shape
    flat = np.moveaxis(y, 0, -3) if y.ndim > 3 else y
    lead = flat.shape[:-3]
    flat = flat.reshape(lead + (s * n_loc,) + y.shape[-1:])
    inv = np.zeros(plan.n_global, np.int64)
    valid = plan.perm.reshape(-1) < plan.n_global - 1
    inv[plan.perm.reshape(-1)[valid]] = np.flatnonzero(valid)
    out = np.take(flat, inv, axis=-2)
    out[..., plan.n_real :, :] = 0.0
    return out
