"""Static-shape padded hierarchy artifacts for the TPU hot path.

The reference feeds ragged per-level edge lists straight to scatter_add
(`src/ops/BSMS.py:39-104`, `src/utils/basic.py:324-343`). XLA wants static
shapes and hates scatters, so the offline builder here emits, per level:

  * receiver-sorted padded edge lists (`senders`/`receivers`, [E_pad]) —
    contiguous segments for segment-sum / Pallas paths;
  * ELL gather tables (`recv_ell` [N_pad, K_in], `send_ell` [N_pad, K_out]) —
    every node's incident-edge slots padded to the level's max degree, so
    aggregation becomes gather + dense sum (and every backward is a gather);
  * static out-degrees (`deg`) for the non-parametric transition weights
    (`cal_ew`, reference `src/ops/basic.py:142-167` — degree is a graph
    constant, so it is precomputed, not recomputed per step);
  * a validity mask for the padding nodes.

Padding convention:
  * nodes are padded to N_pad (always > N); pad nodes carry zeros and every
    pad edge connects pad node N_pad-1 to itself, so garbage never reaches a
    real node;
  * ELL empty slots point to edge index E_pad; consumers append a zero row
    at that index before gathering;
  * pool ids pad to the parent's pad node; unpool inverse pads to the child
    zero slot — `Unpool`'s zero-fill scatter (ref `ops/basic.py:170-201`)
    becomes a pure gather through `unpool_inv`.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Tuple

import numpy as np
from flax import struct

from bsms_gnn_tpu.graph.bistride import (
    BistrideLevels,
    build_bistride_levels,
    smoothed_positions,
    transition_edge_weights,
)
from bsms_gnn_tpu.graph.csr import CsrGraph

CACHE_VERSION = 17  # 17: compact residual tables (CompactResid)
# Raw (unpadded) bi-stride levels are independent of the padding/layout
# parameters; their cache format last changed at v8.
LEVELS_CACHE_VERSION = 8

# Edge chunk granularity: every 128-node block's edge segment is padded to a
# multiple of `edge_block` slots, so the Pallas segment-sum can stream
# grid-aligned chunks (auto-pipelined) and map each chunk to exactly one
# 128-row output block. EDGE_BLOCK is the default; large meshes want bigger
# blocks (the kernel pays a fixed ~250 ns per chunk — measured on v5e — so
# at millions of edges 512-edge chunks cut aggregation time ~40% for a
# ~10-25% edge-padding overhead; at <100k edges the overhead isn't worth it).
EDGE_BLOCK = 128
NODE_BLOCK = 128
# Candidate source-window widths for window="auto" (see choose_windows).
AUTO_WINDOW_CANDIDATES = (128, 256, 512, 1024)
# Cost-model price (in selection rows per edge) of one residual-gather edge;
# shared between choose_windows' default and the auto-build cache key.
AUTO_RESID_ROWS = 2048
# Transitions whose input AND output pads are at most this wide also carry a
# dense [N_out, N_in] operator matrix (one MXU matmul instead of the
# gather + segment-sum pair at dispatch-bound sizes). 2048x2048 f32 = 16 MB
# worst case; typical deep-level matrices are <2 MB.
DENSE_TRANS_MAX = 2048


def _pad_to(n: int, multiple: int, minimum: int = 0) -> int:
    n = max(n, minimum)
    return ((n + multiple - 1) // multiple) * multiple


@struct.dataclass
class LevelGraph:
    """One level's padded static graph. All index arrays are int32."""

    # Block-aligned receiver-sorted edge layout: real edges are grouped by
    # their receiver's 128-node block, each block segment padded to a
    # multiple of EDGE_BLOCK slots (pad slots self-loop on the pad node, the
    # last row of the last block). Real slots are flagged by edge_mask.
    senders: np.ndarray  # [E_pad]
    receivers: np.ndarray  # [E_pad] non-decreasing within each block
    recv_indptr: np.ndarray  # [N_pad+1] layout offset of each node's edges
    recv_ell: np.ndarray  # [N_pad, K_in] edge slots per receiver (pad = E_pad)
    send_ell: np.ndarray  # [N_pad, K_out] edge slots per sender (pad = E_pad)
    deg: np.ndarray  # [N_pad] f32 out-degree over real edges (>= 1)
    node_mask: np.ndarray  # [N_pad, 1] f32, 1.0 for real nodes
    edge_mask: np.ndarray  # [E_pad] f32, 1.0 for real edge slots
    # Slot of each edge's REVERSE (level edge sets are symmetric: they come
    # from symmetric adjacency patterns). Lets sender-aggregation reuse the
    # receiver-sorted kernel: Σ_{send(e)=n} f[e] = Σ_{recv(e)=n} f[rev[e]].
    reverse_perm: np.ndarray  # [E_pad] int32 (pad slots map to themselves)
    # Precomputed transition-conv edge weights (offline cal_ew — a pure
    # graph function; see graph/bistride.py::transition_edge_weights).
    # float64 so the f64 parity path stays exact (runtime device_put
    # canonicalizes to f32 when x64 is off); pad slots carry 0.
    ew: np.ndarray  # [E_pad] f64
    # Precomputed static edge fiber [Δpos, ‖Δpos‖] from the offline
    # smoothed-position chain (graph/bistride.py::smoothed_positions) — the
    # whole mesh-pos stream (gathers, conv, pooling) is a pure graph
    # function, so no online op touches it. Pad slots carry 0. Dynamic
    # (world-space) fibers stay online.
    fiber: np.ndarray  # [E_pad, pos_dim+1] f64
    n_nodes: int = struct.field(pytree_node=False)  # real N
    n_edges: int = struct.field(pytree_node=False)  # real E
    # Chunk granularity this layout was built with (the Pallas segment-sum
    # streams chunks of exactly this many edges; see module docstring).
    edge_block: int = struct.field(pytree_node=False, default=EDGE_BLOCK)
    # ew permuted to each slot's reverse edge (offline): the up conv is the
    # receiver-sum of x[senders]·ew∘rev, so precomputing kills a per-step
    # random [E] gather of static data (ops/message.py::_conv_up_raw).
    ew_rev: Optional[np.ndarray] = None  # [E_pad] f64
    # Windowed-gather tables (built when `window` > 0; see graph/order.py
    # and ops/pallas/windowed.py). send_win holds each slot's sender index
    # relative to its chunk's source window (sentinel `window` = handled by
    # the residual sub-level instead); win_base maps each edge chunk to its
    # window's half-window block index (window = rows [b·W/2, b·W/2 + W)).
    send_win: Optional[np.ndarray] = None  # [E_pad] int32
    win_base: Optional[np.ndarray] = None  # [E_pad // edge_block] int32
    # Mini sub-level holding the out-of-window edges (symmetrized), same
    # node space/padding: windowed ops add its contribution via the
    # standard gather + segment-sum paths.
    resid: Optional["LevelGraph"] = None
    # Compact residual tables (ops/pallas/compact_resid.py) — the fast path
    # for the same out-of-window edges: gathers/MLP on ~R real rows instead
    # of the mini layout's 3-4x padded slots. None on shape-pinned builds
    # (bucketed datasets / per-shard halo stacking), where consumers fall
    # back to `resid`.
    cresid: Optional["CompactResid"] = None
    # Source-window row count (0 = windowed layout not built).
    window: int = struct.field(pytree_node=False, default=0)
    # True when the layout drops the one-chunk-per-block minimum: node
    # blocks with no edges get NO slots, so the plain segment kernels
    # (which zero each visited output block) would leave unvisited blocks
    # undefined — only the ACCUMULATE kernels (segment_sum_accum*, output
    # aliased onto an existing array) may aggregate on such layouts.
    skip_empty: bool = struct.field(pytree_node=False, default=False)
    # Component-major static fiber [8, E_pad] f32 (rows [0, pd1) = fiber
    # components, row pd1 = constant 1.0 carrying the first bias, rest 0) —
    # derived from `fiber` at build/load, never stored. Lets the fused
    # kernels compute the fiber term as a [8,BE]ᵀ×[8,C] MXU dot from a
    # 32 B/edge stream instead of materializing the [E, C] term in HBM.
    fiber_t: Optional[np.ndarray] = None

    @property
    def n_pad_nodes(self) -> int:
        # shape[-1] so stacked (per-sample batched) hierarchies also work.
        return self.deg.shape[-1]

    @property
    def n_pad_edges(self) -> int:
        return self.senders.shape[-1]


@struct.dataclass
class CompactResid:
    """Dense (per-real-edge) residual tables for the block-visit accumulate
    kernel (ops/pallas/compact_resid.py).

    The mini block-aligned residual LevelGraph pads its slot space ~3-4x
    (every 128-node block with stragglers rounds up to a whole edge chunk),
    and every residual gather/MLP runs over those mostly-pad slots — at 1M
    nodes that was ~74 ns per real residual edge, ~25% of the whole forward
    (benchmarks/kernel_breakdown.py, round 4). Here rows are receiver-sorted
    real edges padded only to the next 128; the aggregate runs one VISIT per
    (128-row input block × output node-block) incidence."""

    senders: np.ndarray  # [Rp] int32 absolute (pad → n_pad-1)
    receivers: np.ndarray  # [Rp] int32 absolute, non-decreasing (pad → n_pad-1)
    ew: np.ndarray  # [Rp] f64 (pad 0)
    ew_rev: np.ndarray  # [Rp] f64 twin's weight (levels; == ew for TransOps)
    fiber: np.ndarray  # [Rp, pd1] f64 (zeros when no positions)
    twin: np.ndarray  # [Rp] int32 compact row of the reverse edge (or identity)
    visit_block: np.ndarray  # [V] int32 output node-block (non-decreasing)
    visit_cblk: np.ndarray  # [V] int32 input 128-row block of compact rows
    visit_recv: np.ndarray  # [ceil(V/8)*8, 128] int32 LOCAL recv row (-1 = masked)
    n_real: int = struct.field(pytree_node=False, default=0)
    n_pad_nodes: int = struct.field(pytree_node=False, default=0)
    # True when the edge set is symmetric (level residuals): sender-sums may
    # ride the twin permutation through the receiver-visit kernel.
    symmetric: bool = struct.field(pytree_node=False, default=True)

    @property
    def n_rows(self) -> int:
        return self.senders.shape[-1]


def _compact_resid(
    s: np.ndarray, r: np.ndarray, ew: np.ndarray, ew_rev: np.ndarray,
    n_pad: int, lvl_pos: Optional[np.ndarray], symmetric: bool,
    n_in_pad: Optional[int] = None,
) -> CompactResid:
    """Build CompactResid from raw (unsorted) residual edges. `n_in_pad`
    (rectangular operators) sets the sender pad row; receivers live in the
    `n_pad` output space."""
    s = np.asarray(s, np.int64)
    r = np.asarray(r, np.int64)
    order = np.lexsort((s, r))
    s, r = s[order], r[order]
    ew = np.asarray(ew, np.float64)[order]
    ew_rev = np.asarray(ew_rev, np.float64)[order]
    n = s.shape[0]
    rp = max(-(-n // 128) * 128, 128)

    senders = np.full(rp, (n_in_pad or n_pad) - 1, np.int32)
    receivers = np.full(rp, n_pad - 1, np.int32)
    senders[:n] = s
    receivers[:n] = r
    ew_p = np.zeros(rp, np.float64)
    ew_p[:n] = ew
    ewr_p = np.zeros(rp, np.float64)
    ewr_p[:n] = ew_rev

    pd1 = 1 if lvl_pos is None else lvl_pos.shape[1] + 1
    fiber = np.zeros((rp, pd1), np.float64)
    if lvl_pos is not None and n:
        p = np.asarray(lvl_pos, np.float64)
        d = p[s] - p[r]
        fiber[:n] = np.concatenate(
            [d, np.linalg.norm(d, axis=-1, keepdims=True)], axis=-1
        )

    twin = np.arange(rp, dtype=np.int32)
    if symmetric and n:
        key = s * n_pad + r
        key_rev = r * n_pad + s
        ko = np.argsort(key)
        pos = np.searchsorted(key[ko], key_rev)
        assert np.array_equal(key[ko][pos], key_rev), (
            "residual edge set is not symmetric"
        )
        twin[:n] = ko[pos].astype(np.int32)

    # Visits: one per (compact 128-row block, output node-block) incidence.
    vb, vc, vr = [], [], []
    rblk = np.where(np.arange(rp) < n, receivers // NODE_BLOCK, -1)
    for cb in range(rp // 128):
        seg = rblk[cb * 128:(cb + 1) * 128]
        for ob in np.unique(seg[seg >= 0]):
            vb.append(ob)
            vc.append(cb)
            loc = np.where(seg == ob,
                           receivers[cb * 128:(cb + 1) * 128]
                           - ob * NODE_BLOCK, -1)
            vr.append(loc.astype(np.int32))
    if not vb:  # empty residual: one no-op visit keeps the kernel valid
        vb, vc, vr = [0], [0], [np.full(128, -1, np.int32)]
    v = len(vb)
    v8 = -(-v // 8) * 8
    visit_recv = np.full((v8, 128), -1, np.int32)
    visit_recv[:v] = np.stack(vr)
    return CompactResid(
        senders=senders,
        receivers=receivers,
        ew=ew_p,
        ew_rev=ewr_p,
        fiber=fiber,
        twin=twin,
        visit_block=np.asarray(vb, np.int32),
        visit_cblk=np.asarray(vc, np.int32),
        visit_recv=visit_recv,
        n_real=int(n),
        n_pad_nodes=int(n_pad),
        symmetric=bool(symmetric),
    )


@struct.dataclass
class TransOp:
    """Rectangular weighted-aggregation operator: one FUSED level transition.

    The down transition (weighted conv then index-select pool, reference
    `BSMS.py:74-89`) and the up transition (zero-fill unpool then reverse
    conv, `BSMS.py:98-100`) are compositions of linear maps whose
    coefficients (`cal_ew`) are pure graph functions — so each is a single
    precomputed sparse operator `out = M @ x`:

        M_down[k, i] = Σ_{e=(i → kept_k)} ew_e        (N_parent → M_child)
        M_up         = M_downᵀ                         (M_child → N_parent)

    and each direction's VJP is the other operator. This replaces the
    4-6 dispatched ops per transition (gather, scale, segment-sum, select /
    zero-fill) with one gather+scale and one aggregation kernel — the right
    trade on a chip where every op pays a fixed ~15-30 µs regardless of
    size (PARITY.md roofline §1: the headline sizes are dispatch-bound).

    The layout mirrors LevelGraph's receiver-sorted block-aligned scheme
    over the OUTPUT space, so `ops/pallas/segment_sum.py` runs unchanged
    (duck-typed: it reads receivers/recv_indptr/edge_block/n_pad_* only).
    Pad slots carry ew=0, so garbage in input pad rows never propagates.
    """

    senders: np.ndarray  # [E_pad] INPUT-space rows
    receivers: np.ndarray  # [E_pad] OUTPUT-space rows (block-sorted)
    recv_indptr: np.ndarray  # [N_out_pad + 1]
    ew: np.ndarray  # [E_pad] f64 operator coefficients (0 on pad slots)
    n_in_pad: int = struct.field(pytree_node=False)
    edge_block: int = struct.field(pytree_node=False, default=EDGE_BLOCK)
    # Windowed-selection tables over the INPUT space (built when the level
    # is windowed): the operator application then runs the gather-free
    # windowed one-hot kernel (ops/pallas/windowed.py) instead of a
    # `take` — at 1M scale the row gather is the transition stack's floor
    # (issue-rate-bound, PARITY.md roofline §6). Out-of-window entries ride
    # `resid` (a skip-empty mini TransOp) through take + accumulate.
    send_win: Optional[np.ndarray] = None  # [E_pad] rel. window idx
    win_base: Optional[np.ndarray] = None  # [E_pad // edge_block] int32
    resid: Optional["TransOp"] = None
    # Compact residual (receivers in OUTPUT space, senders in INPUT space,
    # symmetric=False): see LevelGraph.cresid.
    cresid: Optional["CompactResid"] = None
    window: int = struct.field(pytree_node=False, default=0)
    skip_empty: bool = struct.field(pytree_node=False, default=False)
    # Dense [N_out_pad, N_in_pad] form of the operator, built offline when
    # both sides fit DENSE_TRANS_MAX: at tiny deep-level sizes one MXU
    # matmul (~15 µs) beats the gather + segment-sum kernel pair (~60-100
    # µs fixed cost each) — the headline meshes are dispatch-bound
    # (PARITY.md roofline §1).
    dense: Optional[np.ndarray] = None

    @property
    def n_pad_nodes(self) -> int:  # OUTPUT rows (kernel contract)
        return self.recv_indptr.shape[-1] - 1

    @property
    def n_pad_edges(self) -> int:
        return self.senders.shape[-1]


@struct.dataclass
class Transition:
    """Pool/unpool maps between level l (parent) and level l+1 (child).

    `down_op`/`up_op`, when built, are the fused conv+pool / unpool+conv
    operators (see TransOp); pool_ids/unpool_inv stay for the parity-oracle
    paths and the halo partitioning's shard-aligned transitions."""

    pool_ids: np.ndarray  # [M_pad] parent-space node ids (pad → parent pad node)
    unpool_inv: np.ndarray  # [N_pad_parent] child slot or M_pad (zero slot)
    down_op: Optional[TransOp] = None
    up_op: Optional[TransOp] = None
    # Replication boundary (parallel/partition.py, replicate_floor > 0):
    # parent level partitioned, child level replicated on every shard. Set
    # to [S, M_child, 1] with 1 where this shard owns the child's parent —
    # the online pool masks non-owned rows and psums shards to assemble the
    # full child level (ops/pool.py::pool_nodes_boundary); unpool back is a
    # purely local full-child gather. None everywhere else.
    pool_mask: Optional[np.ndarray] = None
    # Dense [child_pad, parent_pad] / [parent_pad, child_pad] operator
    # matrices for BUCKETED variable-mesh groups: sparse op layouts can't
    # stack across meshes (per-mesh E_pad), but dense matrices at bucket
    # shapes stack leaf-wise, giving those datasets the fused-transition
    # dispatch saving whenever both pads fit DENSE_TRANS_MAX.
    down_dense: Optional[np.ndarray] = None
    up_dense: Optional[np.ndarray] = None


@struct.dataclass
class Hierarchy:
    levels: Tuple[LevelGraph, ...]
    transitions: Tuple[Transition, ...]

    @property
    def depth(self) -> int:
        return len(self.transitions)


def _build_ell(index: np.ndarray, slots: np.ndarray, n_pad: int, e_pad: int,
               k_min: int = 0) -> np.ndarray:
    """ELL table: row n lists the layout slots (from `slots`) whose `index`
    value equals n, padded with e_pad. K = max multiplicity over nodes (or
    `k_min` if larger — shape-bucketed datasets force a common width so one
    program serves every mesh of a group)."""
    idx = np.asarray(index, np.int64)
    counts = np.bincount(idx, minlength=n_pad)
    k = max(int(counts.max()) if counts.size else 0, 1, k_min)
    ell = np.full((n_pad, k), e_pad, dtype=np.int32)
    order = np.argsort(idx, kind="stable")
    sorted_idx = idx[order]
    # Position of each edge within its node's slot list.
    starts = np.zeros(n_pad + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(len(idx)) - starts[sorted_idx]
    ell[sorted_idx, pos] = slots[order].astype(np.int32)
    return ell


def layout_edge_count(
    edge_counts_per_node: np.ndarray, n_pad: int, edge_block: int = EDGE_BLOCK
) -> int:
    """Padded layout size for given per-node real edge counts: per 128-node
    block, ceil(max(count,1)/edge_block)·edge_block slots (≥1 chunk each)."""
    counts = np.zeros(n_pad, np.int64)
    counts[: len(edge_counts_per_node)] = edge_counts_per_node
    blocks = counts.reshape(-1, NODE_BLOCK).sum(axis=1)
    seg = np.maximum(blocks, 1)
    seg = -(-seg // edge_block) * edge_block
    return int(seg.sum())


def _pad_level(
    g: CsrGraph, n_pad: int, e_pad_min: int, ec: Optional[np.ndarray] = None,
    lvl_pos: Optional[np.ndarray] = None, edge_block: int = EDGE_BLOCK,
    window: int = 0, min_chunks: bool = True,
    resid_e_pad_min: int = 0, force_resid: bool = False,
    ell_k_min: int = 0, resid_ell_k_min: int = 0,
    force_cresid: bool = False,
) -> LevelGraph:
    n, e = g.num_nodes, g.flat_edges.shape[1]
    assert n_pad > n, "need at least one padding node"
    assert n_pad % NODE_BLOCK == 0
    if window:
        assert window % 2 == 0 and window >= NODE_BLOCK
        assert n_pad % (window // 2) == 0, (
            f"windowed layout needs n_pad multiple of {window // 2}"
        )

    # Block-grouped real edges. Within a 128-node receiver block the slot
    # order is free (every consumer reads recv_indptr only at block
    # granularity, [::BN]); windowed layouts sort each block's edges by
    # SENDER so that 512-edge chunks cluster in sender space — per-chunk
    # windows then cover 95-99% of edges at fixed W (vs 73-93% for
    # per-block windows on the deeper bi-stride levels).
    if window:
        order = np.lexsort(
            (g.flat_edges[1], g.flat_edges[0], g.flat_edges[1] // NODE_BLOCK)
        )
    else:
        order = np.lexsort((g.flat_edges[0], g.flat_edges[1]))
    r_sorted = g.flat_edges[1][order]
    s_sorted = g.flat_edges[0][order]
    ec_sorted = None if ec is None else np.asarray(ec, np.float64)[order]
    fib_sorted = None
    if lvl_pos is not None:
        p = np.asarray(lvl_pos, np.float64)
        d = p[s_sorted] - p[r_sorted]
        fib_sorted = np.concatenate(
            [d, np.linalg.norm(d, axis=-1, keepdims=True)], axis=-1
        )

    # Block-aligned layout: per 128-node block, its edges then pad slots up
    # to a multiple of edge_block (at least one chunk per block so every
    # output block is visited by the Pallas kernel).
    recv_counts = np.bincount(r_sorted, minlength=n_pad)
    block_counts = recv_counts.reshape(-1, NODE_BLOCK).sum(axis=1)
    min_per_block = np.maximum(block_counts, 1) if min_chunks else block_counts
    seg_lens = -(-min_per_block // edge_block) * edge_block
    e_layout = int(seg_lens.sum())
    e_pad = max(e_layout, -(-e_pad_min // edge_block) * edge_block)

    block_starts = np.zeros(len(seg_lens) + 1, np.int64)
    np.cumsum(seg_lens, out=block_starts[1:])

    # Slot position of each sorted real edge: block start + rank in block.
    blk_of_edge = r_sorted // NODE_BLOCK
    cum_before = np.zeros(len(seg_lens) + 1, np.int64)
    np.cumsum(block_counts, out=cum_before[1:])
    slots = block_starts[blk_of_edge] + (np.arange(e) - cum_before[blk_of_edge])

    senders = np.full(e_pad, n_pad - 1, dtype=np.int32)
    receivers = np.full(e_pad, n_pad - 1, dtype=np.int32)
    edge_mask = np.zeros(e_pad, np.float32)
    senders[slots] = s_sorted
    receivers[slots] = r_sorted
    edge_mask[slots] = 1.0

    # Reverse-edge permutation: match (s, r) with (r, s) among real slots.
    key_fwd = s_sorted.astype(np.int64) * n_pad + r_sorted
    key_rev = r_sorted.astype(np.int64) * n_pad + s_sorted
    key_order = np.argsort(key_fwd)
    pos_of_rev = np.searchsorted(key_fwd[key_order], key_rev)
    assert np.array_equal(key_fwd[key_order][pos_of_rev], key_rev), (
        "level edge set is not symmetric"
    )
    rev_idx = key_order[pos_of_rev]  # sorted-edge index of each edge's twin
    reverse_perm = np.arange(e_pad, dtype=np.int32)
    reverse_perm[slots] = slots[rev_idx].astype(np.int32)

    # Per-node layout offsets: block start + cumulative count within block.
    within = recv_counts.reshape(-1, NODE_BLOCK)
    within_cum = np.cumsum(within, axis=1) - within
    recv_indptr = np.zeros(n_pad + 1, np.int64)
    recv_indptr[:n_pad] = (block_starts[:-1, None] + within_cum).reshape(-1)
    recv_indptr[n_pad] = e_pad
    recv_indptr = recv_indptr.astype(np.int32)

    recv_ell = _build_ell(r_sorted, slots, n_pad, e_pad, ell_k_min)
    send_ell = _build_ell(s_sorted, slots, n_pad, e_pad, ell_k_min)

    deg = np.zeros(n_pad, dtype=np.float32)
    deg[:n] = g.degrees().astype(np.float32)
    deg = np.maximum(deg, 1.0)

    node_mask = np.zeros((n_pad, 1), dtype=np.float32)
    node_mask[:n] = 1.0

    ew = np.zeros(e_pad, np.float64)
    if ec is not None:
        ew[slots] = ec_sorted
    pd1 = 1 if lvl_pos is None else lvl_pos.shape[1] + 1
    fiber = np.zeros((e_pad, pd1), np.float64)
    if fib_sorted is not None:
        fiber[slots] = fib_sorted
    ew_rev = ew[reverse_perm]
    fiber_t = _fiber_t(fiber)

    send_win = win_base = resid_level = cresid = None
    if window:
        # Tiny levels: a window wider than the node set would index
        # half-window blocks out of range — shrink to the node count
        # (base 0 then covers every sender; no residual).
        window = min(window, n_pad)
        assert n_pad % (window // 2) == 0
        send_win, win_base, resid_level, cresid = _window_tables(
            senders, receivers, edge_mask, reverse_perm, ew, n_pad, window,
            edge_block, n, lvl_pos, resid_e_pad_min, force_resid,
            resid_ell_k_min, force_cresid,
        )
    return LevelGraph(
        senders=senders,
        receivers=receivers,
        recv_indptr=recv_indptr,
        recv_ell=recv_ell,
        send_ell=send_ell,
        deg=deg,
        node_mask=node_mask,
        edge_mask=edge_mask,
        reverse_perm=reverse_perm,
        ew=ew,
        fiber=fiber,
        n_nodes=n,
        n_edges=e,
        edge_block=edge_block,
        ew_rev=ew_rev,
        send_win=send_win,
        win_base=win_base,
        resid=resid_level,
        cresid=cresid,
        window=window,
        skip_empty=not min_chunks,
        fiber_t=fiber_t,
    )


def _pad_trans_layout(
    s: np.ndarray, r: np.ndarray, w: np.ndarray,
    n_in_pad: int, n_out_pad: int, edge_block: int,
    window: int = 0, min_chunks: bool = True,
) -> TransOp:
    """Block-aligned receiver-sorted layout for a rectangular operator:
    outputs r (in [0, n_out_pad)), inputs s (in [0, n_in_pad)), weights w.
    Same slotting scheme as `_pad_level` (≥1 chunk per 128-row output block;
    pad slots self-loop on the pad rows with weight 0). `window` > 0 builds
    the input-space windowed-selection tables (sender-sorted chunks, per-
    chunk window vote, skip-empty residual sub-op for uncovered entries —
    no symmetrization: rectangular operators have no reverse twins)."""
    assert n_out_pad % NODE_BLOCK == 0
    if window:
        window = min(window, n_in_pad)
        assert window % 2 == 0 and n_in_pad % (window // 2) == 0
        order = np.lexsort((r, s, r // NODE_BLOCK))
    else:
        order = np.lexsort((s, r))
    s_sorted = s[order].astype(np.int64)
    r_sorted = r[order].astype(np.int64)
    w_sorted = np.asarray(w, np.float64)[order]

    recv_counts = np.bincount(r_sorted, minlength=n_out_pad)
    block_counts = recv_counts.reshape(-1, NODE_BLOCK).sum(axis=1)
    min_per_block = np.maximum(block_counts, 1) if min_chunks else block_counts
    seg_lens = -(-min_per_block // edge_block) * edge_block
    e_pad = int(seg_lens.sum())

    block_starts = np.zeros(len(seg_lens) + 1, np.int64)
    np.cumsum(seg_lens, out=block_starts[1:])
    blk_of_edge = r_sorted // NODE_BLOCK
    cum_before = np.zeros(len(seg_lens) + 1, np.int64)
    np.cumsum(block_counts, out=cum_before[1:])
    slots = block_starts[blk_of_edge] + (
        np.arange(len(r_sorted)) - cum_before[blk_of_edge]
    )

    senders = np.full(e_pad, n_in_pad - 1, dtype=np.int32)
    receivers = np.full(e_pad, n_out_pad - 1, dtype=np.int32)
    edge_mask = np.zeros(e_pad, np.float32)
    ew = np.zeros(e_pad, np.float64)
    senders[slots] = s_sorted
    receivers[slots] = r_sorted
    edge_mask[slots] = 1.0
    ew[slots] = w_sorted

    within = recv_counts.reshape(-1, NODE_BLOCK)
    within_cum = np.cumsum(within, axis=1) - within
    recv_indptr = np.zeros(n_out_pad + 1, np.int64)
    recv_indptr[:n_out_pad] = (block_starts[:-1, None] + within_cum).reshape(-1)
    recv_indptr[n_out_pad] = e_pad
    # No ELL table: the narrow-width fallback uses the sorted segment-sum
    # ([N_out, K] ELL tables cost >1 GB device memory at 1M scale for a
    # path only the <8-channel dyn streams and parity oracles take).

    send_win = win_base = resid = cresid = None
    if window:
        # Per-chunk window vote over the INPUT space; identity reverse_perm
        # disables the symmetrization step (see _window_vote).
        base, covered = _window_vote(
            senders, edge_mask, np.arange(e_pad, dtype=np.int32),
            n_in_pad, window, edge_block,
        )
        wh = window // 2
        lo = np.repeat(base, edge_block) * wh
        send_win = np.where(
            covered, senders - lo, window
        ).astype(np.int32)
        win_base = base.astype(np.int32)
        uncov = (edge_mask > 0) & ~covered
        if uncov.any():
            resid = _pad_trans_layout(
                senders[uncov].astype(np.int64),
                receivers[uncov].astype(np.int64),
                ew[uncov], n_in_pad, n_out_pad,
                min(edge_block, EDGE_BLOCK), window=0, min_chunks=False,
            )
            resid = resid.replace(skip_empty=True)
            cresid = _compact_resid(
                senders[uncov].astype(np.int64),
                receivers[uncov].astype(np.int64),
                ew[uncov], ew[uncov], n_out_pad, None, symmetric=False,
                n_in_pad=n_in_pad,
            )

    dense = None
    if (window == 0 and min_chunks
            and n_in_pad <= DENSE_TRANS_MAX and n_out_pad <= DENSE_TRANS_MAX):
        dense = np.zeros((n_out_pad, n_in_pad), np.float32)
        np.add.at(dense, (r_sorted, s_sorted), w_sorted.astype(np.float32))

    return TransOp(
        senders=senders,
        receivers=receivers,
        recv_indptr=recv_indptr.astype(np.int32),
        ew=ew,
        n_in_pad=n_in_pad,
        edge_block=edge_block,
        send_win=send_win,
        win_base=win_base,
        resid=resid,
        cresid=cresid,
        window=window,
        skip_empty=not min_chunks,
        dense=dense,
    )


def _build_dense_trans(
    flat_edges: np.ndarray, ec: np.ndarray, kept: np.ndarray,
    parent_pad: int, child_pad: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense forms of the fused conv→pool / unpool→conv operators (same
    edge selection as _build_trans_ops: only edges with a kept receiver
    contribute — ref `BSMS.py:79-89`). up = downᵀ (the operators are each
    other's adjoints)."""
    snd = flat_edges[0].astype(np.int64)
    rcv = flat_edges[1].astype(np.int64)
    local_of = np.full(parent_pad, -1, np.int64)
    local_of[kept.astype(np.int64)] = np.arange(len(kept))
    sel = local_of[rcv] >= 0
    down = np.zeros((child_pad, parent_pad), np.float32)
    np.add.at(
        down, (local_of[rcv[sel]], snd[sel]),
        np.asarray(ec, np.float64)[sel].astype(np.float32),
    )
    return down, np.ascontiguousarray(down.T)


def _build_trans_ops(
    flat_edges: np.ndarray, ec: np.ndarray, kept: np.ndarray,
    parent_pad: int, child_pad: int, edge_block: int, window: int = 0,
) -> Tuple[TransOp, TransOp]:
    """Fused transition operators from level-l raw edges + offline cal_ew
    weights + the kept-node ids (see TransOp). Only edges whose receiver is
    kept contribute (pool drops the rest; `BSMS.py:79-89`)."""
    snd = flat_edges[0].astype(np.int64)
    rcv = flat_edges[1].astype(np.int64)
    n_raw = parent_pad  # receivers/senders < real N < parent_pad
    local_of = np.full(n_raw, -1, np.int64)
    local_of[kept.astype(np.int64)] = np.arange(len(kept))
    sel = local_of[rcv] >= 0
    s_par = snd[sel]  # parent-space inputs (down) / outputs (up)
    r_chd = local_of[rcv[sel]]  # child-space outputs (down) / inputs (up)
    w = np.asarray(ec, np.float64)[sel]
    down = _pad_trans_layout(s_par, r_chd, w, parent_pad, child_pad,
                             edge_block, window=window)
    up = _pad_trans_layout(r_chd, s_par, w, child_pad, parent_pad,
                           edge_block, window=window)
    return down, up


def _fiber_t(fiber: np.ndarray) -> np.ndarray:
    """[8, E_pad] f32 component-major fiber with a constant-1 row at index
    pd1 (carries the edge MLP's first bias through the same dot)."""
    e_pad, pd1 = fiber.shape
    assert pd1 < 8
    out = np.zeros((8, e_pad), np.float32)
    out[:pd1] = fiber.T.astype(np.float32)
    out[pd1] = 1.0
    return out


def _window_vote(
    senders: np.ndarray,
    edge_mask: np.ndarray,
    reverse_perm: np.ndarray,
    n_pad: int,
    window: int,
    edge_block: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-chunk window vote: each `edge_block`-slot chunk picks the W-row
    source window (base aligned to W/2) covering the most of its real
    senders. Returns (base [num_chunks], covered [E_pad]) with coverage
    symmetrized (an edge counts as covered only if its reverse twin is too,
    so the residual edge set stays symmetric). Fully vectorized — the
    per-chunk mode is a grouped unique-count argmax, first-max tie-break
    (lowest candidate), matching np.argmax over ascending candidates."""
    wh = window // 2
    e_pad = len(senders)
    num_chunks = e_pad // edge_block
    max_base = n_pad // wh - 2
    real = edge_mask > 0
    s64 = senders.astype(np.int64)

    chunk_of = np.repeat(np.arange(num_chunks, dtype=np.int64), edge_block)
    gr = s64 // wh
    cand = np.concatenate([gr - 1, gr])
    cchunk = np.concatenate([chunk_of, chunk_of])
    keep = np.concatenate([real, real]) & (cand >= 0) & (cand <= max_base)
    stride = max_base + 1
    total_keys = num_chunks * stride
    if total_keys <= 200_000_000:
        # Dense histogram + row argmax: O(E + chunks·stride), no sort.
        # np.argmax returns the FIRST maximum = lowest candidate, matching
        # the unique-path tie-break; all-zero rows give base 0, matching
        # the empty-chunk default.
        hist = np.bincount(cchunk[keep] * stride + cand[keep],
                           minlength=total_keys).reshape(num_chunks, stride)
        base = np.argmax(hist, axis=1).astype(np.int64)
    else:
        keys, cnts = np.unique(cchunk[keep] * stride + cand[keep],
                               return_counts=True)
        base = np.zeros(num_chunks, np.int64)
        if keys.size:
            kchunk = keys // stride
            new_run = np.r_[True, kchunk[1:] != kchunk[:-1]]
            run_id = np.cumsum(new_run) - 1
            run_starts = np.flatnonzero(new_run)
            run_max = np.maximum.reduceat(cnts, run_starts)
            at_max = np.flatnonzero(cnts == run_max[run_id])
            runs_at = run_id[at_max]
            first = at_max[np.r_[True, runs_at[1:] != runs_at[:-1]]]
            base[kchunk[run_starts]] = keys[first] % stride

    lo = np.repeat(base, edge_block) * wh
    covered = real & (s64 >= lo) & (s64 < lo + window)
    covered &= covered[reverse_perm]
    return base, covered


def window_coverage(level: "LevelGraph", window: int) -> float:
    """Covered-edge fraction a built level WOULD get at source-window size
    `window` (the chunk layout is window-size-independent: blocks are
    sender-sorted once, see _pad_level). Offline analysis for
    choose_windows / benchmarks."""
    n_pad = level.n_pad_nodes
    w = min(window, n_pad)
    if n_pad % (w // 2):
        return float("nan")
    _, covered = _window_vote(
        np.asarray(level.senders), np.asarray(level.edge_mask),
        np.asarray(level.reverse_perm), n_pad, w, level.edge_block,
    )
    return float(covered.sum()) / max(level.n_edges, 1)


def choose_windows(
    h: "Hierarchy",
    candidates: Tuple[int, ...] = AUTO_WINDOW_CANDIDATES,
    resid_rows: int = AUTO_RESID_ROWS,
) -> List[int]:
    """Offline per-level window auto-tuner. Evaluates each candidate W on a
    hierarchy already built with windowed layouts (any W — the chunk order
    is W-independent) and picks the per-level cost minimizer:

        cost(W) = E_pad · W/2  +  uncovered_edges · resid_rows

    The first term is the windowed kernels' selection work (one-hot MXU
    dots read W/2 source rows per edge — see ops/pallas/windowed.py); the
    second prices each out-of-window edge's trip through the residual
    gather path, which is issue-rate-bound on v5e (~200M rows/s vs the
    MXU's ~µs per 512-edge chunk — PARITY.md "Kernel roofline" items 6-7),
    i.e. worth roughly `resid_rows` selection rows per edge. Returns the
    per-level W list for pad_levels(window=[...])."""
    out = []
    for g in h.levels:
        n_pad = g.n_pad_nodes
        best_w, best_cost = 0, None
        for w in candidates:
            weff = min(w, n_pad)
            if n_pad % (weff // 2):
                continue
            cov = window_coverage(g, weff)
            n_resid = (1.0 - cov) * g.n_edges
            cost = g.n_pad_edges * (weff // 2) + n_resid * resid_rows
            if best_cost is None or cost < best_cost:
                best_w, best_cost = w, cost
        assert best_cost is not None, "no window candidate divides n_pad"
        out.append(best_w)
    return out


def _window_tables(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    reverse_perm: np.ndarray,
    ew: np.ndarray,
    n_pad: int,
    window: int,
    edge_block: int,
    n: int,
    lvl_pos: Optional[np.ndarray],
    resid_e_pad_min: int = 0,
    force_resid: bool = False,
    resid_ell_k_min: int = 0,
    force_cresid: bool = False,
):
    """Per-CHUNK aligned source windows for the windowed one-hot gather
    kernel (ops/pallas/windowed.py).

    Each `edge_block`-slot chunk picks the W-row window (base aligned to
    W/2) covering the most of its senders — blocks are sender-sorted
    internally (see _pad_level), so chunks cluster tightly in sender space
    and fixed-W coverage stays high even on the deep bi-stride levels whose
    squared-adjacency neighborhoods span wide id ranges. Edges left outside
    (or whose reverse twin is — coverage is symmetrized so the residual set
    stays symmetric) go to a mini residual LevelGraph over the same padded
    node space, handled by the standard gather/segment paths. With
    Morton-ordered nodes (graph/order.py) coverage is typically ≥95%."""
    base, covered = _window_vote(
        senders, edge_mask, reverse_perm, n_pad, window, edge_block
    )
    wh = window // 2
    s64 = senders.astype(np.int64)
    lo = np.repeat(base, edge_block) * wh
    real = edge_mask > 0

    send_win = np.where(covered, s64 - lo, window).astype(np.int32)
    win_base = base.astype(np.int32)

    resid_level = None
    cresid = None
    m = real & ~covered
    if m.any() or force_resid:
        # force_resid builds a (possibly empty) residual even when every
        # edge is covered — per-shard halo layouts need identical treedefs
        # across shards (parallel/partition.py stacks them leaf-wise).
        redges = np.stack([s64[m], receivers.astype(np.int64)[m]])
        # skip-empty layout: blocks with no residual edges get no slots
        # (aggregation must go through the accumulate kernels).
        resid_level = _pad_level(
            CsrGraph(redges, n), n_pad, resid_e_pad_min, ew[m], lvl_pos,
            edge_block=min(edge_block, EDGE_BLOCK), window=0,
            min_chunks=False, ell_k_min=resid_ell_k_min,
        )
        if (not force_resid and resid_e_pad_min == 0
                and resid_ell_k_min == 0) or force_cresid:
            # Compact fast path — skipped on shape-pinned builds (bucketed
            # datasets), which need fixed table shapes, UNLESS the caller
            # unifies the table shapes itself (per-shard halo stacking:
            # parallel/partition.py::_unify_cresids pads rows/visits to
            # the shard maximum with inert entries).
            cresid = _compact_resid(
                s64[m], receivers.astype(np.int64)[m], ew[m],
                ew[reverse_perm][m], n_pad, lvl_pos, symmetric=True,
            )
    return send_win, win_base, resid_level, cresid


def build_hierarchy(
    flat_edges: np.ndarray,
    num_layers: int,
    num_nodes: int,
    pos: np.ndarray,
    pad_multiple: int = 128,
    node_buckets: Optional[List[int]] = None,
    edge_buckets: Optional[List[int]] = None,
    edge_block: int = EDGE_BLOCK,
    window: "int | List[int]" = 0,
) -> Hierarchy:
    """Build bi-stride levels and pad them to static shapes.

    `node_buckets`/`edge_buckets` optionally force per-level padded sizes
    (for shape-bucketing across meshes of a variable-mesh dataset); otherwise
    each level pads up to the next `pad_multiple` (plus the guaranteed pad
    node). `window` > 0 additionally builds the windowed-gather tables
    (best with a Morton-ordered mesh, graph/order.py; not supported together
    with bucketed stacking). A per-level list sets each level's source-window
    size independently (every level compiles its own kernels anyway, so
    mixed widths are free — see choose_windows for the offline auto-tuner).
    """
    levels = build_bistride_levels(flat_edges, num_layers, num_nodes, pos)
    return pad_levels(
        levels, pad_multiple, node_buckets, edge_buckets, pos=pos,
        edge_block=edge_block, window=window,
    )


def pad_levels(
    levels: BistrideLevels,
    pad_multiple: int = 128,
    node_buckets: Optional[List[int]] = None,
    edge_buckets: Optional[List[int]] = None,
    pos: Optional[np.ndarray] = None,
    edge_block: int = EDGE_BLOCK,
    window: "int | List[int]" = 0,
    ell_buckets: Optional[List[int]] = None,
    resid_buckets: Optional[List[Tuple[int, int]]] = None,
) -> Hierarchy:
    """`ell_buckets` (per-level ELL width) and `resid_buckets` (per-level
    (E_pad, ELL width) of the windowed residual sub-layout, with (0, 0)
    meaning "force an empty residual") let the bucket planner pin EVERY
    array shape of a group, so one compiled program truly serves all of a
    group's meshes (the max-degree/ residual-size variation would otherwise
    recompile per trajectory)."""
    graphs, ids = levels.graphs, levels.ids
    windows = (
        list(window)
        if isinstance(window, (list, tuple))
        else [window] * len(graphs)
    )
    assert len(windows) == len(graphs), (
        f"per-level window list has {len(windows)} entries for "
        f"{len(graphs)} levels"
    )
    lvl_pos = None if pos is None else smoothed_positions(levels, pos)
    node_multiple = _pad_to(pad_multiple, NODE_BLOCK)
    if any(windows):
        node_multiple = _pad_to(node_multiple, max(windows) // 2)
    n_pads = []
    e_pads = []
    for l, g in enumerate(graphs):
        if node_buckets is not None:
            n_pad = node_buckets[l]
            assert n_pad > g.num_nodes, f"node bucket {n_pad} too small at level {l}"
            assert n_pad % NODE_BLOCK == 0, f"node bucket {n_pad} not {NODE_BLOCK}-aligned"
            if windows[l]:
                # bucketed variable-mesh datasets may window too (the
                # sampler never mixes meshes within a batch, so per-mesh
                # window/residual table shapes only affect compile reuse,
                # not correctness); buckets must be window/2-aligned.
                assert n_pad % (min(windows[l], n_pad) // 2) == 0, (
                    f"node bucket {n_pad} not aligned to window/2"
                )
        else:
            n_pad = _pad_to(g.num_nodes + 1, node_multiple)
        e = g.flat_edges.shape[1]
        if edge_buckets is not None:
            e_pad = edge_buckets[l]
            assert e_pad >= e, f"edge bucket {e_pad} too small at level {l}"
        else:
            e_pad = 0  # layout decides
        n_pads.append(n_pad)
        e_pads.append(e_pad)

    ecs = transition_edge_weights(levels)

    # Bucketed groups stack hierarchies leaf-wise across meshes, so the
    # variable-shape compact residual tables must not be built there.
    bucketed = node_buckets is not None or resid_buckets is not None

    def build_level(l, g):
        lvl = _pad_level(
            g, n_pads[l], e_pads[l], ecs[l],
            None if lvl_pos is None else lvl_pos[l],
            edge_block=edge_block, window=windows[l],
            ell_k_min=0 if ell_buckets is None else ell_buckets[l],
            resid_e_pad_min=0 if resid_buckets is None else resid_buckets[l][0],
            force_resid=(
                resid_buckets is not None and resid_buckets[l][0] > 0
            ),
            resid_ell_k_min=0 if resid_buckets is None else resid_buckets[l][1],
        )
        return lvl.replace(cresid=None) if bucketed else lvl

    # Levels build independently, and the hot numpy kernels (lexsort,
    # bincount, unique) release the GIL — thread the per-level builds.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(graphs), os.cpu_count() or 1)) as ex:
        lvl_graphs = tuple(
            ex.map(lambda lg: build_level(*lg), enumerate(graphs))
        )
    if resid_buckets is not None:
        eb_r = min(edge_block, EDGE_BLOCK)
        for l, g in enumerate(lvl_graphs):
            want = resid_buckets[l][0]
            if want == 0:
                assert g.resid is None, (
                    f"level {l}: mesh has residual edges but the group "
                    f"bucket says none — rebuild the bucket plan"
                )
            else:
                assert g.resid.n_pad_edges == _pad_to(want, eb_r), (
                    f"level {l}: residual layout {g.resid.n_pad_edges} != "
                    f"bucket {want}"
                )
    if edge_buckets is not None:
        # Stacking across meshes requires every mesh to land on the exact
        # bucket size, i.e. the bucket must cover the block-aligned layout.
        for l, g in enumerate(lvl_graphs):
            assert g.n_pad_edges == _pad_to(edge_buckets[l], edge_block), (
                f"level {l}: layout {g.n_pad_edges} exceeds edge bucket "
                f"{edge_buckets[l]}"
            )

    def build_transition(l, kept):
        parent_pad, child_pad = n_pads[l], n_pads[l + 1]
        m = len(kept)
        pool_ids = np.full(child_pad, parent_pad - 1, dtype=np.int32)
        pool_ids[:m] = kept.astype(np.int32)
        unpool_inv = np.full(parent_pad, child_pad, dtype=np.int32)
        unpool_inv[kept] = np.arange(m, dtype=np.int32)
        # Fused transition operators — skipped for bucketed variable-mesh
        # groups (stacking would need the op layouts' E_pad pinned across a
        # group); bucketed groups instead get dense operator matrices at
        # bucket shapes when they fit (stackable leaf-wise).
        down_op = up_op = down_dense = up_dense = None
        if node_buckets is None and edge_buckets is None:
            down_op, up_op = _build_trans_ops(
                graphs[l].flat_edges, ecs[l], kept, parent_pad, child_pad,
                edge_block, window=windows[l],
            )
        elif parent_pad <= DENSE_TRANS_MAX and child_pad <= DENSE_TRANS_MAX:
            down_dense, up_dense = _build_dense_trans(
                graphs[l].flat_edges, ecs[l], kept, parent_pad, child_pad
            )
        return Transition(
            pool_ids=pool_ids, unpool_inv=unpool_inv,
            down_op=down_op, up_op=up_op,
            down_dense=down_dense, up_dense=up_dense,
        )

    with ThreadPoolExecutor(max_workers=min(max(len(ids), 1), os.cpu_count() or 1)) as ex:
        transitions = tuple(
            ex.map(lambda lk: build_transition(*lk), enumerate(ids))
        )

    return Hierarchy(levels=lvl_graphs, transitions=transitions)


# ---------------------------------------------------------------------------
# Cache I/O (replaces the reference's pickle cache, `datasets/base.py:89-125`,
# with an npz of the padded artifacts keyed by depth + padding spec).
# ---------------------------------------------------------------------------


def _atomic_savez(path: str, arrays: dict) -> None:
    """Concurrency-safe cache write: unique temp name per writer (several
    sampler threads may build the same shared cache simultaneously), atomic
    rename, last-writer-wins.

    Compression is adaptive: deflate costs ~37 s/GB single-threaded
    (measured 137 s vs 27 s for the 3.7 GB 1M-mesh cache — more than half
    the total build), so large caches are written uncompressed; small
    per-trajectory caches keep the 3× disk saving."""
    import threading

    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
    raw_bytes = sum(
        a.nbytes for a in arrays.values() if hasattr(a, "nbytes")
    )
    save = np.savez if raw_bytes > 100_000_000 else np.savez_compressed
    save(tmp, **arrays)
    try:
        os.replace(tmp + ".npz", path)
    except FileNotFoundError:
        if not os.path.isfile(path):
            raise


def _cache_key(
    num_layers: int, pad_multiple: int, node_buckets, edge_buckets,
    edge_block: int = EDGE_BLOCK, window: int = 0,
    ell_buckets=None, resid_buckets=None,
) -> str:
    blob = (
        f"v{CACHE_VERSION}|{num_layers}|{pad_multiple}|{node_buckets}"
        f"|{edge_buckets}|eb{edge_block}|w{window}"
    )
    if window == "auto":
        # The tuner's candidate set and cost-model constant change which
        # per-level widths 'auto' resolves to — fold them into the key so
        # tuner changes invalidate stale auto-built caches.
        blob += f"|cand{AUTO_WINDOW_CANDIDATES}|rr{AUTO_RESID_ROWS}"
    if ell_buckets is not None or resid_buckets is not None:
        blob += f"|k{ell_buckets}|r{resid_buckets}"
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def _level_arrays(prefix: str, g: LevelGraph, arrays: dict) -> None:
    arrays[f"{prefix}_senders"] = g.senders
    arrays[f"{prefix}_receivers"] = g.receivers
    arrays[f"{prefix}_recv_indptr"] = g.recv_indptr
    arrays[f"{prefix}_recv_ell"] = g.recv_ell
    arrays[f"{prefix}_send_ell"] = g.send_ell
    arrays[f"{prefix}_deg"] = g.deg
    arrays[f"{prefix}_node_mask"] = g.node_mask
    arrays[f"{prefix}_edge_mask"] = g.edge_mask
    arrays[f"{prefix}_reverse_perm"] = g.reverse_perm
    arrays[f"{prefix}_ew"] = g.ew
    arrays[f"{prefix}_fiber"] = g.fiber
    arrays[f"{prefix}_meta"] = np.array(
        [g.n_nodes, g.n_edges, g.edge_block, g.window, int(g.skip_empty)],
        dtype=np.int64,
    )
    if g.send_win is not None:
        arrays[f"{prefix}_send_win"] = g.send_win
        arrays[f"{prefix}_win_base"] = g.win_base
    if g.resid is not None:
        _level_arrays(f"{prefix}r", g.resid, arrays)
    if g.cresid is not None:
        _cresid_arrays(f"{prefix}c", g.cresid, arrays)


def _cresid_arrays(prefix: str, cr: "CompactResid", arrays: dict) -> None:
    arrays[f"{prefix}_senders"] = cr.senders
    arrays[f"{prefix}_receivers"] = cr.receivers
    arrays[f"{prefix}_ew"] = cr.ew
    arrays[f"{prefix}_ew_rev"] = cr.ew_rev
    arrays[f"{prefix}_fiber"] = cr.fiber
    arrays[f"{prefix}_twin"] = cr.twin
    arrays[f"{prefix}_visit_block"] = cr.visit_block
    arrays[f"{prefix}_visit_cblk"] = cr.visit_cblk
    arrays[f"{prefix}_visit_recv"] = cr.visit_recv
    arrays[f"{prefix}_cmeta"] = np.array(
        [cr.n_real, cr.n_pad_nodes, int(cr.symmetric)], np.int64
    )


def _cresid_from_arrays(prefix: str, z) -> Optional["CompactResid"]:
    if f"{prefix}_cmeta" not in z:
        return None
    meta = z[f"{prefix}_cmeta"]
    return CompactResid(
        senders=z[f"{prefix}_senders"],
        receivers=z[f"{prefix}_receivers"],
        ew=z[f"{prefix}_ew"],
        ew_rev=z[f"{prefix}_ew_rev"],
        fiber=z[f"{prefix}_fiber"],
        twin=z[f"{prefix}_twin"],
        visit_block=z[f"{prefix}_visit_block"],
        visit_cblk=z[f"{prefix}_visit_cblk"],
        visit_recv=z[f"{prefix}_visit_recv"],
        n_real=int(meta[0]),
        n_pad_nodes=int(meta[1]),
        symmetric=bool(meta[2]),
    )


def _level_from_arrays(prefix: str, z) -> LevelGraph:
    meta = z[f"{prefix}_meta"]
    ew = z[f"{prefix}_ew"]
    reverse_perm = z[f"{prefix}_reverse_perm"]
    has_win = f"{prefix}_send_win" in z
    return LevelGraph(
        senders=z[f"{prefix}_senders"],
        receivers=z[f"{prefix}_receivers"],
        recv_indptr=z[f"{prefix}_recv_indptr"],
        recv_ell=z[f"{prefix}_recv_ell"],
        send_ell=z[f"{prefix}_send_ell"],
        deg=z[f"{prefix}_deg"],
        node_mask=z[f"{prefix}_node_mask"],
        edge_mask=z[f"{prefix}_edge_mask"],
        reverse_perm=reverse_perm,
        ew=ew,
        fiber=z[f"{prefix}_fiber"],
        n_nodes=int(meta[0]),
        n_edges=int(meta[1]),
        edge_block=int(meta[2]) if meta.size > 2 else EDGE_BLOCK,
        ew_rev=ew[reverse_perm],  # derived, not stored
        send_win=z[f"{prefix}_send_win"] if has_win else None,
        win_base=z[f"{prefix}_win_base"] if has_win else None,
        resid=(
            _level_from_arrays(f"{prefix}r", z)
            if f"{prefix}r_meta" in z
            else None
        ),
        cresid=_cresid_from_arrays(f"{prefix}c", z),
        window=int(meta[3]) if meta.size > 3 else 0,
        skip_empty=bool(meta[4]) if meta.size > 4 else False,
        fiber_t=_fiber_t(z[f"{prefix}_fiber"]),
    )


def _trans_op_arrays(prefix: str, op: TransOp, arrays: dict) -> None:
    arrays[f"{prefix}_senders"] = op.senders
    arrays[f"{prefix}_receivers"] = op.receivers
    arrays[f"{prefix}_recv_indptr"] = op.recv_indptr
    arrays[f"{prefix}_ew"] = op.ew
    arrays[f"{prefix}_meta"] = np.array(
        [op.n_in_pad, op.edge_block, op.window, int(op.skip_empty)], np.int64
    )
    if op.send_win is not None:
        arrays[f"{prefix}_send_win"] = op.send_win
        arrays[f"{prefix}_win_base"] = op.win_base
    if op.dense is not None:
        arrays[f"{prefix}_dense"] = op.dense
    if op.resid is not None:
        _trans_op_arrays(f"{prefix}r", op.resid, arrays)
    if op.cresid is not None:
        _cresid_arrays(f"{prefix}c", op.cresid, arrays)


def _trans_op_from_arrays(prefix: str, z) -> Optional[TransOp]:
    if f"{prefix}_meta" not in z:
        return None
    meta = z[f"{prefix}_meta"]
    has_win = f"{prefix}_send_win" in z
    return TransOp(
        senders=z[f"{prefix}_senders"],
        receivers=z[f"{prefix}_receivers"],
        recv_indptr=z[f"{prefix}_recv_indptr"],
        ew=z[f"{prefix}_ew"],
        n_in_pad=int(meta[0]),
        edge_block=int(meta[1]),
        send_win=z[f"{prefix}_send_win"] if has_win else None,
        win_base=z[f"{prefix}_win_base"] if has_win else None,
        resid=_trans_op_from_arrays(f"{prefix}r", z),
        cresid=_cresid_from_arrays(f"{prefix}c", z),
        window=int(meta[2]) if meta.size > 2 else 0,
        skip_empty=bool(meta[3]) if meta.size > 3 else False,
        dense=z[f"{prefix}_dense"] if f"{prefix}_dense" in z else None,
    )


def save_hierarchy(path: str, h: Hierarchy) -> None:
    arrays = {"depth": np.int64(h.depth)}
    for l, g in enumerate(h.levels):
        _level_arrays(f"l{l}", g, arrays)
    for l, t in enumerate(h.transitions):
        arrays[f"t{l}_pool_ids"] = t.pool_ids
        arrays[f"t{l}_unpool_inv"] = t.unpool_inv
        if t.down_op is not None:
            _trans_op_arrays(f"t{l}d", t.down_op, arrays)
            _trans_op_arrays(f"t{l}u", t.up_op, arrays)
        if t.down_dense is not None:
            arrays[f"t{l}_down_dense"] = t.down_dense
            arrays[f"t{l}_up_dense"] = t.up_dense
    _atomic_savez(path, arrays)


def load_hierarchy(path: str) -> Hierarchy:
    with np.load(path) as z:
        depth = int(z["depth"])
        levels = [_level_from_arrays(f"l{l}", z) for l in range(depth + 1)]
        transitions = [
            Transition(
                pool_ids=z[f"t{l}_pool_ids"],
                unpool_inv=z[f"t{l}_unpool_inv"],
                down_op=_trans_op_from_arrays(f"t{l}d", z),
                up_op=_trans_op_from_arrays(f"t{l}u", z),
                down_dense=(z[f"t{l}_down_dense"]
                            if f"t{l}_down_dense" in z else None),
                up_dense=(z[f"t{l}_up_dense"]
                          if f"t{l}_up_dense" in z else None),
            )
            for l in range(depth)
        ]
    return Hierarchy(levels=tuple(levels), transitions=tuple(transitions))


def load_or_build_levels(
    cache_dir: str,
    cache_name: str,
    flat_edges: np.ndarray,
    num_layers: int,
    num_nodes: int,
    pos: np.ndarray,
) -> BistrideLevels:
    """Cache-through build of the *raw* (unpadded) bi-stride levels — the
    expensive BFS/SpGEMM part. Padding is cheap and re-done per bucket spec."""
    from bsms_gnn_tpu.graph.csr import CsrGraph

    path = os.path.join(
        cache_dir,
        f"{cache_name}_tpu_levels_v{LEVELS_CACHE_VERSION}_d{num_layers}.npz",
    )
    if os.path.isfile(path):
        try:
            with np.load(path) as z:
                graphs = [
                    CsrGraph(z[f"edges{l}"], int(z[f"n{l}"]))
                    for l in range(num_layers + 1)
                ]
                ids = [z[f"ids{l}"] for l in range(num_layers)]
            return BistrideLevels(graphs=graphs, ids=ids)
        except Exception:
            pass  # stale/corrupt cache: rebuild
    levels = build_bistride_levels(flat_edges, num_layers, num_nodes, pos)
    arrays = {}
    for l, g in enumerate(levels.graphs):
        arrays[f"edges{l}"] = g.flat_edges
        arrays[f"n{l}"] = np.int64(g.num_nodes)
    for l, kept in enumerate(levels.ids):
        arrays[f"ids{l}"] = kept
    os.makedirs(cache_dir, exist_ok=True)
    _atomic_savez(path, arrays)
    return levels


def load_or_build_hierarchy(
    cache_dir: str,
    cache_name: str,
    flat_edges: np.ndarray,
    num_layers: int,
    num_nodes: int,
    pos: np.ndarray,
    pad_multiple: int = 128,
    node_buckets: Optional[List[int]] = None,
    edge_buckets: Optional[List[int]] = None,
    edge_block: int = EDGE_BLOCK,
    window: "int | List[int] | str" = 0,
    ell_buckets: Optional[List[int]] = None,
    resid_buckets: Optional[List[Tuple[int, int]]] = None,
) -> Hierarchy:
    """Cache-through build. `cache_name` should be shared across trajectories
    when the dataset has a consistent mesh (one build serves all, matching
    reference `base.py:98-101` cache-sharing) and per-trajectory otherwise.

    `window="auto"` builds the windowed layout once at the largest candidate
    width, runs the offline per-level cost model (choose_windows), and
    re-pads with the chosen per-level widths — all under one cache entry.

    Trade-off: the auto path keeps node padding aligned to the PROBE width
    (largest candidate / 2, i.e. 512) even when the tuner picks narrower
    windows, because window coverage is layout-dependent — re-padding to a
    smaller alignment would shift chunk boundaries and invalidate the
    coverage the tuner just measured. Cost: up to probe_w/2 - chosen_w/2
    extra pad rows per level (≤384 rows, <0.1% at the 1M sizes 'auto'
    targets). Pin an explicit window list to avoid it on small meshes."""
    key = _cache_key(num_layers, pad_multiple, node_buckets, edge_buckets,
                     edge_block, window, ell_buckets, resid_buckets)
    path = os.path.join(cache_dir, f"{cache_name}_tpu_mmesh_{key}.npz")
    if os.path.isfile(path):
        try:
            return load_hierarchy(path)
        except Exception:
            pass  # stale/corrupt cache: rebuild
    levels = load_or_build_levels(
        cache_dir, cache_name, flat_edges, num_layers, num_nodes, pos
    )
    if window == "auto":
        assert node_buckets is None and edge_buckets is None, (
            "window='auto' chooses per-mesh widths — incompatible with "
            "bucketed stacking (pin an explicit window list instead)"
        )
        probe_w = AUTO_WINDOW_CANDIDATES[-1]
        # Same node alignment for probe and final build so the coverage
        # evaluation sees the exact final layouts.
        pad_multiple = _pad_to(_pad_to(pad_multiple, NODE_BLOCK), probe_w // 2)
        probe = pad_levels(
            levels, pad_multiple, pos=pos, edge_block=edge_block,
            window=probe_w,
        )
        window = choose_windows(probe, AUTO_WINDOW_CANDIDATES)
    h = pad_levels(
        levels, pad_multiple, node_buckets, edge_buckets, pos=pos,
        edge_block=edge_block, window=window,
        ell_buckets=ell_buckets, resid_buckets=resid_buckets,
    )
    os.makedirs(cache_dir, exist_ok=True)
    save_hierarchy(path, h)
    return h
