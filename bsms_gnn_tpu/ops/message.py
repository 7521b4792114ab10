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
from bsms_gnn_tpu.ops.dense import MLPParams, init_mlp
from bsms_gnn_tpu.ops.scatter import (
    aggregate_recv,
    aggregate_send,
    gather_recv,
    gather_send,
)


def _split_interleave(method: str):
    """`"fusedK"` (e.g. "fused2") selects the K-way chunk-interleaved v5
    kernel pair on windowed layouts (ops/pallas/fused_gmp.py, round-5
    kernel-wall probe); returns (base_method, K). Everything else passes
    through with K=1."""
    if method.startswith("fused") and method[5:].isdigit():
        return "fused", int(method[5:])
    return method, 1


@struct.dataclass
class GMPParams:
    mlp_edge: MLPParams
    mlp_node: MLPParams


def init_gmp(
    key, latent_dim: int, hidden_layer: int, pos_dim: int,
    fiber_dims=None,
) -> GMPParams:
    """`fiber_dims` lists the positional streams feeding the edge MLP: each
    stream of width d contributes [Δp, ‖Δp‖] (d+1 channels). The default
    (pos_dim,) is the reference layout (static mesh_pos, ref
    `ops/basic.py:44-45`); (world_dim, pos_dim) adds the world-space
    relative positions the original BSMS contact cases used (reference
    README.md:10)."""
    fiber_dims = (pos_dim,) if fiber_dims is None else tuple(fiber_dims)
    ke, kn = jax.random.split(key)
    edge_in = 2 * latent_dim + sum(d + 1 for d in fiber_dims)
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
    dyn_dims=None,
):
    """One GMP step. x: [..., N_pad, C].

    Edge fibers come from two sources:
      * the STATIC mesh fiber [Δpos, ‖Δpos‖] precomputed offline on the
        level (`level.fiber`, graph/bistride.py::smoothed_positions) — no
        online gather, conv, or norm touches mesh positions at all;
      * optional DYNAMIC streams in `pos` (world-space positions for the
        contact cases), gathered per step; `dyn_dims` lists their widths.
        Dynamic fibers precede the static one, matching `init_gmp`'s
        fiber_dims=(world_dim, pos_dim) row layout.

    The math is the reference's edge MLP over [fibers, x_i, x_j]
    (`ref ops/basic.py:83-92`) followed by receiver-sum and a node MLP over
    [x, aggr] — but both first layers are *split by input block*
    (concat(a,b) @ W ≡ a @ Wa + b @ Wb): the x_i/x_j transforms run per
    NODE before the gather (E/N ≈ 6× fewer rows through the widest matmul)
    and the wide [E, 2C+pd1] / [N, 2C] concatenations never hit HBM."""
    from bsms_gnn_tpu.ops.dense import dense, mlp_apply_tail

    method, ilk = _split_interleave(method)
    c = x.shape[-1]
    static_fiber = level.fiber
    sfw = static_fiber.shape[-1]
    if dyn_dims is None and pos is not None and pos.shape[-1] + 1 != sfw:
        raise ValueError(
            f"static fiber width {sfw} does not match pos width "
            f"{pos.shape[-1]}+1; rebuild the hierarchy cache"
        )
    dyn_dims = tuple(dyn_dims) if dyn_dims else ()
    pd1 = sfw + sum(d + 1 for d in dyn_dims)
    w1 = params.mlp_edge.weights[0]
    wf, wi, wj = w1[:pd1], w1[pd1 : pd1 + c], w1[pd1 + c :]

    mp = method.split(":")
    if (
        mp[0] == "halo"
        and len(mp) > 2
        and mp[2] == "fused"
        and getattr(level, "local", None) is not None
        and not dyn_dims
    ):
        # Ghost halo layout + windowed fused edge phase per shard: ship the
        # [xwi | xj] halo rows in ONE all_to_all, run the v3 kernel on the
        # extended tables (both gathers in-kernel), add the residual
        # mini-layout, keep the owned rows. The ext assembly is plain jax
        # (take + all_to_all over [S, H] rows), so autodiff routes the
        # remote cotangents back through the transposed collective.
        from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase_win
        from bsms_gnn_tpu.parallel.halo import _ext_assemble

        lg = level.local
        n_loc = level.n_pad_nodes
        xwi = dense(x, wi, 0.0, compute_dtype)
        xj = dense(x, wj, 0.0, compute_dtype)
        pair = _ext_assemble(
            level, jnp.concatenate([xwi, xj], axis=-1), mp[1]
        )
        ext_xwi, ext_xj = pair[..., :c], pair[..., c:]
        wf8 = (
            jnp.zeros((8, c), wf.dtype)
            .at[:sfw].set(wf)
            .at[sfw].set(params.mlp_edge.biases[0])
        )
        aggr = fused_edge_phase_win(
            lg, ext_xwi, ext_xj, wf8,
            params.mlp_edge.weights[1:], params.mlp_edge.biases[1:],
        )
        if aggr is not None:
            acc = None
            if lg.cresid is not None:
                # Compact residual on the shard's EXT tables (r5: shard
                # layouts now carry unified CompactResid — see
                # parallel/partition.py::_unify_cresids; its absence was a
                # major term of the measured per-shard cost blow-up).
                acc = _cresid_edge_phase(lg.cresid, params, ext_xwi,
                                         ext_xj, wf, aggr, compute_dtype)
            if acc is None and lg.resid is not None:
                from bsms_gnn_tpu.ops.pallas import segment_sum_accum

                r = lg.resid
                pre_r = (
                    gather_send(r, ext_xwi, "pallas")
                    + gather_recv(r, ext_xj, "pallas")
                    + dense(r.fiber.astype(x.dtype), wf,
                            params.mlp_edge.biases[0], compute_dtype)
                )
                e_r = mlp_apply_tail(params.mlp_edge, pre_r, compute_dtype)
                acc = segment_sum_accum(r, e_r, aggr)
                if acc is None:
                    acc = aggr + aggregate_recv(r, e_r, "ell")
            aggr = acc if acc is not None else aggr
            return _node_phase(
                params, x, aggr[..., :n_loc, :], method, compute_dtype
            )
        # Kernel doesn't fit (no window tables / narrow C): fall through to
        # the generic halo path.

    if (
        mp[0] == "halo"
        and len(mp) > 2
        and mp[2] == "fused"
        and getattr(level, "local", None) is not None
        and len(dyn_dims) == 1
        and pos is not None
        and dyn_dims[0] <= c
    ):
        # Ghost halo + v4 (windowed fused edge phase with one dynamic
        # world-space stream — the contact cases on shards): ship
        # [xwi | xj | world_pos] halo rows in ONE all_to_all, then run the
        # single-chip v4 kernel on the extended tables (Δworld/‖Δworld‖
        # computed in-kernel from the same one-hot selections).
        from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase_win_dyn
        from bsms_gnn_tpu.parallel.halo import _ext_assemble

        lg = level.local
        n_loc = level.n_pad_nodes
        wd = dyn_dims[0]
        xwi = dense(x, wi, 0.0, compute_dtype)
        xj = dense(x, wj, 0.0, compute_dtype)
        wpos = jax.lax.stop_gradient(pos).astype(xwi.dtype)
        trio = _ext_assemble(
            level, jnp.concatenate([xwi, xj, wpos], axis=-1), mp[1]
        )
        ext_xwi = trio[..., :c]
        ext_xj = trio[..., c : 2 * c]
        wpos_ext = trio[..., 2 * c :]
        wf_dyn, wf_nrm, wf_sta = wf[:wd], wf[wd], wf[wd + 1 :]
        wf8 = (
            jnp.zeros((8, c), wf.dtype)
            .at[:sfw].set(wf_sta)
            .at[sfw].set(params.mlp_edge.biases[0])
        )

        def ext4(a):
            w = jnp.broadcast_to(wpos_ext, a.shape[:-1] + (wd,))
            padw = jnp.zeros(a.shape[:-1] + (c - wd,), a.dtype)
            return jnp.concatenate([a, w, padw], axis=-1)

        wfd_ext = jnp.zeros((c, c), jnp.float32).at[:wd].set(
            wf_dyn.astype(jnp.float32)
        )
        wfn8 = jnp.zeros((8, c), jnp.float32).at[0].set(
            wf_nrm.astype(jnp.float32)
        )
        aggr = fused_edge_phase_win_dyn(
            lg, ext4(ext_xwi), ext4(ext_xj), wf8, wfd_ext, wfn8,
            params.mlp_edge.weights[1:], params.mlp_edge.biases[1:], wd,
        )
        if aggr is not None:
            if lg.resid is not None:
                from bsms_gnn_tpu.ops.pallas import segment_sum_accum

                r = lg.resid
                p_i = gather_send(r, wpos_ext, "pallas")
                p_j = gather_recv(r, wpos_ext, "pallas")
                dvec = p_i - p_j
                fib_dyn = jnp.concatenate(
                    [dvec, jnp.linalg.norm(dvec, axis=-1, keepdims=True)],
                    axis=-1,
                )
                pre_r = (
                    gather_send(r, ext_xwi, "pallas")
                    + gather_recv(r, ext_xj, "pallas")
                    + dense(fib_dyn, wf[: wd + 1], 0.0, compute_dtype)
                    + dense(r.fiber.astype(x.dtype), wf_sta,
                            params.mlp_edge.biases[0], compute_dtype)
                )
                e_r = mlp_apply_tail(params.mlp_edge, pre_r, compute_dtype)
                acc = segment_sum_accum(r, e_r, aggr)
                aggr = acc if acc is not None else aggr + aggregate_recv(
                    r, e_r, "ell"
                )
            return _node_phase(
                params, x, aggr[..., :n_loc, :], method, compute_dtype
            )
        # Fall through to the generic halo path.

    if method == "fused" and not dyn_dims:
        from bsms_gnn_tpu.ops.pallas.fused_gmp import (
            fused_edge_phase,
            fused_edge_phase_win,
            fused_edge_phase_win_k,
        )

        xj = dense(x, wj, 0.0, compute_dtype)
        xwi = dense(x, wi, 0.0, compute_dtype)
        # v3 (windowed layouts): BOTH gathers move in-kernel — the sender
        # side as windowed one-hot selection, the receiver side as the
        # transposed one-hot of the resident block — and the static fiber
        # term rides the component-major [8, E] stream (wf8 rows = static
        # wf rows + the first bias on the constant-1 fiber row).
        # Out-of-window edges run the unfused edge phase on the mini
        # residual layout; per-edge MLP+LN make the aggregates additive.
        wf8 = (
            jnp.zeros((8, c), wf.dtype)
            .at[:sfw].set(wf)
            .at[sfw].set(params.mlp_edge.biases[0])
        )
        if ilk > 1:
            aggr = fused_edge_phase_win_k(
                level, xwi, xj, wf8,
                params.mlp_edge.weights[1:], params.mlp_edge.biases[1:],
                ilk,
            )
        else:
            aggr = fused_edge_phase_win(
                level, xwi, xj, wf8,
                params.mlp_edge.weights[1:], params.mlp_edge.biases[1:],
            )
        if aggr is not None and level.resid is not None:
            acc = None
            if level.cresid is not None:
                acc = _cresid_edge_phase(level.cresid, params, xwi, xj, wf,
                                         aggr, compute_dtype)
            if acc is None:
                from bsms_gnn_tpu.ops.pallas import segment_sum_accum

                r = level.resid
                pre_r = (
                    gather_send(r, xwi, "pallas")
                    + gather_recv(r, xj, "pallas")
                    + dense(r.fiber.astype(x.dtype), wf,
                            params.mlp_edge.biases[0], compute_dtype)
                )
                e_r = mlp_apply_tail(params.mlp_edge, pre_r, compute_dtype)
                acc = segment_sum_accum(r, e_r, aggr)
            aggr = acc if acc is not None else aggr + aggregate_recv(
                r, e_r, "ell"
            )
        if aggr is None:
            # v2 fused edge phase: the sender side streams (XLA gather),
            # receiver transform gathered in-kernel.
            zi = gather_send(level, xwi, method) + dense(
                static_fiber.astype(x.dtype), wf,
                params.mlp_edge.biases[0], compute_dtype,
            )
            aggr = fused_edge_phase(
                level, zi, xj,
                params.mlp_edge.weights[1:], params.mlp_edge.biases[1:],
            )
        if aggr is not None:
            return _node_phase(params, x, aggr, method, compute_dtype)

    if (
        method == "fused"
        and len(dyn_dims) == 1
        and pos is not None
        and dyn_dims[0] <= c
    ):
        # v4 (windowed layouts + one dynamic stream — the contact cases):
        # world positions ride the extended [N, 2C] sender/receiver tables
        # and Δworld/‖Δworld‖ are computed in-kernel from the same one-hot
        # selections, so the dyn path's four gathers (z_i, z_j, p_i, p_j)
        # all disappear. World positions are stop-gradient (they never
        # reach parameters — the dyn stream is smoothed by no-grad convs).
        from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_phase_win_dyn

        wd = dyn_dims[0]
        xwi = dense(x, wi, 0.0, compute_dtype)
        xj = dense(x, wj, 0.0, compute_dtype)
        wf_dyn, wf_nrm, wf_sta = wf[:wd], wf[wd], wf[wd + 1 :]
        # Static fiber rows + first bias ride the in-kernel fiber_t dot.
        wf8 = (
            jnp.zeros((8, c), wf.dtype)
            .at[:sfw].set(wf_sta)
            .at[sfw].set(params.mlp_edge.biases[0])
        )
        wpos = jax.lax.stop_gradient(pos).astype(xwi.dtype)

        def ext(a):
            w = jnp.broadcast_to(wpos, a.shape[:-1] + (wd,))
            padw = jnp.zeros(a.shape[:-1] + (c - wd,), a.dtype)
            return jnp.concatenate([a, w, padw], axis=-1)

        wfd_ext = jnp.zeros((c, c), jnp.float32).at[:wd].set(
            wf_dyn.astype(jnp.float32)
        )
        wfn8 = jnp.zeros((8, c), jnp.float32).at[0].set(
            wf_nrm.astype(jnp.float32)
        )
        aggr = fused_edge_phase_win_dyn(
            level, ext(xwi), ext(xj), wf8, wfd_ext, wfn8,
            params.mlp_edge.weights[1:], params.mlp_edge.biases[1:], wd,
        )
        if aggr is not None and level.resid is not None:
            acc = None
            if level.cresid is not None:
                acc = _cresid_edge_phase(
                    level.cresid, params, xwi, xj, wf_sta, aggr,
                    compute_dtype, wpos=wpos, wf_dyn=wf[: wd + 1],
                )
            if acc is None:
                from bsms_gnn_tpu.ops.pallas import segment_sum_accum

                r = level.resid
                p_i = gather_send(r, wpos, "pallas")
                p_j = gather_recv(r, wpos, "pallas")
                dvec = p_i - p_j
                fib_dyn = jnp.concatenate(
                    [dvec, jnp.linalg.norm(dvec, axis=-1, keepdims=True)],
                    axis=-1,
                )
                pre_r = (
                    gather_send(r, xwi, "pallas")
                    + gather_recv(r, xj, "pallas")
                    + dense(fib_dyn, wf[: wd + 1], 0.0, compute_dtype)
                    + dense(r.fiber.astype(x.dtype), wf_sta,
                            params.mlp_edge.biases[0], compute_dtype)
                )
                e_r = mlp_apply_tail(params.mlp_edge, pre_r, compute_dtype)
                acc = segment_sum_accum(r, e_r, aggr)
                if acc is None:
                    acc = aggr + aggregate_recv(r, e_r, "ell")
            aggr = acc
        if aggr is not None:
            return _node_phase(params, x, aggr, method, compute_dtype)

    # Node-side pre-transforms, then gather the 128-lane-aligned activations.
    # (Merging wi|wj into one [N, C]@[C, 2C] matmul was measured SLOWER here:
    # the two gathers then stream 2C-wide rows — the extra bytes cost more
    # than the saved dispatch at headline sizes.)
    z_i = gather_send(level, dense(x, wi, 0.0, compute_dtype), method)
    z_j = gather_recv(level, dense(x, wj, 0.0, compute_dtype), method)

    parts = []
    if dyn_dims:
        assert pos is not None and pos.shape[-1] == sum(dyn_dims)
        p_i = gather_send(level, pos, method)
        p_j = gather_recv(level, pos, method)
        direction = p_i - p_j
        off = 0
        for d in dyn_dims:
            blk = direction[..., off : off + d]
            parts.append(blk)
            parts.append(jnp.linalg.norm(blk, axis=-1, keepdims=True))
            off += d
    parts.append(
        jnp.broadcast_to(
            static_fiber.astype(z_i.dtype),
            z_i.shape[:-1] + (sfw,),
        )
        if parts
        else static_fiber.astype(z_i.dtype)
    )
    fiber = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    pre = dense(fiber, wf, params.mlp_edge.biases[0], compute_dtype) + z_i + z_j

    aggr = None
    if method == "fused":
        # Experimental single-kernel edge phase (ops/pallas/fused_gmp.py):
        # bandwidth-optimal but its 128-row chunk matmuls underutilize the
        # MXU vs XLA's full-E matmuls at current sizes — opt-in only.
        from bsms_gnn_tpu.ops.pallas.fused_gmp import fused_edge_mlp_aggregate

        aggr = fused_edge_mlp_aggregate(
            level, pre, params.mlp_edge.weights[1:], params.mlp_edge.biases[1:]
        )
    if aggr is None:
        agg_method = "pallas" if method == "fused" else method
        edge_embedding = mlp_apply_tail(params.mlp_edge, pre, compute_dtype)
        if agg_method == "pallas":
            # Aggregation + node phase in ONE kernel (the aggregate never
            # hits HBM; one dispatch replaces two — ops/pallas/agg_node.py).
            from bsms_gnn_tpu.ops.pallas.agg_node import (
                fused_aggregate_node_phase,
            )

            out = fused_aggregate_node_phase(
                level, edge_embedding, x, params.mlp_node, compute_dtype
            )
            if out is not None:
                return out
        aggr = aggregate_recv(level, edge_embedding, agg_method)

    return _node_phase(params, x, aggr, method, compute_dtype)


def _cresid_edge_phase(cr, params, xwi, xj, wf_sta, aggr, compute_dtype,
                       wpos=None, wf_dyn=None):
    """Residual edge phase on the COMPACT tables: gathers + edge MLP over
    ~R real rows (instead of the mini layout's 3-4x padded slot space) and
    the block-visit accumulate (ops/pallas/compact_resid.py). `wpos`/
    `wf_dyn` add the dynamic world-space fiber term (contact cases).
    Returns the accumulated aggregate, or None when the compact kernel is
    unsupported (width not 128-aligned) — callers fall back to the mini
    layout."""
    import jax

    from bsms_gnn_tpu.ops.dense import dense, mlp_apply_tail
    from bsms_gnn_tpu.ops.pallas.compact_resid import (
        compact_accum,
        compact_gather,
        supported,
    )

    probe = jax.ShapeDtypeStruct(
        xwi.shape[:-2] + (cr.n_rows, xwi.shape[-1]), xwi.dtype
    )
    if not (cr.symmetric and supported(cr, probe, aggr)):
        return None
    pre_r = (
        compact_gather(cr, xwi, "send")
        + compact_gather(cr, xj, "recv")
        + dense(cr.fiber.astype(xwi.dtype), wf_sta,
                params.mlp_edge.biases[0], compute_dtype)
    )
    if wpos is not None:
        p_i = compact_gather(cr, wpos, "send")
        p_j = compact_gather(cr, wpos, "recv")
        dvec = p_i - p_j
        fib_dyn = jnp.concatenate(
            [dvec, jnp.linalg.norm(dvec, axis=-1, keepdims=True)], axis=-1
        )
        pre_r = pre_r + dense(fib_dyn, wf_dyn, 0.0, compute_dtype)
    e_r = mlp_apply_tail(params.mlp_edge, pre_r, compute_dtype)
    return compact_accum(cr, e_r, aggr)


def _node_phase(params: GMPParams, x, aggr, method: str, compute_dtype):
    """Node MLP over [x, aggr] + residual (reference `ops/basic.py:95-98`),
    with the split-first-layer trick. On the pallas/fused methods the whole
    phase runs as ONE row-chunked kernel (ops/pallas/node_mlp.py) — the
    hidden activations never touch HBM; ell/segment stay on pure XLA (the
    parity-oracle paths)."""
    from bsms_gnn_tpu.ops.dense import dense, mlp_apply_tail

    # The node phase is purely row-local, so the fused kernel also applies
    # inside the shard_map halo path (each shard's [N_loc, C] rows).
    if method in ("pallas", "fused") or method.startswith("halo:"):
        from bsms_gnn_tpu.ops.pallas.node_mlp import fused_node_phase

        out = fused_node_phase(x, aggr, params.mlp_node, compute_dtype)
        if out is not None:
            return out
    c = x.shape[-1]
    wn = params.mlp_node.weights[0]
    node_pre = (
        dense(x, wn[:c], params.mlp_node.biases[0], compute_dtype)
        + dense(aggr, wn[c:], 0.0, compute_dtype)
    )
    return mlp_apply_tail(params.mlp_node, node_pre, compute_dtype) + x


def cal_ew(level: LevelGraph, w, method: str = "ell"):
    """Transition weights (no grad, matching ref @torch.no_grad).

    w: [N_pad, 1] node weights. Returns (ec [E_pad], aggr_w [N_pad, 1]).
    """
    method, _ = _split_interleave(method)
    if method.startswith("halo:") and getattr(level, "local", None) is not None:
        raise NotImplementedError(
            "runtime cal_ew is not supported on ghost halo layouts — the "
            "transition weights are precomputed offline (level.local.ew)"
        )
    w = jax.lax.stop_gradient(w)
    normed_w = w[..., 0] / level.deg
    w_send = gather_send(level, normed_w[..., None], method)[..., 0]
    aggr_w = aggregate_recv(level, w_send[..., None], method)[..., 0] + 1e-12
    ec = w_send / gather_recv(level, aggr_w[..., None], method)[..., 0]
    return jax.lax.stop_gradient(ec), jax.lax.stop_gradient(aggr_w[..., None])


def _conv_fast_ok(level: LevelGraph, x) -> bool:
    return (
        x.ndim in (2, 3)
        and x.shape[-1] % 128 == 0
        and level.n_pad_nodes % 128 == 0
        and level.n_pad_edges % 128 == 0
        and level.recv_indptr.ndim == 1
        and level.reverse_perm.ndim == 1
    )


def _gathered_conv(level: LevelGraph, x, ew):
    """One gather + the streaming receiver kernel over a slot-aligned weight
    vector (`ew` for the down conv, `ew∘reverse` for the up conv)."""
    from bsms_gnn_tpu.ops.pallas import segment_sum_raw

    msg = jnp.take(x, level.senders, axis=-2) * ew[..., None]
    return segment_sum_raw(level, msg).astype(x.dtype)


def _windowed_conv(level: LevelGraph, x, ew, up: bool):
    """Gather-free windowed path (ops/pallas/windowed.py), or None when the
    layout has no window tables. The mini residual level carries the
    out-of-window edges; it is a skip-empty layout, so its messages
    ACCUMULATE onto the windowed output in-place (aliased kernel) instead
    of paying one chunk per empty node block."""
    from bsms_gnn_tpu.ops.pallas import segment_sum_accum_raw
    from bsms_gnn_tpu.ops.pallas.windowed import windowed_conv_raw

    out = windowed_conv_raw(level, x, ew)
    if out is None:
        return None
    cr = level.cresid
    if cr is not None:
        # Compact residual: the take runs over ~R real rows instead of the
        # mini layout's padded slot space (ops/pallas/compact_resid.py).
        from bsms_gnn_tpu.ops.pallas.compact_resid import compact_accum_raw

        ew_r = (cr.ew_rev if up else cr.ew).astype(x.dtype)
        msg = jnp.take(x, cr.senders, axis=-2) * ew_r[..., None]
        out2 = compact_accum_raw(cr, msg, out)
        if out2 is not None:
            return out2.astype(x.dtype)
    r = level.resid
    if r is not None:
        ew_r = (r.ew_rev if up else r.ew).astype(x.dtype)
        msg = jnp.take(x, r.senders, axis=-2) * ew_r[..., None]
        out2 = segment_sum_accum_raw(r, msg, out)
        out = out2 if out2 is not None else out + _gathered_conv(r, x, ew_r)
    return out.astype(x.dtype)


def _conv_down_raw(level: LevelGraph, x, ew):
    """y[n] = Σ_{e: recv(e)=n} ew_e · x[send_e]: one gather + the streaming
    receiver kernel. `ew` is arbitrary (slot-aligned)."""
    return _gathered_conv(level, x, ew)


def _conv_up_raw(level: LevelGraph, x, ew):
    """y[n] = Σ_{e: send(e)=n} ew_e · x[recv_e]. For the symmetric edge
    sets the builder emits, the sender-sum of x[receivers]·ew equals the
    RECEIVER-sum of x[senders]·ew∘reverse_perm (each edge's contribution
    rides its reverse twin) — so the up conv is also one gather + the same
    streaming kernel."""
    return _gathered_conv(level, x, jnp.take(ew, level.reverse_perm, axis=-1))


def _lvl_down_raw(level: LevelGraph, x):
    """Down conv with the LEVEL'S OWN transition weights — the model's hot
    path. Uses the gather-free windowed kernel when the layout has window
    tables, and the precomputed `ew`/`ew_rev` either way."""
    ew = level.ew.astype(x.dtype)
    out = _windowed_conv(level, x, ew, up=False)
    return _gathered_conv(level, x, ew) if out is None else out


def _lvl_up_raw(level: LevelGraph, x):
    ew_rev = (
        level.ew_rev
        if level.ew_rev is not None
        else level.ew[level.reverse_perm]
    ).astype(x.dtype)
    out = _windowed_conv(level, x, ew_rev, up=True)
    return _gathered_conv(level, x, ew_rev) if out is None else out


def _make_conv_pair():
    """Down/up weighted convs as a custom-VJP ADJOINT pair: convᵀ_down =
    conv_up with the same weights, so each backward is the optimized twin.

    `ew` gets a ZERO cotangent: transition weights are no-grad by
    construction (reference cal_ew is @torch.no_grad, `ops/basic.py:142`;
    level.ew is a static offline artifact here). `level` is an explicit
    custom-VJP argument (None cotangent): the backwards read its arrays
    from the residuals, never the closure — closure capture leaks tracers
    when fwd/bwd trace separately (jax.checkpoint / remat).
    """

    @jax.custom_vjp
    def down(level, x, ew):
        return _conv_down_raw(level, x, ew)

    def down_fwd(level, x, ew):
        return _conv_down_raw(level, x, ew), (level, ew)

    def down_bwd(res, g):
        level, ew = res
        return None, _conv_up_raw(level, g, ew), jnp.zeros_like(ew)

    down.defvjp(down_fwd, down_bwd)

    @jax.custom_vjp
    def up(level, x, ew):
        return _conv_up_raw(level, x, ew)

    def up_fwd(level, x, ew):
        return _conv_up_raw(level, x, ew), (level, ew)

    def up_bwd(res, g):
        level, ew = res
        return None, _conv_down_raw(level, g, ew), jnp.zeros_like(ew)

    up.defvjp(up_fwd, up_bwd)
    return down, up


def _make_lvl_conv_pair():
    """As `_make_conv_pair`, but bound to the level's own precomputed
    transition weights (no ew argument) — which is what unlocks the
    windowed gather-free kernel: the offline layout splits `ew` between the
    main and residual sub-layouts, so an arbitrary runtime ew cannot ride
    it."""

    @jax.custom_vjp
    def down(level, x):
        return _lvl_down_raw(level, x)

    def down_fwd(level, x):
        return _lvl_down_raw(level, x), level

    def down_bwd(level, g):
        return None, _lvl_up_raw(level, g)

    down.defvjp(down_fwd, down_bwd)

    @jax.custom_vjp
    def up(level, x):
        return _lvl_up_raw(level, x)

    def up_fwd(level, x):
        return _lvl_up_raw(level, x), level

    def up_bwd(level, g):
        return None, _lvl_down_raw(level, g)

    up.defvjp(up_fwd, up_bwd)
    return down, up


_CONV_DOWN, _CONV_UP = _make_conv_pair()
_LVL_DOWN, _LVL_UP = _make_lvl_conv_pair()


def edge_conv_down(level: LevelGraph, x, ew=None, method: str = "ell"):
    """Aggregating pass: msg = x[senders] · ew, summed at receivers.

    `ew=None` means "the level's own transition weights" (the model's case)
    and additionally unlocks the windowed gather-free kernel on layouts
    built with `window` > 0."""
    method, _ = _split_interleave(method)
    if method.startswith("halo:") and getattr(level, "local", None) is not None:
        # Ghost-edge halo layout: the generic gather/aggregate composition
        # is invalid there (gather_recv is ghost-clamped) — use the
        # dedicated adjoint pair (one ext gather + local kernel each way).
        assert ew is None, "halo ghost layouts precompute ew offline"
        from bsms_gnn_tpu.parallel import halo

        return halo.conv_down_ghost(level, x, method.split(":")[1])
    if ew is None:
        if method in ("pallas", "fused") and _conv_fast_ok(level, x):
            return _LVL_DOWN(level, x)
        ew = level.ew.astype(x.dtype)
    if method in ("pallas", "fused") and _conv_fast_ok(level, x):
        return _CONV_DOWN(level, x, ew)
    msg = gather_send(level, x, method) * ew[..., None]
    return aggregate_recv(level, msg, method)


def edge_conv_up(level: LevelGraph, x, ew=None, method: str = "ell"):
    """Returning pass (ref aggragating=False): msg = x[receivers] · ew,
    summed at senders."""
    method, _ = _split_interleave(method)
    if method.startswith("halo:") and getattr(level, "local", None) is not None:
        assert ew is None, "halo ghost layouts precompute ew offline"
        from bsms_gnn_tpu.parallel import halo

        return halo.conv_up_ghost(level, x, method.split(":")[1])
    if ew is None:
        if method in ("pallas", "fused") and _conv_fast_ok(level, x):
            return _LVL_UP(level, x)
        ew = level.ew.astype(x.dtype)
    if method in ("pallas", "fused") and _conv_fast_ok(level, x):
        return _CONV_UP(level, x, ew)
    msg = gather_recv(level, x, method) * ew[..., None]
    return aggregate_send(level, msg, method)
