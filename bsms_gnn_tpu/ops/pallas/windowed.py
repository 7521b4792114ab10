"""Windowed one-hot gather + weighted segment-sum Pallas kernel.

XLA's random row gather on TPU is issue-rate-bound (~200M rows/s measured on
v5e regardless of dtype — a 6M-row gather costs ~30-55 ms against an ~11 ms
copy roof), which makes `take(x, senders)` the floor of every transition
conv at large scale (the op replaces reference `WeightedEdgeConv`,
`src/ops/basic.py:101-141`). This kernel removes the gather: each edge chunk
carries an offline-chosen source *window* — two consecutive W/2-row blocks
of x held VMEM-resident via BlockSpec index maps — and sender rows are
selected by a one-hot MXU dot, the same trick the segment-sum kernel uses on
the scatter side. Edge weights ride folded into the scatter one-hot, so

    out[recv] += ew_e * x[send_e]

runs as two matmuls per chunk with NO [E, C] HBM intermediate at all:

    sel = onehot_lo^T @ x_lo + onehot_hi^T @ x_hi        # [BE, C] selection
    out_block += (onehot_recv * ew_row) @ sel            # weighted scatter

Out-of-window edges (sentinel send_win == W; typically ≤10% with a
Morton-ordered mesh, graph/order.py) contribute through the level's mini
residual layout (`level.resid`) via the standard gather/segment path — the
caller (ops/message.py) adds the two parts.

Precision: the one-hot is exact in bfloat16, so bf16 features select in a
single MXU pass. f32 features are split in-kernel into three bf16 terms
(b1 + b2 + b3 carries ~24 mantissa bits — the same decomposition XLA's
HIGHEST f32 matmul uses), keeping the f32 path faithful without paying the
6-pass full product for what is only a selection.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BN = 128


def _select(oh, x, f32_mode: bool, c: int, be: int):
    """sel[e] = x[w] where oh[w, e] == 1; f32 via 3-term bf16 split."""
    if not f32_mode:
        return jax.lax.dot_general(
            oh, x.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = jnp.zeros((be, c), jnp.float32)
    rem = x.astype(jnp.float32)
    for _ in range(3):
        part = rem.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            oh, part,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rem = rem - part.astype(jnp.float32)
    return acc


def _make_kernel(be: int, wh: int, c: int, f32_mode: bool):
    import jax.experimental.pallas as pl

    def kernel(cb_ref, first_ref, wb_ref, xa_ref, xb_ref, sw_ref, recv_ref,
               ew_ref, out_ref):
        i = pl.program_id(0)
        base_row = cb_ref[i] * BN

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        row = jax.lax.rem(i, 8)
        sw = sw_ref[pl.ds(row, 1), :]  # [1, BE]; sentinel 2*wh selects nothing
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        oh_a = (iota_w == sw).astype(jnp.bfloat16)
        oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)

        sel = _select(oh_a, xa_ref[:], f32_mode, c, be) + _select(
            oh_b, xb_ref[:], f32_mode, c, be
        )  # [BE, C] f32

        rl = recv_ref[pl.ds(row, 1), :] - base_row  # [1, BE]
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        # ew rides packed as f32 regardless of mode (dynamic sublane loads
        # on (8, BE) bf16 tiles fail Mosaic's alignment proof).
        ewr = ew_ref[pl.ds(row, 1), :]  # [1, BE]; pad slots carry 0
        wsc = jnp.where(iota_n == rl, ewr, 0.0).astype(
            jnp.float32 if f32_mode else jnp.bfloat16
        )
        if f32_mode:
            out_ref[:] += jax.lax.dot_general(
                wsc, sel, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            out_ref[:] += jax.lax.dot_general(
                wsc, sel.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_call(e_pad: int, n_pad: int, c: int, wh: int, be: int,
              f32_mode: bool, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk→block, first flags, chunk→window base
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f, wb: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_kernel(be, wh, c, f32_mode),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # revisited out blocks need
        ),                                       # strictly sequential grid
    )


def _pack_rows(a, be: int, num_chunks: int, fill):
    rows8 = -(-num_chunks // 8) * 8
    out = a.reshape(num_chunks, be)
    return jnp.pad(out, ((0, rows8 - num_chunks), (0, 0)),
                   constant_values=fill)


def supported(level, x) -> bool:
    if getattr(level, "window", 0) <= 0 or level.send_win is None:
        return False
    wh = level.window // 2
    be = getattr(level, "edge_block", 128)
    return (
        x.ndim in (2, 3)
        and x.shape[-1] % 128 == 0
        and level.n_pad_nodes % wh == 0
        and level.n_pad_edges % be == 0
        and level.recv_indptr.ndim == 1
        and level.send_win.ndim == 1
    )


def _make_send_kernel(be: int, wh: int, f32_mode: bool):
    import jax.experimental.pallas as pl

    def kernel(ord_ref, first_ref, wbs_ref, vals_ref, sw_ref, outa_ref,
               outb_ref):
        i = pl.program_id(0)
        j = ord_ref[i]

        @pl.when(first_ref[i] == 1)
        def _():
            outa_ref[:] = jnp.zeros_like(outa_ref)
            outb_ref[:] = jnp.zeros_like(outb_ref)

        row = jax.lax.rem(j, 8)
        sw = sw_ref[pl.ds(row, 1), :]  # [1, BE]; sentinel 2*wh hits nothing
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        dt = jnp.float32 if f32_mode else jnp.bfloat16
        oh_a = (iota_w == sw).astype(dt)
        oh_b = (iota_w == (sw - wh)).astype(dt)
        vals = vals_ref[:]
        precision = (
            jax.lax.Precision.HIGHEST if f32_mode
            else jax.lax.Precision.DEFAULT
        )
        outa_ref[:] += jax.lax.dot_general(
            oh_a, vals, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        outb_ref[:] += jax.lax.dot_general(
            oh_b, vals, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_send_call(e_pad: int, n_pad: int, c: int, wh: int, be: int,
                   f32_mode: bool, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # window-sorted chunk order, first flags, wbs
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, o, f, w: (o[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, o, f, w: (o[i] // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wh, c), lambda i, o, f, w: (w[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), lambda i, o, f, w: (w[i] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _make_send_kernel(be, wh, f32_mode),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def windowed_send_sum_raw(level, vals) -> Optional[jax.Array]:
    """out[n] = Σ_{in-window e: send(e)=n} vals[e] — the TRANSPOSED windowed
    kernel: sender-sums of per-EDGE values without the reverse-perm row
    gather (XLA's gather is issue-rate-bound, ~200M rows/s on v5e — ~290 ms
    per 1M-node train step summed over the fused backwards this replaces).
    Chunks are visited in window-sorted order (scalar-prefetched
    permutation) so each output window block is revisited only
    consecutively; each chunk scatters through the two half-window one-hot
    transposes. Out-of-window slots (sentinel) have structurally zero
    one-hot columns, so callers owing them a contribution (none today: the
    fused backwards zero their cotangents, and real out-of-window edges
    live in `level.resid`) must add it separately. Never-visited window
    blocks hold uninitialized memory — masked out with a `where` on the
    offline-derivable visited-block map before the a+b combine. No custom
    VJP (used inside callers' backwards). Returns None when the layout has
    no window tables."""
    if not supported(level, vals):
        return None
    if vals.shape[-2] != level.n_pad_edges:
        return None
    if vals.ndim == 3:
        return jax.vmap(lambda v: windowed_send_sum_raw(level, v))(vals)
    interpret = jax.default_backend() != "tpu"
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    c = vals.shape[-1]
    be = getattr(level, "edge_block", 128)
    wh = level.window // 2
    f32_mode = vals.dtype != jnp.bfloat16
    num_chunks = e_pad // be

    wb = level.win_base.astype(jnp.int32)
    order = jnp.argsort(wb, stable=True).astype(jnp.int32)
    wbs = jnp.take(wb, order)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (wbs[1:] != wbs[:-1]).astype(jnp.int32),
    ])
    sw = _pack_rows(level.send_win.astype(jnp.int32), be, num_chunks,
                    level.window)
    call = _get_send_call(e_pad, n_pad, c, wh, be, f32_mode, interpret)
    v_dt = vals if not f32_mode else vals.astype(jnp.float32)
    out_a, out_b = call(order, first, wbs, v_dt, sw)

    n_blocks = n_pad // wh
    va = jnp.zeros((n_blocks,), bool).at[wb].set(True)
    vb = jnp.zeros((n_blocks,), bool).at[wb + 1].set(True)
    rows_a = jnp.repeat(va, wh)[:, None]
    rows_b = jnp.repeat(vb, wh)[:, None]
    zero = jnp.zeros((), jnp.float32)
    return jnp.where(rows_a, out_a, zero) + jnp.where(rows_b, out_b, zero)


def windowed_rect_conv_raw(op, x) -> Optional[jax.Array]:
    """Rectangular windowed operator application (fused level transitions,
    graph/hierarchy.py::TransOp): out[k] = Σ_{in-window e: recv(e)=k}
    ew_e · x[send_e], x in the INPUT space ([n_in_pad, C]), out in the
    OUTPUT space ([n_pad_nodes, C]). The same kernel as windowed_conv_raw —
    windows index the x operand, output blocks the out_shape, and nothing
    ties the two sizes together. Residual entries (op.resid) are NOT
    included. No custom VJP (the adjoint is the transposed TransOp)."""
    if getattr(op, "window", 0) <= 0 or op.send_win is None:
        return None
    if x.ndim == 3:
        return jax.vmap(lambda xi: windowed_rect_conv_raw(op, xi))(x)
    if x.ndim != 2 or x.shape[-1] % 128:
        return None
    wh = op.window // 2
    be = getattr(op, "edge_block", 128)
    n_out, e_pad = op.n_pad_nodes, op.n_pad_edges
    if (x.shape[-2] != op.n_in_pad or op.n_in_pad % wh or n_out % BN
            or e_pad % be or op.recv_indptr.ndim != 1):
        return None
    interpret = jax.default_backend() != "tpu"
    c = x.shape[-1]
    f32_mode = x.dtype != jnp.bfloat16
    num_chunks = e_pad // be

    from bsms_gnn_tpu.ops.pallas.fused_gmp import _chunk_tables

    chunk_block, first, recv = _chunk_tables(op)
    sw = _pack_rows(op.send_win.astype(jnp.int32), be, num_chunks, op.window)
    ewp = _pack_rows(op.ew.astype(jnp.float32), be, num_chunks, 0)
    call = _get_call(e_pad, n_out, c, wh, be, f32_mode, interpret)
    x_dt = x if not f32_mode else x.astype(jnp.float32)
    return call(chunk_block, first, op.win_base.astype(jnp.int32),
                x_dt, x_dt, sw, recv, ewp)


def windowed_conv_raw(level, x, ew) -> Optional[jax.Array]:
    """out[n] = Σ_{e: recv(e)=n, in-window} ew_e · x[send_e], with NO custom
    VJP (callers define the adjoint over the full conv; ops/message.py pairs
    it with the reversed-weight twin). Residual (out-of-window) edges are NOT
    included — add `level.resid`'s contribution separately. Returns None when
    the layout has no window tables (caller falls back)."""
    if not supported(level, x):
        return None
    if x.ndim == 3:
        return jax.vmap(lambda xi: windowed_conv_raw(level, xi, ew))(x)
    interpret = jax.default_backend() != "tpu"
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    c = x.shape[-1]
    be = getattr(level, "edge_block", 128)
    wh = level.window // 2
    f32_mode = x.dtype != jnp.bfloat16
    num_chunks = e_pad // be

    from bsms_gnn_tpu.ops.pallas.fused_gmp import _chunk_tables

    chunk_block, first, recv = _chunk_tables(level)
    sw = _pack_rows(level.send_win.astype(jnp.int32), be, num_chunks,
                    level.window)
    ewp = _pack_rows(ew.astype(jnp.float32), be, num_chunks, 0)
    call = _get_call(e_pad, n_pad, c, wh, be, f32_mode, interpret)
    x_dt = x if not f32_mode else x.astype(jnp.float32)
    return call(chunk_block, first, level.win_base.astype(jnp.int32),
                x_dt, x_dt, sw, recv, ewp)
