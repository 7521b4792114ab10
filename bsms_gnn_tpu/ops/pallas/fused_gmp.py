"""Fused edge-MLP → segment-sum Pallas kernel (FusedMM-style).

One GMP block's edge phase is: first-layer pre-activation (computed outside
— it needs gathers, which XLA does well) → ReLU → (L−1 more Linear+ReLU) →
final Linear → non-affine LayerNorm → sum-to-receiver. Unfused, every
intermediate is an [E, 128] HBM round trip; fused, a 128-edge chunk stays in
VMEM through the whole MLP and lands directly in the revisited output block
of the segment-sum — HBM traffic drops from ~6·E·C to E·C reads + N·C
writes.

The backward is a second fused kernel that RECOMPUTES the forward
activations per chunk (remat-in-kernel): the incoming node cotangent block
is scattered back to edges with the transposed one-hot matmul, chained
through LayerNorm/Linear/ReLU transposes, and weight/bias gradients
accumulate in VMEM scratch across the whole grid (written on the last
chunk). So the pair needs only `pre` as a residual.

Weights ride fully resident in VMEM ([L, 128, 128] ≈ 200 KB). Applies to
latent_dim multiple of 128 and hidden layers of equal width; callers fall
back to the unfused path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BN = 128
# Edges per chunk = the level layout's `edge_block` (512-edge chunks both
# amortize the fixed per-chunk cost and feed the MXU [512,128]x[128,128]
# dots instead of [128,128]x[128,128]).
LN_EPS = 1e-5


def _layer_norm_fwd(x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    # 1/sqrt rather than rsqrt: Mosaic lowers rsqrt to the raw approximate
    # VPU instruction (~1e-3 rel error), while XLA refines it — keep the
    # kernel bit-comparable with the unfused path.
    inv = 1.0 / jnp.sqrt(var + LN_EPS)
    return (x - mean) * inv, inv


def _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype):
    """relu(pre) → hidden Linear+ReLU layers → final Linear → LN."""
    normed, _, _ = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers, op_dtype)
    return normed


def _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers, op_dtype):
    """As `_mlp_chunk_fwd`, also returning the per-layer inputs `hs` and
    the LN inverse-std — the recompute step shared by every fused backward
    kernel (remat-in-kernel)."""
    import jax.experimental.pallas as pl

    h = jnp.maximum(pre, 0.0)
    hs = [h]
    for l in range(n_layers - 1):
        h = jnp.maximum(
            _dot(h, w_ref[l], op_dtype) + b_ref[pl.ds(l, 1), :], 0.0
        )
        hs.append(h)
    out = _dot(h, w_ref[n_layers - 1], op_dtype) + b_ref[pl.ds(n_layers - 1, 1), :]
    normed, inv = _layer_norm_fwd(out)
    return normed, inv, hs


def _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers, op_dtype,
                   dw_acc, db_acc):
    """Transpose chain of `_mlp_chunk_fwd` for one chunk: non-affine LN
    backward, tail layers in reverse (accumulating dW/db into VMEM
    scratch), then the leading ReLU — returns dpre."""
    import jax.experimental.pallas as pl

    g_mean = jnp.mean(g, axis=-1, keepdims=True)
    gn_mean = jnp.mean(g * normed, axis=-1, keepdims=True)
    dout = (g - g_mean - normed * gn_mean) * inv

    dw_acc[n_layers - 1] += _dot_t(hs[-1], dout, op_dtype)
    db_acc[pl.ds(n_layers - 1, 1), :] += jnp.sum(dout, axis=0, keepdims=True)
    dh = _dot_nt(dout, w_ref[n_layers - 1], op_dtype)
    for l in range(n_layers - 2, -1, -1):
        dh = dh * (hs[l + 1] > 0.0)
        dw_acc[l] += _dot_t(hs[l], dh, op_dtype)
        db_acc[pl.ds(l, 1), :] += jnp.sum(dh, axis=0, keepdims=True)
        dh = _dot_nt(dh, w_ref[l], op_dtype)
    return dh * (pre > 0.0)


def _dot(a, b, op_dtype=jnp.float32):
    """MXU dot with f32 accumulation. f32 operands use HIGHEST (6-pass —
    real f32); bfloat16 operands take the single-pass fast path, which is
    where the fused kernel beats XLA's unfused full-E matmuls."""
    if op_dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _make_fwd_kernel(n_layers: int, op_dtype, be: int):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, pre_ref, w_ref, b_ref, recv_ref,
               out_ref):
        c = pl.program_id(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        e = _mlp_chunk_fwd(
            pre_ref[:].astype(jnp.float32), w_ref, b_ref, n_layers, op_dtype
        )

        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row  # [1, BE]
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        # One-hot selection is exact at any operand dtype; in bf16 mode the
        # summands are the (already bf16-rounded) LN outputs, accumulated f32.
        onehot = (node_iota == r_local).astype(jnp.float32)
        out_ref[:] += _dot(onehot, e, op_dtype)

    return kernel


def _make_bwd_kernel(n_layers: int, op_dtype, be: int):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, pre_ref, w_ref, b_ref, recv_ref,
               g_node_ref, dpre_ref, dw_ref, db_ref, dw_acc, db_acc):
        c = pl.program_id(0)
        nc = pl.num_programs(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(c == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)

        # Recompute forward (remat-in-kernel), then the transpose chain.
        pre = pre_ref[:].astype(jnp.float32)
        normed, inv, hs = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers,
                                              op_dtype)

        # Edge cotangent: transposed one-hot gather of the node block.
        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot_t = (node_iota == r_local).astype(jnp.float32)  # [BN, BE]
        g = _dot_t(onehot_t, g_node_ref[:].astype(jnp.float32), op_dtype)  # [BE, C]

        dpre = _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers,
                              op_dtype, dw_acc, db_acc)
        dpre_ref[:] = dpre.astype(dpre_ref.dtype)

        @pl.when(c == nc - 1)
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]

    return kernel


def _dot_t(a, b, op_dtype=jnp.float32):
    """aᵀ @ b for [E, C] operands → [C, C]."""
    if op_dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot_nt(a, b, op_dtype=jnp.float32):
    """a @ bᵀ."""
    if op_dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chunk_tables(level):
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    be = getattr(level, "edge_block", 128)
    num_chunks = e_pad // be
    block_starts = level.recv_indptr[::BN]
    chunk_offs = jnp.arange(num_chunks, dtype=jnp.int32) * be
    chunk_block = jnp.searchsorted(
        block_starts[1:], chunk_offs, side="right"
    ).astype(jnp.int32)
    chunk_block = jnp.minimum(chunk_block, n_pad // BN - 1)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (chunk_block[1:] != chunk_block[:-1]).astype(jnp.int32)]
    )
    recv_packed = level.receivers.reshape(-1, be).astype(jnp.int32)
    rows8 = -(-num_chunks // 8) * 8
    recv_packed = jnp.pad(
        recv_packed, ((0, rows8 - num_chunks), (0, 0)),
        constant_values=n_pad - 1,
    )
    return chunk_block, first, recv_packed


@functools.lru_cache(maxsize=None)
def _get_fwd(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
             op_dtype_name: str, be: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases [L, C]
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_fwd_kernel(n_layers, jnp.dtype(op_dtype_name), be),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # revisited out blocks need
        ),                                       # strictly sequential grid
    )


@functools.lru_cache(maxsize=None)
def _get_bwd(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
             op_dtype_name: str, pre_dtype_name: str, be: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dW [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db [L, C]
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd_kernel(n_layers, jnp.dtype(op_dtype_name), be),
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, c), jnp.dtype(pre_dtype_name)),
            jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _make_fwd2_kernel(n_layers: int, op_dtype, be: int):
    """v2: also fuses the receiver-side gather and `pre` assembly. Inputs:
    zi (streamed [BE, C] sender-side pre-activation incl. fiber term and
    first bias) and xj (the [BN, C] receiver-transform block, VMEM-resident
    across same-block chunks). z_j is the transposed one-hot dot of the
    block — the [E, C] receiver gather, its HBM write, and the 3-stream
    `pre` assembly all disappear."""
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, zi_ref, xj_ref, w_ref, b_ref,
               recv_ref, out_ref):
        c = pl.program_id(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row  # [1, BE]
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)  # [BN, BE]

        zj = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)  # [BE, C]
        pre = zi_ref[:].astype(jnp.float32) + zj
        e = _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype)
        out_ref[:] += _dot(onehot, e, op_dtype)

    return kernel


def _make_bwd2_kernel(n_layers: int, op_dtype, be: int):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, zi_ref, xj_ref, w_ref, b_ref,
               recv_ref, g_node_ref, dzi_ref, dxj_ref, dw_ref, db_ref,
               dw_acc, db_acc):
        c = pl.program_id(0)
        nc = pl.num_programs(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(c == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)

        @pl.when(first_ref[c] == 1)
        def _():
            dxj_ref[:] = jnp.zeros_like(dxj_ref)

        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)  # [BN, BE]

        # Recompute forward (remat-in-kernel), then the transpose chain.
        zj = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)
        pre = zi_ref[:].astype(jnp.float32) + zj
        normed, inv, hs = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers,
                                              op_dtype)

        g = _dot_t(onehot, g_node_ref[:].astype(jnp.float32), op_dtype)  # [BE, C]
        dpre = _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers,
                              op_dtype, dw_acc, db_acc)
        dzi_ref[:] = dpre.astype(dzi_ref.dtype)
        dxj_ref[:] += _dot(onehot, dpre, op_dtype)

        @pl.when(c == nc - 1)
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _get_fwd2(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, be: int, x_dtype_name: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases [L, C]
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_fwd2_kernel(n_layers, jnp.dtype(op_dtype_name), be),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=None)
def _get_bwd2(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, pre_dtype_name: str, be: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dW [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db [L, C]
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd2_kernel(n_layers, jnp.dtype(op_dtype_name), be),
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, c), jnp.dtype(pre_dtype_name)),
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _make_fwd3_kernel(n_layers: int, op_dtype, be: int, wh: int):
    """v3: v2 plus IN-KERNEL windowed sender selection (see
    ops/pallas/windowed.py for the window layout): the [E, C] sender gather
    — XLA's issue-rate-bound `take` — disappears too. Inputs: zif (streamed
    fiber term + first bias), xwi (sender transform, resident as two W/2
    half-window blocks), xj (receiver transform block, v2 trick).
    Out-of-window slots (sentinel) are masked out of the scatter; the
    caller runs the level's mini residual layout through the unfused path
    and adds it."""
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(cb_ref, first_ref, wb_ref, fibt_ref, xwia_ref, xwib_ref,
               xj_ref, wf8_ref, w_ref, b_ref, sw_ref, recv_ref, out_ref):
        i = pl.program_id(0)
        base_row = cb_ref[i] * BN

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        row = jax.lax.rem(i, 8)
        sw = sw_ref[pl.ds(row, 1), :]  # [1, BE]
        c = out_ref.shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        oh_a = (iota_w == sw).astype(jnp.bfloat16)
        oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
        sel = _select(oh_a, xwia_ref[:], f32_mode, c, be) + _select(
            oh_b, xwib_ref[:], f32_mode, c, be
        )

        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)

        zj = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)
        # Static fiber term + first bias from the component-major [8, BE]
        # stream (constant-1 row carries the bias): a tiny MXU dot replaces
        # the [E, C] zif materialization + stream.
        fib = _dot_t(fibt_ref[:].astype(jnp.float32), wf8_ref[:], op_dtype)
        pre = fib + sel + zj
        e = _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype)
        # Mask out-of-window slots (handled by the residual pass) AND pad
        # slots (sentinel too) from the scatter.
        masked = jnp.where(sw < 2 * wh, onehot, 0.0)
        out_ref[:] += _dot(masked, e, op_dtype)

    return kernel


def _make_bwd3_kernel(n_layers: int, op_dtype, be: int, wh: int):
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(cb_ref, first_ref, wb_ref, fibt_ref, xwia_ref, xwib_ref,
               xj_ref, wf8_ref, w_ref, b_ref, sw_ref, recv_ref, g_node_ref,
               dpre_ref, dxj_ref, dwf8_ref, dw_ref, db_ref, dw_acc, db_acc,
               dwf8_acc):
        i = pl.program_id(0)
        nc = pl.num_programs(0)
        base_row = cb_ref[i] * BN

        @pl.when(i == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)
            dwf8_acc[:] = jnp.zeros_like(dwf8_acc)

        @pl.when(first_ref[i] == 1)
        def _():
            dxj_ref[:] = jnp.zeros_like(dxj_ref)

        row = jax.lax.rem(i, 8)
        sw = sw_ref[pl.ds(row, 1), :]
        c = dxj_ref.shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        oh_a = (iota_w == sw).astype(jnp.bfloat16)
        oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
        sel = _select(oh_a, xwia_ref[:], f32_mode, c, be) + _select(
            oh_b, xwib_ref[:], f32_mode, c, be
        )

        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)
        masked = jnp.where(sw < 2 * wh, onehot, 0.0)

        # Recompute forward (remat-in-kernel), then the transpose chain.
        zj = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)
        fibt = fibt_ref[:].astype(jnp.float32)
        fib = _dot_t(fibt, wf8_ref[:], op_dtype)
        pre = fib + sel + zj
        normed, inv, hs = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers,
                                              op_dtype)

        # Masked slots get a ZERO edge cotangent (their output never
        # entered the aggregate), which zeroes their whole chain below.
        g = _dot_t(masked, g_node_ref[:].astype(jnp.float32), op_dtype)
        dpre = _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers,
                              op_dtype, dw_acc, db_acc)
        dpre_ref[:] = dpre.astype(dpre_ref.dtype)
        dxj_ref[:] += _dot(onehot, dpre, op_dtype)
        dwf8_acc[:] += _dot(fibt, dpre, op_dtype)

        @pl.when(i == nc - 1)
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]
            dwf8_ref[:] = dwf8_acc[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _get_fwd3(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, be: int, wh: int, x_dtype_name: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((8, be), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # fiber_t [8, E_pad]
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf8 [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases [L, C]
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f, wb: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_fwd3_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=None)
def _get_bwd3(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, pre_dtype_name: str, be: int, wh: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((8, be), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # fiber_t [8, E_pad]
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), lambda i, cb, f, wb: (wb[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf8 [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwf8 [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dW [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db [L, C]
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd3_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh),
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, c), jnp.dtype(pre_dtype_name)),
            jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=None)
def _get_fwd4(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, be: int, wh: int, wd: int,
              pre_dtype_name: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((8, be), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # fiber_t [8, E_pad]
            pl.BlockSpec((wh, 2 * c), lambda i, cb, f, wb: (wb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, 2 * c), lambda i, cb, f, wb: (wb[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 2 * c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf8 [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wfd [C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wfn [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases [L, C]
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f, wb: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_fwd4_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh, wd),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


@functools.lru_cache(maxsize=None)
def _get_bwd4(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, pre_dtype_name: str, be: int, wh: int,
              wd: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e_pad // be,),
        in_specs=[
            pl.BlockSpec((8, be), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # fiber_t [8, E_pad]
            pl.BlockSpec((wh, 2 * c), lambda i, cb, f, wb: (wb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, 2 * c), lambda i, cb, f, wb: (wb[i] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 2 * c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wfd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wfn
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 2 * c), lambda i, cb, f, wb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwf8 [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwfd [C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dwfn [8, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dW [L, C, C]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # db [L, C]
        ],
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd4_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh, wd),
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, c), jnp.dtype(pre_dtype_name)),
            jax.ShapeDtypeStruct((n_pad, 2 * c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def fused_edge_phase_win_dyn(level, xwi_ext, xj_ext, wf8, wfd_ext, wfn,
                             weights: Tuple, biases: Tuple, wd: int
                             ) -> Optional[jax.Array]:
    """v4: the windowed fused edge phase with DYNAMIC (world-space) fibers.

    xwi_ext / xj_ext: [N_pad, 2C], lanes [0, C) = x@W_i / x@W_j, lanes
    [C, C+wd) = world positions, rest zero. wf8: [8, C] static-fiber rows +
    first bias (see fused_edge_phase_win — the static term comes from the
    in-kernel `level.fiber_t` dot). wfd_ext: [C, C] with rows [0, wd) = the
    Δworld rows of the first-layer weight; wfn: [8, C] row 0 = the ‖Δworld‖
    row. World positions must be stop-gradient at the call site (the
    backward returns no w-lane cotangents). Returns None when
    unsupported."""
    from bsms_gnn_tpu.ops.pallas.windowed import supported as win_supported

    if not supported(level, xwi_ext[..., : xwi_ext.shape[-1] // 2], weights):
        return None
    if not win_supported(level, xwi_ext[..., : xwi_ext.shape[-1] // 2]):
        return None
    if getattr(level, "fiber_t", None) is None or level.fiber_t.ndim != 2:
        return None
    c = xwi_ext.shape[-1] // 2
    if xwi_ext.shape[-2] != level.n_pad_nodes:
        return None
    if xj_ext.shape[-2:] != (level.n_pad_nodes, 2 * c):
        return None
    if not (0 < wd <= c) or wf8.shape != (8, c):
        return None

    n_layers = len(weights)
    interpret = jax.default_backend() != "tpu"
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    be = getattr(level, "edge_block", 128)
    wh = level.window // 2
    op_dtype = "bfloat16" if xwi_ext.dtype == jnp.bfloat16 else "float32"
    pre_dtype = jnp.dtype(xwi_ext.dtype).name if op_dtype == "bfloat16" else "float32"
    w_stack = jnp.stack([w.astype(jnp.float32) for w in weights])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in biases])
    wf8_32 = wf8.astype(jnp.float32)
    wfd32 = wfd_ext.astype(jnp.float32)
    wfn32 = wfn.astype(jnp.float32)

    from bsms_gnn_tpu.ops.pallas.windowed import _pack_rows

    def _tables(lvl):
        chunk_block, first, recv = _chunk_tables(lvl)
        sw = _pack_rows(lvl.send_win.astype(jnp.int32), be, e_pad // be,
                        lvl.window)
        return chunk_block, first, lvl.win_base.astype(jnp.int32), sw, recv

    def _raw_forward(lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack, b_stack):
        cb, first, wb, sw, recv = _tables(lvl)
        call = _get_fwd4(e_pad, n_pad, c, n_layers, interpret, op_dtype, be,
                         wh, wd, pre_dtype)
        return call(cb, first, wb, lvl.fiber_t.astype(pre_dtype),
                    xwi_ext.astype(pre_dtype), xwi_ext.astype(pre_dtype),
                    xj_ext.astype(pre_dtype), wf8, wfd, wfn, w_stack,
                    b_stack, sw, recv)

    @jax.custom_vjp
    def run(lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack, b_stack):
        return _raw_forward(lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack,
                            b_stack)

    def fwd(lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack, b_stack):
        out = _raw_forward(lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack,
                           b_stack)
        return out, (lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack, b_stack)

    def bwd(res, g):
        lvl, xwi_ext, xj_ext, wf8, wfd, wfn, w_stack, b_stack = res
        cb, first, wb, sw, recv = _tables(lvl)
        call = _get_bwd4(e_pad, n_pad, c, n_layers, interpret, op_dtype,
                         pre_dtype, be, wh, wd)
        dpre, dxj_ext, dwf8, dwfd, dwfn, dw, db = call(
            cb, first, wb, lvl.fiber_t.astype(pre_dtype),
            xwi_ext.astype(pre_dtype), xwi_ext.astype(pre_dtype),
            xj_ext.astype(pre_dtype), wf8, wfd, wfn,
            w_stack, b_stack, sw, recv, g.astype(jnp.float32),
        )
        # Same gather-free sender-sum as the v3 backward (transposed
        # windowed kernel; gather fallback).
        from bsms_gnn_tpu.ops.pallas.windowed import windowed_send_sum_raw

        dxwi_x = windowed_send_sum_raw(lvl, dpre)
        if dxwi_x is None:
            from bsms_gnn_tpu.ops.pallas.segment_sum import (
                segment_sum_raw as _ssr,
            )

            dxwi_x = _ssr(lvl, jnp.take(dpre, lvl.reverse_perm, axis=-2))
        dxwi_ext = jnp.concatenate(
            [dxwi_x.astype(xwi_ext.dtype),
             jnp.zeros_like(dxwi_x).astype(xwi_ext.dtype)], axis=-1
        )
        return (None, dxwi_ext, dxj_ext.astype(xj_ext.dtype),
                dwf8.astype(wf8.dtype), dwfd.astype(wfd.dtype),
                dwfn.astype(wfn.dtype), dw, db)

    run.defvjp(fwd, bwd)
    axes = tuple(0 if a.ndim == 3 else None for a in (xwi_ext, xj_ext))
    if any(ax == 0 for ax in axes):
        return jax.vmap(
            run, in_axes=(None, *axes, None, None, None, None, None)
        )(level, xwi_ext, xj_ext, wf8_32, wfd32, wfn32, w_stack, b_stack)
    return run(level, xwi_ext, xj_ext, wf8_32, wfd32, wfn32, w_stack,
               b_stack)


def fused_edge_phase_win(level, xwi, xj, wf8, weights: Tuple, biases: Tuple
                         ) -> Optional[jax.Array]:
    """v3: aggregate_recv(LN(MLP_tail(relu(fiber·wf8 + xwi[senders] +
    xj[receivers])))) in one kernel, with BOTH gathers in-kernel (sender
    side via windowed one-hot selection, receiver side via the transposed
    one-hot of the resident block) AND the static fiber term computed from
    the component-major [8, E_pad] stream (`level.fiber_t`; its constant-1
    row carries the first bias through wf8) — no [E, C] HBM stream at all
    in the forward. wf8: [8, C], rows [0, pd1) = the static-fiber rows of
    the first-layer weight, row pd1 = the first bias. Returns None when
    the layout has no window tables (or shapes don't fit); residual
    (out-of-window) edges are NOT included — the caller adds the
    mini-layout edge phase (ops/message.py)."""
    from bsms_gnn_tpu.ops.pallas.windowed import supported as win_supported

    if not supported(level, xwi, weights) or not win_supported(level, xwi):
        return None
    if getattr(level, "fiber_t", None) is None or level.fiber_t.ndim != 2:
        return None
    c = xwi.shape[-1]
    if xwi.shape[-2] != level.n_pad_nodes:
        return None
    if xj.shape[-2:] != (level.n_pad_nodes, c):
        return None
    if wf8.shape != (8, c):
        return None

    n_layers = len(weights)
    interpret = jax.default_backend() != "tpu"
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    be = getattr(level, "edge_block", 128)
    wh = level.window // 2
    op_dtype = "bfloat16" if xwi.dtype == jnp.bfloat16 else "float32"
    pre_dtype = jnp.dtype(xwi.dtype).name if op_dtype == "bfloat16" else "float32"
    w_stack = jnp.stack([w.astype(jnp.float32) for w in weights])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in biases])
    wf8_32 = wf8.astype(jnp.float32)

    from bsms_gnn_tpu.ops.pallas.windowed import _pack_rows

    def _tables(lvl):
        chunk_block, first, recv = _chunk_tables(lvl)
        sw = _pack_rows(lvl.send_win.astype(jnp.int32), be, e_pad // be,
                        lvl.window)
        return chunk_block, first, lvl.win_base.astype(jnp.int32), sw, recv

    def _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack):
        cb, first, wb, sw, recv = _tables(lvl)
        call = _get_fwd3(e_pad, n_pad, c, n_layers, interpret, op_dtype, be,
                         wh, pre_dtype)
        return call(cb, first, wb, lvl.fiber_t.astype(pre_dtype),
                    xwi.astype(pre_dtype), xwi.astype(pre_dtype),
                    xj.astype(pre_dtype), wf8, w_stack, b_stack, sw, recv)

    @jax.custom_vjp
    def run(lvl, xwi, xj, wf8, w_stack, b_stack):
        return _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack)

    def fwd(lvl, xwi, xj, wf8, w_stack, b_stack):
        out = _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack)
        return out, (lvl, xwi, xj, wf8, w_stack, b_stack)

    def bwd(res, g):
        lvl, xwi, xj, wf8, w_stack, b_stack = res
        cb, first, wb, sw, recv = _tables(lvl)
        call = _get_bwd3(e_pad, n_pad, c, n_layers, interpret, op_dtype,
                         pre_dtype, be, wh)
        dpre, dxj, dwf8, dw, db = call(
            cb, first, wb, lvl.fiber_t.astype(pre_dtype),
            xwi.astype(pre_dtype), xwi.astype(pre_dtype),
            xj.astype(pre_dtype), wf8, w_stack, b_stack,
            sw, recv, g.astype(jnp.float32),
        )
        # d_xwi[n] = Σ_{in-window e: send(e)=n} dpre_e. dpre is zero at
        # masked slots (and sentinel slots select no one-hot column), so
        # the transposed windowed kernel computes it with no row gather;
        # fall back to reverse-permute + the receiver segment kernel.
        from bsms_gnn_tpu.ops.pallas.windowed import windowed_send_sum_raw

        dxwi = windowed_send_sum_raw(lvl, dpre)
        if dxwi is None:
            from bsms_gnn_tpu.ops.pallas.segment_sum import (
                segment_sum_raw as _ssr,
            )

            dxwi = _ssr(lvl, jnp.take(dpre, lvl.reverse_perm, axis=-2))
        return (None, dxwi.astype(xwi.dtype), dxj.astype(xj.dtype),
                dwf8.astype(wf8.dtype), dw, db)

    run.defvjp(fwd, bwd)
    axes = tuple(0 if a.ndim == 3 else None for a in (xwi, xj))
    if any(ax == 0 for ax in axes):
        # Batched mode (shared mesh): wf8 and the fiber stream are
        # unbatched while x-derived streams carry the batch axis.
        return jax.vmap(run, in_axes=(None, *axes, None, None, None))(
            level, xwi, xj, wf8_32, w_stack, b_stack
        )
    return run(level, xwi, xj, wf8_32, w_stack, b_stack)




def _make_fwd4_kernel(n_layers: int, op_dtype, be: int, wh: int, wd: int):
    """v4: v3 plus DYNAMIC (world-space) edge fibers, for the contact cases
    (reference README.md:10). The sender/receiver streams ride EXTENDED
    [N, 2C] tables: lanes [0, C) carry the x transforms, lanes [C, C+wd)
    the world positions (zero-padded to a full lane group so all slicing is
    128-aligned). Δworld and ‖Δworld‖ are computed in-kernel from the same
    one-hot selections that fetch the x parts — the unfused path's four
    gathers (z_i, z_j, p_i, p_j) all disappear. World positions are
    stop-gradient (they never reach parameters: the dyn stream is smoothed
    by no-grad transition convs), so the backward owes no w-lane
    cotangents."""
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(cb_ref, first_ref, wb_ref, fibt_ref, xwia_ref, xwib_ref,
               xj_ref, wf8_ref, wfd_ref, wfn_ref, w_ref, b_ref, sw_ref,
               recv_ref, out_ref):
        i = pl.program_id(0)
        base_row = cb_ref[i] * BN

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        row = jax.lax.rem(i, 8)
        sw = sw_ref[pl.ds(row, 1), :]
        c = out_ref.shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        oh_a = (iota_w == sw).astype(jnp.bfloat16)
        oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
        sel = _select(oh_a, xwia_ref[:], f32_mode, 2 * c, be) + _select(
            oh_b, xwib_ref[:], f32_mode, 2 * c, be
        )  # [BE, 2C]

        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)
        zjf = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)

        dwv = sel[:, c:] - zjf[:, c:]  # [BE, C], lanes >= wd are zero
        nrm = jnp.sqrt(jnp.sum(dwv * dwv, axis=-1, keepdims=True))
        fib = _dot_t(fibt_ref[:].astype(jnp.float32), wf8_ref[:], op_dtype)
        pre = (
            fib
            + sel[:, :c]
            + zjf[:, :c]
            + _dot(dwv, wfd_ref[:], op_dtype)
            + nrm * wfn_ref[pl.ds(0, 1), :]
        )
        e = _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype)
        masked = jnp.where(sw < 2 * wh, onehot, 0.0)
        out_ref[:] += _dot(masked, e, op_dtype)

    return kernel


def _make_bwd4_kernel(n_layers: int, op_dtype, be: int, wh: int, wd: int):
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(cb_ref, first_ref, wb_ref, fibt_ref, xwia_ref, xwib_ref,
               xj_ref, wf8_ref, wfd_ref, wfn_ref, w_ref, b_ref, sw_ref,
               recv_ref, g_node_ref, dpre_ref, dxj_ref, dwf8_ref, dwfd_ref,
               dwfn_ref, dw_ref, db_ref, dw_acc, db_acc, dwf8_acc, dwfd_acc,
               dwfn_acc):
        i = pl.program_id(0)
        nc = pl.num_programs(0)
        base_row = cb_ref[i] * BN

        @pl.when(i == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)
            dwf8_acc[:] = jnp.zeros_like(dwf8_acc)
            dwfd_acc[:] = jnp.zeros_like(dwfd_acc)
            dwfn_acc[:] = jnp.zeros_like(dwfn_acc)

        @pl.when(first_ref[i] == 1)
        def _():
            dxj_ref[:] = jnp.zeros_like(dxj_ref)

        row = jax.lax.rem(i, 8)
        sw = sw_ref[pl.ds(row, 1), :]
        c = dpre_ref.shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        oh_a = (iota_w == sw).astype(jnp.bfloat16)
        oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
        sel = _select(oh_a, xwia_ref[:], f32_mode, 2 * c, be) + _select(
            oh_b, xwib_ref[:], f32_mode, 2 * c, be
        )

        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(jnp.float32)
        masked = jnp.where(sw < 2 * wh, onehot, 0.0)
        zjf = _dot_t(onehot, xj_ref[:].astype(jnp.float32), op_dtype)

        dwv = sel[:, c:] - zjf[:, c:]
        nrm = jnp.sqrt(jnp.sum(dwv * dwv, axis=-1, keepdims=True))
        fibt = fibt_ref[:].astype(jnp.float32)
        fib = _dot_t(fibt, wf8_ref[:], op_dtype)
        pre = (
            fib
            + sel[:, :c]
            + zjf[:, :c]
            + _dot(dwv, wfd_ref[:], op_dtype)
            + nrm * wfn_ref[pl.ds(0, 1), :]
        )
        normed, inv, hs = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers,
                                              op_dtype)

        g = _dot_t(masked, g_node_ref[:].astype(jnp.float32), op_dtype)
        dpre = _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers,
                              op_dtype, dw_acc, db_acc)

        # Dynamic-fiber weight gradients (the fiber VALUES are
        # stop-gradient, so no w-lane cotangents are owed).
        dwfd_acc[:] += _dot_t(dwv, dpre, op_dtype)
        dwfn_acc[pl.ds(0, 1), :] += jnp.sum(nrm * dpre, axis=0, keepdims=True)
        dwf8_acc[:] += _dot(fibt, dpre, op_dtype)

        dpre_ref[:] = dpre.astype(dpre_ref.dtype)
        dxj_ref[:, :c] += _dot(onehot, dpre, op_dtype)

        @pl.when(i == nc - 1)
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]
            dwf8_ref[:] = dwf8_acc[:]
            dwfd_ref[:] = dwfd_acc[:]
            dwfn_ref[:] = dwfn_acc[:]

    return kernel


def fused_edge_phase(level, zi, xj, weights: Tuple, biases: Tuple
                     ) -> Optional[jax.Array]:
    """aggregate_recv(LN(MLP_tail(relu(zi + xj[receivers])))) in one kernel.

    zi: [E_pad, C] sender-side pre-activation (x@W_i gathered to edges, plus
    the fiber term and first-layer bias — everything except the receiver
    part). xj: [N_pad, C] receiver transform x@W_j, gathered IN-KERNEL via
    the transposed one-hot dot of the resident output block, so the [E, C]
    receiver gather never exists in HBM. Gradients flow to zi, xj, weights,
    biases (fused remat backward; d_xj accumulates into revisited blocks).
    Returns None when unsupported (caller falls back)."""
    if not supported(level, zi, weights):
        return None
    if xj.shape[-2:] != (level.n_pad_nodes, zi.shape[-1]):
        return None

    n_layers = len(weights)
    interpret = jax.default_backend() != "tpu"
    c = zi.shape[-1]
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    be = getattr(level, "edge_block", 128)
    op_dtype = "bfloat16" if zi.dtype == jnp.bfloat16 else "float32"
    pre_dtype = jnp.dtype(zi.dtype).name if op_dtype == "bfloat16" else "float32"
    w_stack = jnp.stack([w.astype(jnp.float32) for w in weights])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in biases])

    # `level` rides as an explicit custom-VJP argument (None cotangent) so
    # fwd AND bwd derive the chunk tables from residual-threaded arrays —
    # closure capture leaks tracers when fwd/bwd trace separately
    # (jax.checkpoint / the remat train mode).

    def _raw_forward(lvl, zi, xj, w_stack, b_stack):
        chunk_block, first, recv_packed = _chunk_tables(lvl)
        call = _get_fwd2(e_pad, n_pad, c, n_layers, interpret, op_dtype, be,
                         pre_dtype)
        return call(chunk_block, first, zi.astype(pre_dtype),
                    xj.astype(pre_dtype), w_stack, b_stack, recv_packed)

    @jax.custom_vjp
    def run(lvl, zi, xj, w_stack, b_stack):
        return _raw_forward(lvl, zi, xj, w_stack, b_stack)

    def fwd(lvl, zi, xj, w_stack, b_stack):
        out = _raw_forward(lvl, zi, xj, w_stack, b_stack)
        return out, (lvl, zi, xj, w_stack, b_stack)

    def bwd(res, g):
        lvl, zi, xj, w_stack, b_stack = res
        chunk_block, first, recv_packed = _chunk_tables(lvl)
        call = _get_bwd2(e_pad, n_pad, c, n_layers, interpret, op_dtype,
                         pre_dtype, be)
        dzi, dxj, dw, db = call(
            chunk_block, first, zi.astype(pre_dtype), xj.astype(pre_dtype),
            w_stack, b_stack, recv_packed, g.astype(jnp.float32),
        )
        return None, dzi.astype(zi.dtype), dxj.astype(xj.dtype), dw, db

    run.defvjp(fwd, bwd)
    if zi.ndim == 3:
        return jax.vmap(run, in_axes=(None, 0, 0, None, None))(
            level, zi, xj, w_stack, b_stack
        )
    return run(level, zi, xj, w_stack, b_stack)


def supported(level, pre, weights) -> bool:
    c = pre.shape[-1]
    if pre.ndim not in (2, 3):
        return False
    if any(w.shape != (c, c) for w in weights):
        return False
    return (
        c % 128 == 0
        and level.n_pad_nodes % BN == 0
        and level.n_pad_edges % getattr(level, "edge_block", 128) == 0
        and level.recv_indptr.ndim == 1
    )


def fused_edge_mlp_aggregate(level, pre, weights: Tuple, biases: Tuple
                             ) -> Optional[jax.Array]:
    """aggregate_recv(LN(MLP_tail(relu(pre)))) in one fused kernel, or None
    when unsupported. weights/biases are the MLP's layers AFTER the first
    (the caller computes `pre` with the split-first-layer trick).

    Gradients flow to pre, weights, and biases via the fused backward.
    """
    if not supported(level, pre, weights):
        return None

    n_layers = len(weights)
    interpret = jax.default_backend() != "tpu"
    c = pre.shape[-1]
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    be = getattr(level, "edge_block", 128)
    # bfloat16 `pre` selects the single-pass bf16 MXU path (and halves the
    # kernel's dominant HBM read); f32 `pre` keeps exact HIGHEST dots.
    op_dtype = "bfloat16" if pre.dtype == jnp.bfloat16 else "float32"
    pre_dtype = jnp.dtype(pre.dtype).name if op_dtype == "bfloat16" else "float32"
    w_stack = jnp.stack([w.astype(jnp.float32) for w in weights])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in biases])

    # `level` rides as an explicit custom-VJP argument (None cotangent) so
    # fwd AND bwd derive the chunk tables from residual-threaded arrays —
    # closure capture leaks tracers when fwd/bwd trace separately
    # (jax.checkpoint / the remat train mode).

    def _raw_forward(lvl, pre, w_stack, b_stack):
        chunk_block, first, recv_packed = _chunk_tables(lvl)
        call = _get_fwd(e_pad, n_pad, c, n_layers, interpret, op_dtype, be)
        return call(chunk_block, first, pre.astype(pre_dtype), w_stack,
                    b_stack, recv_packed)

    @jax.custom_vjp
    def run(lvl, pre, w_stack, b_stack):
        return _raw_forward(lvl, pre, w_stack, b_stack)

    def fwd(lvl, pre, w_stack, b_stack):
        # Call the raw forward, NOT `run`: re-entering the custom_vjp
        # function inside its own fwd rule breaks under nested transforms.
        return _raw_forward(lvl, pre, w_stack, b_stack), (lvl, pre, w_stack, b_stack)

    def bwd(res, g):
        lvl, pre, w_stack, b_stack = res
        chunk_block, first, recv_packed = _chunk_tables(lvl)
        call = _get_bwd(e_pad, n_pad, c, n_layers, interpret, op_dtype,
                        pre_dtype, be)
        dpre, dw, db = call(
            chunk_block, first, pre.astype(pre_dtype), w_stack, b_stack,
            recv_packed, g.astype(jnp.float32),
        )
        return None, dpre.astype(pre.dtype), dw, db

    run.defvjp(fwd, bwd)
    if pre.ndim == 3:
        return jax.vmap(run, in_axes=(None, 0, None, None))(
            level, pre, w_stack, b_stack
        )
    return run(level, pre, w_stack, b_stack)


# ---------------------------------------------------------------------------
# v5: K-way chunk-interleaved windowed kernel (round-5 "kernel wall" probe).
#
# The r4 irreducibility dossier (PARITY.md "Kernel wall") pinned the
# remaining per-chunk cost on MXU pipeline occupancy of the sequential
# in-chunk dot chain plus ~450 ns fixed per-chunk overhead. Both terms
# divide by K if one grid step carries K INDEPENDENT 512-edge chunks:
# the K selection/scatter chains interleave (VPU one-hot materialization
# of chunk s+1 overlaps the MXU dots of chunk s), the tail MLP runs on the
# stacked [K*be, C] rows (deeper MXU pipeline fill per dot), and the grid
# is K-fold shorter. The edge layout is UNCHANGED — chunks stay `be` edges
# (this is not eb=1024: no extra padding).
#
# Stream decomposition: the chunk list splits into K static contiguous
# ranges of M = ceil(nc/K) chunks. Receiver blocks are monotone over the
# chunk list, so each stream's visited output blocks form a contiguous
# range; each stream accumulates into its own [N_pad, C] output under its
# own first-visit flags, and the caller sums the K outputs under
# visited-range masks — a block on a stream boundary is visited by both
# neighbours, whose partial sums add to the exact total, while blocks
# outside a stream's range (undefined memory) are masked away. Streams
# shorter than M repeat their last chunk with live=0 (the scatter masks
# them to an exact zero contribution).
# ---------------------------------------------------------------------------


def _chunk_tables5(level, k: int):
    """Per-stream (ci, cb, wb, first, live) scalar-prefetch tables plus the
    per-stream visited block ranges, all shape-static for k streams."""
    cb_all, _, recv_packed = _chunk_tables(level)
    be = getattr(level, "edge_block", 128)
    nc = level.n_pad_edges // be
    m = -(-nc // k)
    wb_all = jnp.asarray(level.win_base).astype(jnp.int32)
    tabs, vis = [], []
    for s in range(k):
        idx = jnp.arange(m, dtype=jnp.int32) + s * m
        live = (idx < nc).astype(jnp.int32)
        ci = jnp.minimum(idx, nc - 1)
        cb = cb_all[ci]
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (cb[1:] != cb[:-1]).astype(jnp.int32)]
        )
        wb = wb_all[ci]
        tabs.extend([ci, cb, wb, first, live])
        vis.append((cb[0], cb[m - 1]))
    return tabs, vis, recv_packed


def _make_fwd5_kernel(n_layers: int, op_dtype, be: int, wh: int, k: int,
                      stack: bool = False):
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(*args):
        ns = 5 * k
        scal = args[:ns]
        ins = args[ns:ns + 6 * k]
        wf8_ref, w_ref, b_ref = args[ns + 6 * k:ns + 6 * k + 3]
        outs = args[ns + 6 * k + 3:]
        i = pl.program_id(0)
        c = outs[0].shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        pres, masks = [], []
        for s in range(k):
            ci_r, cb_r, wb_r, first_r, live_r = scal[5 * s:5 * s + 5]
            fib_r, xwia_r, xwib_r, xj_r, sw_r, recv_r = ins[6 * s:6 * s + 6]

            @pl.when(first_r[i] == 1)
            def _(o=outs[s]):
                o[:] = jnp.zeros_like(o)

            row = jax.lax.rem(ci_r[i], 8)
            sw = sw_r[pl.ds(row, 1), :]
            oh_a = (iota_w == sw).astype(jnp.bfloat16)
            oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
            sel = _select(oh_a, xwia_r[:], f32_mode, c, be) + _select(
                oh_b, xwib_r[:], f32_mode, c, be
            )
            r_local = recv_r[pl.ds(row, 1), :] - cb_r[i] * BN
            onehot = (node_iota == r_local).astype(jnp.float32)
            zj = _dot_t(onehot, xj_r[:].astype(jnp.float32), op_dtype)
            fib = _dot_t(fib_r[:].astype(jnp.float32), wf8_ref[:], op_dtype)
            pres.append(fib + sel + zj)
            keep = jnp.logical_and(live_r[i] == 1, sw < 2 * wh)
            masks.append(jnp.where(keep, onehot, 0.0))
        if stack:
            stacked = jnp.concatenate(pres, axis=0) if k > 1 else pres[0]
            e = _mlp_chunk_fwd(stacked, w_ref, b_ref, n_layers, op_dtype)
            es = [e[s * be:(s + 1) * be] for s in range(k)]
        else:
            # Per-stream tail chains: the K independent dot chains still
            # interleave in Mosaic's schedule, without paying the concat's
            # VMEM copy of the stacked rows.
            es = [_mlp_chunk_fwd(p_, w_ref, b_ref, n_layers, op_dtype)
                  for p_ in pres]
        for s in range(k):
            outs[s][:] += _dot(masks[s], es[s], op_dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _get_fwd5(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, be: int, wh: int, k: int,
              stack: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc = e_pad // be
    m = -(-nc // k)
    in_specs = []
    for s in range(k):
        in_specs += [
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (0, t[5 * s][i])),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), (lambda i, *t, s=s: (t[5 * s + 2][i], 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c),
                         (lambda i, *t, s=s: (t[5 * s + 2][i] + 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), (lambda i, *t, s=s: (t[5 * s + 1][i], 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (t[5 * s][i] // 8, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (t[5 * s][i] // 8, 0)),
                         memory_space=pltpu.VMEM),
        ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 * k,
        grid=(m,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((BN, c), (lambda i, *t, s=s: (t[5 * s + 1][i], 0)),
                         memory_space=pltpu.VMEM)
            for s in range(k)
        ],
    )
    return pl.pallas_call(
        _make_fwd5_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh, k,
                          stack),
        out_shape=[jax.ShapeDtypeStruct((n_pad, c), jnp.float32)] * k,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _combine_streams(outs, vis, n_pad: int):
    """Sum per-stream partial outputs under their visited-block-range
    masks (see module comment: boundary blocks add, dead memory masks)."""
    blocks = jnp.arange(n_pad // BN, dtype=jnp.int32)
    total = None
    for out, (lo, hi) in zip(outs, vis):
        mask = jnp.repeat((blocks >= lo) & (blocks <= hi), BN)[:, None]
        term = jnp.where(mask, out, 0.0)
        total = term if total is None else total + term
    return total


def fused_edge_phase_win_k(level, xwi, xj, wf8, weights: Tuple,
                           biases: Tuple, k: int = 2,
                           min_density: int = 6
                           ) -> Optional[jax.Array]:
    """K-way interleaved v3 edge phase (forward + fused backward): same
    contract as `fused_edge_phase_win` (windowed part only; the caller adds
    the residual layout), with K chunks per grid step. k=1 falls back to
    the v3 pair."""
    if k <= 1:
        return fused_edge_phase_win(level, xwi, xj, wf8, weights, biases)
    # Chunk-density gate (benchmarks/out/k_interleave.json): the K-way
    # kernel wins only where the per-level combine (K masked [N_pad, C]
    # sums) is small against the kernel — i.e. many chunks per 128-node
    # output block (deep bi-stride levels, A^2-dense). Sparse levels
    # (level 0: ~2 chunks/block) fall back to the v3 pair.
    be_g = getattr(level, "edge_block", 128)
    if level.n_pad_edges // be_g < min_density * (level.n_pad_nodes // BN):
        return fused_edge_phase_win(level, xwi, xj, wf8, weights, biases)
    from bsms_gnn_tpu.ops.pallas.windowed import supported as win_supported

    if not supported(level, xwi, weights) or not win_supported(level, xwi):
        return None
    if getattr(level, "fiber_t", None) is None or level.fiber_t.ndim != 2:
        return None
    if getattr(level, "skip_empty", False):
        return None
    c = xwi.shape[-1]
    if xwi.shape[-2] != level.n_pad_nodes:
        return None
    if xj.shape[-2:] != (level.n_pad_nodes, c):
        return None
    if wf8.shape != (8, c):
        return None

    n_layers = len(weights)
    interpret = jax.default_backend() != "tpu"
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    be = getattr(level, "edge_block", 128)
    wh = level.window // 2
    op_dtype = "bfloat16" if xwi.dtype == jnp.bfloat16 else "float32"
    pre_dtype = jnp.dtype(xwi.dtype).name if op_dtype == "bfloat16" else "float32"
    w_stack = jnp.stack([w.astype(jnp.float32) for w in weights])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in biases])
    wf8_32 = wf8.astype(jnp.float32)

    from bsms_gnn_tpu.ops.pallas.windowed import _pack_rows

    def _tables(lvl):
        tabs, vis, recv = _chunk_tables5(lvl, k)
        sw = _pack_rows(lvl.send_win.astype(jnp.int32), be, e_pad // be,
                        lvl.window)
        return tabs, vis, sw, recv

    def _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack):
        tabs, vis, sw, recv = _tables(lvl)
        call = _get_fwd5(e_pad, n_pad, c, n_layers, interpret, op_dtype, be,
                         wh, k)
        xw = xwi.astype(pre_dtype)
        fib = lvl.fiber_t.astype(pre_dtype)
        xjt = xj.astype(pre_dtype)
        stream_ins = []
        for _ in range(k):
            stream_ins += [fib, xw, xw, xjt, sw, recv]
        outs = call(*tabs, *stream_ins, wf8, w_stack, b_stack)
        return _combine_streams(outs, vis, n_pad)

    @jax.custom_vjp
    def run(lvl, xwi, xj, wf8, w_stack, b_stack):
        return _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack)

    def fwd(lvl, xwi, xj, wf8, w_stack, b_stack):
        out = _raw_forward(lvl, xwi, xj, wf8, w_stack, b_stack)
        return out, (lvl, xwi, xj, wf8, w_stack, b_stack)

    def bwd(res, g):
        lvl, xwi, xj, wf8, w_stack, b_stack = res
        tabs, vis, sw, recv = _tables(lvl)
        call = _get_bwd5(e_pad, n_pad, c, n_layers, interpret, op_dtype,
                         pre_dtype, be, wh, k)
        xw = xwi.astype(pre_dtype)
        fib = lvl.fiber_t.astype(pre_dtype)
        xjt = xj.astype(pre_dtype)
        g32 = g.astype(jnp.float32)
        stream_ins = []
        for _ in range(k):
            stream_ins += [fib, xw, xw, xjt, sw, recv, g32]
        res_out = call(*tabs, *stream_ins, wf8, w_stack, b_stack)
        dpres = res_out[:k]
        dxjs = res_out[k:2 * k]
        dwf8, dw, db = res_out[2 * k:]
        dxj = _combine_streams(dxjs, vis, n_pad)
        # dpre streams are disjoint chunk ranges of the SAME [E_pad, C]
        # slot space; reassemble by static concatenation (dead tail slots
        # carry zero dpre — their scatter mask zeroed the whole chain).
        nc = e_pad // be
        m = -(-nc // k)
        parts = []
        for s in range(k):
            lo = s * m * be
            hi = min((s + 1) * m, nc) * be
            if hi > lo:
                parts.append(dpres[s][: hi - lo])
        dpre = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

        from bsms_gnn_tpu.ops.pallas.windowed import windowed_send_sum_raw

        dxwi = windowed_send_sum_raw(lvl, dpre)
        if dxwi is None:
            from bsms_gnn_tpu.ops.pallas.segment_sum import (
                segment_sum_raw as _ssr,
            )

            dxwi = _ssr(lvl, jnp.take(dpre, lvl.reverse_perm, axis=-2))
        return (None, dxwi.astype(xwi.dtype), dxj.astype(xj.dtype),
                dwf8.astype(wf8.dtype), dw, db)

    run.defvjp(fwd, bwd)
    axes = tuple(0 if a.ndim == 3 else None for a in (xwi, xj))
    if any(ax == 0 for ax in axes):
        return jax.vmap(run, in_axes=(None, *axes, None, None, None))(
            level, xwi, xj, wf8_32, w_stack, b_stack
        )
    return run(level, xwi, xj, wf8_32, w_stack, b_stack)


def _make_bwd5_kernel(n_layers: int, op_dtype, be: int, wh: int, k: int):
    """K-way interleaved v3 backward: per-stream recompute + per-stream
    node-cotangent scatter, with ONE stacked [K*be, C] tail transpose chain
    and shared dW/db/dwf8 VMEM accumulators. Dead (live=0) repeats get a
    zero edge cotangent, which zeroes their whole chain — no double count."""
    import jax.experimental.pallas as pl

    from bsms_gnn_tpu.ops.pallas.windowed import _select

    def kernel(*args):
        ns = 5 * k
        scal = args[:ns]
        ins = args[ns:ns + 7 * k]
        wf8_ref, w_ref, b_ref = args[ns + 7 * k:ns + 7 * k + 3]
        rest = args[ns + 7 * k + 3:]
        dpre_refs = rest[:k]
        dxj_refs = rest[k:2 * k]
        dwf8_ref, dw_ref, db_ref = rest[2 * k:2 * k + 3]
        dw_acc, db_acc, dwf8_acc = rest[2 * k + 3:]
        i = pl.program_id(0)
        nc_g = pl.num_programs(0)
        c = dxj_refs[0].shape[-1]
        f32_mode = op_dtype != jnp.bfloat16
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wh, be), 0)
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)

        @pl.when(i == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)
            dwf8_acc[:] = jnp.zeros_like(dwf8_acc)

        pres, onehots, gs, fibts = [], [], [], []
        for s in range(k):
            ci_r, cb_r, wb_r, first_r, live_r = scal[5 * s:5 * s + 5]
            (fib_r, xwia_r, xwib_r, xj_r, sw_r, recv_r,
             g_node_r) = ins[7 * s:7 * s + 7]

            @pl.when(first_r[i] == 1)
            def _(o=dxj_refs[s]):
                o[:] = jnp.zeros_like(o)

            row = jax.lax.rem(ci_r[i], 8)
            sw = sw_r[pl.ds(row, 1), :]
            oh_a = (iota_w == sw).astype(jnp.bfloat16)
            oh_b = (iota_w == (sw - wh)).astype(jnp.bfloat16)
            sel = _select(oh_a, xwia_r[:], f32_mode, c, be) + _select(
                oh_b, xwib_r[:], f32_mode, c, be
            )
            r_local = recv_r[pl.ds(row, 1), :] - cb_r[i] * BN
            onehot = (node_iota == r_local).astype(jnp.float32)
            keep = jnp.logical_and(live_r[i] == 1, sw < 2 * wh)
            masked = jnp.where(keep, onehot, 0.0)
            zj = _dot_t(onehot, xj_r[:].astype(jnp.float32), op_dtype)
            fibt = fib_r[:].astype(jnp.float32)
            fib = _dot_t(fibt, wf8_ref[:], op_dtype)
            pres.append(fib + sel + zj)
            onehots.append(onehot)
            fibts.append(fibt)
            gs.append(_dot_t(masked, g_node_r[:].astype(jnp.float32),
                             op_dtype))

        # Per-stream tail transpose chains (K independent chains interleave
        # in Mosaic's schedule; the measured k_interleave.json probe shows
        # stacked concat costs ~7% in VMEM copies). _mlp_chunk_bwd's scratch
        # accumulation (dw_acc[l] += ...) composes across streams.
        for s in range(k):
            normed, inv, hs = _mlp_chunk_fwd_save(pres[s], w_ref, b_ref,
                                                  n_layers, op_dtype)
            dpre_s = _mlp_chunk_bwd(pres[s], hs, normed, inv, gs[s], w_ref,
                                    n_layers, op_dtype, dw_acc, db_acc)
            dwf8_acc[:] += _dot(fibts[s], dpre_s, op_dtype)
            dpre_refs[s][:] = dpre_s.astype(dpre_refs[s].dtype)
            dxj_refs[s][:] += _dot(onehots[s], dpre_s, op_dtype)

        @pl.when(i == nc_g - 1)
        def _():
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]
            dwf8_ref[:] = dwf8_acc[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _get_bwd5(e_pad: int, n_pad: int, c: int, n_layers: int, interpret: bool,
              op_dtype_name: str, pre_dtype_name: str, be: int, wh: int,
              k: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nc = e_pad // be
    m = -(-nc // k)
    in_specs = []
    for s in range(k):
        in_specs += [
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (0, t[5 * s][i])),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c), (lambda i, *t, s=s: (t[5 * s + 2][i], 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wh, c),
                         (lambda i, *t, s=s: (t[5 * s + 2][i] + 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), (lambda i, *t, s=s: (t[5 * s + 1][i], 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (t[5 * s][i] // 8, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), (lambda i, *t, s=s: (t[5 * s][i] // 8, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), (lambda i, *t, s=s: (t[5 * s + 1][i], 0)),
                         memory_space=pltpu.VMEM),
        ]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    out_specs = [
        pl.BlockSpec((be, c), (lambda i, *t: (i, 0)),
                     memory_space=pltpu.VMEM)
        for _ in range(k)
    ] + [
        pl.BlockSpec((BN, c), (lambda i, *t, s=s: (t[5 * s + 1][i], 0)),
                     memory_space=pltpu.VMEM)
        for s in range(k)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5 * k,
        grid=(m,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _make_bwd5_kernel(n_layers, jnp.dtype(op_dtype_name), be, wh, k),
        out_shape=(
            [jax.ShapeDtypeStruct((m * be, c), jnp.dtype(pre_dtype_name))
             for _ in range(k)]
            + [jax.ShapeDtypeStruct((n_pad, c), jnp.float32)
               for _ in range(k)]
            + [jax.ShapeDtypeStruct((8, c), jnp.float32),
               jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
               jax.ShapeDtypeStruct((n_layers, c), jnp.float32)]
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
