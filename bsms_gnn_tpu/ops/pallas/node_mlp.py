"""Fused GMP node phase: split-first-layer + MLP tail + LayerNorm +
residual in ONE row-chunked Pallas kernel.

The node phase of every GMP block (reference `src/ops/basic.py:95-98`:
node MLP over [x, aggr] plus residual) is bandwidth-bound XLA-side: with
hidden_layer=3 it runs 4 [N, C] matmuls whose intermediates each round-trip
HBM (~8·N·C bytes). Fused, a row chunk stays in VMEM through the whole
phase — HBM traffic drops to x + aggr in, out out (and the MXU work is
contiguous). The same [512, 128] × [128, 128] chunk dots the edge kernels
use; weights ride fully resident.

The backward recomputes the forward per chunk (remat-in-kernel) via the
shared `_mlp_chunk_fwd_save`/`_mlp_chunk_bwd` helpers and accumulates all
weight/bias gradients in VMEM scratch across the grid.

Applies to latent width a multiple of 128 with equal-width hidden layers;
callers fall back to the unfused path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.ops.pallas.fused_gmp import (
    _dot,
    _dot_nt,
    _dot_t,
    _mlp_chunk_bwd,
    _mlp_chunk_fwd,
    _mlp_chunk_fwd_save,
)


def _make_fwd_kernel(n_layers: int, op_dtype):
    import jax.experimental.pallas as pl

    def kernel(x_ref, aggr_ref, wa_ref, wb_ref, b0_ref, w_ref, b_ref,
               out_ref):
        x = x_ref[:].astype(jnp.float32)
        pre = (
            _dot(x, wa_ref[:], op_dtype)
            + _dot(aggr_ref[:].astype(jnp.float32), wb_ref[:], op_dtype)
            + b0_ref[pl.ds(0, 1), :]
        )
        e = _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype)
        out_ref[:] = (e + x).astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(n_layers: int, op_dtype):
    import jax.experimental.pallas as pl

    def kernel(x_ref, aggr_ref, wa_ref, wb_ref, b0_ref, w_ref, b_ref,
               g_ref, dx_ref, daggr_ref, dwa_ref, dwb_ref, db0_ref, dw_ref,
               db_ref, dw_acc, db_acc, dwa_acc, dwb_acc, db0_acc):
        i = pl.program_id(0)
        nc = pl.num_programs(0)

        @pl.when(i == 0)
        def _():
            dw_acc[:] = jnp.zeros_like(dw_acc)
            db_acc[:] = jnp.zeros_like(db_acc)
            dwa_acc[:] = jnp.zeros_like(dwa_acc)
            dwb_acc[:] = jnp.zeros_like(dwb_acc)
            db0_acc[:] = jnp.zeros_like(db0_acc)

        x = x_ref[:].astype(jnp.float32)
        aggr = aggr_ref[:].astype(jnp.float32)
        pre = (
            _dot(x, wa_ref[:], op_dtype)
            + _dot(aggr, wb_ref[:], op_dtype)
            + b0_ref[pl.ds(0, 1), :]
        )
        normed, inv, hs = _mlp_chunk_fwd_save(pre, w_ref, b_ref, n_layers,
                                              op_dtype)
        g = g_ref[:].astype(jnp.float32)
        dpre = _mlp_chunk_bwd(pre, hs, normed, inv, g, w_ref, n_layers,
                              op_dtype, dw_acc, db_acc)
        # Residual: out = tail(...) + x, so dx gets g directly too.
        dx_ref[:] = (_dot_nt(dpre, wa_ref[:], op_dtype) + g).astype(
            dx_ref.dtype
        )
        daggr_ref[:] = _dot_nt(dpre, wb_ref[:], op_dtype).astype(
            daggr_ref.dtype
        )
        dwa_acc[:] += _dot_t(x, dpre, op_dtype)
        dwb_acc[:] += _dot_t(aggr, dpre, op_dtype)
        db0_acc[pl.ds(0, 1), :] += jnp.sum(dpre, axis=0, keepdims=True)

        @pl.when(i == nc - 1)
        def _():
            dwa_ref[:] = dwa_acc[:]
            dwb_ref[:] = dwb_acc[:]
            db0_ref[:] = db0_acc[:]
            dw_ref[:] = dw_acc[:]
            db_ref[:] = db_acc[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _get_fwd(n_pad: int, c: int, rb: int, n_layers: int, interpret: bool,
             op_dtype_name: str, out_dtype_name: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(n_layers, jnp.dtype(op_dtype_name)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.dtype(out_dtype_name)),
        grid=(n_pad // rb,),
        in_specs=[row, row, full, full, full, full, full],
        out_specs=row,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _get_bwd(n_pad: int, c: int, rb: int, n_layers: int, interpret: bool,
             op_dtype_name: str, x_dtype_name: str, a_dtype_name: str):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    row = pl.BlockSpec((rb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_bwd_kernel(n_layers, jnp.dtype(op_dtype_name)),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c), jnp.dtype(x_dtype_name)),
            jax.ShapeDtypeStruct((n_pad, c), jnp.dtype(a_dtype_name)),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n_layers, c), jnp.float32),
        ],
        grid=(n_pad // rb,),
        in_specs=[row, row, full, full, full, full, full, row],
        out_specs=[row, row, full, full, full, full, full],
        scratch_shapes=[
            pltpu.VMEM((n_layers, c, c), jnp.float32),
            pltpu.VMEM((n_layers, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((c, c), jnp.float32),
            pltpu.VMEM((8, c), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # cross-grid dW accumulation
        ),
    )


def fused_node_phase(x, aggr, mlp, compute_dtype=None) -> Optional[jax.Array]:
    """LN(MLP_node([x, aggr])) + x in one kernel, or None when unsupported.

    `mlp` is the GMP's node MLPParams: weights[0] is the [2C, C] first
    layer (split into the x and aggr halves), the rest the equal-width
    tail. Gradients flow to x, aggr, and all weights/biases via the fused
    remat backward."""
    c = x.shape[-1]
    if x.ndim not in (2, 3) or aggr.shape != x.shape:
        return None
    if c % 128 != 0:
        return None
    if not mlp.layer_normalized:
        return None
    if mlp.weights[0].shape != (2 * c, c):
        return None
    if any(w.shape != (c, c) for w in mlp.weights[1:]):
        return None
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None  # f64 parity paths stay on the XLA implementation
    n_pad = x.shape[-2]
    rb = next((r for r in (512, 256, 128) if n_pad % r == 0), None)
    if rb is None:
        return None

    n_layers = len(mlp.weights) - 1
    interpret = jax.default_backend() != "tpu"
    cd = compute_dtype if compute_dtype is not None else jnp.float32
    op_dtype = "bfloat16" if jnp.dtype(cd) == jnp.bfloat16 else "float32"
    out_dtype = cd if op_dtype == "bfloat16" else x.dtype
    wa = mlp.weights[0][:c].astype(jnp.float32)
    wb = mlp.weights[0][c:].astype(jnp.float32)
    b0 = jnp.zeros((8, c), jnp.float32).at[0].set(
        mlp.biases[0].astype(jnp.float32)
    )
    w_stack = jnp.stack([w.astype(jnp.float32) for w in mlp.weights[1:]])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in mlp.biases[1:]])

    def _raw(x, aggr, wa, wb, b0, w_stack, b_stack):
        call = _get_fwd(n_pad, c, rb, n_layers, interpret, op_dtype,
                        jnp.dtype(out_dtype).name)
        return call(x, aggr, wa, wb, b0, w_stack, b_stack)

    @jax.custom_vjp
    def run(x, aggr, wa, wb, b0, w_stack, b_stack):
        return _raw(x, aggr, wa, wb, b0, w_stack, b_stack)

    def fwd(x, aggr, wa, wb, b0, w_stack, b_stack):
        # Raw forward, NOT `run`: re-entering a custom_vjp function inside
        # its own fwd rule breaks under nested transforms.
        return (_raw(x, aggr, wa, wb, b0, w_stack, b_stack),
                (x, aggr, wa, wb, b0, w_stack, b_stack))

    def bwd(res, g):
        x, aggr, wa, wb, b0, w_stack, b_stack = res
        call = _get_bwd(n_pad, c, rb, n_layers, interpret, op_dtype,
                        jnp.dtype(x.dtype).name, jnp.dtype(aggr.dtype).name)
        dx, daggr, dwa, dwb, db0, dw, db = call(
            x, aggr, wa, wb, b0, w_stack, b_stack, g.astype(jnp.float32)
        )
        return dx, daggr, dwa, dwb, db0, dw, db

    run.defvjp(fwd, bwd)
    if x.ndim == 3:
        return jax.vmap(run, in_axes=(0, 0, None, None, None, None, None))(
            x, aggr, wa, wb, b0, w_stack, b_stack
        )
    return run(x, aggr, wa, wb, b0, w_stack, b_stack)
