"""Fused aggregation + GMP node phase: receiver segment-sum and the whole
node MLP (split first layer + tail + LayerNorm + residual) in ONE kernel.

The GMP's closing sequence (reference `src/ops/basic.py:94-98`) is
`aggr = scatter_sum(e, receivers)` followed by `node_mlp([x, aggr]) + x`.
Separately those are two custom calls with an [N, C] HBM round trip for
`aggr` between them. Here the one-hot MXU segment-sum accumulates each
128-row output block in VMEM scratch, and on the block's LAST edge chunk
the node phase runs in place on the accumulated block — `aggr` never
exists in HBM and one dispatch replaces two (the headline meshes are
dispatch-bound: PARITY.md roofline §1).

Backward (custom VJP) is pure reuse: recompute `aggr` with the plain
segment-sum kernel (remat — cheaper than saving it), run the existing
fused node-phase backward (ops/pallas/node_mlp.py), and route the edge
cotangent as a gather of d_aggr by receivers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.ops.pallas.fused_gmp import _dot, _mlp_chunk_fwd
from bsms_gnn_tpu.ops.pallas.segment_sum import BN


def _make_kernel(be: int, n_layers: int, op_dtype):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, last_ref, feat_ref, recv_ref,
               x_ref, wa_ref, wb_ref, b0_ref, w_ref, b_ref, out_ref, acc):
        c = pl.program_id(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(first_ref[c] == 1)
        def _():
            acc[:] = jnp.zeros_like(acc)

        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row  # [1, BE]
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(feat_ref.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if feat_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        acc[:] += jax.lax.dot_general(
            onehot, feat_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        @pl.when(last_ref[c] == 1)
        def _():
            x = x_ref[:].astype(jnp.float32)
            pre = (
                _dot(x, wa_ref[:], op_dtype)
                + _dot(acc[:], wb_ref[:], op_dtype)
                + b0_ref[pl.ds(0, 1), :]
            )
            e = _mlp_chunk_fwd(pre, w_ref, b_ref, n_layers, op_dtype)
            out_ref[:] = (e + x).astype(out_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _get_call(e_pad: int, n_pad: int, c: int, feat_dtype, be: int,
              n_layers: int, op_dtype_name: str, out_dtype_name: str,
              interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_chunks = e_pad // be
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # chunk→block, first-visit, last-visit
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BN, c),
                lambda i, chunk_block, first, last: (chunk_block[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wa
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w tail stack
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b tail stack
        ],
        out_specs=pl.BlockSpec(
            (BN, c),
            lambda i, chunk_block, first, last: (chunk_block[i], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((BN, c), jnp.float32)],
    )
    return pl.pallas_call(
        _make_kernel(be, n_layers, jnp.dtype(op_dtype_name)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.dtype(out_dtype_name)),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: scratch carries
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * BN * c + 2 * n_pad * c * c * (n_layers + 2),
            bytes_accessed=e_pad * c * 4 + n_pad * c * 8,
            transcendentals=0,
        ),
    )


def _chunk_tables(level):
    """(chunk_block, first, last) tables for the level layout. Derived with
    jnp from the level's own leaves at CALL time (inside the custom-VJP'd
    function) so remat re-traces never see stale outer-trace tracers, and
    GSPMD-sharded hierarchies (device-array leaves) work unchanged."""
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    be = getattr(level, "edge_block", 128)
    num_chunks = e_pad // be
    block_starts = level.recv_indptr[::BN]
    chunk_offs = jnp.arange(num_chunks, dtype=jnp.int32) * be
    chunk_block = jnp.searchsorted(
        block_starts[1:], chunk_offs, side="right"
    ).astype(jnp.int32)
    chunk_block = jnp.minimum(chunk_block, n_pad // BN - 1)
    diff = (chunk_block[1:] != chunk_block[:-1]).astype(jnp.int32)
    one = jnp.ones((1,), jnp.int32)
    first = jnp.concatenate([one, diff])
    last = jnp.concatenate([diff, one])
    return chunk_block, first, last


def fused_aggregate_node_phase(level, feat, x, mlp, compute_dtype=None
                               ) -> Optional[jax.Array]:
    """One kernel for `node_mlp([x, Σ_recv feat]) + x`, or None when
    unsupported (caller falls back to aggregate_recv + fused_node_phase)."""
    import numpy as np

    c = x.shape[-1]
    if feat.ndim != x.ndim or x.ndim not in (2, 3):
        return None
    if getattr(level, "skip_empty", False):
        return None
    if c % 128 != 0 or feat.shape[-1] != c:
        return None
    if not getattr(mlp, "layer_normalized", False):
        return None
    if mlp.weights[0].shape != (2 * c, c):
        return None
    if any(w.shape != (c, c) for w in mlp.weights[1:]):
        return None
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    be = getattr(level, "edge_block", 128)
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    if (n_pad % BN or e_pad % be or level.recv_indptr.ndim != 1
            or x.shape[-2] != n_pad):
        return None

    n_layers = len(mlp.weights) - 1
    interpret = jax.default_backend() != "tpu"
    cd = compute_dtype if compute_dtype is not None else jnp.float32
    op_dtype = "bfloat16" if jnp.dtype(cd) == jnp.bfloat16 else "float32"
    feat_dtype = jnp.bfloat16 if feat.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = cd if op_dtype == "bfloat16" else x.dtype

    wa = mlp.weights[0][:c].astype(jnp.float32)
    wb = mlp.weights[0][c:].astype(jnp.float32)
    b0 = jnp.zeros((8, c), jnp.float32).at[0].set(mlp.biases[0].astype(jnp.float32))
    w_stack = jnp.stack([w.astype(jnp.float32) for w in mlp.weights[1:]])
    b_stack = jnp.stack([b.astype(jnp.float32) for b in mlp.biases[1:]])

    def _raw(lvl, f, xv, wa, wb, b0, w_stack, b_stack):
        # All layout-derived arrays are computed HERE from lvl's leaves (no
        # closure over staged values — remat re-traces this body).
        chunk_block, first, last = _chunk_tables(lvl)
        num_chunks = e_pad // be
        rows8 = -(-num_chunks // 8) * 8
        recv_packed = jnp.pad(
            lvl.receivers.reshape(-1, be).astype(jnp.int32),
            ((0, rows8 - num_chunks), (0, 0)), constant_values=n_pad - 1,
        )
        call = _get_call(e_pad, n_pad, c, jnp.dtype(feat_dtype).name, be,
                         n_layers, op_dtype, jnp.dtype(out_dtype).name,
                         interpret)
        return call(chunk_block, first, last, f.astype(feat_dtype),
                    recv_packed, xv, wa, wb, b0, w_stack, b_stack)

    @jax.custom_vjp
    def run(lvl, f, xv, wa, wb, b0, w_stack, b_stack):
        return _raw(lvl, f, xv, wa, wb, b0, w_stack, b_stack)

    def fwd(lvl, f, xv, wa, wb, b0, w_stack, b_stack):
        return _raw(lvl, f, xv, wa, wb, b0, w_stack, b_stack), (
            lvl, f, xv, wa, wb, b0, w_stack, b_stack
        )

    def bwd(res, g):
        lvl, f, xv, wa, wb, b0, w_stack, b_stack = res
        from bsms_gnn_tpu.ops.pallas.node_mlp import _get_bwd
        from bsms_gnn_tpu.ops.pallas.segment_sum import segment_sum_raw

        aggr = segment_sum_raw(lvl, f)  # remat the aggregate
        rb = next(r for r in (512, 256, 128) if n_pad % r == 0)
        call = _get_bwd(n_pad, c, rb, n_layers, interpret, op_dtype,
                        jnp.dtype(xv.dtype).name,
                        jnp.dtype(jnp.float32).name)
        dx, daggr, dwa, dwb, db0, dw, db = call(
            xv, aggr.astype(jnp.float32), wa, wb, b0, w_stack, b_stack,
            g.astype(jnp.float32),
        )
        d_feat = jnp.take(daggr, lvl.receivers, axis=-2).astype(f.dtype)
        return None, d_feat, dx, dwa, dwb, db0, dw, db

    run.defvjp(fwd, bwd)
    if x.ndim == 3:
        return jax.vmap(
            run, in_axes=(None, 0, 0, None, None, None, None, None)
        )(level, feat, x, wa, wb, b0, w_stack, b_stack)
    return run(level, feat, x, wa, wb, b0, w_stack, b_stack)
