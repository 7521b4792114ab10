"""Compact residual-edge accumulation (block-visit Pallas kernel).

The windowed kernels leave 1-9% of edges out-of-window; those used to ride a
mini block-aligned LevelGraph whose slot space pads ~3-4x (every 128-node
block with >=1 straggler rounds up to a full edge chunk), so every residual
gather/MLP ran on mostly-pad rows — measured ~23 ms of gmp[0]'s 64 ms at the
1M mesh (74 ns per real edge vs 5.3 ns in the main kernel; see
benchmarks/kernel_breakdown.py, round 4).

This module replaces that with a COMPACT formulation: residual edges are
packed densely ([R] real rows + tail padding to 128 only), so gathers and
the edge MLP touch ~R rows, and the aggregation runs a "block-visit" kernel:

  * offline, compact rows are receiver-sorted and cut into aligned 128-row
    input blocks; each (input block, output node-block) incidence is one
    VISIT with a precomputed LOCAL receiver row ([128] int32, -1 = row
    belongs to another visit / padding);
  * the kernel walks visits (sorted by output block, so revisits are
    consecutive), reads the input block, and accumulates a one-hot MXU dot
    into the output block — in-place onto an existing accumulator
    (input_output_aliases), exactly like segment_sum's accumulate variants.

V = #visits ~ (#active node blocks) + R/128, independent of the padded slot
count the old mini layout paid for.

Replaces the residual side of reference `scatter_sum`
(`/root/reference/src/utils/basic.py:324-343`); the covered side runs the
windowed fused kernels (ops/pallas/{windowed,fused_gmp}.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BN = 128


def _make_kernel():
    import jax.experimental.pallas as pl

    def kernel(vb_ref, first_ref, cblk_ref, prev_ref, vals_ref, rl_ref,
               out_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = prev_ref[:]

        row = jax.lax.rem(i, 8)
        rl = rl_ref[pl.ds(row, 1), :]  # [1, 128] LOCAL recv rows; -1 masked
        iota = jax.lax.broadcasted_iota(jnp.int32, (BN, BN), 0)
        onehot = (iota == rl).astype(vals_ref.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if vals_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out_ref[:] += jax.lax.dot_general(
            onehot, vals_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_call(n_rows: int, n_pad: int, c: int, n_visits: int, dtype_name: str,
              interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # visit out-block, first flags, visit in-block
        grid=(n_visits,),
        in_specs=[
            pl.BlockSpec((BN, c), lambda i, vb, f, cb: (vb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, c), lambda i, vb, f, cb: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, vb, f, cb: (vb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # acc rides as operand 3 (after the three scalar-prefetch tables)
        # and IS the output buffer: unvisited blocks keep its values.
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def supported(cr, vals, acc) -> bool:
    if cr is None:
        return False
    if vals.ndim not in (2, 3) or acc.ndim != vals.ndim:
        return False
    return (
        vals.shape[-1] % 128 == 0
        and vals.shape[-2] == cr.n_rows
        and acc.shape[-1] == vals.shape[-1]
        and acc.shape[-2] == cr.n_pad_nodes
        and cr.n_pad_nodes % BN == 0
    )


def _forward(cr, vals, acc):
    interpret = jax.default_backend() != "tpu"
    c = vals.shape[-1]
    vb = cr.visit_block.astype(jnp.int32)
    first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (vb[1:] != vb[:-1]).astype(jnp.int32),
    ])
    dtype = vals.dtype if vals.dtype == jnp.bfloat16 else jnp.float32
    call = _get_call(cr.n_rows, cr.n_pad_nodes, c, int(vb.shape[0]),
                     jnp.dtype(dtype).name, interpret)
    return call(vb, first, cr.visit_cblk.astype(jnp.int32),
                acc.astype(jnp.float32), vals.astype(dtype),
                cr.visit_recv.astype(jnp.int32))


def compact_accum_raw(cr, vals, acc) -> Optional[jax.Array]:
    """acc + receiver-sums of the compact residual rows, NO custom VJP (for
    callers that pair their own adjoints — conv/transition paths). Returns
    None when unsupported."""
    if not supported(cr, vals, acc):
        return None
    if vals.ndim == 3:
        return jax.vmap(lambda v, a: _forward(cr, v, a))(vals, acc)
    return _forward(cr, vals, acc)


def compact_accum(cr, vals, acc) -> Optional[jax.Array]:
    """Differentiable acc + receiver-sums: d_acc = g, d_vals =
    g[receivers]."""
    if not supported(cr, vals, acc):
        return None

    in_dtype, acc_dtype = vals.dtype, acc.dtype

    @jax.custom_vjp
    def agg(c_, v, a):
        return _forward(c_, v, a)

    def fwd(c_, v, a):
        return _forward(c_, v, a), c_

    def bwd(c_, g):
        return (None, jnp.take(g, c_.receivers, axis=-2).astype(in_dtype),
                g.astype(acc_dtype))

    agg.defvjp(fwd, bwd)
    if vals.ndim == 3:
        return jax.vmap(agg, in_axes=(None, 0, 0))(cr, vals, acc)
    return agg(cr, vals, acc)


def compact_gather(cr, x, by: str):
    """x[cr.senders] / x[cr.receivers] → [..., R_pad, C], with scatter-free
    VJPs: the sender gather's backward rides the twin permutation (the
    residual edge set is symmetric — sender-sums equal receiver-sums of the
    twin rows) into the block-visit accumulate; the receiver gather's
    backward accumulates directly. `by='send'` requires a symmetric compact
    residual (levels; TransOps use the raw take + their op-level adjoint)."""
    assert by in ("send", "recv")
    if by == "send":
        assert cr.symmetric, "sender-gather VJP needs a symmetric resid set"
    in_dtype = x.dtype

    def _run(c_, x):
        idx = c_.senders if by == "send" else c_.receivers
        return jnp.take(x, idx, axis=-2)

    @jax.custom_vjp
    def g(c_, x):
        return _run(c_, x)

    def fwd(c_, x):
        return _run(c_, x), c_

    def bwd(c_, ct):
        zeros = jnp.zeros(
            ct.shape[:-2] + (c_.n_pad_nodes, ct.shape[-1]), jnp.float32
        )
        v = ct if by == "recv" else jnp.take(ct, c_.twin, axis=-2)
        out = compact_accum_raw(c_, v, zeros)
        if out is None:  # width not 128-aligned: dense fallback
            idx = c_.senders if by == "send" else c_.receivers
            out = zeros.at[..., idx, :].add(ct)
        return None, out.astype(in_dtype)

    g.defvjp(fwd, bwd)
    return g(cr, x)
