"""Pallas TPU kernel: sorted-CSR segment-sum (edge→node aggregation).

The hot aggregation of every GMP block (reference `scatter_sum` to receiver,
`src/ops/basic.py:94`) over the offline block-aligned receiver-sorted edge
layout (`graph/hierarchy.py`: every 128-node block's edge segment is padded
to 128-edge chunks, so each chunk maps to exactly one 128-row output block).

Design (SURVEY.md §7.2 item 8):
  * grid over edge chunks of 128; Pallas streams the [128, C] feature blocks
    and [1, 128] packed receiver rows through VMEM with automatic
    double-buffering — no manual DMA, and chunk N+1 prefetches while chunk N
    computes (this is what the block-aligned layout buys);
  * the output BlockSpec's index map reads a scalar-prefetched
    chunk→node-block table, so consecutive chunks of the same block revisit
    one VMEM tile (zeroed on first visit) and spill to HBM only on block
    change;
  * in-chunk accumulation uses the MXU: out += onehot @ chunk, where
    onehot[n, e] = (node_iota[n] == receiver_local[e]) — a broadcast compare
    of a [BN, 1] iota against the [1, 128] receiver row; a scatter becomes a
    [128, 128] × [128, C] matmul (the VPU cannot scatter; the systolic array
    eats the one-hot for free). HIGHEST precision keeps f32 mantissas (the
    MXU truncates f32 operands to bf16 by default);
  * pad slots carry receiver = pad-node row, which falls outside every block
    except the last → zero one-hot column (the last block accumulates pad
    garbage onto the pad node, which nothing reads).

The backward of the aggregation is a plain gather by receiver (custom_vjp).

Applies to 2-D [E_pad, C] features with C a multiple of 128 (the latent dim
of every GMP block); callers fall back to the ELL path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BN = 128  # node rows per output block
# Edges per chunk = the level layout's `edge_block` (one packed receiver
# row). Bigger chunks amortize the ~250 ns fixed per-chunk cost (measured on
# v5e) — large-mesh layouts use 512 (see graph/hierarchy.py).


def _make_kernel(be: int):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, feat_ref, recv_ref, out_ref):
        c = pl.program_id(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # recv_ref holds 8 packed receiver rows (Mosaic wants ≥8 sublanes);
        # this chunk's row is c mod 8.
        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row  # [1, BE]
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(feat_ref.dtype)  # [BN, BE]
        # HIGHEST keeps full f32 mantissas (the MXU truncates f32 operands
        # to bf16 by default); Mosaic rejects it for bf16 operands, where
        # the default already accumulates in f32.
        precision = (
            jax.lax.Precision.HIGHEST
            if feat_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out_ref[:] += jax.lax.dot_general(
            onehot,
            feat_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_call(e_pad: int, n_pad: int, c: int, dtype, interpret: bool, be: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_chunks = e_pad // be
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # chunk→block table, first-visit flags
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c),
            lambda i, chunk_block, first: (chunk_block[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _make_kernel(be),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # revisited out blocks need
        ),                                       # strictly sequential grid
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * BN * c,
            bytes_accessed=e_pad * c * 4 + e_pad * 4 + n_pad * c * 4,
            transcendentals=0,
        ),
    )


def _supported(level, feat) -> bool:
    if feat.ndim not in (2, 3):
        return False
    if getattr(level, "skip_empty", False):
        # Skip-empty layouts never visit (and so never zero) empty node
        # blocks — only the accumulate kernels below may aggregate them.
        return False
    be = getattr(level, "edge_block", 128)
    return (
        feat.shape[-1] % 128 == 0
        and level.n_pad_nodes % BN == 0
        and level.n_pad_edges % be == 0
        and level.recv_indptr.ndim == 1
    )


# ---------------------------------------------------------------------------
# Accumulate variants: out starts as a copy of an existing [N_pad, C] array
# (input_output_aliases) and only the blocks owning edge chunks are visited —
# the natural form for adding a sparse residual layout's contribution
# (graph/hierarchy.py `skip_empty`) onto a dense aggregate without paying
# one chunk per empty block.
# ---------------------------------------------------------------------------


def _make_accum_kernel(be: int):
    import jax.experimental.pallas as pl

    def kernel(chunk_block_ref, first_ref, prev_ref, feat_ref, recv_ref,
               out_ref):
        c = pl.program_id(0)
        base_row = chunk_block_ref[c] * BN

        @pl.when(first_ref[c] == 1)
        def _():
            out_ref[:] = prev_ref[:]

        row = jax.lax.rem(c, 8)
        r_local = recv_ref[pl.ds(row, 1), :] - base_row
        node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        onehot = (node_iota == r_local).astype(feat_ref.dtype)
        precision = (
            jax.lax.Precision.HIGHEST
            if feat_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out_ref[:] += jax.lax.dot_general(
            onehot,
            feat_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_accum_call(e_pad: int, n_pad: int, c: int, dtype, interpret: bool,
                    be: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_chunks = e_pad // be
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((BN, c), lambda i, cb, f: (cb[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_accum_kernel(be),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # acc rides as operand 2 (after the two scalar-prefetch tables) and
        # IS the output buffer: unvisited blocks keep its values.
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def _accum_supported(level, feat, acc) -> bool:
    if feat.ndim not in (2, 3) or acc.ndim != feat.ndim:
        return False
    be = getattr(level, "edge_block", 128)
    return (
        feat.shape[-1] % 128 == 0
        and acc.shape[-1] == feat.shape[-1]
        and acc.shape[-2] == level.n_pad_nodes
        and level.n_pad_nodes % BN == 0
        and level.n_pad_edges % be == 0
        and level.recv_indptr.ndim == 1
    )


def _forward_accum(level, feat, acc):
    interpret = jax.default_backend() != "tpu"
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
        [
            jnp.ones((1,), jnp.int32),
            (chunk_block[1:] != chunk_block[:-1]).astype(jnp.int32),
        ]
    )
    dtype = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    call = _get_accum_call(
        e_pad, n_pad, feat.shape[-1], jnp.dtype(dtype).name, interpret, be
    )
    recv_packed = level.receivers.reshape(-1, be).astype(jnp.int32)
    rows8 = -(-num_chunks // 8) * 8
    recv_packed = jnp.pad(
        recv_packed, ((0, rows8 - num_chunks), (0, 0)), constant_values=n_pad - 1
    )
    return call(chunk_block, first, acc.astype(jnp.float32),
                feat.astype(dtype), recv_packed)


def segment_sum_accum_raw(level, feat, acc) -> Optional[jax.Array]:
    """acc + receiver-sums of feat, with NO custom VJP (for callers that
    define their own adjoint). The only kernel valid on `skip_empty`
    layouts. Returns None when unsupported."""
    if not _accum_supported(level, feat, acc):
        return None
    if feat.ndim == 3:
        return jax.vmap(lambda f, a: _forward_accum(level, f, a))(feat, acc)
    return _forward_accum(level, feat, acc)


def segment_sum_accum(level, feat, acc) -> Optional[jax.Array]:
    """Differentiable acc + receiver-sums of feat: d_acc = g (identity),
    d_feat = g[receivers]. Returns None when unsupported."""
    if not _accum_supported(level, feat, acc):
        return None

    in_dtype = feat.dtype
    acc_dtype = acc.dtype

    @jax.custom_vjp
    def agg(lvl, f, a):
        return _forward_accum(lvl, f, a)

    def fwd(lvl, f, a):
        return _forward_accum(lvl, f, a), lvl

    def bwd(lvl, g):
        return (None, jnp.take(g, lvl.receivers, axis=-2).astype(in_dtype),
                g.astype(acc_dtype))

    agg.defvjp(fwd, bwd)
    if feat.ndim == 3:
        return jax.vmap(agg, in_axes=(None, 0, 0))(level, feat, acc)
    return agg(level, feat, acc)


def segment_sum_accum_send_raw(level, feat, acc) -> Optional[jax.Array]:
    """acc + SENDER-sums of feat (reverse-perm trick), no VJP. The
    skip-empty-safe form of `segment_sum_send_pallas`'s forward."""
    if not _accum_supported(level, feat, acc) or level.reverse_perm.ndim != 1:
        return None
    f = jnp.take(feat, level.reverse_perm, axis=-2)
    if feat.ndim == 3:
        return jax.vmap(lambda fi, a: _forward_accum(level, fi, a))(f, acc)
    return _forward_accum(level, f, acc)


def _forward(level, feat):
    interpret = jax.default_backend() != "tpu"
    n_pad, e_pad = level.n_pad_nodes, level.n_pad_edges
    be = getattr(level, "edge_block", 128)
    num_chunks = e_pad // be
    # Chunk → owning node block, from the layout's block starts
    # (recv_indptr at block boundaries; tail chunks land on the last block).
    block_starts = level.recv_indptr[::BN]  # [num_blocks + 1]
    chunk_offs = jnp.arange(num_chunks, dtype=jnp.int32) * be
    chunk_block = jnp.searchsorted(
        block_starts[1:], chunk_offs, side="right"
    ).astype(jnp.int32)
    chunk_block = jnp.minimum(chunk_block, n_pad // BN - 1)
    first = jnp.concatenate(
        [
            jnp.ones((1,), jnp.int32),
            (chunk_block[1:] != chunk_block[:-1]).astype(jnp.int32),
        ]
    )
    dtype = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
    call = _get_call(
        e_pad, n_pad, feat.shape[-1], jnp.dtype(dtype).name, interpret, be
    )
    recv_packed = level.receivers.reshape(-1, be).astype(jnp.int32)
    rows8 = -(-num_chunks // 8) * 8
    recv_packed = jnp.pad(
        recv_packed, ((0, rows8 - num_chunks), (0, 0)), constant_values=n_pad - 1
    )
    return call(chunk_block, first, feat.astype(dtype), recv_packed)


def segment_sum_send_pallas(level, feat) -> Optional[jax.Array]:
    """Aggregate [E_pad, C] edge features into [N_pad, C] SENDER sums by
    permuting each slot to its reverse edge and reusing the receiver-sorted
    kernel (symmetric edge sets). Backward is a gather by sender.

    `level` rides as an explicit custom-VJP argument (None cotangent) so the
    backward reads its arrays from the residuals, never from the closure —
    closure capture leaks tracers when fwd and bwd trace separately
    (jax.checkpoint / the remat train mode)."""
    if not _supported(level, feat) or level.reverse_perm.ndim != 1:
        return None

    in_dtype = feat.dtype

    def _run(lvl, f):
        return _forward(lvl, jnp.take(f, lvl.reverse_perm, axis=-2))

    @jax.custom_vjp
    def agg(lvl, f):
        return _run(lvl, f)

    def fwd(lvl, f):
        return _run(lvl, f), lvl

    def bwd(lvl, g):
        return None, jnp.take(g, lvl.senders, axis=-2).astype(in_dtype)

    agg.defvjp(fwd, bwd)
    if feat.ndim == 3:
        return jax.vmap(agg, in_axes=(None, 0))(level, feat)
    return agg(level, feat)


def segment_sum_raw(level, feat) -> Optional[jax.Array]:
    """The bare receiver-sum kernel with NO custom VJP attached — for
    callers that define their own adjoint over a larger fused expression
    (ops/message.py's conv adjoint pair). Returns None when unsupported."""
    if not _supported(level, feat):
        return None
    if feat.ndim == 3:
        return jax.vmap(lambda f: _forward(level, f))(feat)
    return _forward(level, feat)


def segment_sum_pallas(level, feat) -> Optional[jax.Array]:
    """Aggregate [E_pad, C] edge features into [N_pad, C] receiver sums, or
    None when the kernel doesn't apply (caller falls back to ELL).

    `level` is an explicit custom-VJP argument (None cotangent): the
    backward gather reads `receivers` from the residuals, not the closure
    (closure capture leaks tracers under jax.checkpoint — remat training)."""
    if not _supported(level, feat):
        return None

    in_dtype = feat.dtype

    @jax.custom_vjp
    def agg(lvl, f):
        return _forward(lvl, f)

    def fwd(lvl, f):
        return _forward(lvl, f), lvl

    def bwd(lvl, g):
        return None, jnp.take(g, lvl.receivers, axis=-2).astype(in_dtype)

    agg.defvjp(fwd, bwd)
    if feat.ndim == 3:
        # Batched consistent-mesh mode: vmap adds a batch grid dimension to
        # the pallas_call (one kernel launch, B× the chunks).
        return jax.vmap(agg, in_axes=(None, 0))(level, feat)
    return agg(level, feat)
