"""Pallas TPU kernel: sorted-CSR segment-sum (edge→node aggregation).

The hot aggregation of every GMP block (reference `scatter_sum` to receiver,
`src/ops/basic.py:94`) over the offline receiver-sorted padded edge list.

Design (SURVEY.md §7.2 item 8):
  * grid over node blocks of BN=128 rows; block i owns the contiguous edge
    range [indptr[i·BN], indptr[(i+1)·BN]) — block starts ride in as scalar
    prefetch so DMA offsets are known before the body runs;
  * edge features stay in HBM and stream through a double-buffered VMEM
    scratch in BE=128-edge chunks aligned to the edge array (aligned ⇒ every
    DMA is in-bounds; boundary chunks are masked). Receiver ids are packed
    offline-shape [E/128, 128] so each chunk's ids arrive as one [1, 128]
    row — edges live on the *lane* axis and no cross-lane relayout is ever
    needed;
  * in-chunk accumulation uses the MXU: acc += onehot @ chunk, where
    onehot[n, e] = (node_iota[n] == receiver_local[e]) is a broadcast
    compare of a [BN, 1] iota against the [1, 128] receiver row — a scatter
    becomes a [BN, 128] × [128, C] matmul (the VPU cannot scatter; the
    systolic array eats the one-hot for free);
  * lanes outside [start, end) get receiver −1 → an all-zero one-hot column.

The backward of the aggregation is a plain gather by receiver (custom_vjp).

Applies to 2-D [E_pad, C] features with C a multiple of 128 (the latent dim
of every GMP block); callers fall back to the ELL path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

BN = 128  # node rows per grid step
GROUP = 128  # edges per one-hot matmul (= one packed receiver row)
GROUPS_PER_CHUNK = 8
BE = GROUP * GROUPS_PER_CHUNK  # edges per DMA chunk


def _make_kernel():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(block_starts_ref, feat_hbm, recv_hbm, out_ref,
               acc_ref, feat_buf, recv_buf, fsems, rsems):
        i = pl.program_id(0)
        start = block_starts_ref[i]
        end = block_starts_ref[i + 1]
        base_row = i * BN

        acc_ref[:] = jnp.zeros_like(acc_ref)

        c0 = start // BE
        c1 = pl.cdiv(end, BE)

        def feat_dma(slot, chunk):
            return pltpu.make_async_copy(
                feat_hbm.at[pl.ds(chunk * BE, BE), :],
                feat_buf.at[slot],
                fsems.at[slot],
            )

        def recv_dma(slot, chunk):
            return pltpu.make_async_copy(
                recv_hbm.at[pl.ds(chunk * GROUPS_PER_CHUNK, GROUPS_PER_CHUNK), :],
                recv_buf.at[slot],
                rsems.at[slot],
            )

        @pl.when(c1 > c0)
        def _():
            feat_dma(0, c0).start()
            recv_dma(0, c0).start()

            def body(chunk, _):
                slot = (chunk - c0) % 2
                nxt = (chunk - c0 + 1) % 2

                @pl.when(chunk + 1 < c1)
                def _():
                    feat_dma(nxt, chunk + 1).start()
                    recv_dma(nxt, chunk + 1).start()

                feat_dma(slot, chunk).wait()
                recv_dma(slot, chunk).wait()

                node_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, GROUP), 0)
                for g in range(GROUPS_PER_CHUNK):
                    # Absolute edge index per lane; mask lanes outside the
                    # block's range.
                    offs = chunk * BE + g * GROUP + jax.lax.broadcasted_iota(
                        jnp.int32, (1, GROUP), 1
                    )
                    in_range = (offs >= start) & (offs < end)
                    r_local = jnp.where(
                        in_range, recv_buf[slot, pl.ds(g, 1), :] - base_row, -1
                    )
                    onehot = (node_iota == r_local).astype(jnp.float32)
                    # HIGHEST precision: the TPU MXU truncates f32 operands
                    # to bf16 by default; the one-hot is exact but the
                    # features would lose mantissa bits.
                    acc_ref[:] += jax.lax.dot_general(
                        onehot,
                        feat_buf[slot, pl.ds(g * GROUP, GROUP), :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                return 0

            jax.lax.fori_loop(c0, c1, body, 0)

        out_ref[:] = acc_ref[:]

    return kernel


@functools.lru_cache(maxsize=None)
def _get_call(e_pad: int, n_pad: int, c: int, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_blocks = n_pad // BN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # feat [E_pad, C] in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # recv packed [E_pad/128, 128]
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BN, c), jnp.float32),  # accumulator
            pltpu.VMEM((2, BE, c), jnp.float32),  # feature double buffer
            pltpu.VMEM((2, GROUPS_PER_CHUNK, GROUP), jnp.int32),  # receiver rows
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * BN * c,
            bytes_accessed=e_pad * c * 4 + e_pad * 4 + n_pad * c * 4,
            transcendentals=0,
        ),
    )


def _supported(level, feat) -> bool:
    if feat.ndim != 2:
        return False  # batched [B, E, C] runs the ELL path
    return (
        feat.shape[-1] % 128 == 0
        and level.n_pad_nodes % BN == 0
        and level.n_pad_edges % BE == 0
        and level.recv_indptr.ndim == 1
    )


def _forward(level, feat):
    interpret = jax.default_backend() != "tpu"
    block_starts = level.recv_indptr[::BN].astype(jnp.int32)
    call = _get_call(
        level.n_pad_edges, level.n_pad_nodes, feat.shape[-1], interpret
    )
    recv_packed = level.receivers.reshape(-1, GROUP).astype(jnp.int32)
    return call(block_starts, feat.astype(jnp.float32), recv_packed)


def segment_sum_pallas(level, feat) -> Optional[jax.Array]:
    """Aggregate [E_pad, C] edge features into [N_pad, C] receiver sums, or
    None when the kernel doesn't apply (caller falls back to ELL)."""
    if not _supported(level, feat):
        return None

    @jax.custom_vjp
    def agg(f):
        return _forward(level, f)

    def fwd(f):
        return _forward(level, f), None

    def bwd(_, g):
        return (jnp.take(g, level.receivers, axis=-2),)

    agg.defvjp(fwd, bwd)
    return agg(feat)
