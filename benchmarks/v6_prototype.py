"""Prototype of the round-4 'free-block sub-window' selection kernel (v6).

kernel_breakdown.py shows the v3/conv wall is NOT the edge-MLP tail
(marginal tail dot: 77 ns/chunk, at the pure-dot roof) but the one-hot
SELECTION MACs (2·(W/2)·BE·C per chunk) plus per-chunk overhead. This
prototype replaces the per-chunk contiguous W=512 window with per-128-edge
sub-chunk windows of K=2 freely-chosen 128-row blocks (sub-chunk blocks are
constrained inside the chunk's old contiguous window so the fused backward's
send kernel keeps working unchanged): selection MACs drop 2x
(8 x [128,128]x[128,C] dots vs 2 x [256,512]x[256,C]), one-hot VPU
materialization drops 2x, streamed window rows stay 4x128 = 512.

Compares, on one 1M-mesh level: current windowed_conv_raw vs the v6
prototype, same math (weighted receiver conv over the covered edge set),
parity-checked against a NumPy oracle on the prototype's own covered set.

Usage: python benchmarks/v6_prototype.py [n_nodes] [level] [dtype]
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kernel_roofline import measure_roofs  # noqa: E402
from profile_1m import _scan_time, load_scale_hierarchy  # noqa: E402

BN = 128
SUB = 128
K = 2


def build_sub_tables(level):
    """Per-128-edge sub-chunk: top-K aligned 128-row sender blocks, chosen
    inside the chunk's old contiguous window. Returns (sub_base [chunks*OPS],
    send_sub [E_pad] in [0, K*128] (sentinel K*128), covered mask)."""
    be = level.edge_block
    wh = level.window // 2
    s = np.asarray(level.senders).astype(np.int64)
    in_win = np.asarray(level.send_win) < level.window
    mask = (np.asarray(level.edge_mask) > 0) & in_win
    e_pad = s.shape[0]
    n_chunks = e_pad // be
    subs_per = be // SUB
    wb = np.asarray(level.win_base).astype(np.int64)  # per chunk, wh units

    sub_base = np.zeros((n_chunks, subs_per, K), np.int32)
    send_sub = np.full(e_pad, K * SUB, np.int32)
    sb_all = s // SUB
    n_cand = level.window // SUB  # aligned 128-blocks inside the window
    for c in range(n_chunks):
        lo_blk = wb[c] * wh // SUB
        for u in range(subs_per):
            sl = slice(c * be + u * SUB, c * be + (u + 1) * SUB)
            m = mask[sl]
            base_blocks = np.full(K, lo_blk, np.int64)
            if m.any():
                rel = sb_all[sl][m] - lo_blk
                cnt = np.bincount(rel[(rel >= 0) & (rel < n_cand)],
                                  minlength=n_cand)
                top = np.argsort(cnt)[::-1][:K]
                top = top[cnt[top] > 0]
                base_blocks[:len(top)] = lo_blk + np.sort(top)
            sub_base[c, u] = base_blocks
            # slot values
            for j in range(K):
                hit = m & (sb_all[sl] == base_blocks[j])
                v = send_sub[sl]
                v[hit] = j * SUB + (s[sl][hit] - base_blocks[j] * SUB)
                send_sub[sl] = v
    covered = send_sub < K * SUB
    return sub_base.reshape(-1), send_sub, covered


def _pack_rows(a, be, num_chunks, fill):
    rows8 = -(-num_chunks // 8) * 8
    out = a.reshape(num_chunks, be)
    return np.pad(out, ((0, rows8 - num_chunks), (0, 0)),
                  constant_values=fill)


def _make_v6_conv_kernel(be: int, c: int, f32_mode: bool, ops: int):
    import jax.experimental.pallas as pl

    def kernel(cb_ref, first_ref, sb_ref, *rest):
        x_refs = rest[:ops]
        sw_ref, recv_ref, ew_ref, out_ref = rest[ops:]
        i = pl.program_id(0)
        base_row = cb_ref[i] * BN

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        import jax
        import jax.numpy as jnp_  # noqa

        row = jax.lax.rem(i, 8)
        parts = []
        subs = be // SUB
        # send_sub rides packed at SUB-chunk granularity: row (i*subs+u) % 8
        # of block (i*subs+u) // 8 — a full [1, SUB] row per sub-chunk (lane
        # slices of a [1, BE] row break Mosaic's broadcast layout).
        iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        sub0 = jax.lax.rem(i * subs, 8)
        for u in range(subs):
            swu = sw_ref[pl.ds(sub0 + u, 1), :]  # [1, SUB]
            acc = None
            for j in range(K):
                oh = (iota == (swu - j * SUB)).astype(jnp.bfloat16)
                xr = x_refs[u * K + j]
                from bsms_gnn_tpu.ops.pallas.windowed import _select
                t = _select(oh, xr[:], f32_mode, c, SUB)
                acc = t if acc is None else acc + t
            parts.append(acc)
        sel = jnp.concatenate(parts, axis=0)  # [BE, C]

        rl = recv_ref[pl.ds(row, 1), :] - base_row
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (BN, be), 0)
        ewr = ew_ref[pl.ds(row, 1), :]
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


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@functools.lru_cache(maxsize=None)
def _get_v6_conv(e_pad, n_pad, c, be, f32_mode, interpret, ops):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def mk_x_spec(k):
        return pl.BlockSpec((SUB, c), lambda i, cb, f, sb, k=k: (sb[i * ops + k], 0),
                            memory_space=pltpu.VMEM)

    subs = be // SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(e_pad // be,),
        in_specs=[mk_x_spec(k) for k in range(ops)] + [
            pl.BlockSpec((8, SUB), lambda i, *_: (i * subs // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, be), lambda i, *_: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BN, c), lambda i, cb, f, sb: (cb[i], 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _make_v6_conv_kernel(be, c, f32_mode, ops),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def main(n_nodes=1_000_000, lvl_idx=0, dtype="bfloat16", depth=7, c=128):
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bsms_gnn_tpu.ops.pallas.fused_gmp import _chunk_tables
    from bsms_gnn_tpu.ops.pallas.windowed import windowed_conv_raw
    from bsms_gnn_tpu.utils.timing import pipelined_timeit

    hbm_gbps, mxu_tflops = measure_roofs(pipelined_timeit)
    print(f"roofs: HBM {hbm_gbps:.0f} GB/s, MXU {mxu_tflops:.0f} TF/s\n")

    h = load_scale_hierarchy("/tmp/bsms-scale", n_nodes, depth,
                             edge_block=512, window=512)
    level = h.levels[lvl_idx]
    be = level.edge_block
    e_pad, n_pad = level.n_pad_edges, level.n_pad_nodes
    ops = (be // SUB) * K
    print(f"level {lvl_idx}: E={level.n_edges} E_pad={e_pad} be={be}")

    print("building sub tables (python loop; production goes vectorized)...")
    sub_base, send_sub, covered = build_sub_tables(level)
    in_win = (np.asarray(level.send_win) < level.window) & (
        np.asarray(level.edge_mask) > 0)
    print(f"covered: v6 {100*covered.sum()/max(in_win.sum(),1):.1f}% of the "
          f"old in-window set ({100*covered.sum()/max((np.asarray(level.edge_mask)>0).sum(),1):.1f}% of real edges)")

    rng = np.random.default_rng(5)
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.standard_normal((n_pad, c)), jdt)
    ew_np = rng.standard_normal(e_pad).astype(np.float32)
    ew = jnp.asarray(ew_np)

    lvl_dev = jax.device_put(level)
    num_chunks = e_pad // be
    chunk_block, first, recv = _chunk_tables(lvl_dev)
    num_subs = e_pad // SUB
    rows8 = -(-num_subs // 8) * 8
    sw_sub_np = np.pad(send_sub.reshape(num_subs, SUB),
                       ((0, rows8 - num_subs), (0, 0)),
                       constant_values=K * SUB)
    sw_p = jnp.asarray(sw_sub_np)
    ew_p = jnp.asarray(_pack_rows(np.where(covered, ew_np, 0.0), be,
                                  num_chunks, 0))
    sb = jnp.asarray(sub_base)
    interpret = jax.default_backend() != "tpu"
    f32_mode = dtype != "bfloat16"
    call = _get_v6_conv(e_pad, n_pad, c, be, f32_mode, interpret, ops)

    # parity on the v6 covered set
    out_v6 = np.asarray(call(chunk_block, first, sb, *([x] * ops), sw_p, recv,
                             ew_p))
    s_np = np.asarray(level.senders)
    r_np = np.asarray(level.receivers)
    x_np = np.asarray(x, np.float32)
    oracle = np.zeros((n_pad, c), np.float32)
    np.add.at(oracle, r_np[covered],
              ew_np[covered, None] * x_np[s_np[covered]])
    err = np.abs(out_v6 - oracle).max() / max(np.abs(oracle).max(), 1e-9)
    print(f"v6 parity vs oracle (covered set): rel max err {err:.2e}")

    def v6_body(xc, cb, fr, sbc, swc, rc, ewc):
        out = call(cb, fr, sbc, *([xc] * ops), swc, rc, ewc)
        return xc + 1e-6 * out.astype(xc.dtype)

    t6 = _scan_time(v6_body, x, 20, pipelined_timeit,
                    consts=(chunk_block, first, sb, sw_p, recv, ew_p))

    def cur_body(xc, lvl, ewc):
        out = windowed_conv_raw(lvl, xc, ewc)
        return xc + 1e-6 * out.astype(xc.dtype)

    tc = _scan_time(cur_body, x, 20, pipelined_timeit, consts=(lvl_dev, ew))

    print(f"\ncurrent conv (W=512):  {tc*1e6:9.1f} µs "
          f"({tc/num_chunks*1e9:.0f} ns/chunk)")
    print(f"v6 conv (8x128-blk):   {t6*1e6:9.1f} µs "
          f"({t6/num_chunks*1e9:.0f} ns/chunk)  speedup {tc/t6:.2f}x")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 1_000_000,
         int(a[1]) if len(a) > 1 else 0,
         a[2] if len(a) > 2 else "bfloat16")
