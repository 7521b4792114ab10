"""Fused level transitions: one operator application per direction.

The reference's per-level transition is 4-6 dispatched ops each way
(weighted conv = gather + scale + scatter-sum, then index-select pool /
zero-fill unpool then reverse conv — `src/ops/BSMS.py:74-89,98-100`,
`src/ops/basic.py:101-201`). Both are linear maps with offline coefficients,
so each direction collapses to a single precomputed sparse operator
(`graph/hierarchy.py::TransOp`): `down(x) = M x`, `up(x) = Mᵀ x` — and the
VJP of each is the other, giving an adjoint pair with no scatter anywhere.

On the pallas/fused methods the aggregation runs the standard receiver-sorted
Pallas segment-sum over the operator layout (duck-typed LevelGraph); the
ell/segment parity paths use the ELL gather+sum. Total per transition:
one gather+scale fusion and one kernel — the dominant win on dispatch-bound
headline meshes (PARITY.md roofline §1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.graph.hierarchy import Transition, TransOp
from bsms_gnn_tpu.ops.scatter import _seg_sum


def dense_apply(d, x):
    """Tiny-level operator as one MXU matmul (~15 µs) instead of the
    gather + segment-sum pair (~60-100 µs fixed each) — the headline meshes
    are dispatch-bound (PARITY.md roofline §1). d: [O, I] (shared mesh) or
    [..., O, I] (bucketed per-sample stack); x: [..., I, C]. f32 inputs use
    HIGHEST (true f32, the repo-wide convention); bf16 accumulates f32."""
    d = jnp.asarray(d).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    out = jnp.einsum("...oi,...ic->...oc", d, x, precision=prec,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _apply(op: TransOp, x, method: str):
    """out[..., k, :] = Σ_e ew[e] · x[..., senders[e], :] summed at
    receivers[e]. x: [..., N_in_pad, C] → [..., N_out_pad, C].

    On windowed layouts the selection runs in-kernel (no row gather —
    issue-rate-bound at 1M scale); out-of-window entries accumulate via
    the skip-empty residual sub-op."""
    if method in ("pallas", "fused") and op.dense is not None:
        return dense_apply(op.dense, x)
    if method in ("pallas", "fused") and op.window > 0:
        from bsms_gnn_tpu.ops.pallas.windowed import windowed_rect_conv_raw

        out = windowed_rect_conv_raw(op, x)
        if out is not None:
            cr = op.cresid
            if cr is not None:
                # Compact residual: take + block-visit accumulate over ~R
                # real rows (ops/pallas/compact_resid.py).
                from bsms_gnn_tpu.ops.pallas.compact_resid import (
                    compact_accum_raw,
                )

                msg = (jnp.take(x, cr.senders, axis=-2)
                       * cr.ew.astype(x.dtype)[..., None])
                acc = compact_accum_raw(cr, msg, out)
                if acc is not None:
                    return acc.astype(x.dtype)
            r = op.resid
            if r is not None:
                from bsms_gnn_tpu.ops.pallas import segment_sum_accum_raw

                msg = (jnp.take(x, r.senders, axis=-2)
                       * r.ew.astype(x.dtype)[..., None])
                acc = segment_sum_accum_raw(r, msg, out)
                out = acc if acc is not None else out + _seg_sum(
                    msg, r.receivers, r.n_pad_nodes
                )
            return out.astype(x.dtype)
    msg = jnp.take(x, op.senders, axis=-2) * op.ew.astype(x.dtype)[..., None]
    if method in ("pallas", "fused"):
        from bsms_gnn_tpu.ops.pallas import segment_sum_raw

        out = segment_sum_raw(op, msg)
        if out is not None:
            return out.astype(x.dtype)
    return _seg_sum(msg, op.receivers, op.n_pad_nodes)


def _make_pair(direction: str):
    """custom_vjp apply: forward runs ops[0], backward runs ops[1] on the
    cotangent (M and Mᵀ are each other's adjoints). The ops ride as an
    explicit argument (None cotangent) so remat re-traces never capture
    tracers via closure; `method` is a static nondiff arg."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
    def f(ops, x, method):
        return _apply(ops[0], x, method)

    def fwd(ops, x, method):
        # zero-size dtype token: residuals must be JAX types, not dtypes.
        tok = jnp.zeros((0,), x.dtype)
        return _apply(ops[0], x, method), (ops, tok)

    def bwd(method, res, g):
        ops, tok = res
        return None, _apply(ops[1], g, method).astype(tok.dtype)

    f.defvjp(fwd, bwd)
    f.__name__ = f"trans_{direction}"
    return f


_DOWN = _make_pair("down")
_UP = _make_pair("up")


def trans_down(t: Transition, x, method: str = "pallas"):
    """Fused conv→pool: [..., N_parent_pad, C] → [..., M_child_pad, C].
    Requires t.down_op (built by pad_levels on unbucketed hierarchies)."""
    return _DOWN((t.down_op, t.up_op), x, method)


def trans_up(t: Transition, x, method: str = "pallas"):
    """Fused unpool→reverse-conv: child → parent space."""
    return _UP((t.up_op, t.down_op), x, method)
