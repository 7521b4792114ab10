"""Pool / unpool between hierarchy levels — both pure gathers.

Parity with the reference's index-select pooling (`src/ops/BSMS.py:79-89`)
and `Unpool`'s zero-fill scatter (`src/ops/basic.py:170-201`). The offline
builder's `unpool_inv` turns the unpool scatter into a gather through a
zero slot, and pool/unpool are mutual transposes, so each op's custom VJP is
just the other op's gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bsms_gnn_tpu.graph.hierarchy import Transition


def _take(x, idx):
    return jnp.take(x, idx, axis=-2)


def _gather_with_zero_slot(x, idx):
    """Gather rows of x by idx where idx == x.shape[-2] selects a zero row."""
    zero = jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), x.dtype)
    return _take(jnp.concatenate([x, zero], axis=-2), idx)


@jax.custom_vjp
def _pool(h, pool_ids, unpool_inv):
    return _take(h, pool_ids)


def _pool_fwd(h, pool_ids, unpool_inv):
    return _take(h, pool_ids), (pool_ids, unpool_inv)


def _pool_bwd(res, g):
    pool_ids, unpool_inv = res
    # d h_parent[j] = g[unpool_inv[j]] for kept parents, else 0. Pad slots of
    # pool_ids collide on the parent pad node; their cotangent is dropped,
    # which only zeroes a pad row.
    return (_gather_with_zero_slot(g, unpool_inv), None, None)


_pool.defvjp(_pool_fwd, _pool_bwd)


@jax.custom_vjp
def _unpool(h, pool_ids, unpool_inv):
    return _gather_with_zero_slot(h, unpool_inv)


def _unpool_fwd(h, pool_ids, unpool_inv):
    return _gather_with_zero_slot(h, unpool_inv), (pool_ids, unpool_inv)


def _unpool_bwd(res, g):
    pool_ids, unpool_inv = res
    return (_take(g, pool_ids), None, None)


_unpool.defvjp(_unpool_fwd, _unpool_bwd)


def pool_nodes_boundary(t: Transition, h, axis: str):
    """Pool across the replication boundary (parent partitioned, child
    replicated — parallel/partition.py `replicate_floor`): each shard
    gathers the child rows whose parent it owns (others masked to zero —
    the parent pad node is NOT zero post-GMP), then one `psum` assembles
    the identical full child level on every shard.

    Adjoint: each shard's replica of the child feeds its own downstream
    compute, so the global child cotangent is the psum of the per-shard
    cotangents; gathering it through `unpool_inv` (which only references
    children whose parent this shard owns) restores the owned-parent rows.
    """
    pool_ids, unpool_inv = t.pool_ids, t.unpool_inv
    mask = t.pool_mask

    @jax.custom_vjp
    def f(h):
        part = _take(h, pool_ids) * mask.astype(h.dtype)
        return jax.lax.psum(part, axis)

    def fwd(h):
        return f(h), None

    def bwd(_, g):
        return (_gather_with_zero_slot(jax.lax.psum(g, axis), unpool_inv),)

    f.defvjp(fwd, bwd)
    return f(h)


def unpool_nodes_boundary(t: Transition, h):
    """Unpool across the replication boundary: the child level is replicated
    (every shard holds the full table), so each shard's owned parents gather
    their children locally — ZERO communication. Adjoint of
    `pool_nodes_boundary` without the psum: the cotangent scatter back into
    the replicated child is exactly the masked pool gather (this shard's
    replica only owes the rows its own parents consumed)."""
    pool_ids, unpool_inv = t.pool_ids, t.unpool_inv
    mask = t.pool_mask

    @jax.custom_vjp
    def f(h):
        return _gather_with_zero_slot(h, unpool_inv)

    def fwd(h):
        return f(h), None

    def bwd(_, g):
        return (_take(g, pool_ids) * mask.astype(g.dtype),)

    f.defvjp(fwd, bwd)
    return f(h)


def pool_nodes(t: Transition, h):
    """h_child[m] = h_parent[pool_ids[m]] (pad slots read the parent pad
    node's zeros)."""
    return _pool(h, t.pool_ids, t.unpool_inv)


def unpool_nodes(t: Transition, h):
    """h_parent[j] = h_child[unpool_inv[j]] if kept else 0 — the zero-filled
    unpool of ref `ops/basic.py:194-199` as a gather."""
    return _unpool(h, t.pool_ids, t.unpool_inv)
