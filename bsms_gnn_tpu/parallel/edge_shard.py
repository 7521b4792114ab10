"""Edge-partitioned graph parallelism via GSPMD sharding annotations.

The mesh has axes ('data', 'graph'). Batch arrays shard over 'data'; every
level's edge-indexed arrays (senders/receivers and the ELL gather tables'
row dim) shard over 'graph'. The train step itself is the *same* program as
single-chip — `jit` with in_shardings lets XLA's SPMD partitioner slice the
edge MLPs and segment/ELL aggregations across chips and insert the
all-gather / reduce-scatter collectives over ICI, including the correct
gradient transposes (a manual shard_map formulation must hand-split
"replicated node compute" from "local edge compute" cotangents; GSPMD does
this for free — the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives, profile, iterate).

This is the graph analog of context/sequence parallelism (SURVEY.md §5.7):
the scaling axis is mesh size, letting one giant graph span chips.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bsms_gnn_tpu.graph.hierarchy import Hierarchy


def hierarchy_pspecs(h: Hierarchy) -> Hierarchy:
    """Hierarchy-shaped pytree of PartitionSpecs: edge-indexed leading dims
    shard over 'graph'; node-indexed arrays replicate (they are small next
    to edge features and are gathered from everywhere)."""
    edge = P("graph")
    repl = P()

    def cresid_spec(cr):
        # Compact residual tables are tiny (~R real edges) — replicate.
        return None if cr is None else cr.replace(
            senders=repl, receivers=repl, ew=repl, ew_rev=repl, fiber=repl,
            twin=repl, visit_block=repl, visit_cblk=repl, visit_recv=repl,
        )

    def level_spec(l):
        return l.replace(
            senders=edge,
            receivers=edge,
            recv_indptr=repl,
            recv_ell=repl,
            send_ell=repl,
            deg=repl,
            node_mask=repl,
            edge_mask=edge,
            reverse_perm=edge,
            ew=edge,
            fiber=edge,
            ew_rev=None if l.ew_rev is None else edge,
            send_win=None if l.send_win is None else edge,
            win_base=None if l.win_base is None else repl,
            resid=None if l.resid is None else level_spec(l.resid),
            cresid=cresid_spec(l.cresid),
            fiber_t=None if l.fiber_t is None else P(None, "graph"),
        )

    def trans_op_spec(op):
        return None if op is None else op.replace(
            senders=edge, receivers=edge, recv_indptr=repl,
            ew=edge,
            send_win=None if op.send_win is None else edge,
            win_base=None if op.win_base is None else repl,
            resid=trans_op_spec(op.resid),
            cresid=cresid_spec(op.cresid),
            dense=None if op.dense is None else repl,
        )

    levels = tuple(level_spec(l) for l in h.levels)
    transitions = tuple(
        t.replace(
            pool_ids=repl, unpool_inv=repl,
            down_op=trans_op_spec(t.down_op),
            up_op=trans_op_spec(t.up_op),
        )
        for t in h.transitions
    )
    return Hierarchy(levels=levels, transitions=transitions)


def hierarchy_shardings(h: Hierarchy, mesh: Mesh) -> Hierarchy:
    """`hierarchy_pspecs` materialized as NamedShardings on `mesh`."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        hierarchy_pspecs(h),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_hierarchy(h: Hierarchy, mesh: Mesh) -> Hierarchy:
    """Place a (host or device) hierarchy according to `hierarchy_shardings`."""
    return jax.tree_util.tree_map(
        jax.device_put, h, hierarchy_shardings(h, mesh)
    )


def make_spmd_train_step(trainer, mesh: Mesh, hierarchy: Hierarchy) -> Callable:
    """Compile the trainer's step over `mesh` with data+graph shardings.

    Returns step(state, hierarchy, node_in, node_tar, node_mask, key) →
    (state, loss). Pass a hierarchy placed with `shard_hierarchy`; batch
    arrays shard over 'data' (leading axis must divide the axis size).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    h_shard = hierarchy_shardings(hierarchy, mesh)
    return jax.jit(
        trainer._train_step_impl,
        donate_argnums=(0,),
        in_shardings=(repl, h_shard, data, data, data, repl),
        out_shardings=(repl, repl),
    )


# Backwards-compat name used elsewhere in the package.
make_sharded_train_step = make_spmd_train_step
shard_hierarchy_specs = hierarchy_shardings
