"""Decompose the halo-partition padding factor: for each level and shard
count, how many padded edge slots come from (a) receiver-owned real edges
(with max/mean imbalance), (b) ghost twins of cross-shard edges, (c) edge
block/layout padding. Drives the choice of lever for BASELINE.md row 3
(>=80% scaling at S=8): balance fixes (a), partition shape fixes (b),
layout fixes (c), replication fixes all three for edge-sparse levels.

Usage: python benchmarks/partition_diag.py [n_nodes] [depth] [balance]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_nodes=200000, depth=7, balance="cost", shards=(8,), window=512,
         ghost_floor=0):
    from bsms_gnn_tpu.data.synthetic import make_graded_airfoil_mesh
    from bsms_gnn_tpu.graph.bistride import build_bistride_levels
    from bsms_gnn_tpu.graph.hierarchy import pad_levels
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.parallel import build_partition

    rng = np.random.default_rng(0)
    pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels = build_bistride_levels(edges, depth, n, pos.astype(np.float64))
    h = pad_levels(levels, pad_multiple=128, pos=pos.astype(np.float64))
    e_global = sum(g.n_pad_edges for g in h.levels)
    print(f"n={n} depth={depth} e_pad_global={e_global} balance={balance}")

    for s in shards:
        plan = build_partition(
            levels, s, h.levels[0].n_pad_nodes, pos.astype(np.float64),
            local_layouts=True, window=window, balance=balance,
            ghost_floor=ghost_floor,
        )
        tot_pad = 0
        print(f"--- S={s} ---")
        print(f"{'lvl':>3} {'e_real':>9} {'own_max':>8} {'own_mean':>8} "
              f"{'imbal':>6} {'ghost_max':>9} {'e_pad_loc':>9} {'xS/real':>7}")
        for l, (g, lvl) in enumerate(zip(levels.graphs, plan.hierarchy.levels)):
            snd, rcv = g.flat_edges
            lg = lvl.local
            if lg is None:  # plain halo level: edge space is the level's own
                lg = lvl
            e_pad_loc = int(np.asarray(lg.senders if lvl.local is not None
                                       else lvl.senders_ext).shape[-1])
            tot_pad += e_pad_loc * s
            em = np.asarray(lg.edge_mask)  # [S, E_pad] real-slot mask
            own_plus_ghost = em.sum(axis=-1)
            # ghosts = slots whose receiver is an ext row (>= n_loc)
            recv = np.asarray(lvl.receivers)
            n_loc = lvl.n_pad_nodes
            ghost = ((recv >= n_loc) & (em > 0)).sum(axis=-1)
            owned = own_plus_ghost - ghost
            e_real = g.flat_edges.shape[1]
            print(f"{l:>3} {e_real:>9} {int(owned.max()):>8} "
                  f"{owned.mean():>8.0f} {owned.max() / max(owned.mean(), 1):>6.2f} "
                  f"{int(ghost.max()):>9} {e_pad_loc:>9} "
                  f"{e_pad_loc * s / e_real:>7.2f}")
        print(f"pad_factor={tot_pad / e_global:.3f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 200000,
        int(a[1]) if len(a) > 1 else 7,
        a[2] if len(a) > 2 else "cost",
        tuple(int(x) for x in a[3:4]) or (8,),
        ghost_floor=int(a[4]) if len(a) > 4 else 0,
    )
