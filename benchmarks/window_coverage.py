"""Coverage-vs-window-size analysis for the windowed one-hot kernels.

The v3 fused kernel's sender-selection dots cost W/2 · C MACs per edge —
at W=512, C=128 that is ~131 kFLOP/edge, MORE than the edge-MLP tail
(~98 kFLOP/edge at hidden_layer=3). Shrinking W cuts selection flops
linearly but pushes more edges to the residual (gather-path) mini-level.
This script quantifies that trade-off on the real padded layouts: for each
level of a cached hierarchy it recomputes per-chunk window coverage at
several W (the chunk order is fixed by the layout — blocks are
sender-sorted independent of W, graph/hierarchy.py:_pad_level) and prints
covered-edge fraction plus the selection-flop share, so the production
window is a measured choice, not a guess.

Usage: python benchmarks/window_coverage.py [n_nodes] [depth] [built_window]
(pure CPU; reuses the /tmp/bsms-scale cache written by scale_1m.py)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def chunk_coverage(senders, edge_mask, reverse_perm, n_pad, window,
                   edge_block):
    """Covered-edge fraction under the same per-chunk best-window vote as
    graph/hierarchy.py:_window_tables (incl. the reverse-twin symmetrize)."""
    window = min(window, n_pad)
    wh = window // 2
    if n_pad % wh:
        return float("nan")
    e_pad = len(senders)
    num_chunks = e_pad // edge_block
    max_base = n_pad // wh - 2
    real = np.asarray(edge_mask) > 0
    s64 = np.asarray(senders).astype(np.int64)
    base = np.zeros(num_chunks, np.int64)
    s_chunks = s64.reshape(num_chunks, edge_block)
    r_chunks = real.reshape(num_chunks, edge_block)
    for i in range(num_chunks):
        s_i = s_chunks[i][r_chunks[i]]
        if len(s_i) == 0:
            continue
        gr = s_i // wh
        cand = np.concatenate([gr - 1, gr])
        cand = cand[(cand >= 0) & (cand <= max_base)]
        if len(cand) == 0:
            base[i] = min(max(int(gr[0]) - 1, 0), max_base)
            continue
        vals, cnts = np.unique(cand, return_counts=True)
        base[i] = vals[np.argmax(cnts)]
    lo = np.repeat(base, edge_block) * wh
    covered = real & (s64 >= lo) & (s64 < lo + window)
    covered &= covered[np.asarray(reverse_perm)]
    return covered.sum() / max(real.sum(), 1)


def main(n_nodes=1_000_000, depth=7, built_window=512):
    from benchmarks.profile_1m import load_scale_hierarchy

    h = load_scale_hierarchy("/tmp/bsms-scale", n_nodes, depth,
                             window=built_window)
    windows = [128, 256, 512, 1024]
    c, hl = 128, 3
    tail_fpe = 2 * hl * c * c  # edge-MLP tail flops/edge
    print(f"levels={len(h.levels)} edge-MLP tail ≈{tail_fpe/1e3:.0f} kFLOP/edge")
    print(f"{'lvl':>3} {'E_real':>9} " +
          " ".join(f"W={w:<4} (sel kF/e)" for w in windows))
    tot = {w: [0, 0] for w in windows}
    for li, lvl in enumerate(h.levels):
        eb = getattr(lvl, "edge_block", 128)
        row = []
        for w in windows:
            cov = chunk_coverage(
                np.asarray(lvl.senders), np.asarray(lvl.edge_mask),
                np.asarray(lvl.reverse_perm), lvl.n_pad_nodes, w, eb)
            sel_fpe = 2 * min(w, lvl.n_pad_nodes) // 2 * c * 2  # a+b halves
            row.append(f"{cov*100:5.1f}% ({sel_fpe/1e3:4.0f})")
            tot[w][0] += cov * lvl.n_edges
            tot[w][1] += lvl.n_edges
        print(f"{li:>3} {lvl.n_edges:>9} " + "  ".join(row))
    print("edge-weighted coverage: " + "  ".join(
        f"W={w}: {100*a/b:.1f}%" for w, (a, b) in tot.items()))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a))
