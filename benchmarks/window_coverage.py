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


def main(n_nodes=1_000_000, depth=7, built_window=512):
    from benchmarks.profile_1m import load_scale_hierarchy

    from bsms_gnn_tpu.graph.hierarchy import choose_windows, window_coverage

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
            cov = window_coverage(lvl, w)
            sel_fpe = 2 * min(w, lvl.n_pad_nodes) // 2 * c * 2  # a+b halves
            row.append(f"{cov*100:5.1f}% ({sel_fpe/1e3:4.0f})")
            tot[w][0] += cov * lvl.n_edges
            tot[w][1] += lvl.n_edges
        print(f"{li:>3} {lvl.n_edges:>9} " + "  ".join(row))
    print("edge-weighted coverage: " + "  ".join(
        f"W={w}: {100*a/b:.1f}%" for w, (a, b) in tot.items()))
    print(f"choose_windows -> {choose_windows(h, tuple(windows))} "
          "(per-level cost model; build with window=-1 / 'auto')")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a))
