"""Pallas sorted-CSR segment-sum kernel (stub for now).

Round-1 placeholder: returns None so callers use the ELL gather path. The
planned kernel blocks receiver-sorted edges into VMEM tiles and accumulates
per-node partial sums with double-buffered HBM→VMEM DMA; see SURVEY.md §7.2
item 8.
"""

from __future__ import annotations

from typing import Optional


def segment_sum_pallas(level, feat) -> Optional[object]:
    return None
