"""Single-trajectory reader: h5 fields + cached padded hierarchy.

Parity with reference `singleTrajReader` (`src/datasets/base.py:13-125`):
loads the configured fields, derives the mesh graph from frame-0 cells,
builds/caches the multi-level hierarchy (one shared cache when the dataset
has a consistent mesh, else one per trajectory — ref :98-101), and assembles
per-frame model inputs [output_fields, mesh_pos, node_type].

Additions: node arrays are padded to the hierarchy's static shapes, and
optional per-level buckets let variable-mesh datasets share one compiled
program.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import h5py
import numpy as np

from bsms_gnn_tpu.config import DatasetConfig
from bsms_gnn_tpu.data.datasets import get_mask
from bsms_gnn_tpu.graph.hierarchy import Hierarchy, load_or_build_hierarchy
from bsms_gnn_tpu.graph.mesh import to_flat_edge


def _pad_rows(x: np.ndarray, n_pad: int) -> np.ndarray:
    """Zero-pad axis -2 (nodes) to n_pad."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - x.shape[-2])
    return np.pad(x, pad)


class TrajectoryReader:
    def __init__(
        self,
        cfg: DatasetConfig,
        file_path: str,
        node_buckets: Optional[List[int]] = None,
        edge_buckets: Optional[List[int]] = None,
        ell_buckets: Optional[List[int]] = None,
        resid_buckets: Optional[List] = None,
    ):
        self.cfg = cfg
        self.file_path = file_path
        fields: Dict[str, np.ndarray] = {}
        with h5py.File(file_path, "r") as f:
            for name in cfg.field_names:
                fields[name] = np.asarray(f[name])
        self.cells = fields["cells"][0]
        self.mesh_pos0 = np.asarray(fields["mesh_pos"][0], np.float64)
        self.n_nodes = self.mesh_pos0.shape[0]
        # Input cannot be the last frame (no target), ref base.py:44.
        self.length = fields["mesh_pos"].shape[0] - 1

        # Windowed-gather layouts need spatially coherent node ids: Morton-
        # reorder the mesh at ingest (model outputs are then in reordered
        # node space; `node_perm` maps new id → original id for export).
        self.node_perm: Optional[np.ndarray] = None
        if cfg.window:
            from bsms_gnn_tpu.graph.order import morton_perm

            perm = morton_perm(self.mesh_pos0)
            inv = np.empty(len(perm), np.int64)
            inv[perm] = np.arange(len(perm))
            self.node_perm = perm
            self.cells = inv[self.cells.astype(np.int64)].astype(
                self.cells.dtype
            )
            for name, arr in fields.items():
                if (
                    name != "cells"
                    and arr.ndim >= 2
                    and arr.shape[1] == self.n_nodes
                ):
                    fields[name] = arr[:, perm]
            self.mesh_pos0 = np.asarray(fields["mesh_pos"][0], np.float64)

        cache_dir = os.path.dirname(file_path)
        cache_name = (
            "shared"
            if cfg.consist_mesh
            else os.path.splitext(os.path.basename(file_path))[0]
        )
        if cfg.window:
            # The raw-levels cache is keyed by name only (not content):
            # Morton-reordered levels must not collide with the original
            # ordering's cache when `window` is toggled on a dataset dir.
            cache_name += "_mrt"
        flat_edges = to_flat_edge(self.cells, cfg.mesh_type)
        self.hierarchy: Hierarchy = load_or_build_hierarchy(
            cache_dir,
            cache_name,
            flat_edges,
            cfg.unet_depth,
            self.n_nodes,
            self.mesh_pos0,
            pad_multiple=cfg.pad_multiple,
            node_buckets=node_buckets,
            edge_buckets=edge_buckets,
            edge_block=cfg.edge_block,
            # window=-1: per-level auto-tuned widths (choose_windows);
            # needs per-mesh shapes, so only off the bucketed path.
            window="auto" if cfg.window < 0 else cfg.window,
            ell_buckets=ell_buckets,
            resid_buckets=resid_buckets,
        )
        self.n_pad = self.hierarchy.levels[0].n_pad_nodes

        # Assemble per-frame arrays once: inputs [T, N_pad, C+pos+1],
        # outputs [T, N_pad, C], masks [T, N_pad, 1] (ref _proc_data key
        # order: output fields, then mesh_pos, then node_type; base.py:259-268).
        out_keys = list(cfg.output_field_names)
        inp_list = [fields[k].astype(np.float32) for k in out_keys]
        inp_list.append(fields["mesh_pos"].astype(np.float32))
        inp_list.append(fields["node_type"].astype(np.float32))
        inputs = np.concatenate(inp_list, axis=-1)
        outputs = np.concatenate(
            [fields[k].astype(np.float32) for k in out_keys], axis=-1
        )
        mask = get_mask(cfg.name, fields["node_type"])

        self.node_in = _pad_rows(inputs, self.n_pad)
        self.node_out = _pad_rows(outputs, self.n_pad)
        self.node_mask = _pad_rows(mask.astype(np.float32), self.n_pad)

    def __len__(self) -> int:
        return self.length

    def sample(self, t: int):
        """(node_in[t], target = outputs[t+1], mask[t]) — the one-step
        supervised pair (ref base.py:__getitem__)."""
        return self.node_in[t], self.node_out[t + 1], self.node_mask[t]

    def full(self):
        """Whole trajectory for rollout: inputs [T-1,...], targets [T-1,...]
        (frame t target = outputs[t+1]), masks [T-1,...]."""
        return (
            self.node_in[:-1],
            self.node_out[1:],
            self.node_mask[:-1],
        )

    def level_sizes(self):
        """(per-level real node counts, per-level real edge counts)."""
        return (
            [g.n_nodes for g in self.hierarchy.levels],
            [g.n_edges for g in self.hierarchy.levels],
        )
