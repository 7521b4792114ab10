"""Batching pipeline: bucket planning, shuffled infinite sampling with
background prefetch, hierarchy stacking for variable meshes, rollout mode.

Parity with reference `TrajectoryDataPipe` (`src/datasets/base.py:128-357`) +
`InfiniteDataLooper` (`utils/dataset_utils.py`): shuffled (file, timestep)
sampling, per-worker RNG seeding, train/test/rollout modes. The reference's
two collation modes collapse into static-shape batches (SURVEY.md §7.1):

  * consistent mesh → features [B, N_pad, C] over ONE shared Hierarchy;
  * variable meshes → per-sample hierarchies padded to dataset-wide buckets
    and stacked leaf-wise → [B, ...] arrays driven by a vmapped forward
    (replacing PyG disjoint-union collation + index offsetting).

Noise injection happens on-device in the trainer, so batches here are clean.
"""

from __future__ import annotations

import glob
import json
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import h5py
import jax
import numpy as np

from bsms_gnn_tpu.config import DatasetConfig
from bsms_gnn_tpu.data.trajectory import TrajectoryReader
from bsms_gnn_tpu.graph.hierarchy import Hierarchy, load_or_build_levels
from bsms_gnn_tpu.graph.mesh import to_flat_edge


@dataclass
class Batch:
    node_in: np.ndarray  # [B, N_pad, C+pos+1]
    node_tar: np.ndarray  # [B, N_pad, C]
    node_mask: np.ndarray  # [B, N_pad, 1]
    hierarchy: Hierarchy  # shared (1-sample arrays) or stacked ([B, ...])


def stack_hierarchies(hs: List[Hierarchy]) -> Hierarchy:
    """Stack same-shape hierarchies leaf-wise along a new leading axis.
    Static fields (n_nodes/n_edges) take the max — they are metadata only;
    the compute path reads padded shapes."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *hs)


def dataset_files(cfg: DatasetConfig, mode: str) -> List[str]:
    # No "rollout" subdir on disk; rollout reads the test split (ref
    # base.py:149-152).
    disk_mode = "test" if mode == "rollout" else mode
    files = sorted(glob.glob(os.path.join(cfg.root, cfg.name, disk_mode, "*.h5")))
    if not files:
        raise FileNotFoundError(
            f"No trajectories under {os.path.join(cfg.root, cfg.name, disk_mode)}"
        )
    return files


@dataclass
class BucketPlan:
    """Per-level padded shapes, grouped into K size buckets. Each trajectory
    belongs to one group; all meshes in a group pad to the group's shapes,
    so small meshes stop paying for the dataset's largest (SURVEY.md §7.1
    "per-bucket (N_max, E_max) padding"). EVERY array shape is pinned —
    node/edge pads, ELL widths, windowed residual sub-layouts — so one XLA
    program truly compiles per group (max-degree and residual-size
    variation would otherwise recompile per trajectory)."""

    groups: List[dict]  # {"node_buckets", "edge_buckets", "ell_buckets",
    #                      "resid_buckets" ([e_pad, k] per level)}
    file_group: dict  # "split/basename" -> group index

    def for_file(self, path: str) -> dict:
        g = self.groups[self.file_group[_plan_key(path)]]
        return {
            "node_buckets": g["node_buckets"],
            "edge_buckets": g["edge_buckets"],
            "ell_buckets": g.get("ell_buckets"),
            "resid_buckets": (
                None if g.get("resid_buckets") is None
                else [tuple(r) for r in g["resid_buckets"]]
            ),
        }


def _plan_key(path: str) -> str:
    """Split-qualified key — train/0.h5 and test/0.h5 are different files."""
    return os.path.join(os.path.basename(os.path.dirname(path)),
                        os.path.basename(path))


def _load_levels_for(cfg: DatasetConfig, path: str):
    with h5py.File(path, "r") as f:
        cells = np.asarray(f["cells"][0])
        pos = np.asarray(f["mesh_pos"][0], np.float64)
    name = os.path.splitext(os.path.basename(path))[0]
    if cfg.window:
        # Match TrajectoryReader's Morton relabeling exactly — the edge
        # layout sizes depend on how receivers distribute over 128-node
        # blocks, so the plan must measure the reordered graph (and use the
        # reader's "_mrt" cache name).
        from bsms_gnn_tpu.graph.order import reorder_mesh

        pos, cells, _, _ = reorder_mesh(pos, cells)
        name += "_mrt"
    edges = to_flat_edge(cells, cfg.mesh_type)
    return load_or_build_levels(
        os.path.dirname(path), name, edges, cfg.unet_depth, pos.shape[0], pos
    )


def plan_buckets(cfg: DatasetConfig, mode: str = "train") -> BucketPlan:
    """Streaming two-pass bucket planner for variable-mesh datasets.

    Pass 1 holds only per-file level sizes (a few ints each — a
    1000-trajectory cylinder_flow fits trivially); files are then split into
    `cfg.size_buckets` groups by level-0 node count, and pass 2 streams each
    group's (cached) levels once more to size the block-aligned edge
    layouts. Raw levels are never all resident. Cached as JSON next to the
    data."""
    if cfg.window < 0:
        raise ValueError(
            "window=-1 (auto per-level widths) picks per-mesh shapes and "
            "cannot be pinned by a bucket plan — use an explicit window "
            "size with size_buckets"
        )
    all_files = []
    for m in ("train", "test"):
        try:
            all_files += dataset_files(cfg, m)
        except FileNotFoundError:
            pass
    if not all_files:
        all_files = dataset_files(cfg, mode)
    k = max(1, int(getattr(cfg, "size_buckets", 1)))
    plan_path = os.path.join(
        cfg.root, cfg.name,
        f"tpu_buckets_d{cfg.unet_depth}_p{cfg.pad_multiple}_k{k}"
        + (f"_eb{cfg.edge_block}" if cfg.edge_block != 128 else "")
        + (f"_w{cfg.window}" if cfg.window else "")
        + ".json",
    )
    # Cache validity: count alone is not enough — regenerating a dataset
    # in place (same file names, different meshes) must invalidate the
    # plan, or stale bucket dims underfit the new meshes (negative-pad
    # crash in TrajectoryReader).
    fingerprint = sorted(
        (os.path.join(os.path.basename(os.path.dirname(p)),
                      os.path.basename(p)),
         os.path.getsize(p), int(os.path.getmtime(p)))
        for p in all_files
    )
    fingerprint = [list(t) for t in fingerprint]
    if os.path.isfile(plan_path):
        with open(plan_path) as f:
            plan = json.load(f)
        if (
            plan.get("n_files") == len(all_files)
            and plan.get("fingerprint") == fingerprint
            and all("ell_buckets" in g for g in plan.get("groups", []))
        ):
            return BucketPlan(plan["groups"], plan["file_group"])

    from bsms_gnn_tpu.graph.hierarchy import NODE_BLOCK, layout_edge_count

    # Pass 1: per-file per-level node counts only.
    sizes = {}
    for path in all_files:
        levels = _load_levels_for(cfg, path)
        sizes[path] = [g.num_nodes for g in levels.graphs]
        del levels

    order = sorted(all_files, key=lambda p: sizes[p][0])
    group_lists = [list(g) for g in np.array_split(np.asarray(order), k) if len(g)]

    m = max(cfg.pad_multiple, NODE_BLOCK)
    if cfg.window:
        # windowed layouts need node pads to be window/2-aligned
        m = max(m, cfg.window // 2)
    groups = []
    file_group = {}
    for gi, files in enumerate(group_lists):
        n_max = np.zeros(cfg.unet_depth + 1, np.int64)
        for path in files:
            n_max = np.maximum(n_max, sizes[path])
            file_group[_plan_key(path)] = gi
        node_buckets = [int(-(-(n + 1) // m) * m) for n in n_max]
        # Pass 2 (this group only): edge buckets must cover every member's
        # block-aligned layout exactly; ELL widths (max degree) and — on
        # windowed datasets — the residual sub-layout shapes are pinned to
        # the group maxima too, so the group compiles ONE program.
        nl = cfg.unet_depth + 1
        edge_buckets = [0] * nl
        ell_buckets = [0] * nl
        resid_buckets = [[0, 0] for _ in range(nl)]
        for path in files:
            levels = _load_levels_for(cfg, path)  # cache hit after pass 1
            for l, g in enumerate(levels.graphs):
                if cfg.window:
                    # build the actual layout once (offline, plan-cached) to
                    # read the residual shapes the window tables produce
                    from bsms_gnn_tpu.graph.hierarchy import _pad_level
                    from bsms_gnn_tpu.graph.csr import CsrGraph

                    lg = _pad_level(
                        CsrGraph(g.flat_edges, g.num_nodes), node_buckets[l],
                        0, None, None, edge_block=cfg.edge_block,
                        window=cfg.window,
                    )
                    edge_buckets[l] = max(edge_buckets[l], lg.n_pad_edges)
                    ell_buckets[l] = max(
                        ell_buckets[l], lg.recv_ell.shape[1],
                        lg.send_ell.shape[1],
                    )
                    if lg.resid is not None:
                        resid_buckets[l][0] = max(
                            resid_buckets[l][0], lg.resid.n_pad_edges
                        )
                        resid_buckets[l][1] = max(
                            resid_buckets[l][1], lg.resid.recv_ell.shape[1],
                            lg.resid.send_ell.shape[1],
                        )
                else:
                    counts = np.bincount(
                        g.flat_edges[1], minlength=node_buckets[l]
                    )
                    edge_buckets[l] = max(
                        edge_buckets[l],
                        layout_edge_count(counts, node_buckets[l],
                                          cfg.edge_block),
                    )
                    ell_buckets[l] = max(
                        ell_buckets[l], int(counts.max()) if counts.size else 1,
                    )
            del levels
        groups.append({
            "node_buckets": node_buckets, "edge_buckets": edge_buckets,
            "ell_buckets": ell_buckets,
            "resid_buckets": resid_buckets if cfg.window else None,
        })

    with open(plan_path, "w") as f:
        json.dump(
            {"n_files": len(all_files), "fingerprint": fingerprint,
             "groups": groups, "file_group": file_group},
            f,
        )
    return BucketPlan(groups, file_group)


class TrajectorySampler:
    """Infinite shuffled batch iterator with background prefetch threads.

    Replaces DataLoader workers + InfiniteDataLooper (process boundary →
    thread boundary: h5py/NumPy release the GIL, and batches land directly
    in host memory ready for device transfer).
    """

    def __init__(
        self,
        cfg: DatasetConfig,
        batch_size: int,
        num_workers: int = 2,
        base_seed: int = 42,
        mode: str = "train",
        prefetch: int = 4,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.mode = mode
        self.files = dataset_files(cfg, mode)
        self.plan = None if cfg.consist_mesh else plan_buckets(cfg, mode)
        self._readers: dict = {}
        self._readers_lock = threading.Lock()
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(
                target=self._worker, args=(w, base_seed), daemon=True
            )
            for w in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _get_reader(self, path: str) -> TrajectoryReader:
        with self._readers_lock:
            r = self._readers.get(path)
        if r is None:
            bk = {} if self.plan is None else self.plan.for_file(path)
            r = TrajectoryReader(self.cfg, path, **bk)
            with self._readers_lock:
                self._readers[path] = r
        return r

    def _worker(self, worker_id: int, base_seed: int) -> None:
        # Per-worker RNG (the reference hashes [train_seed, worker_id,
        # base_seed], base.py:170-205; we fold the same ingredients).
        rng = np.random.default_rng((base_seed, worker_id, 0xB5))
        try:
            # Workers shard the file list (ref base.py:207-219) but resample
            # jointly each epoch for better mixing with few files.
            while not self._stop.is_set():
                file_order = rng.permutation(len(self.files))
                for fi in file_order[worker_id :: max(1, len(self._threads))]:
                    reader = self._get_reader(self.files[fi])
                    t_ids = rng.permutation(len(reader))
                    for start in range(
                        0, len(t_ids) - self.batch_size + 1, self.batch_size
                    ):
                        if self._stop.is_set():
                            return
                        batch = self._collate(
                            [(reader, int(t))
                             for t in t_ids[start : start + self.batch_size]]
                        )
                        self._queue.put(batch)
        except BaseException as e:  # surface worker crashes to the consumer
            self._queue.put(e)

    def _collate(self, samples: List[Tuple[TrajectoryReader, int]]) -> Batch:
        ins, tars, masks = zip(*(r.sample(t) for r, t in samples))
        node_in = np.stack(ins)
        node_tar = np.stack(tars)
        node_mask = np.stack(masks)
        if self.cfg.consist_mesh:
            hierarchy = samples[0][0].hierarchy
        else:
            hierarchy = stack_hierarchies([r.hierarchy for r, _ in samples])
        return Batch(node_in, node_tar, node_mask, hierarchy)

    def __iter__(self) -> Iterator[Batch]:
        return self

    def __next__(self) -> Batch:
        item = self._queue.get()
        if isinstance(item, BaseException):
            raise RuntimeError("TrajectorySampler worker failed") from item
        return item

    def close(self) -> None:
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass


def device_prefetch(batches: Iterator[Batch], depth: int = 2) -> Iterator[Batch]:
    """Move batches to device `depth` steps ahead of consumption, so the
    host→device copy overlaps the previous train step (async dispatch).
    The hierarchy transfers once per identity (device_put of the same
    arrays is cached by JAX for committed arrays; shared-mesh datasets reuse
    one hierarchy object)."""
    import collections

    import jax

    q: "collections.deque[Batch]" = collections.deque()
    it = iter(batches)
    try:
        while True:
            while len(q) <= depth:
                b = next(it)
                q.append(
                    Batch(
                        node_in=jax.device_put(b.node_in),
                        node_tar=jax.device_put(b.node_tar),
                        node_mask=jax.device_put(b.node_mask),
                        hierarchy=b.hierarchy,
                    )
                )
            yield q.popleft()
    except StopIteration:
        while q:
            yield q.popleft()


def rollout_iterator(
    cfg: DatasetConfig, base_seed: int = 42
) -> Iterator[Tuple[TrajectoryReader, np.ndarray, np.ndarray, np.ndarray]]:
    """Yield whole test trajectories for closed-loop rollout (ref
    `base.py:352-357` + `rollout.py:64`): (reader, inputs [T-1, N_pad, C_in],
    targets [T-1, N_pad, C], masks [T-1, N_pad, 1])."""
    plan = None if cfg.consist_mesh else plan_buckets(cfg, "rollout")
    for path in dataset_files(cfg, "rollout"):
        bk = {} if plan is None else plan.for_file(path)
        reader = TrajectoryReader(cfg, path, **bk)
        inp, tar, mask = reader.full()
        yield reader, inp, tar, mask
