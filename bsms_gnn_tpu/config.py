"""Config system: dataclass groups composed from YAML, with CLI overrides.

Mirrors the reference's Hydra group layout (`configs/default.yaml` +
`datasets/ model/ opt/` groups, reference `src/train.py:112`,
`configs/default.yaml`) without depending on Hydra: groups are plain YAML
files under `bsms_gnn_tpu/configs/`, composed by `load_config`, and
`key=value` CLI overrides (including `group=name` swaps and dotted paths like
`opt.peak_lr=3e-4`) are applied on top.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


@dataclass
class DatasetConfig:
    """Dataset group. Mirrors reference `configs/datasets/*.yaml`."""

    name: str = "airfoil"
    root: str = "/data/converted/"
    tf_dataset_dir: str = "/data/"
    field_names: List[str] = field(
        default_factory=lambda: ["node_type", "cells", "mesh_pos", "density", "velocity"]
    )
    output_field_names: List[str] = field(default_factory=lambda: ["velocity", "density"])
    mesh_type: str = "tri"
    unet_depth: int = 7
    consist_mesh: bool = True
    space_dim: int = 2
    noise_level: List[float] = field(default_factory=lambda: [10.0, 10.0, 0.01])
    noise_gamma: float = 1.0
    # TPU-native additions: padding buckets for static shapes. 0 = auto
    # (round up per-mesh to the alignment multiple).
    node_bucket: int = 0
    edge_bucket: int = 0
    pad_multiple: int = 128
    # Pallas segment-sum chunk granularity (edges per streamed chunk). Large
    # meshes (>~100k edges) want 512: the kernel pays ~250 ns fixed cost per
    # chunk, so bigger chunks trade ~10-25% edge padding for ~40% faster
    # aggregation at 1M-node scale. Small meshes keep 128.
    edge_block: int = 128
    # Variable-mesh datasets: number of size groups for padded-shape
    # bucketing (1 = one dataset-wide max bucket; >1 stops small meshes
    # paying for the largest — one compiled program per group).
    size_buckets: int = 1
    # Windowed-gather layout (ops/pallas/windowed.py): >0 Morton-reorders
    # each trajectory's mesh at ingest and builds per-chunk source windows
    # of this row count, making the conv/GMP sender gathers run in-kernel
    # (recommended 512 for >100k-node meshes; requires consistent-mesh
    # unbucketed datasets). 0 = off.
    window: int = 0


@dataclass
class ModelConfig:
    """Model group. Mirrors reference `configs/model/*.yaml`."""

    consistent_mesh: bool = True
    latent_dim: int = 128
    hidden_layer: int = 3
    unet_depth: int = 7
    out_dim: int = 3
    pos_dim: int = 2
    # Normalizer warmup steps (NOT gradient accumulation; see reference
    # `trainer.py:55,146` where this gates loss.backward()).
    accumulation_steps: int = 300
    # World-space edge features (Δworld, ‖Δworld‖ alongside Δmesh) for the
    # contact cases — the capability the reference's 2024 rewrite dropped
    # (reference README.md:10). Requires the first world_dim output channels
    # to be world_pos. world_dim=0 means "same as pos_dim" (flag_simple has
    # a 2-D mesh embedded in 3-D world space, so it sets world_dim: 3).
    world_edges: bool = False
    world_dim: int = 0
    # TPU-native knobs.
    aggregation: str = "ell"  # one of {"ell", "segment", "pallas"}
    compute_dtype: str = "float32"  # matmul compute dtype: "float32"|"bfloat16"
    # Selective precision for the encode/decode MLPs (the normalized I/O
    # boundary, where quantization couples directly to the predicted delta).
    # "" = same as compute_dtype; "float32" pins them to full precision
    # while the processor runs in compute_dtype (bf16 recipe ablation).
    io_dtype: str = ""
    remat: bool = False  # jax.checkpoint each GMP block (memory vs flops)
    # Selective remat: only checkpoint GMPs on levels with at least this
    # many padded nodes (level sizes halve with depth, so deep levels'
    # saved activations are cheap while their replay is not free).
    remat_min_nodes: int = 0


@dataclass
class OptConfig:
    """Optimizer group. Mirrors reference `configs/opt/default.yaml`."""

    peak_lr: float = 1e-4
    end_lr: float = 1e-7
    warmup_steps: int = 20000
    decay_steps: int = 200000
    gnorm_clip: float = 1.0
    weight_decay: float = 1e-4
    gradient_accumulation_steps: int = 1


@dataclass
class ParallelConfig:
    """TPU-native parallelism group (no reference counterpart; the reference's
    multi-GPU path is vestigial, see `trainer.py:15-18` / `train.py:16`)."""

    data_axis: int = 1  # number of chips for batch (data) parallelism
    graph_axis: int = 1  # number of chips for edge-partitioned graph parallelism


@dataclass
class Config:
    """Root config. Mirrors reference `configs/default.yaml` statics."""

    datasets: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    opt: OptConfig = field(default_factory=OptConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    board: bool = False
    plot: bool = True
    dump_dir: str = "/tmp/bsms-res"
    project: str = "train"
    base_seed: int = 42
    dataset_workers: int = 8
    batch: int = 48
    restore_dir: str = ""
    restore_step: int = -1
    epochs: int = 20
    steps_per_epoch: int = 10000
    loss_freq: int = 1000
    save_freq: int = 10000
    plot_freq: int = 10000
    time_freq: int = 1000
    time_warm: int = 100


_GROUPS = {
    "datasets": ("datasets", DatasetConfig),
    "model": ("model", ModelConfig),
    "opt": ("opt", OptConfig),
}


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _coerce(value: str, target: Any) -> Any:
    """Parse a CLI string override into the type of the existing value."""
    if isinstance(target, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(target, int):
        return int(float(value))
    if isinstance(target, float):
        return float(value)
    if isinstance(target, list):
        return yaml.safe_load(value)
    return value


def _apply_dict(cfg: Any, d: dict) -> None:
    for k, v in d.items():
        if not hasattr(cfg, k):
            raise KeyError(f"Unknown config key {k!r} for {type(cfg).__name__}")
        cur = getattr(cfg, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            _apply_dict(cur, v)
        else:
            # YAML 1.1 reads `1e-4` as a string; coerce against field types.
            if isinstance(v, str) and isinstance(cur, (int, float)) and not isinstance(cur, bool):
                v = _coerce(v, cur)
            if isinstance(v, list) and isinstance(cur, list) and cur and isinstance(cur[0], float):
                v = [float(x) for x in v]
            setattr(cfg, k, v)


def _set_dotted(cfg: Config, dotted: str, value: str) -> None:
    parts = dotted.split(".")
    obj = cfg
    for p in parts[:-1]:
        obj = getattr(obj, p)
    cur = getattr(obj, parts[-1])
    setattr(obj, parts[-1], _coerce(value, cur))


def load_config(overrides: Optional[List[str]] = None, config_dir: str = _CONFIG_DIR) -> Config:
    """Compose the config like Hydra would.

    `overrides` entries are either group swaps (`datasets=cylinder_flow`,
    which also swaps the matching `model` group as the reference's defaults
    list pairs them) or dotted value overrides (`opt.peak_lr=3e-4`,
    `batch=16`).
    """
    overrides = list(overrides or [])
    cfg = Config()

    default = _load_yaml(os.path.join(config_dir, "default.yaml"))
    group_choice = dict(default.pop("defaults", {}))

    # First pass: group swaps from CLI.
    value_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override {ov!r} must be key=value")
        k, v = ov.split("=", 1)
        if k in _GROUPS and "." not in k and not hasattr(Config, k):
            pass
        if k in group_choice and os.path.isfile(os.path.join(config_dir, k, v + ".yaml")):
            group_choice[k] = v
            # Convention from the reference: dataset choice implies the
            # matching model group when one exists.
            if k == "datasets" and os.path.isfile(os.path.join(config_dir, "model", v + ".yaml")):
                group_choice["model"] = v
        else:
            value_overrides.append((k, v))

    for group, choice in group_choice.items():
        path = os.path.join(config_dir, group, choice + ".yaml")
        _apply_dict(getattr(cfg, group), _load_yaml(path))

    _apply_dict(cfg, default)

    for k, v in value_overrides:
        _set_dotted(cfg, k, v)

    return cfg


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_yaml(cfg: Any) -> str:
    return yaml.safe_dump(to_dict(cfg), sort_keys=False)
