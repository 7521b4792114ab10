"""CLI smoke tests: the train and rollout entry points run end-to-end on a
tiny synthetic dataset (few steps, CPU), including checkpoint save/restore
across the two programs."""

import glob
import os

import numpy as np
import pytest

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.data import generate_synthetic_dataset
from bsms_gnn_tpu.train import run_train
from bsms_gnn_tpu.rollout import run_rollout


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_data"))
    dump = str(tmp_path_factory.mktemp("cli_dump"))
    generate_synthetic_dataset(
        root, "synthetic_airfoil", n_train=1, n_test=1, n_nodes=120, n_frames=6,
        consistent_mesh=True, with_density=True, seed=3,
    )
    overrides = [
        "datasets=synthetic_airfoil",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=8", "model.hidden_layer=1",
        "model.accumulation_steps=1",
        "datasets.pad_multiple=32",
        "opt.warmup_steps=2", "opt.decay_steps=10",
        "batch=2", "epochs=1", "steps_per_epoch=4",
        "loss_freq=2", "save_freq=4", "time_freq=100", "dataset_workers=1",
    ]
    cfg = load_config(overrides)
    cfg.datasets.root = root
    cfg.dump_dir = dump
    return cfg


def test_train_cli_runs_and_checkpoints(tiny_cfg, capsys):
    run_train(tiny_cfg)
    out = capsys.readouterr().out
    assert "[train] step" in out
    assert "rel_err_mean" in out
    ckpts = glob.glob(os.path.join(tiny_cfg.dump_dir, "ckpts", "**", "step_*"),
                      recursive=True)
    assert ckpts, "no checkpoint written"


def test_rollout_cli_restores_and_reports(tiny_cfg, capsys):
    ckpts = sorted(
        glob.glob(os.path.join(tiny_cfg.dump_dir, "ckpts", "**", "step_*"),
                  recursive=True),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    assert ckpts
    tiny_cfg.restore_dir = os.path.dirname(ckpts[-1])
    tiny_cfg.restore_step = int(ckpts[-1].rsplit("_", 1)[1])
    metrics = run_rollout(tiny_cfg)
    out = capsys.readouterr().out
    assert "rollout RMSE" in out
    assert np.isfinite(metrics["overall_mean"])
    assert len(metrics["per_channel_mean"]) == tiny_cfg.model.out_dim
