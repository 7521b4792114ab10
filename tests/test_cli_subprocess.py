"""Real-subprocess CLI tests: `python -m bsms_gnn_tpu.train` /
`python -m bsms_gnn_tpu.rollout` with argv overrides, covering `main()`,
`load_config(sys.argv[1:])`, and the module `__main__` wiring that the
in-process tests (test_cli.py) bypass. Mirrors the reference entry surface
(`src/train.py:112`, `src/rollout.py:166`)."""

import glob
import os
import subprocess
import sys

import pytest

from bsms_gnn_tpu.data import generate_synthetic_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        JAX_PLATFORM_NAME="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
    )
    return subprocess.run(
        [sys.executable, "-m", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_sub_data"))
    dump = str(tmp_path_factory.mktemp("cli_sub_dump"))
    generate_synthetic_dataset(
        root, "synthetic_airfoil", n_train=1, n_test=1, n_nodes=120, n_frames=6,
        consistent_mesh=True, with_density=True, seed=3,
    )
    return root, dump


OVERRIDES = [
    "datasets=synthetic_airfoil",
    "model.unet_depth=2", "datasets.unet_depth=2",
    "model.latent_dim=8", "model.hidden_layer=1",
    "model.accumulation_steps=1",
    "datasets.pad_multiple=32",
    "opt.warmup_steps=2", "opt.decay_steps=10",
    "batch=2", "epochs=1", "steps_per_epoch=3",
    "loss_freq=2", "save_freq=3", "time_freq=100", "dataset_workers=1",
    "plot=false",
]


def test_train_module_subprocess(data_dirs):
    root, dump = data_dirs
    r = _run(["bsms_gnn_tpu.train", *OVERRIDES,
              f"datasets.root={root}", f"dump_dir={dump}"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[train] step" in r.stdout
    ckpts = glob.glob(os.path.join(dump, "ckpts", "**", "step_*"), recursive=True)
    assert ckpts, f"no checkpoint written; stdout tail: {r.stdout[-500:]}"


def test_rollout_module_subprocess(data_dirs):
    root, dump = data_dirs
    ckpts = sorted(
        glob.glob(os.path.join(dump, "ckpts", "**", "step_*"), recursive=True),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    assert ckpts, "train subprocess test must run first"
    r = _run(["bsms_gnn_tpu.rollout", *OVERRIDES,
              f"datasets.root={root}", f"dump_dir={dump}",
              f"restore_dir={os.path.dirname(ckpts[-1])}",
              f"restore_step={ckpts[-1].rsplit('_', 1)[1]}"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rollout RMSE" in r.stdout


def test_train_bad_override_fails_loudly():
    r = _run(["bsms_gnn_tpu.train", "nonexistent.knob=1"], timeout=120)
    assert r.returncode != 0
    assert "nonexistent" in (r.stderr + r.stdout)
