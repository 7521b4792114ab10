"""Rollout entry point: closed-loop evaluation with RMSE summaries.

Usage (ref `README.md:129-133`):
    python -m bsms_gnn_tpu.rollout datasets=airfoil restore_dir=... restore_step=...

Parity with reference `src/rollout.py:19-163`: restore checkpoint, roll out
every test trajectory autoregressively, accumulate overall / per-channel /
per-timestep RMSE across trajectories (mean ± std), print summaries
including steps {0, 5, 10, 50, last} (with the reference's unreachable-elif
ordering bug fixed — SURVEY.md §7.3).
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from bsms_gnn_tpu.config import Config, load_config, to_yaml
from bsms_gnn_tpu.data import rollout_iterator
from bsms_gnn_tpu.training import Trainer, rollout_metrics, rollout_trajectory
from bsms_gnn_tpu.training.checkpoint import restore_checkpoint
from bsms_gnn_tpu.training.rollout import StreamingStats


def run_rollout(cfg: Config) -> dict:
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(to_yaml(cfg), flush=True)
    trainer = Trainer(cfg)
    step = cfg.restore_step
    if cfg.restore_dir and step < 0:
        from bsms_gnn_tpu.training.checkpoint import latest_step

        step = latest_step(cfg.restore_dir)
    if cfg.restore_dir and step >= 0:
        trainer.state = restore_checkpoint(cfg.restore_dir, step, trainer.state)
        print(f"restored step {step} from {cfg.restore_dir}", flush=True)
    else:
        print("WARNING: rolling out an untrained model (no restore_dir)", flush=True)

    acc_overall = None
    acc_channel = None
    acc_time = None

    n_traj = 0
    for reader, inp, tar, mask in rollout_iterator(cfg.datasets, cfg.base_seed):
        preds = np.asarray(
            rollout_trajectory(
                trainer.state.sim,
                reader.hierarchy,
                jnp.asarray(inp[0]),
                jnp.asarray(mask[0]),
                inp.shape[0],
                cfg.model,
                trainer.compute_dtype,
            )
        )
        m = rollout_metrics(preds, tar, mask[0])
        if acc_overall is None:
            acc_overall = StreamingStats(1)
            acc_channel = StreamingStats(m["per_channel"].shape[-1])
            acc_time = StreamingStats(m["per_time"].shape[-1])
        acc_overall.add(np.asarray([[m["overall"]]]))
        acc_channel.add(m["per_channel"])
        acc_time.add(m["per_time"])
        n_traj += 1
        print(f"traj {n_traj}: rollout RMSE {m['overall']:.6f}", flush=True)

    assert n_traj > 0, "no test trajectories found"

    print("\n---- error averaged over time and channel ----")
    print(f"mean {acc_overall.mean()[0]:.6f}  std {acc_overall.std()[0]:.6f}")
    print("\n---- error per channel ----")
    print(f"mean {acc_channel.mean().tolist()}")
    print(f"std  {acc_channel.std().tolist()}")
    print("\n---- error at steps 0, 5, 10, 50, last ----")
    t_mean, t_std = acc_time.mean(), acc_time.std()
    t_len = t_mean.shape[0]
    steps = [s for s in (0, 5, 10, 50) if s < t_len] + [t_len - 1]
    print(f"mean {t_mean[steps].tolist()}")
    print(f"std  {t_std[steps].tolist()}")

    return {
        "overall_mean": float(acc_overall.mean()[0]),
        "overall_std": float(acc_overall.std()[0]),
        "per_channel_mean": acc_channel.mean().tolist(),
        "per_time_mean": t_mean.tolist(),
    }


def main() -> None:
    run_rollout(load_config(sys.argv[1:]))


if __name__ == "__main__":
    main()
