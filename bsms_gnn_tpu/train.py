"""Training entry point.

Usage (Hydra-style overrides, ref `README.md:125-133`):
    python -m bsms_gnn_tpu.train datasets=airfoil batch=48 epochs=20
    python -m bsms_gnn_tpu.train datasets=cylinder_flow opt.peak_lr=2e-4

Parity with reference `src/train.py:19-109`: seeded setup, cadenced
loss/error logging on train and test batches (dense near the start/end),
periodic checkpoints, ETA prints. Checkpoints carry optimizer state, so
`restore_dir`/`restore_step` resume exactly.
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from bsms_gnn_tpu.config import Config, load_config, to_yaml
from bsms_gnn_tpu.data import TrajectorySampler
from bsms_gnn_tpu.data.pipeline import device_prefetch
from bsms_gnn_tpu.training import Trainer
from bsms_gnn_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from bsms_gnn_tpu.utils import MetricLogger, TicToc, board_loss, print_error_table


def _log_cadence(step: int, freq: int, total: int) -> bool:
    """Reference cadence (`train.py:66-70`): every `freq`, plus every
    `freq//10` near the start and end."""
    dense = max(freq // 10, 1)
    return (
        step % freq == 0
        or (step <= freq and step % dense == 0)
        or (step >= total - freq and step % dense == 0)
    )


def _batch_arrays(b):
    return jnp.asarray(b.node_in), jnp.asarray(b.node_tar), jnp.asarray(b.node_mask)


def _plot_test_batch(cfg, trainer, batch, step, stamp) -> None:
    from bsms_gnn_tpu.utils.plotting import plot_fields

    ni, nt, nm = _batch_arrays(batch)
    pred = np.asarray(trainer.get_pred(batch.hierarchy, ni, nm))[0]
    pos = np.asarray(ni[0, :, -1 - cfg.model.pos_dim : -1])
    # Reconstruct a triangulation from the level-0 graph is overkill here;
    # scatter panels only need positions, so plot with a Delaunay of the
    # valid nodes' positions.
    n_valid = int(np.asarray(nm[0]).sum())
    try:
        from scipy.spatial import Delaunay

        cells = Delaunay(pos[:n_valid]).simplices
    except Exception:
        return
    out = os.path.join(cfg.dump_dir, "plots", f"{cfg.datasets.name}_{stamp}",
                       f"step_{step}.png")
    plot_fields(
        pos[:n_valid], cells, pred[:n_valid], np.asarray(nt[0]),
        save_path=out, title=f"step {step}",
    )
    print(f"plotted test batch → {out}", flush=True)


def run_train(cfg: Config) -> None:
    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    np.random.seed(cfg.base_seed)
    print(to_yaml(cfg), flush=True)
    logger = MetricLogger(cfg.board, cfg.project)

    trainer = Trainer(cfg)
    if cfg.restore_dir:
        # restore_step=-1 auto-resumes from the newest checkpoint (the
        # failure-recovery path the reference lacks, SURVEY.md §5.3/5.4).
        step = cfg.restore_step
        if step < 0:
            step = latest_step(cfg.restore_dir)
        if step >= 0:
            trainer.state = restore_checkpoint(cfg.restore_dir, step, trainer.state)
            print(f"restored step {step} from {cfg.restore_dir}", flush=True)

    train_sampler = TrajectorySampler(
        cfg.datasets, cfg.batch, cfg.dataset_workers, cfg.base_seed, "train"
    )
    test_sampler = TrajectorySampler(
        cfg.datasets, cfg.batch, max(1, cfg.dataset_workers // 4), cfg.base_seed, "test"
    )

    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    ckpt_dir = os.path.join(
        cfg.dump_dir, "ckpts", cfg.project, cfg.datasets.name, stamp
    )
    print(f"stamp: {stamp}; checkpoints → {ckpt_dir}", flush=True)

    key = jax.random.PRNGKey(cfg.base_seed)
    timer = TicToc()
    total_steps = cfg.epochs * cfg.steps_per_epoch
    train_iter = device_prefetch(train_sampler)
    try:
        for i in range(total_steps + 1):
            batch = next(train_iter)
            step = trainer.step

            if _log_cadence(step, cfg.loss_freq, total_steps):
                ni, nt, nm = _batch_arrays(batch)
                loss, mean, std = trainer.get_loss_and_error(
                    batch.hierarchy, ni, nt, nm
                )
                board_loss(logger, "train", step, loss)
                print_error_table("train", step, mean, std)
                tb = next(test_sampler)
                tni, tnt, tnm = _batch_arrays(tb)
                loss, mean, std = trainer.get_loss_and_error(
                    tb.hierarchy, tni, tnt, tnm
                )
                board_loss(logger, "test", step, loss)
                print_error_table("test", step, mean, std)

            if cfg.plot and step > 0 and step % cfg.plot_freq == 0:
                # Working version of the reference's disabled eval_plot
                # (`train_utils.py:60-62`): test-batch field/error panels.
                _plot_test_batch(cfg, trainer, next(test_sampler), step, stamp)

            if step % cfg.save_freq == 0 and step > 0:
                save_checkpoint(ckpt_dir, step, trainer.state)
                print(f"saved step {step} → {ckpt_dir}", flush=True)

            ni, nt, nm = _batch_arrays(batch)
            trainer.iter(
                batch.hierarchy, ni, nt, nm, jax.random.fold_in(key, i)
            )

            if trainer.step == cfg.time_warm:
                timer.tic("train")
            if trainer.step > cfg.time_warm and trainer.step % cfg.time_freq == 0:
                timer.estimate_time(
                    "train", (trainer.step - cfg.time_warm) / total_steps
                )
        save_checkpoint(ckpt_dir, trainer.step, trainer.state)
    finally:
        train_sampler.close()
        test_sampler.close()
        logger.finish()


def main() -> None:
    run_train(load_config(sys.argv[1:]))


if __name__ == "__main__":
    main()
