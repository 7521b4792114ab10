"""End-to-end learning validation: train on a synthetic airfoil-like dataset
and verify the closed-loop rollout RMSE drops well below the untrained
model's. This is the integration-level 'does the whole framework actually
learn' check (the synthetic dynamics are smooth and learnable; real-data
rollout parity needs the DeepMind sets, which require network access).

Usage: python benchmarks/convergence.py [steps] [n_nodes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps=400, n_nodes=800, compute_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data import (
        TrajectorySampler,
        generate_synthetic_dataset,
        rollout_iterator,
    )
    from bsms_gnn_tpu.training import Trainer, rollout_metrics, rollout_trajectory

    root = "/tmp/bsms-convergence"
    generate_synthetic_dataset(
        root, "synthetic_airfoil", n_train=6, n_test=2, n_nodes=n_nodes,
        n_frames=30, consistent_mesh=True, with_density=True, seed=0,
    )
    cfg = load_config([
        "datasets=synthetic_airfoil",
        "model.unet_depth=4", "datasets.unet_depth=4",
        "model.accumulation_steps=20",
        # Synthetic fields are O(1); airfoil's physical-unit noise levels
        # would swamp them.
        "datasets.noise_level=[0.01,0.01,0.01]",
        f"opt.warmup_steps={steps // 8}", f"opt.decay_steps={steps}",
        "opt.peak_lr=3e-4",
        f"model.compute_dtype={compute_dtype}",
        "batch=8",
    ])
    cfg.datasets.root = root

    def eval_rollout(trainer):
        overall = []
        for reader, inp, tar, mask in rollout_iterator(cfg.datasets):
            preds = rollout_trajectory(
                trainer.state.sim, reader.hierarchy, jnp.asarray(inp[0]),
                jnp.asarray(mask[0]), inp.shape[0], cfg.model,
                trainer.compute_dtype,
            )
            overall.append(rollout_metrics(np.asarray(preds), tar, mask[0])["overall"])
        return float(np.mean(overall))

    trainer = Trainer(cfg)
    rmse_untrained = eval_rollout(trainer)
    print(f"rollout RMSE untrained: {rmse_untrained:.5f}", flush=True)

    sampler = TrajectorySampler(cfg.datasets, cfg.batch, 2, cfg.base_seed, "train")
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    try:
        for i in range(steps):
            b = next(sampler)
            loss = trainer.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            )
            if i % max(steps // 10, 1) == 0:
                print(f"step {i}: loss {float(loss):.5f}", flush=True)
    finally:
        sampler.close()
    print(f"trained {steps} steps in {time.time()-t0:.0f}s", flush=True)

    rmse_trained = eval_rollout(trainer)
    print(f"rollout RMSE trained: {rmse_trained:.5f} "
          f"(untrained {rmse_untrained:.5f}, ratio {rmse_trained/rmse_untrained:.3f})",
          flush=True)
    assert rmse_trained < rmse_untrained * 0.5, "model failed to learn"
    print("CONVERGENCE OK", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        int(args[0]) if args else 400,
        int(args[1]) if len(args) > 1 else 800,
        args[2] if len(args) > 2 else "float32",
    )
