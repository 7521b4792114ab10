"""Long-horizon closed-loop rollout stability (VERDICT r3 item 8).

The reference's real cases roll hundreds of steps
(`/root/reference/src/rollout.py:47-64`); the r3 showdown only rolled 49 at
800 nodes. This trains the synthetic 5k graded-airfoil problem to
convergence (convergence.py recipe, direct in-memory batches) and commits
the per-timestep RMSE of a >=200-step closed-loop rollout — the
{1,5,10,50,100,200,last} horizon table `rollout.py` prints, plus the full
curve, so the drift SHAPE (linear error growth vs blow-up) is on record.

Usage: python benchmarks/long_rollout.py [steps] [n_nodes] [horizon]
Writes benchmarks/out/long_rollout.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps=1000, n_nodes=5000, horizon=220, depth=7,
         compute_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import (
        generate_trajectory,
        make_graded_airfoil_mesh,
    )
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.training import Trainer
    from bsms_gnn_tpu.training.rollout import rollout_trajectory

    rng = np.random.default_rng(0)
    pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    mesh = (pos, cells, node_type)
    n = pos.shape[0]
    frames = 30
    batch = 4
    trajs = [
        np.concatenate([f["velocity"], f["density"]], -1)
        for f in (generate_trajectory(n, frames, rng, True, mesh)[0]
                  for _ in range(6))
    ]
    # One long held-out trajectory for the closed-loop horizon.
    long_fields = np.concatenate(
        [generate_trajectory(n, horizon + 1, rng, True, mesh)[0][k]
         for k in ("velocity", "density")], -1
    )
    mask = (node_type[:, 0] == 0).astype(np.float32)[:, None]

    cache = "/tmp/bsms-longroll"
    os.makedirs(cache, exist_ok=True)
    edges = to_flat_edge(cells, "tri")
    h = load_or_build_hierarchy(
        cache, f"m{n}", edges, depth, n, pos.astype(np.float64)
    )
    h = jax.device_put(h)
    n_pad = h.levels[0].n_pad_nodes

    def pad(a):
        out = np.zeros(a.shape[:-2] + (n_pad,) + a.shape[-1:], np.float32)
        out[..., :n, :] = a
        return out

    mask_pad = jnp.asarray(pad(mask[None]))
    mask_b = jnp.asarray(np.broadcast_to(pad(mask[None]), (batch, n_pad, 1)).copy())

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        "model.aggregation=pallas", f"model.compute_dtype={compute_dtype}",
        "model.accumulation_steps=30",
        "datasets.noise_level=[0.01,0.01,0.01]",
        "opt.peak_lr=3e-4", f"opt.warmup_steps={steps // 8}",
        f"opt.decay_steps={steps}",
    ])

    batch_rng = np.random.default_rng(7)

    def draw_batch():
        ni, nt = [], []
        for _ in range(batch):
            i = int(batch_rng.integers(0, len(trajs)))
            t = int(batch_rng.integers(0, frames - 1))
            fields = trajs[i]
            ni.append(np.concatenate(
                [fields[t], pos.astype(np.float32),
                 node_type.astype(np.float32)], -1))
            nt.append(fields[t + 1])
        return (jnp.asarray(pad(np.stack(ni))), jnp.asarray(pad(np.stack(nt))))

    tr = Trainer(cfg, init_key=jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    losses = []
    for s in range(steps):
        ni, nt = draw_batch()
        l = tr.iter(h, ni, nt, mask_b, jax.random.fold_in(key, s))
        losses.append(float(l))
        if s % max(steps // 10, 1) == 0:
            print(f"step {s}: loss {float(l):.5f}", flush=True)
    print(f"trained {steps} steps in {time.time()-t0:.0f}s", flush=True)

    ic = np.concatenate(
        [long_fields[0], pos.astype(np.float32),
         node_type.astype(np.float32)], -1
    )
    preds = np.asarray(rollout_trajectory(
        tr.state.sim, h, jnp.asarray(pad(ic[None]))[0], mask_pad[0],
        horizon, cfg.model, tr.compute_dtype,
    ))
    se = (preds[:, :n] - long_fields[1:]) ** 2  # [T, n, C]
    per_t = np.sqrt(se.mean(axis=(1, 2)))  # [T]
    # Field magnitude per step — context for "is the error saturated or
    # growing relative to the signal".
    sig = np.sqrt((long_fields[1:] ** 2).mean(axis=(1, 2)))

    marks = [1, 5, 10, 50, 100, 200, horizon]
    table = {str(m): round(float(per_t[m - 1]), 5)
             for m in marks if m <= horizon}
    print("per-timestep RMSE:", table, flush=True)
    growth_ratio = float(per_t[-1] / max(per_t[49], 1e-12))
    out = {
        "config": {"n_nodes": n, "depth": depth, "steps": steps,
                   "horizon": horizon, "compute_dtype": compute_dtype},
        "final_train_loss_25": round(float(np.mean(losses[-25:])), 5),
        "rmse_at": table,
        "rmse_curve": [round(float(v), 5) for v in per_t],
        "signal_rms": [round(float(v), 5) for v in sig[:: max(horizon // 20, 1)]],
        "rmse_last_over_rmse_50": round(growth_ratio, 3),
    }
    path = os.path.join(os.path.dirname(__file__), "out", "long_rollout.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)
    print(f"drift: rmse[{horizon}]/rmse[50] = {growth_ratio:.3f} "
          f"(signal RMS ~{float(sig.mean()):.3f})", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 1000,
        int(a[1]) if len(a) > 1 else 5000,
        int(a[2]) if len(a) > 2 else 220,
    )
