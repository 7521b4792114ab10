"""bf16 training recipe, equal-WALL-CLOCK (VERDICT r2 item 7).

The round-2 claim ("bf16 converges mildly behind f32 at equal steps") is
the wrong comparison for a recipe: bf16 steps are faster, so the honest
question is what each precision achieves per unit wall time. This trains
the same synthetic-airfoil problem twice — identical data, init, noise
sequence — under a fixed wall-clock budget, f32 vs bf16 compute, and
reports steps completed + closed-loop rollout RMSE for both, plus the
equal-step comparison at min(steps) for continuity with the old claim.

Precision recipe notes (README "bf16 recipe"):
  * parameters, optimizer state, and normalizer statistics stay float32
    ("master weights") — `compute_dtype` only casts matmul/kernel operands
    and stores intermediates in bf16 (ops/dense.py); accumulation is f32
    everywhere (MXU preferred_element_type, kernel accumulators);
  * no loss scaling: bf16 keeps f32's exponent range, so the fp16-style
    underflow that needs loss scaling cannot occur; gradients flow in f32
    from the loss down (masked RMSE is computed in f32).

Usage: python benchmarks/bf16_recipe.py [n_nodes] [depth] [budget_s]
Writes benchmarks/out/bf16_recipe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_nodes=50_000, depth=6, budget_s=240.0):
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import generate_trajectory, make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.models.simulator import SimulatorState
    from bsms_gnn_tpu.training import Trainer
    from bsms_gnn_tpu.training.rollout import rollout_trajectory

    rng = np.random.default_rng(0)
    mesh = make_delaunay_mesh(n_nodes, rng)
    pos, cells, node_type = mesh
    n = pos.shape[0]
    frames = 24
    trajs = [
        np.concatenate([f["velocity"], f["density"]], -1)
        for f in (generate_trajectory(n, frames, rng, True, mesh)[0]
                  for _ in range(4))
    ]
    test = [
        np.concatenate([f["velocity"], f["density"]], -1)
        for f in (generate_trajectory(n, frames, rng, True, mesh)[0]
                  for _ in range(2))
    ]
    mask = (node_type[:, 0] == 0).astype(np.float32)[:, None]

    cache = "/tmp/bsms-bf16recipe"
    os.makedirs(cache, exist_ok=True)
    edges = to_flat_edge(cells, "tri")
    h = load_or_build_hierarchy(
        cache, f"m{n_nodes}", edges, depth, n, pos.astype(np.float64)
    )
    h = jax.device_put(h)
    n_pad = h.levels[0].n_pad_nodes

    def pad(a):
        out = np.zeros(a.shape[:-2] + (n_pad,) + a.shape[-1:], np.float32)
        out[..., :n, :] = a
        return out

    mask_pad = jnp.asarray(pad(mask[None]))
    batch_rng = np.random.default_rng(5)
    out_dim = 3

    def batch(s):
        i = int(batch_rng.integers(0, len(trajs)))
        t = int(batch_rng.integers(0, frames - 1))
        fields = trajs[i]
        node_in = np.concatenate(
            [fields[t], pos.astype(np.float32), node_type.astype(np.float32)], -1
        )
        return (jnp.asarray(pad(node_in[None])),
                jnp.asarray(pad(fields[t + 1][None])))

    results = {"config": {"n_nodes": n, "depth": depth, "budget_s": budget_s}}
    for dtype in ("float32", "bfloat16"):
        cfg = load_config([
            f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
            "model.aggregation=pallas", f"model.compute_dtype={dtype}",
            "model.remat=true",
            "model.accumulation_steps=30",
            "datasets.noise_level=[0.02,0.02,0.02]",
            "opt.peak_lr=3e-4", "opt.warmup_steps=100", "opt.decay_steps=3000",
        ])
        batch_rng = np.random.default_rng(5)  # identical sample sequence
        tr = Trainer(cfg, init_key=jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        ni, nt = batch(0)
        t0 = time.time()
        tr.iter(h, ni, nt, mask_pad, key)  # compile
        compile_s = time.time() - t0

        losses = []
        t0 = time.time()
        s = 0
        while time.time() - t0 < budget_s:
            ni, nt = batch(s)
            l = tr.iter(h, ni, nt, mask_pad, jax.random.fold_in(key, s))
            losses.append(float(l))
            s += 1
        wall = time.time() - t0

        sim = tr.state.sim

        def rollout_rmse(roll_dtype):
            rmses = []
            for fields in test:
                ic = np.concatenate(
                    [fields[0], pos.astype(np.float32),
                     node_type.astype(np.float32)], -1
                )
                preds = np.asarray(rollout_trajectory(
                    SimulatorState(params=sim.params, norm_in=sim.norm_in,
                                   norm_out=sim.norm_out),
                    h, jnp.asarray(pad(ic[None]))[0], mask_pad[0],
                    frames - 1, cfg.model, roll_dtype,
                ))
                se = (preds[:, :n] - fields[1:]) ** 2
                rmses.append(float(np.sqrt(se.mean(axis=(1, 2))).mean()))
            return float(np.mean(rmses))

        results[dtype] = {
            "steps_in_budget": s,
            "ms_per_step": round(1e3 * wall / max(s, 1), 1),
            "compile_s": round(compile_s, 1),
            "loss_curve_tail": [round(float(np.mean(losses[i:i+25])), 5)
                                for i in range(0, len(losses), 25)],
            "rollout_rmse": rollout_rmse(
                jnp.bfloat16 if dtype == "bfloat16" else None
            ),
        }
        if dtype == "bfloat16":
            # Params/normalizers are f32 masters either way, so the trained
            # model can roll out at f32 — separates inference precision from
            # training quality (the production recipe: train bf16, serve f32).
            results[dtype]["rollout_rmse_f32_inference"] = rollout_rmse(None)
        print(f"[{dtype}] {s} steps in {wall:.0f}s "
              f"({1e3*wall/max(s,1):.0f} ms/step), rollout RMSE "
              f"{results[dtype]['rollout_rmse']:.4f}", flush=True)

    f32, b16 = results["float32"], results["bfloat16"]
    results["summary"] = {
        "speedup": round(f32["ms_per_step"] / b16["ms_per_step"], 2),
        "equal_wall_rmse_ratio_bf16_over_f32": round(
            b16["rollout_rmse"] / f32["rollout_rmse"], 3
        ),
        "equal_wall_rmse_ratio_recipe": round(
            b16["rollout_rmse_f32_inference"] / f32["rollout_rmse"], 3
        ),
    }
    out = os.path.join(os.path.dirname(__file__), "out", "bf16_recipe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["summary"]))


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 50_000,
        int(a[1]) if len(a) > 1 else 6,
        float(a[2]) if len(a) > 2 else 240.0,
    )
