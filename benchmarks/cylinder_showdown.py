"""Variable-mesh (cylinder_flow-style) training showdown vs the reference
(VERDICT r3 item 2b).

The r3 showdown covered the consistent-mesh airfoil path; this drives the
OTHER data path end-to-end against the actual reference PyTorch model:

  * dataset: synthetic cylinder_flow — a DIFFERENT mesh per trajectory
    (sizes drawn in [n/2, n]), cylinder mask semantics (valid <=>
    node_type in {0, 5}; ref `src/datasets/cylinder_flow.py:23-25`,
    ours `data/datasets.py::_mask_cylinder`);
  * our side: the real bucketed pipeline — `plan_buckets` (K size groups,
    every array shape pinned per group), `TrajectoryReader` with bucket
    dims, `stack_hierarchies` + the stacked-vmap forward
    (`models/simulator.py::simulator_forward_auto`);
  * reference side: its PyG batching mode (`src/datasets/base.py:322-351`,
    `src/models/model.py:193-200`) concatenates the batch's graphs into
    one disjoint-union graph — torch_geometric is not installed here, so
    the union (node offsets on every level's edges and pooling ids) is
    constructed directly and fed through the same forward; the math is
    identical to PyG's collate by construction.

Equal data: both sides consume the same (trajectory, t) schedule (batches
grouped within a bucket, as the bucketed sampler would), the same host-side
noise draws (ref recipe `datasets/base.py:274-289`), equal warmup /
LR schedule. Inits are independent (framework-native) — the comparison is
statistical, like the r3 independent-init mode; step parity is already
proven by the mirror run and the golden tests.

Usage:  python benchmarks/cylinder_showdown.py [--steps 1000] [--seeds 1]
Output: benchmarks/out/cylinder_showdown.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reference_showdown import (  # noqa: E402
    REF_SRC,
    _install_ref_stubs,
    rollout_rmse,
)

OUT_DIM = 3
NOISE_LEVEL = [0.02, 0.02, 0.02]
NOISE_GAMMA = 1.0


def build_dataset(root, n_nodes, n_train, n_test, n_frames, seed):
    import shutil

    from bsms_gnn_tpu.data.synthetic import generate_synthetic_dataset

    shutil.rmtree(root, ignore_errors=True)  # stale caches from prior runs
    return generate_synthetic_dataset(
        root, "synthetic_cylinder_flow", n_train=n_train, n_test=n_test,
        n_nodes=n_nodes, n_frames=n_frames, consistent_mesh=False,
        with_density=True, seed=seed,
    )


def make_schedule(readers, batch, steps, seed):
    """Frame batches WITHIN one trajectory at a time — both pipelines'
    real semantics (our `TrajectorySampler._worker` iterates one reader's
    shuffled frames per batch; the reference's datapipe loads one
    trajectory's frames per batch, `src/datasets/base.py:207-219`). Across
    batches, trajectories (and hence bucket shapes) interleave."""
    rng = np.random.default_rng(seed + 2000)
    paths = sorted(readers)
    batches = []
    while len(batches) < steps:
        for fi in rng.permutation(len(paths)):
            p = paths[fi]
            t_ids = rng.permutation(len(readers[p]))
            for i in range(0, len(t_ids) - batch + 1, batch):
                batches.append([(p, int(t)) for t in t_ids[i:i + batch]])
    rng.shuffle(batches)
    return batches[:steps]


def ref_graphs_for_mesh(cells, pos, depth):
    """The reference's own bi-stride build for one mesh (numpy levels)."""
    from graph_wrappers import BistrideMultiLayerGraph

    from bsms_gnn_tpu.graph.mesh import to_flat_edge

    edges = to_flat_edge(cells, "tri")
    mlg = BistrideMultiLayerGraph(edges, depth, pos.shape[0], pos)
    _, m_flat_es, m_ids = mlg.get_multi_layer_graphs()
    return [np.asarray(e) for e in m_flat_es], [np.asarray(i) for i in m_ids]


def union_graphs(graph_list, n_nodes_list, depth):
    """Disjoint union of per-sample level graphs — what PyG's collate
    builds (edge indices and pooling ids shifted by per-level node
    offsets)."""
    import torch

    m_gs, m_ids = [], []
    for l in range(depth + 1):
        off, parts = 0, []
        for (es, _), counts in zip(graph_list, n_nodes_list):
            parts.append(es[l] + off)
            off += counts[l]
        m_gs.append(torch.tensor(np.concatenate(parts, axis=1),
                                 dtype=torch.long)[None])
    for l in range(depth):
        off, parts = 0, []
        for (_, ids), counts in zip(graph_list, n_nodes_list):
            parts.append(ids[l] + off)
            off += counts[l]
        m_ids.append(torch.tensor(np.concatenate(parts), dtype=torch.long)[None])
    return m_gs, m_ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=900)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--n-train", type=int, default=4)
    ap.add_argument("--n-test", type=int, default=4)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--warmup-acc", type=int, default=100)
    ap.add_argument("--lr-warmup", type=int, default=200)
    ap.add_argument("--peak-lr", type=float, default=5e-4)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "out", "cylinder_showdown.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.pipeline import (
        _plan_key,
        plan_buckets,
        stack_hierarchies,
    )
    from bsms_gnn_tpu.data.trajectory import TrajectoryReader
    from bsms_gnn_tpu.models.simulator import SimulatorState
    from bsms_gnn_tpu.training import Trainer
    from bsms_gnn_tpu.training.rollout import rollout_trajectory

    results = {"config": vars(args), "seeds": []}
    for seed in range(args.seeds):
        root = f"/tmp/bsms-cylsd-{seed}"
        build_dataset(root, args.nodes, args.n_train, args.n_test,
                      args.frames, seed)
        cfg = load_config([
            "datasets=synthetic_cylinder_flow",
            f"datasets.unet_depth={args.depth}",
            f"model.unet_depth={args.depth}",
            f"model.latent_dim={args.latent}",
            f"model.hidden_layer={args.hidden}",
            f"model.accumulation_steps={args.warmup_acc}",
            "model.consistent_mesh=false",
            "datasets.size_buckets=2",
            "datasets.noise_level=[0.0,0.0,0.0]",  # host-side shared noise
            f"opt.peak_lr={args.peak_lr}",
            f"opt.warmup_steps={args.lr_warmup}",
            f"opt.decay_steps={args.steps}",
        ])
        cfg.datasets.root = root

        # --- our side: the real bucketed pipeline machinery ---
        plan = plan_buckets(cfg.datasets, "train")
        from bsms_gnn_tpu.data.pipeline import dataset_files

        train_files = dataset_files(cfg.datasets, "train")
        test_files = dataset_files(cfg.datasets, "test")
        readers = {
            p: TrajectoryReader(cfg.datasets, p, **plan.for_file(p))
            for p in train_files
        }
        schedule = make_schedule(readers, args.batch, args.steps, seed)

        # Shared noise draws per (batch step, slot) on REAL rows.
        noise_rng = np.random.default_rng(seed + 7)
        nlv = np.asarray(NOISE_LEVEL, np.float32)

        def batch_arrays(batch_pairs):
            """(ours: padded stacked [B,N_pad,...] + stacked hierarchy;
            ref: per-sample real-row arrays) with identical noised values."""
            ins, tars, masks, hs = [], [], [], []
            ref_samples = []
            for (p, t) in batch_pairs:
                r = readers[p]
                ni, nt, nm = r.sample(t)
                n = r.n_nodes
                noise = noise_rng.standard_normal((n, OUT_DIM)).astype(
                    np.float32) * nlv
                noise = np.where(nm[:n] == 0, 0.0, noise)
                ni = ni.copy()
                nt = nt.copy()
                ni[:n, :OUT_DIM] += noise
                nt[:n] += (1.0 - NOISE_GAMMA) * noise
                ins.append(ni)
                tars.append(nt)
                masks.append(nm)
                hs.append(r.hierarchy)
                ref_samples.append((p, ni[:n], nt[:n], nm[:n]))
            return (
                np.stack(ins), np.stack(tars), np.stack(masks),
                stack_hierarchies(hs), ref_samples,
            )

        t0 = time.time()
        tr = Trainer(cfg, init_key=jax.random.PRNGKey(seed))
        key = jax.random.PRNGKey(seed + 13)
        our_losses = []
        ref_batches = []  # replay buffer for the reference pass
        for s, bp in enumerate(schedule):
            ni, nt, nm, hs, ref_samples = batch_arrays(bp)
            ref_batches.append(ref_samples)
            l = tr.iter(hs, jnp.asarray(ni), jnp.asarray(nt),
                        jnp.asarray(nm), jax.random.fold_in(key, s))
            our_losses.append(float(l))
        t_ours = time.time() - t0

        # our rollouts (per-test-file hierarchy, full-length closed loop)
        sim = tr.state.sim
        our_rmse = []
        test_readers = {}
        for p in test_files:
            r = TrajectoryReader(cfg.datasets, p)
            test_readers[p] = r
            n = r.n_nodes
            ic = r.node_in[0]
            steps_r = len(r)
            preds = np.asarray(rollout_trajectory(
                SimulatorState(params=sim.params, norm_in=sim.norm_in,
                               norm_out=sim.norm_out),
                r.hierarchy, jnp.asarray(ic), jnp.asarray(r.node_mask[0]),
                steps_r, cfg.model,
            ))
            our_rmse.append(rollout_rmse(preds[:, :n], r.node_out[1:, :n]))

        # --- reference side: same schedule, same noised values, union ---
        _install_ref_stubs()
        if REF_SRC not in sys.path:
            sys.path.insert(0, REF_SRC)
        import torch

        from models.model import BSMS_Simulator
        from trainer.trainer import Trainer as RefTrainer

        torch.manual_seed(seed)
        t0 = time.time()
        ref_graph_cache = {}
        count_cache = {}
        for p, r in list(readers.items()) + list(test_readers.items()):
            gs, ids = ref_graphs_for_mesh(r.cells, r.mesh_pos0, args.depth)
            ref_graph_cache[p] = (gs, ids)
            counts = [r.n_nodes]
            for l in range(args.depth):
                counts.append(len(ids[l]))
            count_cache[p] = counts

        model_cfg = types.SimpleNamespace(
            out_dim=OUT_DIM, latent_dim=args.latent,
            hidden_layer=args.hidden, unet_depth=args.depth, pos_dim=2,
            consistent_mesh=True,  # the union graph rides the tuple path
            accumulation_steps=args.warmup_acc,
        )
        opt_cfg = types.SimpleNamespace(
            peak_lr=args.peak_lr, weight_decay=1e-4,
            warmup_steps=args.lr_warmup, decay_steps=args.steps,
            gnorm_clip=1.0,
        )
        model = BSMS_Simulator(model_cfg)
        rtr = RefTrainer(model, model_cfg, opt_cfg)
        ref_losses = []
        union_cache = {}
        for s, ref_samples in enumerate(ref_batches):
            paths = tuple(p for p, *_ in ref_samples)
            if paths not in union_cache:
                union_cache[paths] = union_graphs(
                    [ref_graph_cache[p] for p in paths],
                    [count_cache[p] for p in paths], args.depth,
                )
            m_gs, m_ids = union_cache[paths]
            node_in = np.concatenate([x for _, x, _, _ in ref_samples])[None]
            node_tar = np.concatenate([x for _, _, x, _ in ref_samples])[None]
            mask_u = np.concatenate([x for _, _, _, x in ref_samples])[None]
            data = (
                torch.tensor(node_in), torch.tensor(node_tar),
                torch.tensor(mask_u), m_gs, m_ids,
            )
            data = rtr.move_to_device(data)
            loss = rtr._loss_fn(data)
            if rtr.train_step >= model_cfg.accumulation_steps:
                loss.backward()
                torch.nn.utils.clip_grad_norm_(
                    model.parameters(), opt_cfg.gnorm_clip)
                rtr.optimizer.step()
                rtr.lr_scheduler.step()
                rtr.optimizer.zero_grad()
            rtr.train_step += 1
            ref_losses.append(float(loss.detach()))

        from utils.rollout_utils import rollout_one_traj

        ref_rmse = []
        for p in test_files:
            r = test_readers[p]
            n = r.n_nodes
            gs, ids = ref_graph_cache[p]
            m_gs = [torch.tensor(e, dtype=torch.long)[None] for e in gs]
            m_ids = [torch.tensor(i, dtype=torch.long)[None] for i in ids]
            steps_r = len(r)
            fake = types.SimpleNamespace(model=model)
            res = torch.zeros((steps_r, n, OUT_DIM))
            with torch.no_grad():
                preds = rollout_one_traj(
                    fake, torch.tensor(r.node_in[0:1, :n]), res,
                    torch.tensor(r.node_mask[0:1, :n]), m_gs, m_ids, None,
                ).numpy()
            ref_rmse.append(rollout_rmse(preds, r.node_out[1:, :n]))
        t_ref = time.time() - t0

        def reduce(per_traj):
            return {h: float(np.mean([t[h] for t in per_traj]))
                    for h in ("s1", "s5", "s10", "all")}

        entry = {
            "seed": seed,
            "bucket_groups": len({plan.file_group[_plan_key(p)] for p in train_files}),
            "mesh_sizes": sorted(readers[p].n_nodes for p in train_files),
            "rollout_rmse_ours": our_rmse,
            "rollout_rmse_reference": ref_rmse,
            "rollout_rmse_ours_mean": reduce(our_rmse),
            "rollout_rmse_reference_mean": reduce(ref_rmse),
            "final_train_loss_ours": float(np.mean(our_losses[-50:])),
            "final_train_loss_reference": float(np.mean(ref_losses[-50:])),
            "loss_curve": {
                "steps": list(range(0, args.steps, 25)),
                "ours": [float(np.mean(our_losses[i:i + 25]))
                         for i in range(0, args.steps, 25)],
                "reference": [float(np.mean(ref_losses[i:i + 25]))
                              for i in range(0, args.steps, 25)],
            },
            "wall_s_ours": round(t_ours, 1),
            "wall_s_reference_cpu": round(t_ref, 1),
        }
        results["seeds"].append(entry)
        o, r_ = entry["rollout_rmse_ours_mean"], entry["rollout_rmse_reference_mean"]
        print(f"[seed {seed}] cylinder rollout RMSE ours/ref: "
              f"s1 {o['s1']:.4f}/{r_['s1']:.4f} "
              f"s10 {o['s10']:.4f}/{r_['s10']:.4f} "
              f"all {o['all']:.4f}/{r_['all']:.4f} | final loss "
              f"{entry['final_train_loss_ours']:.4f}/"
              f"{entry['final_train_loss_reference']:.4f}", flush=True)

    summary = {}
    for h in ("s1", "s5", "s10", "all"):
        ours_all = [t[h] for e in results["seeds"] for t in e["rollout_rmse_ours"]]
        ref_all = [t[h] for e in results["seeds"] for t in e["rollout_rmse_reference"]]
        summary[f"ours_{h}"] = float(np.mean(ours_all))
        summary[f"ours_{h}_std"] = float(np.std(ours_all))
        summary[f"reference_{h}"] = float(np.mean(ref_all))
        summary[f"reference_{h}_std"] = float(np.std(ref_all))
        summary[f"ratio_{h}"] = float(np.mean(ours_all) / np.mean(ref_all))
    results["summary"] = summary
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
