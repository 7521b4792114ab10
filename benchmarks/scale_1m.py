"""Scaled airfoil stretch case (~1M nodes, SURVEY.md §7.2 item 10):
hierarchy precompute at scale + single-chip inference throughput, reported
as edges/s across all levels. Training at this scale uses remat
(`model.remat=true`) so only node-level residuals persist.

Usage: python benchmarks/scale_1m.py [n_nodes] [depth] [mode: infer|train]
           [dtype] [aggregation] [edge_block] [window]

`window` > 0 Morton-reorders the mesh (graph/order.py) and builds the
windowed-gather layout so the transition convs run gather-free
(ops/pallas/windowed.py).

`dtype` (float32 default, bfloat16) sets `model.compute_dtype`. At this
scale the forward is HBM-bandwidth-bound on [E,128] edge activations
(see benchmarks/profile_1m.py for the component breakdown), so bfloat16
halves the traffic of every gather/matmul/aggregate in the hot path.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _record(tag: str, payload: dict) -> None:
    """Append/refresh one entry of benchmarks/out/scale_1m.json — the
    committed machine artifact behind the README/PARITY scale claims
    (VERDICT r3 weak item 4: headline numbers need a JSON receipt)."""
    import json

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "scale_1m.json")
    data = {}
    if os.path.isfile(path):
        with open(path) as f:
            data = json.load(f)
    data[tag] = payload
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"recorded {tag} -> {path}", flush=True)


def main(n_nodes=1_000_000, depth=7, mode="infer", dtype="float32",
         aggregation="pallas", edge_block=128, window=0, remat_min=0):
    # edge_block=512 cuts the segment-sum kernel 33->19 ms (f32) at this
    # scale but inflates E_pad ~13%, which costs MORE on the XLA-side edge
    # work (gather + edge-MLP scale with E_pad): measured end-to-end
    # 2611 ms vs 2203 ms. Default stays 128; the knob remains for
    # aggregation-dominated workloads.
    import jax
    import jax.numpy as jnp

    from bsms_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_delaunay_mesh
    from bsms_gnn_tpu.graph.hierarchy import load_or_build_hierarchy
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.models.simulator import init_simulator, simulator_forward

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        f"model.aggregation={aggregation}",
        f"model.compute_dtype={dtype}",
        # mode "train_noremat" recomputes nothing in the backward — fits in
        # 16 GB at 1M bf16 since the TransOp ELL tables were dropped (r3).
        "model.remat=" + ("true" if mode == "train" else "false"),
        # No normalizer warmup: the warmup branch of the trainer's lax.cond
        # skips backward+optimizer entirely (30 ms/step at 1M!) and must
        # not be what the train benchmark times (same as train_step.py).
        "model.accumulation_steps=0",
        # Selective remat (train mode): only levels with >= remat_min
        # padded nodes are checkpointed — deep levels' saved activations
        # are geometrically small while their replay is not free.
        f"model.remat_min_nodes={remat_min}",
    ])
    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
    cache_dir = "/tmp/bsms-scale"
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.time()
    pos, cells, node_type = make_delaunay_mesh(n_nodes, np.random.default_rng(0))
    name = f"scale{n_nodes}"
    if window:
        from bsms_gnn_tpu.graph.order import reorder_mesh

        pos, cells, _, _ = reorder_mesh(pos, cells)
        name = f"scale{n_nodes}mrt"
    edges = to_flat_edge(cells, "tri")
    h = load_or_build_hierarchy(
        cache_dir, name, edges, depth, pos.shape[0],
        pos.astype(np.float64), edge_block=edge_block,
        window="auto" if window < 0 else window,  # -1: per-level auto-tune
    )
    if window:
        print(f"windows/level={[g.window for g in h.levels]}", flush=True)
    total_edges = sum(g.n_edges for g in h.levels)
    total_pad = sum(g.n_pad_edges for g in h.levels)
    print(
        f"precompute {time.time()-t0:.0f}s; N={pos.shape[0]} "
        f"edges/level={[g.n_edges for g in h.levels]} total={total_edges} "
        f"pad={total_pad} (eb={edge_block})",
        flush=True,
    )
    h = jax.device_put(h)

    n, n_pad = pos.shape[0], h.levels[0].n_pad_nodes
    c = cfg.model.out_dim
    rng = np.random.default_rng(1)
    node_in = np.zeros((n_pad, c + 3), np.float32)
    node_in[:n, :c] = rng.standard_normal((n, c))
    node_in[:n, c : c + 2] = pos
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = 1.0
    node_in, mask = jnp.asarray(node_in), jnp.asarray(mask)

    state = init_simulator(jax.random.PRNGKey(0), cfg.model)

    if mode == "infer":
        # Hierarchy and params are jit ARGUMENTS: closing over them would
        # bake hundreds of MB of tables into the serialized program (the
        # remote compile service rejects oversized bodies).
        f = jax.jit(
            lambda prm, nin, nout, hh, ni, m: simulator_forward(
                prm, nin, nout, hh, ni, m, cfg.model, compute_dtype
            )
        )
        from bsms_gnn_tpu.utils.timing import pipelined_timeit

        args = (state.params, state.norm_in, state.norm_out, h)
        t0 = time.time()
        out = f(*args, node_in, mask)
        print(f"compile+first {time.time()-t0:.0f}s "
              f"finite={bool(np.isfinite(np.asarray(out[:n])).all())}", flush=True)
        dt = pipelined_timeit(lambda: f(*args, node_in, mask), steps=10, warmup=2)
        print(
            f"infer[{n_nodes}n,d{depth},{dtype},{aggregation}]: "
            f"{dt*1e3:.1f} ms/step, {total_edges/dt/1e9:.2f} Gedges/s",
            flush=True,
        )
        _record(
            f"infer_{n_nodes}_{dtype}_{aggregation}_eb{edge_block}_w{window}",
            {"n_nodes": n_nodes, "depth": depth, "dtype": dtype,
             "aggregation": aggregation, "edge_block": edge_block,
             "window": window, "ms_per_step": round(dt * 1e3, 2),
             "gedges_per_s": round(total_edges / dt / 1e9, 3),
             "total_edges": total_edges, "total_pad_edges": total_pad,
             "device": jax.devices()[0].device_kind},
        )
    elif mode == "learn":
        # End-to-end LEARNING at full scale (not just step timing): a
        # position-dependent target (the tests_problem.halo_target formula
        # — the constant-delta timing target normalizes to zero and proves
        # nothing) trained for 120 optimizer steps under the 1M recipe
        # (bf16 + remat); the decreasing loss trace is the artifact.
        from bsms_gnn_tpu.training import Trainer

        cfg.model.remat = True
        cfg.model.accumulation_steps = 3  # short normalizer warmup
        cfg.opt.peak_lr = 3e-4
        cfg.opt.warmup_steps = 20
        cfg.opt.decay_steps = 200
        tr = Trainer(cfg)
        node_tar = (node_in[None, :, :c] * 1.03
                    + 0.05 * jnp.sin(node_in[None, :, c : c + 1]))
        node_tar = node_tar * mask[None]
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        losses = []
        for i in range(120):
            l = tr.iter(h, node_in[None], node_tar, mask[None],
                        jax.random.fold_in(key, i))
            losses.append(float(l))
            if i == 0:
                print(f"learn compile+first {time.time()-t0:.0f}s", flush=True)
            if (i + 1) % 20 == 0:
                print(f"  step {i+1}: loss {sum(losses[-10:])/10:.4f}",
                      flush=True)
        head = sum(losses[3:13]) / 10
        tail = sum(losses[-10:]) / 10
        print(f"learn[{n_nodes}n,d{depth},{dtype}]: loss {head:.4f} -> "
              f"{tail:.4f} over {len(losses)} steps "
              f"({'DECREASED' if tail < head else 'FLAT'})", flush=True)
        _record(
            f"learn_{n_nodes}_{dtype}",
            {"n_nodes": n_nodes, "depth": depth, "dtype": dtype,
             "steps": len(losses), "loss_head": round(head, 4),
             "loss_tail": round(tail, 4),
             "device": jax.devices()[0].device_kind},
        )
    else:
        from bsms_gnn_tpu.training import Trainer

        tr = Trainer(cfg)
        node_tar = node_in[None, :, :c]
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        loss = tr.iter(h, node_in[None], node_tar, mask[None], key)
        print(f"train compile+first {time.time()-t0:.0f}s loss={float(loss):.4f}",
              flush=True)
        steps = 5
        t0 = time.time()
        for i in range(steps):
            loss = tr.iter(h, node_in[None], node_tar, mask[None],
                           jax.random.fold_in(key, i))
        float(loss)
        dt = (time.time() - t0) / steps
        tag = "remat" if cfg.model.remat else "noremat"
        print(f"train[{n_nodes}n,d{depth},{tag}]: {dt*1e3:.0f} ms/step, "
              f"{total_edges/dt/1e9:.2f} Gedges/s", flush=True)
        _record(
            f"train_{n_nodes}_{dtype}_{aggregation}_eb{edge_block}_w{window}",
            {"n_nodes": n_nodes, "depth": depth, "dtype": dtype,
             "aggregation": aggregation, "edge_block": edge_block,
             "window": window, "remat": bool(cfg.model.remat),
             "remat_min_nodes": remat_min,
             "ms_per_step": round(dt * 1e3, 1),
             "gedges_per_s": round(total_edges / dt / 1e9, 3),
             "device": jax.devices()[0].device_kind},
        )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if a else 1_000_000,
        int(a[1]) if len(a) > 1 else 7,
        a[2] if len(a) > 2 else "infer",
        a[3] if len(a) > 3 else "float32",
        a[4] if len(a) > 4 else "pallas",
        int(a[5]) if len(a) > 5 else 128,
        int(a[6]) if len(a) > 6 else 0,
        int(a[7]) if len(a) > 7 else 0,
    )
