"""Predicted multi-chip scaling efficiency of the halo-partitioned step —
the BASELINE.md ">=80% at >=2 hosts" row, modeled from measurable
quantities when only one real chip is available (VERDICT r2 item 5).

What is measured (exact, on the 8-virtual-device CPU mesh):
  * per-level halo widths and per-shard edge-layout sizes from
    `build_partition` (load balance + padding overhead are real numbers,
    not estimates);
  * the compiled halo train step's COLLECTIVE instructions: every
    all-to-all / all-reduce / collective-permute in the optimized HLO,
    with exact operand byte counts.

What is modeled (assumptions stated in the output):
  * single-chip step time: taken from the real-chip measurement of the
    same mesh (pass as CLI arg; defaults to the bench.py 16k figure);
  * ICI bandwidth per chip (default 9e10 B/s — v5e 2D-torus figure from
    the public scaling-book numbers; the output includes a +-2x
    sensitivity row);
  * compute scales as 1/S times the measured per-shard padding factor
    (shard layouts pad each 128-row block, so small shards carry extra
    rows — this is the real source of sub-linear scaling at small S).

Efficiency = t1 / (S * max-or-sum of (t_compute, t_comm)): reported for
both zero overlap (sum — worst case) and full overlap (max — what the
async collective scheduler achieves when compute >> comm).

Usage: python benchmarks/scaling_model.py [n_nodes] [depth] [ms_1chip]
Writes benchmarks/out/scaling_model.json and prints the PARITY.md table.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_BYTES_PER_S = 9e10  # per-chip ICI bandwidth assumption (v5e 2D torus)


def _collective_bytes(hlo_text: str):
    """(counts, bytes) per collective opcode from optimized HLO text."""
    out = {}
    # e.g.:  %x = (f32[1,512,256], ...) all-to-all(...)
    pat = re.compile(
        r"=\s*((?:\([^)]*\))|(?:\S+))\s*"
        r"(all-to-all|all-reduce|collective-permute|all-gather|"
        r"reduce-scatter)", )
    shape_pat = re.compile(r"(f32|bf16|f16|s32|u32|f64|s64|pred)\[([\d,]*)\]")
    for m in pat.finditer(hlo_text):
        shapes, op = m.groups()
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            sz = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                  "f64": 8, "s64": 8, "pred": 1}[dt]
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * sz
        cnt, tot = out.get(op, (0, 0))
        out[op] = (cnt + 1, tot + nbytes)
    return out


def main(n_nodes=16000, depth=7, ms_1chip=16.2, shards=(2, 4, 8),
         compile_hlo=True, replicate_floor=0, ghost_floor=0):
    from bsms_gnn_tpu.parallel.mesh import ensure_n_devices

    jax = ensure_n_devices(max(shards))  # virtual CPU mesh (axon is 1-chip)
    import jax.numpy as jnp

    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.data.synthetic import make_graded_airfoil_mesh
    from bsms_gnn_tpu.graph.bistride import build_bistride_levels
    from bsms_gnn_tpu.graph.hierarchy import pad_levels
    from bsms_gnn_tpu.graph.mesh import to_flat_edge
    from bsms_gnn_tpu.graph.order import reorder_mesh
    from bsms_gnn_tpu.parallel import (
        build_partition,
        make_mesh,
        partition_nodes,
    )
    from bsms_gnn_tpu.parallel.halo import make_halo_train_step
    from bsms_gnn_tpu.training import Trainer

    n_dev = len(jax.devices())
    shards = [s for s in shards if s <= n_dev]

    cfg = load_config([
        f"model.unet_depth={depth}", f"datasets.unet_depth={depth}",
        "model.aggregation=fused", "model.accumulation_steps=0",
    ])
    rng = np.random.default_rng(0)
    pos, cells, node_type = make_graded_airfoil_mesh(n_nodes, rng)
    pos, cells, (node_type,), _ = reorder_mesh(pos, cells, (node_type,))
    edges = to_flat_edge(cells, "tri")
    n = pos.shape[0]
    levels = build_bistride_levels(edges, depth, n, pos.astype(np.float64))
    h = pad_levels(levels, pad_multiple=128, pos=pos.astype(np.float64))
    n_pad = h.levels[0].n_pad_nodes
    e_global = sum(g.n_pad_edges for g in h.levels)

    c, pd = cfg.model.out_dim, cfg.model.pos_dim
    node_in = np.zeros((n_pad, c + pd + 1), np.float32)
    node_in[:n, :c] = rng.standard_normal((n, c))
    node_in[:n, c:c + pd] = pos
    node_in[:n, -1:] = node_type
    node_tar = node_in[:, :c] + 0.01
    mask = np.zeros((n_pad, 1), np.float32)
    mask[:n] = 1.0

    note = next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith("--note=")), None)
    result = {
        "mesh": {"n_nodes": n, "depth": depth, "e_pad_global": e_global},
        "assumptions": {
            "ms_1chip_measured": ms_1chip,
            "ici_bytes_per_s": ICI_BYTES_PER_S,
            "compute_model": "t1/S x per-shard padding factor",
            **({"note": note} if note else {}),
        },
        "shards": {},
    }

    for s in shards:
        plan = build_partition(
            levels, s, n_pad, pos.astype(np.float64),
            local_layouts=True, window=512, replicate_floor=replicate_floor,
            ghost_floor=ghost_floor,
        )
        tr = Trainer(cfg)
        loss = float("nan")
        collectives = {}
        if compile_hlo:
            # Exact collective inventory from the compiled train step.
            mesh = make_mesh(1, s, devices=jax.devices()[:s])
            step = make_halo_train_step(tr, mesh, plan)
            ni = jnp.asarray(partition_nodes(plan, node_in))
            nt = jnp.asarray(partition_nodes(plan, node_tar))
            nm = jnp.asarray(partition_nodes(plan, mask))
            key = jax.random.PRNGKey(0)
            # Lower BEFORE executing (donate_argnums would invalidate state).
            hlo = (
                step._jit.lower(tr.state, step._hier_dev, ni, nt, nm, key)
                .compile().as_text()
            )
            collectives = _collective_bytes(hlo)
            state, loss = step(tr.state, ni, nt, nm, key)
            jax.block_until_ready(loss)

        # per-level halo geometry (exact)
        lvl_rows = []
        for l, lvl in enumerate(plan.hierarchy.levels):
            lg = lvl.local
            e_pad_l = int(np.asarray(
                lg.senders if lg is not None else lvl.senders_ext
            ).shape[-1])
            lvl_rows.append({
                "level": l,
                "halo_width": int(lvl.halo_width),
                "n_loc": int(np.asarray(lvl.deg).shape[-1]),
                "e_pad_local": e_pad_l,
                "ghost": lg is not None,
                "replicated": bool(lvl.replicated),
            })
        pad_factor = (
            sum(r["e_pad_local"] for r in lvl_rows) * s / e_global
        )
        # fwd collectives: one [S,H,2C] all_to_all per GMP (2 per level +
        # bottom); bwd mirrors them; plus one grad psum.
        halo_bytes_fwd = sum(
            s * r["halo_width"] * 2 * cfg.model.latent_dim * 4
            * (1 if r["level"] == depth else 2)
            for r in lvl_rows if not r["replicated"]
        )
        # Replication boundary: one [n_loc_child, C] psum assembling the
        # first replicated level (fwd; bwd mirrors it) — counted at 1x bytes
        # like the grad psum below.
        first_repl = next(
            (r for r in lvl_rows if r["replicated"]), None
        )
        if first_repl is not None:
            halo_bytes_fwd += first_repl["n_loc"] * cfg.model.latent_dim * 4
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(tr.state.sim.params)
        )
        bytes_step = 2 * halo_bytes_fwd + 4 * n_params  # fwd+bwd + psum
        t_comm = bytes_step / ICI_BYTES_PER_S
        t_cmp = ms_1chip / 1e3 / s * pad_factor
        t1 = ms_1chip / 1e3
        eff_sum = t1 / (s * (t_cmp + t_comm))
        eff_max = t1 / (s * max(t_cmp, t_comm))
        result["shards"][s] = {
            "levels": lvl_rows,
            "collectives_hlo": {
                k: {"count": v[0], "bytes": v[1]}
                for k, v in sorted(collectives.items())
            },
            "padding_factor": round(pad_factor, 3),
            "halo_bytes_fwd_per_chip": int(halo_bytes_fwd / s),
            "collective_bytes_per_step_per_chip": int(bytes_step / s),
            "t_compute_ms": round(1e3 * t_cmp, 3),
            "t_comm_ms": round(1e3 * t_comm / s, 4),
            "eff_no_overlap": round(eff_sum, 3),
            "eff_full_overlap": round(eff_max, 3),
            "train_loss_check": float(loss),
        }
        print(
            f"S={s}: pad_factor {pad_factor:.3f}  "
            f"halo {halo_bytes_fwd / s / 1e6:.2f} MB/chip/fwd  "
            f"t_cmp {1e3 * t_cmp:.2f} ms  t_comm {1e3 * t_comm / s:.3f} ms  "
            f"eff {100 * eff_sum:.1f}% (no overlap) / "
            f"{100 * eff_max:.1f}% (full)",
            flush=True,
        )

    name = ("scaling_model.json" if n_nodes <= 16000
            else f"scaling_model_{n_nodes}.json")
    out = os.path.join(os.path.dirname(__file__), "out", name)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if not x.startswith("--")]
    # --note=... is recorded into the JSON assumptions verbatim.
    main(
        int(a[0]) if a else 16000,
        int(a[1]) if len(a) > 1 else 7,
        float(a[2]) if len(a) > 2 else 16.2,
        compile_hlo=("--no-compile" not in sys.argv),
        replicate_floor=int(a[3]) if len(a) > 3 else 0,
        ghost_floor=int(a[4]) if len(a) > 4 else 0,
    )
