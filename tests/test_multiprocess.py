"""Multi-process `jax.distributed` local-cluster harness (SURVEY.md §4,
VERDICT item 4): 2 CPU processes × 4 virtual devices each join a
coordinator, assemble global arrays across the process boundary, and run
SPMD train steps; losses, params, and normalizer stats must match the
single-process run of the identical problem."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests_problem import build_problem

TESTS = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nprocs, graph_axis, tmp_path):
    port = _free_port()
    out = os.path.join(str(tmp_path), "result.json")
    procs = []
    for rank in range(nprocs):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(TESTS, "multiprocess_worker.py"),
                 str(rank), str(nprocs), str(port), out, str(graph_axis)],
                env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    with open(out) as f:
        return json.load(f)


def _single_process_reference():
    from bsms_gnn_tpu.training import Trainer

    cfg, h, node_in, node_tar, mask = build_problem()
    tr = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    losses = [
        float(tr.iter(h, jnp.asarray(node_in), jnp.asarray(node_tar),
                      jnp.asarray(mask), jax.random.fold_in(key, i)))
        for i in range(3)
    ]
    checksum = float(
        sum(float(jnp.sum(jnp.abs(l)))
            for l in jax.tree_util.tree_leaves(tr.state.sim.params))
    )
    return losses, checksum, np.asarray(tr.state.sim.norm_in.e_x)


def _single_process_halo_reference():
    """Single-device trainer on the halo section's problem (first sample,
    zero noise — the halo step's per-shard RNG reproduces the single-device
    draw only at noise 0)."""
    import copy

    from bsms_gnn_tpu.training import Trainer
    from tests_problem import halo_target

    cfg, h, node_in, node_tar, mask = build_problem()
    cfg = copy.deepcopy(cfg)
    cfg.datasets.noise_level = [0.0] * cfg.model.out_dim
    node_tar_h = halo_target(cfg, node_in) * mask
    tr = Trainer(cfg)
    key = jax.random.PRNGKey(5)
    return [
        float(tr.iter(h, jnp.asarray(node_in[0]), jnp.asarray(node_tar_h[0]),
                      jnp.asarray(mask[0]), jax.random.fold_in(key, i)))
        for i in range(3)
    ]


@pytest.mark.parametrize("graph_axis", [1, 2])
def test_two_process_cluster_matches_single_process(graph_axis, tmp_path):
    result = _run_cluster(2, graph_axis, tmp_path)
    assert result["process_count"] == 2
    assert result["n_devices"] == 8

    losses_ref, checksum_ref, ex_ref = _single_process_reference()
    np.testing.assert_allclose(result["losses"], losses_ref, rtol=1e-4)
    np.testing.assert_allclose(result["checksum"], checksum_ref, rtol=1e-4)
    np.testing.assert_allclose(result["norm_in_ex"], ex_ref, rtol=1e-4, atol=1e-6)

    # Ghost-edge halo shard_map step across the process boundary (8 shards,
    # 4 per process): per-step losses match the single-device trainer.
    halo_ref = _single_process_halo_reference()
    np.testing.assert_allclose(result["halo_losses"], halo_ref, rtol=1e-4)
