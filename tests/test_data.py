"""Data-layer tests: synthetic generator schema, trajectory reader, sampler
batching (shared and stacked hierarchies), mask registry, bucket planning,
and a tiny end-to-end train + rollout on each batching mode."""

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from bsms_gnn_tpu.config import load_config
from bsms_gnn_tpu.data import (
    TrajectoryReader,
    TrajectorySampler,
    generate_synthetic_dataset,
    get_mask,
    rollout_iterator,
    stack_hierarchies,
)
from bsms_gnn_tpu.data.pipeline import device_prefetch, plan_buckets
from bsms_gnn_tpu.training import Trainer, rollout_trajectory, rollout_metrics


@pytest.fixture(scope="module")
def synth_consistent(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    generate_synthetic_dataset(
        root, "synthetic_airfoil", n_train=2, n_test=1, n_nodes=150, n_frames=8,
        consistent_mesh=True, with_density=True, seed=0,
    )
    cfg = load_config([
        "datasets=synthetic_airfoil", "model.unet_depth=3", "model.latent_dim=16",
        "model.hidden_layer=1", "model.accumulation_steps=2",
        "datasets.unet_depth=3", "datasets.pad_multiple=32",
        "opt.warmup_steps=3", "opt.decay_steps=30", "batch=4",
    ])
    cfg.datasets.root = root
    return cfg


@pytest.fixture(scope="module")
def synth_variable(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data_var"))
    generate_synthetic_dataset(
        root, "synthetic_cylinder_flow", n_train=3, n_test=1, n_nodes=160,
        n_frames=6, consistent_mesh=False, with_density=False, seed=1,
    )
    cfg = load_config([
        "datasets=cylinder_flow", "model.unet_depth=2", "model.latent_dim=16",
        "model.hidden_layer=1", "model.accumulation_steps=1",
        "datasets.unet_depth=2", "datasets.pad_multiple=32",
        "opt.warmup_steps=3", "opt.decay_steps=30", "batch=2",
    ])
    cfg.datasets.name = "synthetic_cylinder_flow"
    cfg.datasets.root = root
    return cfg


def test_synthetic_schema(synth_consistent):
    cfg = synth_consistent
    import glob, os
    files = sorted(glob.glob(os.path.join(cfg.datasets.root, "synthetic_airfoil", "train", "*.h5")))
    assert len(files) == 2
    with h5py.File(files[0], "r") as f:
        for k in ["node_type", "cells", "mesh_pos", "density", "velocity"]:
            assert k in f
        t, n, _ = f["velocity"].shape
        assert t == 8
        assert f["mesh_pos"].shape == (t, n, 2)
        assert f["node_type"].shape == (t, n, 1)


def test_mask_registry():
    nt = np.array([[0], [4], [5], [6]])
    np.testing.assert_array_equal(get_mask("airfoil", nt)[:, 0], [1, 0, 0, 0])
    np.testing.assert_array_equal(get_mask("cylinder_flow", nt)[:, 0], [1, 0, 1, 0])
    with pytest.raises(KeyError):
        get_mask("nope", nt)


def test_trajectory_reader(synth_consistent):
    cfg = synth_consistent
    import glob, os
    files = sorted(glob.glob(os.path.join(cfg.datasets.root, "synthetic_airfoil", "train", "*.h5")))
    r = TrajectoryReader(cfg.datasets, files[0])
    assert len(r) == 7
    node_in, node_tar, mask = r.sample(0)
    c = len(cfg.datasets.output_field_names) + 1  # velocity(2)+density(1)
    assert node_in.shape == (r.n_pad, 3 + 2 + 1)
    assert node_tar.shape == (r.n_pad, 3)
    assert mask.shape == (r.n_pad, 1)
    # Pad rows zero.
    assert np.all(node_in[r.n_nodes:] == 0)
    assert np.all(mask[r.n_nodes:] == 0)
    # Target is next frame's output fields.
    inp2, _, _ = r.sample(1)
    np.testing.assert_allclose(node_tar[: r.n_nodes], inp2[: r.n_nodes, :3])
    # Shared cache: second reader reuses hierarchy shapes.
    r2 = TrajectoryReader(cfg.datasets, files[1])
    assert r2.n_pad == r.n_pad


def test_sampler_consistent(synth_consistent):
    cfg = synth_consistent
    s = TrajectorySampler(cfg.datasets, batch_size=4, num_workers=1, mode="train")
    try:
        b = next(s)
        assert b.node_in.shape[0] == 4
        assert b.node_in.ndim == 3
        assert b.hierarchy.levels[0].senders.ndim == 1  # shared hierarchy
    finally:
        s.close()


def test_sampler_stacked_and_buckets(synth_variable):
    cfg = synth_variable
    plan = plan_buckets(cfg.datasets, "train")
    assert len(plan.groups) == 1  # default size_buckets=1
    nb = plan.groups[0]["node_buckets"]
    assert len(nb) == cfg.datasets.unet_depth + 1
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    try:
        b = next(s)
        assert b.hierarchy.levels[0].senders.ndim == 2  # stacked
        assert b.hierarchy.levels[0].senders.shape[0] == 2
        assert b.node_in.shape[0] == 2
        assert b.node_in.shape[1] == nb[0]
    finally:
        s.close()


def test_multi_bucket_skewed_dataset(tmp_path):
    """Skewed variable-mesh dataset (≈120- and ≈600-node meshes mixed):
    with size_buckets=2 the small meshes pad to a SMALL bucket instead of
    the dataset max (SURVEY.md §7.1), the planner streams (no all-levels
    residency), and training runs on both compiled shapes."""
    import os
    import shutil

    root = str(tmp_path)
    small = generate_synthetic_dataset(
        root + "/small", "synthetic_cylinder_flow", n_train=2, n_test=1,
        n_nodes=120, n_frames=6, consistent_mesh=False, with_density=False,
        seed=2,
    )
    big = generate_synthetic_dataset(
        root + "/big", "synthetic_cylinder_flow", n_train=2, n_test=1,
        n_nodes=600, n_frames=6, consistent_mesh=False, with_density=False,
        seed=3,
    )
    base = os.path.join(root, "synthetic_cylinder_flow")
    for split in ("train", "test"):
        os.makedirs(os.path.join(base, split), exist_ok=True)
        idx = 0
        for src in (small, big):
            for f in sorted(os.listdir(os.path.join(src, split))):
                shutil.copy(
                    os.path.join(src, split, f),
                    os.path.join(base, split, f"{idx}.h5"),
                )
                idx += 1

    cfg = load_config([
        "datasets=cylinder_flow", "model.unet_depth=2", "model.latent_dim=16",
        "model.hidden_layer=1", "model.accumulation_steps=1",
        "datasets.unet_depth=2", "datasets.pad_multiple=32",
        "datasets.size_buckets=2",
        "opt.warmup_steps=2", "opt.decay_steps=20", "batch=2",
    ])
    cfg.datasets.name = "synthetic_cylinder_flow"
    cfg.datasets.root = root

    plan = plan_buckets(cfg.datasets, "train")
    assert len(plan.groups) == 2
    nb_small = plan.groups[0]["node_buckets"][0]
    nb_big = plan.groups[1]["node_buckets"][0]
    assert nb_small < nb_big, (nb_small, nb_big)
    assert nb_small <= 192  # small meshes must NOT pad to the 600-node bucket

    tr = Trainer(cfg)
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    key = jax.random.PRNGKey(0)
    seen_shapes = set()
    hier_sigs = set()
    try:
        for i in range(6):
            b = next(s)
            seen_shapes.add(b.node_in.shape[1])
            hier_sigs.add(tuple(
                tuple(a.shape) for a in jax.tree_util.tree_leaves(b.hierarchy)
            ))
            loss = float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            ))
            assert np.isfinite(loss)
    finally:
        s.close()
    assert len(seen_shapes) >= 2, f"only one bucket shape sampled: {seen_shapes}"
    # ELL widths are bucket-pinned too: one compiled program per group.
    assert len(hier_sigs) <= 2, (
        f"{len(hier_sigs)} distinct hierarchy shapes for 2 groups"
    )


def test_end_to_end_consistent(synth_consistent):
    cfg = synth_consistent
    tr = Trainer(cfg)
    s = TrajectorySampler(cfg.datasets, batch_size=4, num_workers=1,
                          mode="train", base_seed=cfg.base_seed)
    key = jax.random.PRNGKey(0)
    try:
        losses = []
        for i in range(12):
            b = next(s)
            losses.append(float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            )))
    finally:
        s.close()
    assert np.all(np.isfinite(losses))
    assert float(tr.state.sim.norm_in.num_accumulations) == 2.0

    # Rollout on the test split.
    for reader, inp, tar, mask in rollout_iterator(cfg.datasets):
        preds = rollout_trajectory(
            tr.state.sim, reader.hierarchy, jnp.asarray(inp[0]),
            jnp.asarray(mask[0]), inp.shape[0], cfg.model,
        )
        m = rollout_metrics(np.asarray(preds), tar, mask[0])
        assert np.isfinite(m["overall"])
        break


def test_end_to_end_stacked(synth_variable):
    cfg = synth_variable
    tr = Trainer(cfg)
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    key = jax.random.PRNGKey(1)
    try:
        for i in range(4):
            b = next(s)
            loss = float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            ))
            assert np.isfinite(loss)
    finally:
        s.close()


def test_rollout_iterator_variable_mesh(synth_variable):
    cfg = synth_variable
    count = 0
    for reader, inp, tar, mask in rollout_iterator(cfg.datasets):
        assert inp.ndim == 3 and tar.ndim == 3
        assert reader.hierarchy.levels[0].senders.ndim == 1
        count += 1
    assert count >= 1


def test_device_prefetch(synth_consistent):
    cfg = synth_consistent
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    try:
        it = device_prefetch(iter(s), depth=2)
        b1, b2 = next(it), next(it)
        assert hasattr(b1.node_in, "devices") or hasattr(b1.node_in, "device")
        assert b1.node_in.shape[0] == 2 and b2.node_in.shape[0] == 2
    finally:
        s.close()


def test_tetra_deforming_plate_end_to_end(tmp_path):
    """3D/tetra capability (deforming_plate family): data gen → hierarchy →
    a few training steps → rollout, with pos_dim=3 world_pos dynamics."""
    from bsms_gnn_tpu.data.synthetic import generate_synthetic_tetra_dataset

    root = str(tmp_path)
    generate_synthetic_tetra_dataset(root, n_train=2, n_test=1, n_nodes=200,
                                     n_frames=6, seed=2)
    cfg = load_config([
        "datasets=deforming_plate",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=16", "model.hidden_layer=1",
        "model.accumulation_steps=1",
        "opt.warmup_steps=2", "opt.decay_steps=20", "batch=2",
    ])
    cfg.datasets.name = "synthetic_deforming_plate"
    cfg.datasets.root = root
    assert cfg.model.pos_dim == 3 and cfg.datasets.mesh_type == "tetra"

    tr = Trainer(cfg)
    s = TrajectorySampler(cfg.datasets, batch_size=2, num_workers=1, mode="train")
    key = jax.random.PRNGKey(0)
    try:
        for i in range(3):
            b = next(s)
            loss = float(tr.iter(
                b.hierarchy, jnp.asarray(b.node_in), jnp.asarray(b.node_tar),
                jnp.asarray(b.node_mask), jax.random.fold_in(key, i),
            ))
            assert np.isfinite(loss)
    finally:
        s.close()

    for reader, inp, tar, mask in rollout_iterator(cfg.datasets):
        preds = rollout_trajectory(
            tr.state.sim, reader.hierarchy, jnp.asarray(inp[0]),
            jnp.asarray(mask[0]), inp.shape[0], cfg.model,
        )
        assert np.all(np.isfinite(np.asarray(preds)))
        break
