"""End-to-end L0 on the REAL DeepMind MeshGraphNets wire format.

Builds a fixture tfrecord dataset that is bit-faithful to the published
airfoil schema (`meta.json` features: static cells/mesh_pos/node_type,
dynamic velocity/pressure/density — reference `misc/parse_tfrecord.py:15-33`
and `misc/download_dataset.sh:24-33`), scaled down in trajectory length and
node count only, then drives the full acquisition path as one flow:

    download (urllib mocked to serve the fixture) → pure-Python tfrecord
    parse → per-trajectory h5 → data pipeline → 2 train steps + a rollout
    read.

Plus the deforming_plate-style `dynamic_varlen` cells variant (ragged
per-frame cells with a `length_cells` side channel). With this green, real
DeepMind data is a config change, not a debugging session.
"""

import json
import os
from unittest import mock

import h5py
import numpy as np
import pytest

from bsms_gnn_tpu.data.download import download_dataset
from bsms_gnn_tpu.data.tfrecord import (
    convert_tfrecord_to_h5,
    decode_trajectory,
    parse_example,
)

from conftest import make_grid_mesh
from test_tfrecord import encode_example, write_tfrecord

T_LEN = 6  # real airfoil: 601 — schema identical, scaled for test speed


def _airfoil_meta(t_len: int) -> dict:
    """The published airfoil meta.json schema (shapes use the ragged -1
    node dim exactly as DeepMind ships it)."""
    return {
        "simulator": "cfd",
        "dt": 0.008,
        "features": {
            "cells": {"type": "static", "shape": [1, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [1, -1, 2], "dtype": "float32"},
            "node_type": {"type": "static", "shape": [1, -1, 1], "dtype": "int32"},
            "velocity": {"type": "dynamic", "shape": [t_len, -1, 2], "dtype": "float32"},
            "pressure": {"type": "dynamic", "shape": [t_len, -1, 1], "dtype": "float32"},
            "density": {"type": "dynamic", "shape": [t_len, -1, 1], "dtype": "float32"},
        },
        "field_names": ["cells", "mesh_pos", "node_type", "velocity", "pressure", "density"],
        "trajectory_length": t_len,
    }


def _airfoil_trajectory(rng, pos, cells, node_type):
    n = pos.shape[0]
    vel = rng.standard_normal((T_LEN, n, 2)).astype(np.float32)
    return {
        "cells": cells[None].astype(np.int32),
        "mesh_pos": pos[None].astype(np.float32),
        "node_type": node_type[None].astype(np.int32),
        "velocity": vel,
        "pressure": rng.standard_normal((T_LEN, n, 1)).astype(np.float32),
        "density": (1.0 + 0.1 * vel[..., :1]).astype(np.float32),
    }


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    """A remote-shaped fixture: {meta.json, train/valid/test.tfrecord} with
    2/1/1 trajectories in the real airfoil schema."""
    remote = tmp_path_factory.mktemp("dm_remote")
    rng = np.random.default_rng(0)
    pos, cells = make_grid_mesh(10, 10)
    node_type = np.zeros((pos.shape[0], 1), np.int64)
    node_type[:6] = 4  # a few Dirichlet (wall) nodes

    with open(remote / "meta.json", "w") as f:
        json.dump(_airfoil_meta(T_LEN), f)
    trajs = {}
    for split, count in (("train", 2), ("valid", 1), ("test", 1)):
        recs = []
        trajs[split] = []
        for _ in range(count):
            t = _airfoil_trajectory(rng, pos, cells, node_type)
            trajs[split].append(t)
            recs.append(encode_example({k: v.tobytes() for k, v in t.items()}))
        write_tfrecord(str(remote / f"{split}.tfrecord"), recs)
    return str(remote), trajs


def test_download_parse_train_end_to_end(fixture_dataset, tmp_path):
    remote, trajs = fixture_dataset
    tf_dir = tmp_path / "tfdata"
    conv_root = tmp_path / "converted"

    # 1) download (urllib mocked onto the fixture "bucket")
    def fake_retrieve(url, dst):
        fname = url.rsplit("/", 1)[1]
        with open(os.path.join(remote, fname), "rb") as s, open(dst, "wb") as d:
            d.write(s.read())

    with mock.patch("urllib.request.urlretrieve", side_effect=fake_retrieve):
        download_dataset("airfoil", str(tf_dir))
    assert sorted(os.listdir(tf_dir / "airfoil")) == [
        "meta.json", "test.tfrecord", "train.tfrecord", "valid.tfrecord",
    ]

    # 2) pure-Python tfrecord → h5 (the reference needs a TF 1.15 env here)
    convert_tfrecord_to_h5(
        str(tf_dir / "airfoil"), str(conv_root / "airfoil"),
        ["node_type", "cells", "mesh_pos", "density", "velocity"],
    )
    with h5py.File(conv_root / "airfoil" / "train" / "0.h5", "r") as f:
        src = trajs["train"][0]
        np.testing.assert_array_equal(np.asarray(f["velocity"]), src["velocity"])
        np.testing.assert_array_equal(np.asarray(f["density"]), src["density"])
        # static fields tiled over the trajectory, exactly like tf.tile
        assert f["mesh_pos"].shape == (T_LEN,) + src["mesh_pos"].shape[1:]
        np.testing.assert_array_equal(np.asarray(f["mesh_pos"][3]), src["mesh_pos"][0])
        np.testing.assert_array_equal(np.asarray(f["cells"][0]), src["cells"][0])

    # 3) h5 → pipeline → 2 train steps + a rollout-mode read
    from bsms_gnn_tpu.config import load_config
    from bsms_gnn_tpu.train import run_train

    cfg = load_config([
        "datasets=airfoil",
        "model.unet_depth=2", "datasets.unet_depth=2",
        "model.latent_dim=8", "model.hidden_layer=1",
        "model.accumulation_steps=1",
        "datasets.pad_multiple=32",
        "datasets.noise_level=[0.1,0.1,0.01]",
        "opt.warmup_steps=2", "opt.decay_steps=10",
        "batch=2", "epochs=1", "steps_per_epoch=2",
        "loss_freq=1", "save_freq=100", "time_freq=100", "dataset_workers=1",
    ])
    cfg.datasets.root = str(conv_root)
    cfg.dump_dir = str(tmp_path / "dump")
    run_train(cfg)  # raises on any NaN/shape/mask failure

    from bsms_gnn_tpu.data.pipeline import rollout_iterator

    reader, inp, tar, mask = next(rollout_iterator(cfg.datasets, cfg.base_seed))
    assert np.isfinite(np.asarray(inp)).all()
    assert inp.shape[0] == T_LEN - 1


def test_varlen_cells_deforming_plate_schema():
    """`dynamic_varlen` ragged cells + length_ side channel, the
    deforming_plate wire layout (`parse_tfrecord.py:25-28`)."""
    rng = np.random.default_rng(1)
    t_len, n = 3, 12
    cells_per_frame = [
        rng.integers(0, n, size=(m, 4)).astype(np.int32) for m in (7, 5, 6)
    ]
    world = rng.standard_normal((t_len, n, 3)).astype(np.float32)
    meta = {
        "trajectory_length": t_len,
        "field_names": ["cells", "world_pos"],
        "features": {
            "cells": {"type": "dynamic_varlen", "shape": [-1, 4], "dtype": "int32"},
            "world_pos": {"type": "dynamic", "shape": [t_len, -1, 3], "dtype": "float32"},
        },
    }
    example = {
        "cells": np.concatenate([c.reshape(-1) for c in cells_per_frame]).tobytes(),
        "length_cells": np.asarray([len(c) for c in cells_per_frame], np.int32).tobytes(),
        "world_pos": world.tobytes(),
    }
    traj = decode_trajectory(parse_example(encode_example(example)), meta)
    # Frame-0 connectivity tiled (the hierarchy builder uses frame 0; the
    # reference converter SKIPS ragged trajectories wholesale, ref :59-61).
    assert traj["cells"].shape == (t_len, 7, 4)
    np.testing.assert_array_equal(traj["cells"][0], cells_per_frame[0])
    np.testing.assert_array_equal(traj["world_pos"], world)
