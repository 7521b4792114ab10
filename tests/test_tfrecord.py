"""TFRecord converter tests: an in-test protobuf *encoder* writes
tf.train.Example records in the wire format, and the pure-Python parser must
round-trip them into the per-trajectory h5 schema."""

import json
import os
import struct

import h5py
import numpy as np

from bsms_gnn_tpu.data.tfrecord import (
    convert_tfrecord_to_h5,
    decode_trajectory,
    parse_example,
    read_records,
)


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(features: dict) -> bytes:
    """{name: bytes} → serialized tf.train.Example."""
    entries = b""
    for key, value in features.items():
        bytes_list = _ld(1, value)  # BytesList.value
        feature = _ld(1, bytes_list)  # Feature.bytes_list
        entry = _ld(1, key.encode()) + _ld(2, feature)
        entries += _ld(1, entry)  # Features.feature
    return _ld(1, entries)  # Example.features


def write_tfrecord(path: str, records):
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\x00" * 4)  # length crc (unvalidated)
            f.write(rec)
            f.write(b"\x00" * 4)  # payload crc


def _make_meta_and_example(t_len=3, n=5):
    rng = np.random.default_rng(0)
    mesh_pos = rng.standard_normal((1, n, 2)).astype(np.float32)
    node_type = np.zeros((1, n, 1), np.int32)
    cells = np.array([[[0, 1, 2], [2, 3, 4]]], np.int32)
    velocity = rng.standard_normal((t_len, n, 2)).astype(np.float32)
    meta = {
        "trajectory_length": t_len,
        "field_names": ["cells", "mesh_pos", "node_type", "velocity"],
        "features": {
            "cells": {"type": "static", "shape": [1, -1, 3], "dtype": "int32"},
            "mesh_pos": {"type": "static", "shape": [1, -1, 2], "dtype": "float32"},
            "node_type": {"type": "static", "shape": [1, -1, 1], "dtype": "int32"},
            "velocity": {"type": "dynamic", "shape": [t_len, -1, 2], "dtype": "float32"},
        },
    }
    example = {
        "cells": cells.tobytes(),
        "mesh_pos": mesh_pos.tobytes(),
        "node_type": node_type.tobytes(),
        "velocity": velocity.tobytes(),
    }
    return meta, example, dict(
        cells=cells, mesh_pos=mesh_pos, node_type=node_type, velocity=velocity
    )


def test_parse_and_decode_roundtrip():
    meta, example, arrays = _make_meta_and_example()
    parsed = parse_example(encode_example(example))
    assert set(parsed) == set(example)
    traj = decode_trajectory(parsed, meta)
    t = meta["trajectory_length"]
    # Static fields tiled over time; dynamic kept as-is.
    assert traj["mesh_pos"].shape == (t, 5, 2)
    np.testing.assert_array_equal(traj["mesh_pos"][2], arrays["mesh_pos"][0])
    np.testing.assert_array_equal(traj["velocity"], arrays["velocity"])
    assert traj["cells"].shape == (t, 2, 3)


def test_convert_tfrecord_to_h5(tmp_path):
    meta, example, arrays = _make_meta_and_example()
    src = tmp_path / "raw"
    dst = tmp_path / "converted"
    os.makedirs(src)
    with open(src / "meta.json", "w") as f:
        json.dump(meta, f)
    write_tfrecord(str(src / "train.tfrecord"), [encode_example(example)] * 2)
    # A corrupt record must be skipped, not fatal.
    write_tfrecord(str(src / "test.tfrecord"), [b"\xff\xff", encode_example(example)])

    convert_tfrecord_to_h5(str(src), str(dst), meta["field_names"])
    assert sorted(os.listdir(dst / "train")) == ["0.h5", "1.h5"]
    files = os.listdir(dst / "test")
    assert "1.h5" in files and "0.h5" not in files
    with h5py.File(dst / "train" / "0.h5", "r") as f:
        np.testing.assert_array_equal(np.asarray(f["velocity"]), arrays["velocity"])
        assert f["node_type"].shape == (3, 5, 1)
