"""Test env: force an 8-device virtual CPU platform before JAX import so
multi-chip sharding tests run anywhere (SURVEY.md §4 test strategy)."""

import os

# The axon TPU plugin ignores JAX_PLATFORMS; the legacy JAX_PLATFORM_NAME and
# the config update below both take effect. Set everything before any test
# module imports jax.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_grid_mesh(nx: int, ny: int):
    """Triangulated structured grid: positions [N,2] and tri cells [M,3]."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float64)
    cells = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = (i + 1) * ny + j + 1
            d = i * ny + j + 1
            cells.append([a, b, c])
            cells.append([a, c, d])
    return pos, np.asarray(cells, dtype=np.int64)


def make_path_graph(n: int = 11):
    """The reference's 11-node path-graph fixture (ops/BSMS.py:107-135)."""
    s = np.arange(n - 1)
    e = np.stack([s, s + 1])
    edges = np.concatenate([e, e[::-1]], axis=1)
    pos = np.stack([np.arange(n), np.zeros(n), np.zeros(n)], axis=-1).astype(np.float64)
    return edges, pos
