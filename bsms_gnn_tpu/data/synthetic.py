"""Synthetic trajectory generator in the converted-DeepMind h5 schema.

The real MeshGraphNets datasets need network access (see
`bsms_gnn_tpu/data/download.py`); this generator produces schema-identical
trajectories — Delaunay-triangulated 2D meshes with smooth analytic dynamics
— so tests, benchmarks, and end-to-end training runs work hermetically.
Field layout matches `misc/parse_tfrecord.py:44-61` output: every field has
a leading time axis (static fields tiled), one h5 file per trajectory under
`{root}/{name}/{split}/`.
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np
from scipy.spatial import Delaunay

from bsms_gnn_tpu.data.datasets import (
    NT_AIRFOIL,
    NT_HANDLE,
    NT_INFLOW,
    NT_NORMAL,
    NT_OUTFLOW,
    NT_WALL,
)


def make_delaunay_mesh(n_nodes: int, rng: np.random.Generator,
                       aspect: float = 1.0):
    """Irregular triangulated mesh on [0, aspect] x [0, 1]; returns
    (pos [N,2], cells [M,3], node_type [N,1]).

    `aspect` > 1 stretches the domain into a strip, raising the graph
    diameter to ~sqrt(N*aspect) hops. Deep bi-stride hierarchies need this:
    adjacency squaring halves the diameter per level, and a unit-square mesh
    of ~5k nodes (diameter ~70) collapses to one node by level 5-6 — the
    reference builder then crashes on an empty level
    (`/root/reference/src/utils/basic.py:305` on a 0-edge graph). The real
    airfoil mesh survives depth 7 because of its graded annular geometry;
    a strip is the simplest synthetic stand-in with comparable diameter."""
    n_side = max(4, int(np.sqrt(n_nodes) // 4))
    # Boundary ring keeps the hull well-shaped.
    t = np.linspace(0, 1, n_side, endpoint=False)
    boundary = np.concatenate(
        [
            np.stack([t, np.zeros_like(t)], -1),
            np.stack([np.ones_like(t), t], -1),
            np.stack([1 - t, np.ones_like(t)], -1),
            np.stack([np.zeros_like(t), 1 - t], -1),
        ]
    )
    n_interior = max(n_nodes - boundary.shape[0], 8)
    interior = rng.uniform(0.02, 0.98, size=(n_interior, 2))
    pos = np.concatenate([boundary, interior])
    if aspect != 1.0:
        # Stretch BEFORE triangulating so the edge graph is strip-like.
        pos = pos * np.array([aspect, 1.0])
    tri = Delaunay(pos)
    cells = tri.simplices.astype(np.int64)

    node_type = np.full((pos.shape[0], 1), NT_NORMAL, np.int32)
    nb = boundary.shape[0]
    # Left edge = inflow, right edge = outflow, top/bottom = wall.
    x_hi = float(aspect)
    node_type[:nb][np.isclose(pos[:nb, 0], 0.0)] = NT_INFLOW
    node_type[:nb][np.isclose(pos[:nb, 0], x_hi)] = NT_OUTFLOW
    on_wall = np.isclose(pos[:nb, 1], 0.0) | np.isclose(pos[:nb, 1], 1.0)
    node_type[:nb][on_wall & ~np.isclose(pos[:nb, 0], 0.0) & ~np.isclose(pos[:nb, 0], x_hi)] = NT_WALL
    return pos.astype(np.float32), cells, node_type


def make_grid_strip_mesh(n_nodes: int, ny: int = 8):
    """Regular triangulated strip of ~n_nodes (nx = n_nodes // ny columns,
    jittered interior positions): (pos [N,2], cells [M,3], node_type [N,1]).

    Deep-depth-safe companion to `make_delaunay_mesh`: bi-stride ring-parity
    selection (`/root/reference/src/graph_wrappers/bsms_graph_wrapper.py:84-93`)
    stays clean on regular strips (alternating columns, bounded degree) all
    the way to depth 7+, while irregular stretched meshes degenerate (ring
    bands become cliques under adjacency squaring)."""
    nx = max(n_nodes // ny, 4)
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float64)
    # Jitter interior nodes so edge fibers are non-degenerate.
    rng = np.random.default_rng(12345)
    interior = (
        (pos[:, 0] > 0) & (pos[:, 0] < nx - 1)
        & (pos[:, 1] > 0) & (pos[:, 1] < ny - 1)
    )
    pos[interior] += rng.uniform(-0.25, 0.25, size=(int(interior.sum()), 2))
    pos = pos / ny  # unit-height strip, aspect nx/ny
    cells = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            c = (i + 1) * ny + j + 1
            d = i * ny + j + 1
            cells.append([a, b, c])
            cells.append([a, c, d])
    cells = np.asarray(cells, dtype=np.int64)
    node_type = np.full((pos.shape[0], 1), NT_NORMAL, np.int32)
    x = pos[:, 0] * ny
    node_type[np.isclose(x, 0.0)] = NT_INFLOW
    node_type[np.isclose(x, nx - 1)] = NT_OUTFLOW
    y = pos[:, 1] * ny
    wall = (np.isclose(y, 0.0) | np.isclose(y, ny - 1)) & ~np.isclose(
        x, 0.0) & ~np.isclose(x, nx - 1)
    node_type[wall] = NT_WALL
    return pos.astype(np.float32), cells, node_type


def _analytic_fields(pos: np.ndarray, t: float, phase: float):
    """Traveling-vortex velocity + advected density — smooth, learnable
    one-step dynamics."""
    x, y = pos[:, 0], pos[:, 1]
    vx = np.sin(2 * np.pi * (x - 0.3 * t) + phase) * np.cos(2 * np.pi * y)
    vy = -np.cos(2 * np.pi * (x - 0.3 * t) + phase) * np.sin(2 * np.pi * y)
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * (x + y - 0.5 * t) + phase)
    return vx.astype(np.float32), vy.astype(np.float32), rho.astype(np.float32)


def make_tetra_mesh(n_nodes: int, rng: np.random.Generator):
    """3D Delaunay-tetrahedralized block (for deforming_plate-style cases):
    (pos [N,3], cells [M,4], node_type [N,1] with z=0 face as handles)."""
    pos = rng.uniform(0.0, 1.0, size=(max(n_nodes, 16), 3))
    pos[: n_nodes // 8, 2] = 0.0  # anchor face
    tri = Delaunay(pos)
    cells = tri.simplices.astype(np.int64)
    node_type = np.full((pos.shape[0], 1), NT_NORMAL, np.int32)
    node_type[np.isclose(pos[:, 2], 0.0)] = NT_HANDLE
    return pos.astype(np.float32), cells, node_type


def generate_tetra_trajectory(n_nodes: int, n_frames: int, rng: np.random.Generator):
    """world_pos dynamics: smooth squeeze of the block over time."""
    pos, cells, node_type = make_tetra_mesh(n_nodes, rng)
    n = pos.shape[0]
    phase = float(rng.uniform(0, 2 * np.pi))
    world = np.zeros((n_frames, n, 3), np.float32)
    for ti in range(n_frames):
        s = 1.0 - 0.2 * np.sin(0.3 * ti + phase) * pos[:, 2]
        world[ti] = pos * s[:, None]
    return {
        "mesh_pos": np.broadcast_to(pos, (n_frames, n, 3)).copy(),
        "node_type": np.broadcast_to(node_type, (n_frames, n, 1)).copy(),
        "cells": np.broadcast_to(cells, (n_frames,) + cells.shape).copy(),
        "world_pos": world,
    }


def generate_synthetic_tetra_dataset(
    root: str,
    name: str = "synthetic_deforming_plate",
    n_train: int = 2,
    n_test: int = 1,
    n_nodes: int = 300,
    n_frames: int = 10,
    seed: int = 0,
) -> str:
    """Tetra-mesh dataset in the deforming_plate schema."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, name)
    for split, count in (("train", n_train), ("test", n_test)):
        split_dir = os.path.join(base, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(count):
            fields = generate_tetra_trajectory(
                int(rng.integers(n_nodes // 2, n_nodes)), n_frames, rng
            )
            with h5py.File(os.path.join(split_dir, f"{i}.h5"), "w") as f:
                for k, v in fields.items():
                    f.create_dataset(k, data=v)
    return base


def make_graded_airfoil_mesh(n_nodes: int, rng: np.random.Generator):
    """Airfoil-LIKE topology for honest benchmarking: radially graded point
    density around an elliptical body (dense boundary layer, coarse far
    field) with the body interior carved out — matching the real DeepMind
    airfoil mesh's node count and strongly skewed edge-length/degree
    distribution, unlike a uniform Delaunay carpet. Returns (pos [N,2],
    cells [M,3], node_type [N,1])."""
    from scipy.spatial import Delaunay

    a, b = 0.5, 0.06  # body semi-axes (thin airfoil-ish ellipse)
    n_body = max(n_nodes // 20, 64)
    t = np.linspace(0, 2 * np.pi, n_body, endpoint=False)
    body = np.stack([a * np.cos(t), b * np.sin(t)], -1)

    # Graded cloud: radius ~ exponential in u so ~half the nodes sit within
    # 2 body-lengths; far field extends to ~20 body lengths.
    n_cloud = n_nodes - n_body
    u = rng.uniform(0, 1, n_cloud)
    r = 1.02 + (np.exp(4.0 * u) - 1) / (np.exp(4.0) - 1) * 40.0
    th = rng.uniform(0, 2 * np.pi, n_cloud)
    cloud = np.stack([a * r * np.cos(th), a * r * np.sin(th)], -1)
    # Push points out of the body (scaled ellipse test).
    inside = (cloud[:, 0] / (1.02 * a)) ** 2 + (cloud[:, 1] / (1.02 * b)) ** 2 < 1
    cloud[inside] *= 1.2 / np.sqrt(
        (cloud[inside, 0] / a) ** 2 + (cloud[inside, 1] / b) ** 2
    )[:, None]

    pos = np.concatenate([body, cloud])
    tri = Delaunay(pos)
    cells = tri.simplices.astype(np.int64)
    # Drop triangles whose centroid falls inside the body (the hole).
    cen = pos[cells].mean(axis=1)
    keep = (cen[:, 0] / a) ** 2 + (cen[:, 1] / b) ** 2 > 1.0
    cells = cells[keep]

    node_type = np.full((pos.shape[0], 1), NT_NORMAL, np.int32)
    node_type[:n_body] = NT_AIRFOIL
    rad = np.linalg.norm(pos, axis=-1)
    node_type[rad > 0.98 * rad.max()] = NT_INFLOW  # far-field boundary
    return pos.astype(np.float32), cells, node_type


def make_sphere_mesh(n_nodes: int, rng: np.random.Generator):
    """Closed triangulated surface in 3D (inflating-font-style cases):
    Fibonacci-sphere points + convex hull. Returns (pos [N,3], cells [M,3],
    node_type [N,1] with the bottom cap as handles)."""
    from scipy.spatial import ConvexHull

    n = max(n_nodes, 32)
    i = np.arange(n, dtype=np.float64)
    golden = (1 + 5**0.5) / 2
    z = 1 - 2 * (i + 0.5) / n
    r = np.sqrt(np.maximum(1 - z**2, 0.0))
    theta = 2 * np.pi * i / golden
    pos = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=-1)
    pos += rng.normal(0, 1e-3, pos.shape)  # break hull degeneracies
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    hull = ConvexHull(pos)
    cells = hull.simplices.astype(np.int64)
    node_type = np.full((n, 1), NT_NORMAL, np.int32)
    node_type[pos[:, 2] < np.quantile(pos[:, 2], 0.05)] = NT_HANDLE
    return pos.astype(np.float32), cells, node_type


def generate_inflating_trajectory(n_nodes: int, n_frames: int,
                                  rng: np.random.Generator):
    """world_pos dynamics: the surface inflates radially with a smooth
    angular bulge; handle nodes stay at rest (Dirichlet)."""
    pos, cells, node_type = make_sphere_mesh(n_nodes, rng)
    n = pos.shape[0]
    phase = float(rng.uniform(0, 2 * np.pi))
    handles = (node_type[:, 0] == NT_HANDLE)
    world = np.zeros((n_frames, n, 3), np.float32)
    for ti in range(n_frames):
        inflate = 1.0 + 0.25 * (1 - np.cos(0.35 * ti + 0.0)) / 2
        bulge = 1.0 + 0.08 * np.sin(3 * np.arctan2(pos[:, 1], pos[:, 0]) + phase) \
            * np.sin(0.35 * ti)
        scale = inflate * bulge  # [N]
        w = pos * scale[:, None]
        w[handles] = pos[handles]
        world[ti] = w
    return {
        "mesh_pos": np.broadcast_to(pos, (n_frames, n, 3)).copy(),
        "node_type": np.broadcast_to(node_type, (n_frames, n, 1)).copy(),
        "cells": np.broadcast_to(cells, (n_frames,) + cells.shape).copy(),
        "world_pos": world,
    }


def generate_synthetic_inflating_dataset(
    root: str,
    name: str = "synthetic_inflating_font",
    n_train: int = 2,
    n_test: int = 1,
    n_nodes: int = 400,
    n_frames: int = 10,
    seed: int = 0,
) -> str:
    """Closed-surface dataset in the inflating-font schema (4th case family,
    BASELINE.md 'inflating elastic surface')."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, name)
    for split, count in (("train", n_train), ("test", n_test)):
        split_dir = os.path.join(base, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(count):
            fields = generate_inflating_trajectory(
                int(rng.integers(max(n_nodes // 2, 32), n_nodes)), n_frames, rng
            )
            with h5py.File(os.path.join(split_dir, f"{i}.h5"), "w") as f:
                for k, v in fields.items():
                    f.create_dataset(k, data=v)
    return base


def generate_trajectory(
    n_nodes: int,
    n_frames: int,
    rng: np.random.Generator,
    with_density: bool,
    shared_mesh: Optional[tuple] = None,
):
    pos, cells, node_type = shared_mesh if shared_mesh else make_delaunay_mesh(n_nodes, rng)
    n = pos.shape[0]
    phase = float(rng.uniform(0, 2 * np.pi))
    vel = np.zeros((n_frames, n, 2), np.float32)
    rho = np.zeros((n_frames, n, 1), np.float32)
    for ti in range(n_frames):
        vx, vy, r = _analytic_fields(pos, ti * 0.05, phase)
        vel[ti, :, 0], vel[ti, :, 1] = vx, vy
        rho[ti, :, 0] = r
    fields = {
        "mesh_pos": np.broadcast_to(pos, (n_frames, n, 2)).copy(),
        "node_type": np.broadcast_to(node_type, (n_frames, n, 1)).copy(),
        "cells": np.broadcast_to(cells, (n_frames,) + cells.shape).copy(),
        "velocity": vel,
    }
    if with_density:
        fields["density"] = rho
    return fields, (pos, cells, node_type)


def generate_synthetic_dataset(
    root: str,
    name: str = "synthetic_airfoil",
    n_train: int = 4,
    n_test: int = 2,
    n_nodes: int = 500,
    n_frames: int = 20,
    consistent_mesh: bool = True,
    with_density: bool = True,
    seed: int = 0,
) -> str:
    """Write a complete synthetic dataset; returns its directory."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, name)
    shared = None
    if consistent_mesh:
        shared = make_delaunay_mesh(n_nodes, rng)
    for split, count in (("train", n_train), ("test", n_test)):
        split_dir = os.path.join(base, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(count):
            mesh = shared if consistent_mesh else None
            n = n_nodes if consistent_mesh else int(rng.integers(n_nodes // 2, n_nodes))
            fields, _ = generate_trajectory(n, n_frames, rng, with_density, mesh)
            with h5py.File(os.path.join(split_dir, f"{i}.h5"), "w") as f:
                for k, v in fields.items():
                    f.create_dataset(k, data=v)
    return base
