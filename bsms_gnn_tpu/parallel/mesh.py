"""Device mesh construction for ('data', 'graph') SPMD axes."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    graph: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ('data', 'graph'). `data * graph` must divide into the
    available devices; pass `data=-1` to absorb all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % graph == 0, (n, graph)
        data = n // graph
    need = data * graph
    assert need <= n, f"need {need} devices, have {n}"
    arr = np.asarray(devices[:need]).reshape(data, graph)
    return Mesh(arr, ("data", "graph"))
