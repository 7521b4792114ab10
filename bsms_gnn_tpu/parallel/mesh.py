"""Device mesh construction for ('data', 'graph') SPMD axes."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def ensure_n_devices(n_devices: int):
    """Return the jax module with >= n_devices devices on the default
    platform, forcing the virtual host (CPU) platform when needed.

    The axon TPU plugin ignores the JAX_PLATFORMS env var, so setting
    JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=N in the
    environment still lands on the 1-chip TPU backend. As long as no
    backend has been initialised yet, jax.config.update("jax_platforms",
    "cpu") does take effect (same workaround as tests/conftest.py). Used by
    the multichip dryrun and the CPU-mesh scaling benchmarks."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    def _n_default():
        try:
            return len(jax.devices())
        except RuntimeError:
            return 0

    # Probing jax.devices() would itself initialise the 1-chip TPU backend
    # and lock the platform, so force CPU up front — harmless when the env
    # already points at CPU, a caught no-op when a backend exists already.
    backends_up = False
    try:
        from jax._src import xla_bridge as _xb

        backends_up = bool(_xb._backends)
    except Exception:
        pass
    if not backends_up or _n_default() < n_devices:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backends already initialised; fall through to the check
    if _n_default() < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {_n_default()} and could not "
            "force the virtual CPU platform (jax backends were initialised "
            "first — set JAX_PLATFORM_NAME=cpu and "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N instead)"
        )
    return jax


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
