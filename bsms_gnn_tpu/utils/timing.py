"""Wall-clock timing + ETA (parity with reference `TicToc`,
`src/utils/basic.py:122-165`) and a device-aware benchmark timer."""

from __future__ import annotations

import time
from datetime import datetime, timedelta
from functools import wraps


def _fmt(seconds: float) -> str:
    seconds = int(seconds)
    d, seconds = divmod(seconds, 86400)
    h, seconds = divmod(seconds, 3600)
    m, s = divmod(seconds, 60)
    return f"{d}-{h:02d}:{m:02d}:{s:02d}"


class TicToc:
    def __init__(self):
        self.start_time = {}

    def tic(self, name: str) -> None:
        self.start_time[name] = time.perf_counter()

    def toc(self, name: str) -> float:
        total = time.perf_counter() - self.start_time[name]
        print(f"{name} took {total:.4f} s", flush=True)
        return total

    def estimate_time(self, name: str, ratio: float) -> None:
        """Print elapsed / remaining / total estimates at `ratio` progress."""
        elapsed = time.perf_counter() - self.start_time[name]
        ratio = max(ratio, 1e-9)
        remaining = elapsed * (1 - ratio) / ratio
        finish = datetime.now() + timedelta(seconds=remaining)
        print(
            f"[eta] {ratio*100:.2f}% done | elapsed {_fmt(elapsed)} | "
            f"remaining {_fmt(remaining)} | total {_fmt(elapsed / ratio)} | "
            f"finish {finish:%Y-%m-%d %H:%M:%S}",
            flush=True,
        )


timer = TicToc()


def timeit(func):
    @wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = func(*args, **kwargs)
        print(f"{func.__name__} took {time.perf_counter() - t0:.4f} s", flush=True)
        return out

    return wrapper


def device_sync(x) -> None:
    """Force completion of a device computation by materializing one scalar
    element of its first array leaf. `jax.block_until_ready` is NOT a
    reliable fence on remote/tunneled backends (observed returning early on
    the axon TPU plugin); a host transfer of a dependent value is."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "size") and getattr(leaf, "size", 0):
            float(jnp.ravel(leaf)[0])
            return


def simple_timeit(f, tries: int = 10, warmup: int = 2) -> float:
    """Median seconds per call with a real device sync (see device_sync)."""
    for _ in range(warmup):
        device_sync(f())
    times = []
    for _ in range(tries):
        t0 = time.perf_counter()
        device_sync(f())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def pipelined_timeit(f, steps: int = 20, warmup: int = 3) -> float:
    """Seconds per call for `steps` back-to-back dispatches synced once at
    the end (the device executes its queue serially, so the last result's
    availability bounds them all). Measures sustained throughput without
    paying per-call host↔device round trips."""
    for _ in range(warmup):
        device_sync(f())
    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = f()
    device_sync(out)
    return (time.perf_counter() - t0) / steps
