"""LR schedule: linear warmup then cosine decay to zero.

Parity with reference `WarmupCosineDecayScheduler`
(`src/utils/basic.py:168-184`): factor = step/warmup during warmup, else
0.5·(1+cos(π·progress)). One deliberate fix (SURVEY.md §7.3 "quirks not to
replicate"): progress is clamped at 1 so the LR stays 0 past `decay_steps`
instead of cosine-oscillating back up. `end_lr` remains unused exactly as in
the reference config.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int, decay_steps: int):
    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip(
            (count - warmup_steps) / jnp.maximum(decay_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return peak_lr * jnp.where(count <= warmup_steps, warm, cos)

    return schedule
