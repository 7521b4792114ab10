"""Closed-loop rollout as `lax.scan` + streaming RMSE metrics.

Parity with reference `src/utils/rollout_utils.py:14-64` and
`src/rollout.py:87-163`: starting from the initial condition, feed each
prediction back with the static (mesh_pos, node_type) tail re-attached and
Dirichlet (mask==0) nodes clamped to the IC; accumulate overall /
per-channel / per-timestep RMSE with mean±std across trajectories.

The reference reuses its `Normalizer` as a streaming-stats accumulator
(`rollout.py:87-112`); here that is an explicit `StreamingStats`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from bsms_gnn_tpu.config import ModelConfig
from bsms_gnn_tpu.graph.hierarchy import Hierarchy
from bsms_gnn_tpu.models.simulator import SimulatorState, simulator_forward


def rollout_trajectory(
    sim: SimulatorState,
    hierarchy: Hierarchy,
    ic,
    node_mask,
    n_steps: int,
    cfg: ModelConfig,
    compute_dtype=None,
):
    """Autoregressive rollout.

    ic: [N_pad, C+pos_dim+1] initial condition (frame 0 input);
    node_mask: [N_pad, 1]. Returns [n_steps, N_pad, C] predictions.
    """
    c_out = ic.shape[-1] - cfg.pos_dim - 1
    pos_type = ic[..., c_out:]

    def step(current_input, _):
        pred = simulator_forward(
            sim.params, sim.norm_in, sim.norm_out, hierarchy,
            current_input, node_mask, cfg, compute_dtype,
        )
        nxt = jnp.concatenate([pred, pos_type], axis=-1)
        nxt = jnp.where(node_mask == 0, ic, nxt)
        return nxt, pred

    _, preds = jax.lax.scan(step, ic, None, length=n_steps)
    return preds


def rollout_jit():
    """Jitted rollout with static step count and model config."""
    return jax.jit(rollout_trajectory, static_argnums=(4, 5, 6))


class StreamingStats:
    """Weighted streaming mean/std over accumulated batches (the explicit
    version of the reference's Normalizer-as-accumulator trick; same
    recurrence as `normalizer.py:55-71`)."""

    def __init__(self, size: int):
        self.size = size
        self.w = 0.0
        self.e_x = np.zeros(size, np.float64)
        self.e_x2 = np.zeros(size, np.float64)

    def add(self, data: np.ndarray) -> None:
        data = np.asarray(data, np.float64).reshape(-1, self.size)
        dw = data.shape[0]
        neww = self.w + dw
        self.e_x = (self.e_x * self.w + data.mean(0) * dw) / neww
        self.e_x2 = (self.e_x2 * self.w + (data**2).mean(0) * dw) / neww
        self.w = neww

    def mean(self) -> np.ndarray:
        return self.e_x

    def std(self) -> np.ndarray:
        var = self.e_x2 - self.e_x**2
        return np.maximum(np.nan_to_num(np.sqrt(var)), 1e-8)


def rollout_metrics(
    preds: np.ndarray, targets: np.ndarray, node_mask: np.ndarray
) -> Dict[str, np.ndarray]:
    """Per-trajectory RMSE summaries (ref `rollout.py:99-112`).

    preds/targets: [T, N, C]; node_mask: [N, 1] or [T, N, 1].
    Returns overall scalar RMSE, per-channel [T, C] RMSE, per-time [C, T].
    """
    preds = np.asarray(preds, np.float64)
    targets = np.asarray(targets, np.float64)
    mask = np.asarray(node_mask, np.float64)
    if mask.ndim == 2:
        mask = np.broadcast_to(mask[None], preds.shape[:-1] + (1,))
    se = (preds - targets) ** 2
    overall = np.sqrt((se * mask).sum() / mask.sum() / se.shape[-1])
    per_channel = np.sqrt((se * mask).sum(axis=1) / mask.sum(axis=1))  # [T, C]
    per_time = per_channel.T  # [C, T]
    return {"overall": overall, "per_channel": per_channel, "per_time": per_time}
