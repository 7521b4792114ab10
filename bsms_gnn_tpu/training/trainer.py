"""Jitted trainer: AdamW + warmup-cosine + global-norm clip, with the
normalizer-warmup gate and on-device noise injection.

Parity with reference `src/trainer/trainer.py`:
  * AdamW(peak_lr, weight_decay) over trainable params with
    clip_grad_norm(gnorm_clip) and the warmup-cosine schedule (ref :24-33,151);
  * masked RMSE loss √(Σ mask·se / Σ mask / C) (ref `_loss_fn`, :79-98);
  * the first `accumulation_steps` steps only accumulate normalizer
    statistics and skip the gradient update (ref :146) — here a `lax.cond`
    inside one compiled step, so warmup and training share a single XLA
    program;
  * per-channel relative error report (ref `get_error`, :231-271);
  * optimizer state IS checkpointed/restored (fixing the reference's TODO at
    :188-193).

TPU-native deltas: training-time Gaussian noise injection moved from the host
dataloader (ref `datasets/base.py:274-289`) onto the device inside the jitted
step (same math: per-channel σ, zeroed on masked nodes, target +=
(1−γ)·noise); gradient accumulation actually works via `optax.MultiSteps`
when `gradient_accumulation_steps > 1` (the reference exposes the knob but
never implements it).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from bsms_gnn_tpu.config import Config
from bsms_gnn_tpu.graph.hierarchy import Hierarchy
from bsms_gnn_tpu.models.simulator import (
    SimulatorState,
    init_simulator,
    simulator_forward_auto,
    simulator_warmup,
)
from bsms_gnn_tpu.training.schedule import warmup_cosine_schedule


@struct.dataclass
class TrainState:
    sim: SimulatorState
    opt_state: optax.OptState
    step: jax.Array  # [] int32


def masked_rmse(pred, tar, mask):
    se = jnp.square(pred - tar)
    return jnp.sqrt(jnp.sum(se * mask) / jnp.sum(mask) / se.shape[-1])


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(
        cfg.opt.peak_lr, cfg.opt.warmup_steps, cfg.opt.decay_steps
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.opt.gnorm_clip),
        optax.adamw(schedule, weight_decay=cfg.opt.weight_decay),
    )
    if cfg.opt.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.opt.gradient_accumulation_steps)
    return tx


class Trainer:
    """Owns the optimizer and the compiled train/eval steps.

    The hierarchy is a per-batch argument (static shapes hash into the jit
    cache), so one Trainer serves consistent-mesh and bucketed
    variable-mesh datasets alike.
    """

    def __init__(self, cfg: Config, init_key: Optional[jax.Array] = None,
                 compute_dtype=None):
        self.cfg = cfg
        self.compute_dtype = (
            jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
        ) if compute_dtype is None else compute_dtype
        self.tx = make_optimizer(cfg)
        if init_key is None:
            init_key = jax.random.PRNGKey(cfg.base_seed)
        sim = init_simulator(init_key, cfg.model)
        self.state = TrainState(
            sim=sim,
            opt_state=self.tx.init(sim.params),
            step=jnp.zeros((), jnp.int32),
        )
        self._noise_level = np.asarray(cfg.datasets.noise_level, np.float32)
        self._noise_gamma = float(cfg.datasets.noise_gamma)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- noise ------------------------------------------------------------

    def _inject_noise(self, key, node_in, node_tar, node_mask):
        """Reference `base.py:274-289` on device: Gaussian noise with
        per-channel σ on the output-field channels, zero on masked nodes;
        target absorbs (1−γ)·noise."""
        c = self._noise_level.shape[0]
        noise = (
            jax.random.normal(key, node_tar.shape, node_tar.dtype)
            * jnp.asarray(self._noise_level)
        )
        noise = jnp.where(node_mask == 0, 0.0, noise)
        node_in = node_in.at[..., :c].add(noise)
        node_tar = node_tar + (1.0 - self._noise_gamma) * noise
        return node_in, node_tar

    # -- steps ------------------------------------------------------------

    def _loss_fn(self, params, sim: SimulatorState, hierarchy, node_in, node_tar,
                 node_mask):
        pred = simulator_forward_auto(
            params, sim.norm_in, sim.norm_out, hierarchy, node_in, node_mask,
            self.cfg.model, self.compute_dtype,
        )
        return masked_rmse(pred, node_tar, node_mask)

    def _train_step_impl(self, state: TrainState, hierarchy: Hierarchy,
                         node_in, node_tar, node_mask, key):
        node_in, node_tar = self._inject_noise(key, node_in, node_tar, node_mask)

        # Normalizer statistics ignore padding but include Dirichlet nodes,
        # like the reference (which accumulates over every node).
        pad_mask = jnp.broadcast_to(
            hierarchy.levels[0].node_mask, node_mask.shape
        )

        def warmup_branch(args):
            state, node_in, node_tar = args
            sim = simulator_warmup(
                state.sim, node_in, node_tar, self.cfg.model, pad_mask
            )
            # Loss against the zero prediction, for logging parity with the
            # reference's warmup (`model.py:108-125`).
            loss = masked_rmse(jnp.zeros_like(node_tar), node_tar, node_mask)
            return TrainState(sim=sim, opt_state=state.opt_state, step=state.step + 1), loss

        def train_branch(args):
            state, node_in, node_tar = args
            loss, grads = jax.value_and_grad(self._loss_fn)(
                state.sim.params, state.sim, hierarchy, node_in, node_tar, node_mask
            )
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.sim.params
            )
            new_params = optax.apply_updates(state.sim.params, updates)
            sim = SimulatorState(
                params=new_params, norm_in=state.sim.norm_in, norm_out=state.sim.norm_out
            )
            return TrainState(sim=sim, opt_state=new_opt, step=state.step + 1), loss

        return jax.lax.cond(
            state.step < self.cfg.model.accumulation_steps,
            warmup_branch,
            train_branch,
            (state, node_in, node_tar),
        )

    def _eval_step_impl(self, sim: SimulatorState, hierarchy: Hierarchy,
                        node_in, node_mask):
        return simulator_forward_auto(
            sim.params, sim.norm_in, sim.norm_out, hierarchy, node_in, node_mask,
            self.cfg.model, self.compute_dtype,
        )

    # -- public API -------------------------------------------------------

    def iter(self, hierarchy: Hierarchy, node_in, node_tar, node_mask, key
             ) -> jax.Array:
        """One training iteration; returns the scalar loss."""
        self.state, loss = self._train_step(
            self.state, hierarchy, node_in, node_tar, node_mask, key
        )
        return loss

    def get_pred(self, hierarchy: Hierarchy, node_in, node_mask):
        return self._eval_step(self.state.sim, hierarchy, node_in, node_mask)

    def get_loss(self, hierarchy: Hierarchy, node_in, node_tar, node_mask):
        pred = self.get_pred(hierarchy, node_in, node_mask)
        return masked_rmse(pred, node_tar, node_mask)

    def get_loss_and_error(
        self, hierarchy: Hierarchy, node_in, node_tar, node_mask,
        relative: bool = True,
    ) -> Tuple[float, np.ndarray, np.ndarray]:
        """(loss, per-channel error mean, std) from ONE forward pass — the
        logging cadence needs both, and the reference's separate
        `get_loss`/`get_error` calls each re-ran the model on the same batch
        (`src/train.py:66-79`)."""
        pred = self.get_pred(hierarchy, node_in, node_mask)
        loss = float(masked_rmse(pred, node_tar, node_mask))
        mean, std = self._error_stats(
            np.asarray(pred), np.asarray(node_tar), np.asarray(node_mask), relative
        )
        return loss, mean, std

    def get_error(self, hierarchy: Hierarchy, node_in, node_tar, node_mask,
                  relative: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Per-channel (relative) error mean/std (ref `get_error`,
        `trainer.py:231-271`), computed over valid nodes only (the reference
        averages zeros for masked nodes into the mean; padded batching makes
        that convention meaningless, so we restrict to mask==1)."""
        pred = np.asarray(self.get_pred(hierarchy, node_in, node_mask))
        return self._error_stats(pred, np.asarray(node_tar), np.asarray(node_mask),
                                 relative)

    @staticmethod
    def _error_stats(pred: np.ndarray, tar: np.ndarray, mask: np.ndarray,
                     relative: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        err = np.sqrt(np.where(mask > 0, (pred - tar) ** 2, 0.0))
        if relative:
            tar_sqr = np.where(mask > 0, tar**2, 0.0)
            tar_scale = np.sqrt(
                tar_sqr.sum(axis=-2, keepdims=True)
                / (mask.sum(axis=-2, keepdims=True) + 1e-6)
            ) + 1e-6
            err = err / tar_scale
        flat = err.reshape(-1, err.shape[-1])
        fmask = (mask.reshape(-1, 1) > 0)[:, 0]
        sel = flat[fmask]
        return sel.mean(axis=0), sel.std(axis=0)

    @property
    def step(self) -> int:
        return int(self.state.step)
