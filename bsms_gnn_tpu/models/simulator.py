"""BSMS next-step simulator: encode → BSGMP process → decode, delta target.

Parity with reference `src/models/model.py`:
  * inputs are [..., N, C + pos_dim + 1] = [output_fields, mesh_pos,
    node_type]; the latent input strips mesh_pos and keeps node_type
    (`_get_nodal_latent_input`, ref :29-46);
  * targets are per-node deltas to the next frame (`_deltas`, ref :64-81);
  * normalize input → encode MLP → BSGMP → decode MLP → denormalize delta →
    zero masked nodes → pred = state + delta (`_forward`, ref :127-164);
  * warmup accumulates normalizer statistics and predicts zeros
    (`_warmup`, ref :108-125) — expressed here as a separate pure function
    the trainer gates with `lax.cond`.

The reference's two batching modes (consistent-mesh dense batch vs PyG
disjoint union, ref :166-208) collapse into one: features are [..., N_pad, C]
over a single padded `Hierarchy` — a shared mesh batches as [B, N_pad, C];
variable meshes arrive as an offline-built padded disjoint union with leading
dim 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from bsms_gnn_tpu.config import ModelConfig
from bsms_gnn_tpu.graph.hierarchy import Hierarchy
from bsms_gnn_tpu.models.normalizer import (
    NormalizerState,
    denormalize,
    init_normalizer,
    normalize,
    normalizer_accumulate,
)
from bsms_gnn_tpu.ops.bsgmp import BSGMPParams, bsgmp_apply, init_bsgmp
from bsms_gnn_tpu.ops.dense import MLPParams, init_mlp, mlp_apply


@struct.dataclass
class SimulatorParams:
    encode: MLPParams
    process: BSGMPParams
    decode: MLPParams


@struct.dataclass
class SimulatorState:
    """Trainable params + non-trainable normalizer statistics."""

    params: SimulatorParams
    norm_in: NormalizerState
    norm_out: NormalizerState


def init_simulator(key, cfg: ModelConfig) -> SimulatorState:
    ke, kp, kd = jax.random.split(key, 3)
    fiber_dims = None
    if cfg.world_edges:
        wd = cfg.world_dim or cfg.pos_dim
        if cfg.out_dim < wd:
            raise ValueError(
                "world_edges requires the first world_dim output channels to "
                f"be world_pos (out_dim={cfg.out_dim} < world_dim={wd})"
            )
        fiber_dims = (wd, cfg.pos_dim)
    params = SimulatorParams(
        encode=init_mlp(
            ke, cfg.out_dim + 1, cfg.latent_dim, cfg.latent_dim, cfg.hidden_layer, True
        ),
        process=init_bsgmp(kp, cfg.unet_depth, cfg.latent_dim, cfg.hidden_layer,
                           cfg.pos_dim, fiber_dims=fiber_dims),
        decode=init_mlp(
            kd, cfg.latent_dim, cfg.latent_dim, cfg.out_dim, cfg.hidden_layer, False
        ),
    )
    max_acc = 5e5
    return SimulatorState(
        params=params,
        norm_in=init_normalizer(cfg.out_dim + 1, max_accumulations=max_acc),
        norm_out=init_normalizer(cfg.out_dim, max_accumulations=max_acc),
    )


def split_node_input(node_in, pos_dim: int):
    """[..., C+pos_dim+1] → (latent_input [..., C+1], pos [..., pos_dim],
    node_type [..., 1])."""
    fields = node_in[..., : -1 - pos_dim]
    pos = node_in[..., -(1 + pos_dim) : -1]
    node_type = node_in[..., -1:]
    latent_input = jnp.concatenate([fields, node_type], axis=-1)
    return latent_input, pos, node_type


def target_delta(node_in, node_tar, pos_dim: int):
    """node_tar − current output-fields (ref `_deltas`)."""
    c = node_tar.shape[-1]
    return node_tar - node_in[..., :c]


def simulator_forward(
    params: SimulatorParams,
    norm_in: NormalizerState,
    norm_out: NormalizerState,
    hierarchy: Hierarchy,
    node_in,
    node_mask,
    cfg: ModelConfig,
    compute_dtype=None,
):
    """Predict the next-step state. node_in: [..., N_pad, C+pos_dim+1];
    node_mask: [..., N_pad, 1] (1 = loss-valid node)."""
    latent_input, _, _ = split_node_input(node_in, cfg.pos_dim)
    # Mesh positions live offline in the hierarchy's static fibers; only
    # dynamic world-space positions (contact cases) enter the processor.
    dyn = None
    dyn_dims = None
    if cfg.world_edges:
        wd = cfg.world_dim or cfg.pos_dim
        dyn = node_in[..., :wd]
        dyn_dims = (wd,)

    # Selective precision: cfg.io_dtype pins the encode/decode MLPs to a
    # different dtype than the processor (bf16 recipe: f32 at the
    # normalized I/O boundary, bf16 through the U-Net).
    io_cd = compute_dtype
    if cfg.io_dtype:
        io_cd = None if cfg.io_dtype == "float32" else jnp.dtype(cfg.io_dtype)

    norm_node_in = normalize(norm_in, latent_input)
    x = mlp_apply(params.encode, norm_node_in, io_cd)
    x = bsgmp_apply(
        params.process,
        hierarchy,
        x,
        dyn,
        method=cfg.aggregation,
        compute_dtype=compute_dtype,
        remat=cfg.remat,
        dyn_dims=dyn_dims,
        remat_min_nodes=cfg.remat_min_nodes,
    )
    if io_cd is None and x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    norm_pred_delta = mlp_apply(params.decode, x, io_cd)

    pred_delta = denormalize(norm_out, norm_pred_delta) * node_mask
    c = pred_delta.shape[-1]
    return latent_input[..., :c] + pred_delta


def simulator_forward_auto(
    params: SimulatorParams,
    norm_in: NormalizerState,
    norm_out: NormalizerState,
    hierarchy: Hierarchy,
    node_in,
    node_mask,
    cfg: ModelConfig,
    compute_dtype=None,
):
    """Dispatch on the batching mode: a stacked hierarchy (per-sample graphs
    stacked leaf-wise, index arrays 2-D) runs the forward vmapped over the
    sample axis; a shared hierarchy broadcasts it over [B, N_pad, C]."""
    stacked = hierarchy.levels[0].senders.ndim == 2
    if not stacked:
        return simulator_forward(
            params, norm_in, norm_out, hierarchy, node_in, node_mask, cfg, compute_dtype
        )
    return jax.vmap(
        lambda hh, ni, nm: simulator_forward(
            params, norm_in, norm_out, hh, ni, nm, cfg, compute_dtype
        )
    )(hierarchy, node_in, node_mask)


def simulator_warmup(
    state: SimulatorState,
    node_in,
    node_tar,
    cfg: ModelConfig,
    node_mask: Optional[jax.Array] = None,
) -> SimulatorState:
    """Accumulate normalizer statistics (ref `_warmup`). The optional mask
    keeps padded rows out of the statistics (pass None to reproduce the
    reference exactly on unpadded data)."""
    latent_input, _, _ = split_node_input(node_in, cfg.pos_dim)
    delta = target_delta(latent_input, node_tar, cfg.pos_dim)
    return SimulatorState(
        params=state.params,
        norm_in=normalizer_accumulate(state.norm_in, latent_input, node_mask),
        norm_out=normalizer_accumulate(state.norm_out, delta, node_mask),
    )
