"""Dense layers as pure functions over param pytrees.

Parity with reference `src/ops/basic.py:6-23` (`MLP`: hidden_layers ×
(Linear→ReLU) → Linear → optional non-affine LayerNorm). Initialization
matches torch.nn.Linear's default (U(±1/√fan_in) for both weight and bias) so
training dynamics are comparable. Matmuls ride the MXU; `compute_dtype`
bfloat16 casts operands while accumulating in float32.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MLPParams:
    weights: Tuple[Any, ...]  # each [in, out]
    biases: Tuple[Any, ...]  # each [out]
    layer_normalized: bool = struct.field(pytree_node=False, default=True)


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, minval=-bound, maxval=bound)
    return w, b


def init_mlp(
    key,
    input_dim: int,
    latent_dim: int,
    output_dim: int,
    hidden_layers: int,
    layer_normalized: bool = True,
    dtype=jnp.float32,
) -> MLPParams:
    dims = [input_dim] + [latent_dim] * hidden_layers + [output_dim]
    keys = jax.random.split(key, len(dims) - 1)
    ws: List[Any] = []
    bs: List[Any] = []
    for k, (fi, fo) in zip(keys, zip(dims[:-1], dims[1:])):
        w, b = _linear_init(k, fi, fo, dtype)
        ws.append(w)
        bs.append(b)
    return MLPParams(weights=tuple(ws), biases=tuple(bs), layer_normalized=layer_normalized)


def dense(x, w, b, compute_dtype=None):
    """x @ w + b. With a low-precision compute_dtype, operands are cast down,
    accumulation stays f32, and the OUTPUT is stored in compute_dtype too —
    halving HBM traffic for every intermediate activation (params remain
    f32; the final model output is cast back by the caller)."""
    if compute_dtype is not None:
        out = jnp.matmul(
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return (out + b).astype(compute_dtype)
    # HIGHEST: the TPU MXU silently truncates f32 operands to bf16 under the
    # default precision — f32 mode should mean real f32 (use
    # compute_dtype=bfloat16 explicitly for the fast path). f64 inputs (CPU
    # parity tests) keep f64 accumulation.
    return (
        jnp.matmul(
            x, w, preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        + b
    )


def layer_norm(x, eps: float = 1e-5):
    """Non-affine LayerNorm over the last axis (torch default eps). Low
    precision inputs (bf16) are normalized in f32; f64 stays f64 so the
    golden parity tests can run the whole network in double."""
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def mlp_apply(params: MLPParams, x, compute_dtype=None):
    n = len(params.weights)
    for i in range(n - 1):
        x = jax.nn.relu(dense(x, params.weights[i], params.biases[i], compute_dtype))
    x = dense(x, params.weights[-1], params.biases[-1], compute_dtype)
    if params.layer_normalized:
        x = layer_norm(x)
    return x


def mlp_apply_tail(params: MLPParams, pre_act, compute_dtype=None):
    """Finish an MLP whose first layer's pre-activation was computed by the
    caller (the split-first-layer trick: concat(xs) @ W == Σ xs_k @ W_k, so
    node-side pieces are transformed before the edge gather and the wide
    concatenated input never materializes)."""
    x = jax.nn.relu(pre_act)
    n = len(params.weights)
    for i in range(1, n - 1):
        x = jax.nn.relu(dense(x, params.weights[i], params.biases[i], compute_dtype))
    x = dense(x, params.weights[-1], params.biases[-1], compute_dtype)
    if params.layer_normalized:
        x = layer_norm(x)
    return x
