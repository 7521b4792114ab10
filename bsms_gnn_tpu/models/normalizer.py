"""Online feature normalizer as explicit functional state.

Parity with reference `src/utils/normalizer.py`: weighted online accumulation
of E[x] / E[x²] (row count scaled by `unit`), capped at `max_accumulations`;
std = max(√(E[x²]−E[x]²), 1e-8) with NaN→0. The reference hides this state in
non-grad `nn.Parameter`s so it rides the checkpoint (`normalizer.py:28-36`);
here it is a small pytree inside the train state, updated with `lax.cond`
(no Python-side mutation), and checkpointed with everything else.

TPU notes: statistics are float32 by default (f64 is unsupported/emulated on
TPU); parity tests run the same code in f64 on CPU. Accumulation takes an
optional per-row validity mask so padded rows don't pollute the statistics —
with an all-ones mask this is bit-for-bit the reference recurrence. Under
pjit with a batch-sharded input, the means below become global means (XLA
inserts the cross-chip reductions), which is exactly the all-reduce the
reference's never-called `Normalizer.synchronize` (ref :92-114) intended.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
    acc_weight: jax.Array  # [] accumulated row weight (rows / unit)
    num_accumulations: jax.Array  # [] number of accumulate() calls
    e_x: jax.Array  # [size] running E[x]
    e_x2: jax.Array  # [size] running E[x²]
    max_accumulations: float = struct.field(pytree_node=False, default=5e5)
    unit: float = struct.field(pytree_node=False, default=1e6)
    std_epsilon: float = struct.field(pytree_node=False, default=1e-8)


def init_normalizer(
    size: int,
    max_accumulations: float = 5e5,
    unit: float = 1e6,
    std_epsilon: float = 1e-8,
    dtype=jnp.float32,
) -> NormalizerState:
    return NormalizerState(
        acc_weight=jnp.zeros((), dtype),
        num_accumulations=jnp.zeros((), dtype),
        e_x=jnp.zeros((size,), dtype),
        e_x2=jnp.zeros((size,), dtype),
        max_accumulations=max_accumulations,
        unit=unit,
        std_epsilon=std_epsilon,
    )


def normalizer_row_sums(state: NormalizerState, batched_data, mask=None):
    """(n_rows, Σx, Σx²) over data reshaped to [-1, size] — the reduction
    half of an accumulation step, separated out so distributed callers can
    psum the sums across shards before applying the recurrence."""
    dtype = state.e_x.dtype
    size = state.e_x.shape[0]
    data = batched_data.reshape(-1, size).astype(dtype)
    if mask is None:
        return (
            jnp.asarray(data.shape[0], dtype),
            jnp.sum(data, axis=0),
            jnp.sum(jnp.square(data), axis=0),
        )
    m = jnp.broadcast_to(mask.reshape(-1, 1).astype(dtype), data.shape[:1] + (1,))
    return (
        jnp.sum(m),
        jnp.sum(data * m, axis=0),
        jnp.sum(jnp.square(data) * m, axis=0),
    )


def normalizer_apply_sums(
    state: NormalizerState, n_rows, sum_x, sum_x2
) -> NormalizerState:
    """Apply one accumulation step from (possibly globally-reduced) sums."""
    n_rows = jnp.maximum(n_rows, 1.0)
    mean = sum_x / n_rows
    mean_sq = sum_x2 / n_rows

    delta_w = n_rows / state.unit
    new_w = state.acc_weight + delta_w
    new_ex = (state.e_x * state.acc_weight + mean * delta_w) / new_w
    new_ex2 = (state.e_x2 * state.acc_weight + mean_sq * delta_w) / new_w

    def apply(_):
        return NormalizerState(
            acc_weight=new_w,
            num_accumulations=state.num_accumulations + 1.0,
            e_x=new_ex,
            e_x2=new_ex2,
            max_accumulations=state.max_accumulations,
            unit=state.unit,
            std_epsilon=state.std_epsilon,
        )

    def skip(_):
        return state

    return jax.lax.cond(
        state.num_accumulations < state.max_accumulations, apply, skip, None
    )


def normalizer_accumulate(
    state: NormalizerState, batched_data, mask=None
) -> NormalizerState:
    """One accumulation step over data reshaped to [-1, size].

    `mask` (broadcastable to [..., 1]) selects valid rows; rows with mask 0
    contribute neither to the count nor the means. With an all-ones mask
    this matches the reference recurrence (`normalizer.py:55-71`) exactly.
    """
    n_rows, sum_x, sum_x2 = normalizer_row_sums(state, batched_data, mask)
    return normalizer_apply_sums(state, n_rows, sum_x, sum_x2)


def normalizer_mean(state: NormalizerState):
    return state.e_x


def normalizer_std(state: NormalizerState):
    var = state.e_x2 - jnp.square(state.e_x)
    std = jnp.nan_to_num(jnp.sqrt(var))
    return jnp.maximum(std, state.std_epsilon)


def normalize(state: NormalizerState, x):
    out = (x - normalizer_mean(state)) / normalizer_std(state)
    return out.astype(jnp.float32)


def denormalize(state: NormalizerState, x):
    out = x * normalizer_std(state) + normalizer_mean(state)
    return out.astype(jnp.float32)
