"""Orbax checkpointing of the full train state.

Replaces reference `torch.save(model.state_dict())` (`trainer.py:158-169`)
and fixes its resume gap (`trainer.py:188-193`: optimizer state never
restored): the whole pytree — params, optimizer state, normalizer statistics
(which the reference smuggles through `state_dict` via non-grad Parameters,
`normalizer.py:28-36`), and step — round-trips.

Layout mirrors the reference: `{dump_dir}/ckpts/{project}/{dataset}/{stamp}/`
with one directory per step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with _checkpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def restore_checkpoint(ckpt_dir: str, step: int, template: Any) -> Any:
    """Restore into the structure of `template` (an initialized state)."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    with _checkpointer() as ckptr:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)


def latest_step(ckpt_dir: str) -> int:
    """Largest step with a saved checkpoint, or -1."""
    if not os.path.isdir(ckpt_dir):
        return -1
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps, default=-1)
