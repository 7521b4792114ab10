"""Training layer: optimizer/schedule, jitted train step, rollout, checkpoints."""

from bsms_gnn_tpu.training.schedule import warmup_cosine_schedule  # noqa: F401
from bsms_gnn_tpu.training.trainer import Trainer, TrainState  # noqa: F401
from bsms_gnn_tpu.training.rollout import rollout_trajectory, rollout_metrics  # noqa: F401
from bsms_gnn_tpu.training.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
