"""Shared utilities: timing/ETA, console metrics, seeding."""

from bsms_gnn_tpu.utils.timing import TicToc, timeit, simple_timeit  # noqa: F401
from bsms_gnn_tpu.utils.logging import board_loss, print_error_table, MetricLogger  # noqa: F401
