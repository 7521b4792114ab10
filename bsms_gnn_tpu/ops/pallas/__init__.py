"""Pallas TPU kernels for the aggregation hot path.

`segment_sum_pallas` returns None when the kernel does not apply (wrong
platform / unsupported shape), letting callers fall back to the ELL path.
"""

from bsms_gnn_tpu.ops.pallas.segment_sum import (  # noqa: F401
    segment_sum_accum,
    segment_sum_accum_raw,
    segment_sum_accum_send_raw,
    segment_sum_pallas,
    segment_sum_raw,
    segment_sum_send_pallas,
)
