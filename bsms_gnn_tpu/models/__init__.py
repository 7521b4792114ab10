"""Model layer: online normalizer state + the BSMS next-step simulator."""

from bsms_gnn_tpu.models.normalizer import (  # noqa: F401
    NormalizerState,
    init_normalizer,
    normalizer_accumulate,
    normalize,
    denormalize,
    normalizer_mean,
    normalizer_std,
)
from bsms_gnn_tpu.models.simulator import (  # noqa: F401
    SimulatorParams,
    SimulatorState,
    init_simulator,
    simulator_forward,
    simulator_warmup,
)
