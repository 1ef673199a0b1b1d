"""Reference cpflow/main.py surface."""
from cpflow_tpu.api import (Ansatz, AdaptiveOptions, BasicOptions,  # noqa: F401
                            Decomposition, EntanglingBlock, LossSpec,
                            RegularizationOptions, Results, StaticOptions,
                            Synthesize)
from cpflow_tpu.sim.ansatz_kernel import build_unitary  # noqa: F401
