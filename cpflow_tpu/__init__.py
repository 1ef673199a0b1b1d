"""cpflow_tpu: TPU-native variational quantum-circuit synthesis.

A ground-up JAX/XLA rebuild with the capabilities of idnm/cpflow
(arXiv:2205.01121): synthesize CZ + 1q-rotation circuits minimizing a loss on
unitaries (compilation, state preparation, relative-phase compilation) under
qubit-connectivity constraints, via CP-gate continuous relaxation, massive
multi-start Adam on TPU, TPE hyperparameter adaptation, and host-side
refinement to exact / Rational / Clifford+T circuits.

Public API mirrors the reference (__init__.py:5-10).
"""

from cpflow_tpu.api import (Ansatz, AdaptiveOptions, BasicOptions,
                            Decomposition, EntanglingBlock, LossSpec,
                            RegularizationOptions, Results, StaticOptions,
                            Synthesize)

__version__ = '0.1.0'

__all__ = [
    'Ansatz', 'AdaptiveOptions', 'BasicOptions', 'Decomposition',
    'EntanglingBlock', 'LossSpec', 'RegularizationOptions', 'Results',
    'StaticOptions', 'Synthesize',
]
