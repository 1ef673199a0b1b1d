"""Drop-in compatibility package: the reference's import surface
(`from cpflow import ...`, reference cpflow/__init__.py) backed by the
TPU-native implementation in cpflow_tpu.

Reference-style scripts and notebooks (paper/peppar.ipynb,
tutorial/CPFlow_tutorial.ipynb) import from here unchanged; each submodule
below mirrors one reference module. Qiskit interop in those notebooks is
orthogonal (install qiskit if you need it — nothing here depends on it).
"""

from cpflow_tpu import __version__  # noqa: F401
from cpflow_tpu.api import (Ansatz, AdaptiveOptions, BasicOptions,  # noqa: F401
                            Decomposition, EntanglingBlock, LossSpec,
                            RegularizationOptions, Results, StaticOptions,
                            Synthesize)

__all__ = [
    'Ansatz', 'AdaptiveOptions', 'BasicOptions', 'Decomposition',
    'EntanglingBlock', 'LossSpec', 'RegularizationOptions', 'Results',
    'StaticOptions', 'Synthesize',
]
