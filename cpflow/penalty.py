"""Reference cpflow/penalty.py surface."""
from cpflow_tpu.ops.penalty import (cp_penalty_L1, cp_penalty_linear,  # noqa: F401
                                    make_regularization_function)
