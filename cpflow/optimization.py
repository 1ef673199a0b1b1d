"""Reference cpflow/optimization.py surface."""
from cpflow_tpu.optimize import (mynimize, mynimize_repeated,  # noqa: F401
                                 unitary_learn)
from cpflow_tpu.optimize.engine import (adam_chain,  # noqa: F401
                                        angle_by_angle_chain,
                                        gradient_descent_chain,
                                        minimize_multistart,
                                        plain_hessian_preconditioner,
                                        plain_natural_preconditioner,
                                        sparse_hessian_preconditioner)
