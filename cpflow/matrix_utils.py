"""Reference cpflow/matrix_utils.py surface."""
from cpflow_tpu.ops.losses import (cost_HST, disc, disc2_swap,  # noqa: F401
                                   disc_modulo_diagonal,
                                   disc_modulo_identity, fubini_study,
                                   tensor_diagonal_loss, tensor_identity_loss,
                                   theoretical_lower_bound, trace_prod)
