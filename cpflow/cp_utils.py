"""Reference cpflow/cp_utils.py surface (the reference re-exports the
regularization factory here too; the tutorial imports it from this path)."""
from cpflow_tpu.ops.penalty import make_regularization_function  # noqa: F401
from cpflow_tpu.optimize.candidates import (constrained_function,  # noqa: F401
                                            convert_cp_to_cz,
                                            evaluate_cp_result,
                                            filter_cp_results, insert_params,
                                            project_cp_angles,
                                            random_cp_angles,
                                            verify_cp_result)
