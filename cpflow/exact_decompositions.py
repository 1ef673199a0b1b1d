"""Reference cpflow/exact_decompositions.py surface."""
from cpflow_tpu.circuits.passes import (check_approximation,  # noqa: F401
                                        check_loss, cp_to_cz_circuit,
                                        rationalize_all_rgates,
                                        remove_zero_rgates)
from cpflow_tpu.circuits.passes import convert_to_zxz  # noqa: F401
from cpflow_tpu.circuits.refine import reduce_angles, refine  # noqa: F401
from cpflow_tpu.circuits.clifford_t import solovay_kitaev  # noqa: F401

# reference spells the ZXZ pass in caps
convert_to_ZXZ = convert_to_zxz


def gates_count(circuit, gate_names=('cz',)):
    """Reference gates_count(qc, names) contract on our IR circuits."""
    return circuit.gates_count(list(gate_names))


def gates_depth(circuit, gate_names=('cz',)):
    return circuit.gates_depth(list(gate_names))
