"""Executing IR circuits as jax-traceable parametrized unitary functions.

Parity target: reference qiskit_circ_to_jax_unitary
(circuit_assembly.py:48-81) — turn a concrete circuit back into a function of
its rotation angles, with a conversion-correctness assert. Used when a
refined circuit needs device-side (re-)optimization of its angles.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np
import jax.numpy as jnp

from cpflow_tpu import config
from cpflow_tpu.circuits.ir import Circuit, ROTATION_NAMES
from cpflow_tpu.ops import gates
from cpflow_tpu.ops.losses import cost_HST
from cpflow_tpu.sim.apply import apply_gate_to_tensor


def circuit_to_jax_unitary(circ: Circuit, check: bool = True
                           ) -> Tuple[Callable, List[float], List[int]]:
    """Return (u_func, initial_angles, wires): u_func maps a vector of
    rotation angles to the circuit unitary, tracing through the device
    simulator; initial_angles/wires list the circuit's rotation parameters
    in order (reference circuit_assembly.py:48-81).

    Supports rotation gates (parametrized) plus any fixed gate in the IR
    (cz/cx/h/s/t/... embedded as numpy literals) and concrete-angle cp gates.
    """
    n = circ.num_qubits
    init_angles = [float(i.param) for i in circ.instructions
                   if i.name in ROTATION_NAMES]
    wires = [i.qubits[0] for i in circ.instructions
             if i.name in ROTATION_NAMES]

    def u_func(angles):
        u = jnp.eye(2 ** n, dtype=config.complex_dtype).reshape([2] * (2 * n))
        i = 0
        for inst in circ.instructions:
            if inst.name in ROTATION_NAMES:
                mat = gates.ROTATION_FROM_NAME[inst.name](angles[i])
                u = apply_gate_to_tensor(mat, u, [inst.qubits[0]])
                i += 1
            elif inst.name == 'cp':
                mat = gates.cp_mat(inst.param).reshape(2, 2, 2, 2)
                u = apply_gate_to_tensor(mat, u, list(inst.qubits))
            else:
                g = inst.gate_matrix().astype(np.complex64)
                g = g.reshape([2] * (2 * inst.num_qubits))
                u = apply_gate_to_tensor(g, u, list(inst.qubits))
        return u.reshape(2 ** n, 2 ** n)

    if check:
        cost = float(cost_HST(u_func(jnp.asarray(init_angles,
                                                 dtype=config.real_dtype)),
                              circ.unitary().astype(np.complex64)))
        assert cost < 1e-5, (
            f'Error converting circuit to jax unitary: HST distance {cost} '
            f'too high.')

    return u_func, init_angles, wires
