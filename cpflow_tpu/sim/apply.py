"""Applying k-qubit gates to 2n-leg unitary tensors.

Parity target: reference cpflow/circuit_assembly.py:7-45. The accumulated
unitary is kept as a tensor of shape [2]*2n (first n legs = output/row
indices, last n = input/column). Left-multiplying by a gate at `placement`
is a tensordot over the placement legs followed by a *static* transpose —
placements are compile-time constants, so XLA sees fixed contractions and
layout changes and fuses the whole gate chain.
"""

from __future__ import annotations

import jax.numpy as jnp

from cpflow_tpu import config


def gate_transposition(placement):
    """Transposition induced by the initial placement of the gate
    (circuit_assembly.py:7-13)."""
    position_index = [(placement[i], i) for i in range(len(placement))]
    position_index.sort()
    return [i for _, i in position_index]


def transposition(n_qubits, placement):
    """Permutation that moves the gate's output legs back into `placement`
    positions after a tensordot (circuit_assembly.py:16-28).

    Example: n=6, placement=[1,3] -> [2,0,3,1,4,5];
             twisted [3,1] -> [2,1,3,0,4,5].
    """
    gate_width = len(placement)
    t = list(range(gate_width, n_qubits))
    for position, insertion in zip(sorted(placement), gate_transposition(placement)):
        t.insert(position, insertion)
    return t


def apply_gate_to_tensor(gate, tensor, placement):
    """Left-multiply `gate` into `tensor` at the output legs in `placement`
    (circuit_assembly.py:31-45)."""
    gate_width = len(gate.shape) // 2
    tensor_width = len(tensor.shape) // 2

    gate_contraction_axes = list(range(gate_width, 2 * gate_width))
    contraction = jnp.tensordot(gate, tensor, axes=[gate_contraction_axes, list(placement)],
                                precision=config.PRECISION)

    t = transposition(tensor_width, placement) + list(range(tensor_width, 2 * tensor_width))
    return jnp.transpose(contraction, axes=t)
