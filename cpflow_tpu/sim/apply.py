"""Applying k-qubit gates to 2n-leg unitary tensors.

Behavioral parity target: reference cpflow/circuit_assembly.py (left-multiply
a gate into an accumulated unitary kept as a [2]*2n tensor, first n legs =
output/row indices, last n = input/column indices).

Implementation is the per-restart statement of the batched hot path's idiom
(sim/batched.py:_apply_gate_batched): move the placement legs to the front
with one static permutation, contract the flattened gate matrix against the
flattened remainder, and restore the layout with the argsort-inverse of the
same permutation. Placements are compile-time constants, so XLA sees fixed
contractions and layout changes and fuses the whole gate chain.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cpflow_tpu import config


def inverse_leg_permutation(n_qubits, placement):
    """Inverse of the move-placement-legs-to-front permutation, restricted to
    the n row legs: position q of the result names where leg q sits after a
    contraction has left the gate's output legs (in placement order) at the
    front and the untouched legs behind them."""
    front = list(placement) + [q for q in range(n_qubits) if q not in placement]
    return [int(i) for i in np.argsort(front)]


def apply_gate_to_tensor(gate, tensor, placement):
    """Left-multiply `gate` into `tensor` at the row legs in `placement`.

    gate: [2]*2k tensor (or any shape reshapeable to (2^k, 2^k));
    tensor: [2]*2n; placement: the k row legs the gate acts on, in gate-leg
    order (so a twisted placement like [3, 1] puts gate leg 0 on qubit 3).
    """
    n = tensor.ndim // 2
    k = len(placement)
    dim_g = 2 ** k

    front = list(placement) + [q for q in range(n) if q not in placement]
    perm = front + list(range(n, 2 * n))
    moved = jnp.transpose(tensor, perm).reshape(dim_g, -1)

    out = jnp.matmul(jnp.reshape(gate, (dim_g, dim_g)), moved,
                     precision=config.PRECISION)

    return jnp.transpose(out.reshape([2] * (2 * n)), np.argsort(perm))
