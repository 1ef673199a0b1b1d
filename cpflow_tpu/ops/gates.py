"""Quantum gate matrices, plus canned target unitaries.

Parity target: reference cpflow/gates.py:22-58 (rotation/CZ/CP matrices) and
cpflow/gates.py:95-106 (Toffoli target unitaries). Unlike the reference we do
not depend on qiskit: target unitaries are constructed directly in the
big-endian convention (qubit 0 = most significant bit), which is what the
reference obtains via ``Operator(qc.reverse_bits()).data``.

All module-level constants are **numpy** arrays, not jnp: they are embedded
as literals at trace time (no host->device transfer at import, no
device->host copy during lowering). Angle-parametrized matrices are built
from traced jnp ops so they differentiate and vmap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cpflow_tpu import config

# --- Single-qubit Pauli matrices (host constants) ----------------------------

x_mat = np.array([[0, 1], [1, 0]], dtype=np.complex64)
y_mat = np.array([[0, -1j], [1j, 0]], dtype=np.complex64)
z_mat = np.array([[1, 0], [0, -1]], dtype=np.complex64)

_I2 = np.eye(2, dtype=np.complex64)


def rotation_matrix(pauli, a):
    """exp(-i a P / 2) = cos(a/2) I - i sin(a/2) P   (reference gates.py:22-23)."""
    a = jnp.asarray(a, dtype=config.real_dtype)
    return (jnp.cos(a / 2) * _I2 - 1j * jnp.sin(a / 2) * pauli).astype(config.complex_dtype)


def rx_mat(a):
    return rotation_matrix(x_mat, a)


def ry_mat(a):
    return rotation_matrix(y_mat, a)


def rz_mat(a):
    return rotation_matrix(z_mat, a)


# --- Two-qubit gates ----------------------------------------------------------

cx_mat = np.array(
    [[1, 0, 0, 0],
     [0, 1, 0, 0],
     [0, 0, 0, 1],
     [0, 0, 1, 0]], dtype=np.complex64)

cz_mat = np.array(
    [[1, 0, 0, 0],
     [0, 1, 0, 0],
     [0, 0, 1, 0],
     [0, 0, 0, -1]], dtype=np.complex64)

_CP_BASE = np.diag([1, 1, 1, 0]).astype(np.complex64)
_CP_PHASE = np.diag([0, 0, 0, 1]).astype(np.complex64)


def cp_mat(a):
    """Controlled-phase gate: identity at a=0 or 2pi, CZ at a=pi (gates.py:51-58).

    diag(1, 1, 1, e^{ia}).
    """
    a = jnp.asarray(a, dtype=config.real_dtype)
    phase = jnp.exp(1j * a.astype(config.complex_dtype))
    return (_CP_BASE + phase * _CP_PHASE).astype(config.complex_dtype)


ROTATION_MATS = {'x': rx_mat, 'y': ry_mat, 'z': rz_mat}
ROTATION_FROM_NAME = {'rx': rx_mat, 'ry': ry_mat, 'rz': rz_mat}


# --- Canned target unitaries (big-endian: qubit 0 = MSB; host numpy) ---------

def multi_controlled_z(num_qubits: int) -> np.ndarray:
    """C^{n-1}Z: diagonal with -1 on the all-ones state. Basis-order agnostic."""
    d = 2 ** num_qubits
    diag = np.ones(d, dtype=np.complex64)
    diag[d - 1] = -1
    return np.diag(diag)


def multi_controlled_x(num_qubits: int) -> np.ndarray:
    """C^{n-1}X (generalized Toffoli), target = last qubit, big-endian.

    Swaps the basis states |1...10> and |1...11>. Matches the reference's
    u_toff{3,4,5} = Operator(mct(...).reverse_bits()).data (gates.py:95-106).
    """
    d = 2 ** num_qubits
    u = np.eye(d, dtype=np.complex64)
    u[d - 2, d - 2] = u[d - 1, d - 1] = 0
    u[d - 2, d - 1] = u[d - 1, d - 2] = 1
    return u


def multi_controlled_sqrt_x(num_qubits: int) -> np.ndarray:
    """C^{n-1}(sqrt X): identity except the bottom 2x2 block, which is the
    principal square root of X (paper/CPFlow.tex sec toff5: the C3-sqrt-X
    block of the 48-CZ chain toffoli-5 construction)."""
    d = 2 ** num_qubits
    u = np.eye(d, dtype=np.complex64)
    sx = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]],
                        dtype=np.complex64)
    u[d - 2:, d - 2:] = sx
    return u


def multi_controlled_x_root(num_qubits: int, root: int) -> np.ndarray:
    """C^{n-1}(X^(1/root)): identity except the bottom 2x2 block, the
    principal root-th root of X. X = H Z H, so X^(1/r) = H diag(1,
    e^{i pi/r}) H — root=2 reproduces multi_controlled_sqrt_x; root=4 is
    the inner block of the toffoli-7 V-recursion (benchmarks/composite.py
    build_c5sqrtx_connected, verified exact in tests/test_compat_shim.py)."""
    d = 2 ** num_qubits
    u = np.eye(d, dtype=np.complex64)
    w = np.exp(1j * np.pi / root)
    v = 0.5 * np.array([[1 + w, 1 - w], [1 - w, 1 + w]])
    u[d - 2:, d - 2:] = v.astype(np.complex64)
    return u


u_toff3 = multi_controlled_x(3)
u_toff4 = multi_controlled_x(4)
u_toff5 = multi_controlled_x(5)

u_ccz3 = multi_controlled_z(3)
u_cccz4 = multi_controlled_z(4)
