"""Gate matrices vs closed forms (SURVEY.md §4 tier (a))."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpflow_tpu.ops import gates


def test_paulis():
    for m in [gates.x_mat, gates.y_mat, gates.z_mat]:
        np.testing.assert_allclose(np.asarray(m @ m), np.eye(2), atol=1e-7)


@pytest.mark.parametrize("rot,pauli", [
    (gates.rx_mat, gates.x_mat),
    (gates.ry_mat, gates.y_mat),
    (gates.rz_mat, gates.z_mat),
])
def test_rotation_closed_form(rot, pauli):
    for a in [0.0, 0.3, np.pi / 2, np.pi, 2.7, -1.1]:
        expected = np.cos(a / 2) * np.eye(2) - 1j * np.sin(a / 2) * np.asarray(pauli)
        np.testing.assert_allclose(np.asarray(rot(a)), expected, atol=1e-6)


def test_rotations_unitary():
    for rot in [gates.rx_mat, gates.ry_mat, gates.rz_mat]:
        u = np.asarray(rot(0.77))
        np.testing.assert_allclose(u @ u.conj().T, np.eye(2), atol=1e-6)


def test_cp_endpoints():
    np.testing.assert_allclose(np.asarray(gates.cp_mat(0.0)), np.eye(4), atol=1e-7)
    np.testing.assert_allclose(np.asarray(gates.cp_mat(2 * np.pi)), np.eye(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gates.cp_mat(np.pi)), np.asarray(gates.cz_mat), atol=1e-6)


def test_cp_general():
    a = 1.234
    expected = np.diag([1, 1, 1, np.exp(1j * a)])
    np.testing.assert_allclose(np.asarray(gates.cp_mat(a)), expected, atol=1e-6)


def test_toffoli3_structure():
    """CCX big-endian: swaps |110> and |111>, identity elsewhere."""
    u = np.asarray(gates.u_toff3)
    expected = np.eye(8)
    expected[6, 6] = expected[7, 7] = 0
    expected[6, 7] = expected[7, 6] = 1
    np.testing.assert_allclose(u, expected, atol=1e-7)


def test_mcz():
    u = np.asarray(gates.multi_controlled_z(3))
    expected = np.diag([1, 1, 1, 1, 1, 1, 1, -1])
    np.testing.assert_allclose(u, expected, atol=1e-7)


def test_toffoli_sizes():
    assert gates.u_toff4.shape == (16, 16)
    assert gates.u_toff5.shape == (32, 32)
    # involutory and unitary
    for u in [gates.u_toff4, gates.u_toff5]:
        un = np.asarray(u)
        np.testing.assert_allclose(un @ un, np.eye(un.shape[0]), atol=1e-7)


def test_multi_controlled_sqrt_x():
    for n in (3, 4):
        sx = gates.multi_controlled_sqrt_x(n)
        d = 2 ** n
        assert np.allclose(sx @ sx.conj().T, np.eye(d), atol=1e-6)
        assert np.allclose(sx @ sx, gates.multi_controlled_x(n), atol=1e-6)
        # identity outside the controlled 2x2 block
        assert np.allclose(sx[:d - 2, :d - 2], np.eye(d - 2))


def test_new_topology_layers():
    from cpflow_tpu.topology import (kite_layer, square_layer,
                                     num_qubits_from_layer)
    k = kite_layer()
    s = square_layer(4)
    assert num_qubits_from_layer(k) == 4 and len(k) == 4
    assert num_qubits_from_layer(s) == 4 and len(s) == 4
    # square is a simple cycle: every qubit has degree 2
    deg = {}
    for a, b in s:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(v == 2 for v in deg.values())
