"""Circuit IR, QASM parsing, Euler decomposition, and transformation passes."""

import math

import numpy as np
import pytest

from cpflow_tpu.circuits import euler, passes
from cpflow_tpu.circuits.ir import Circuit, Instruction, parse_qasm


def random_u2(seed):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    q, _ = np.linalg.qr(m)
    return q


def test_circuit_unitary_cz_bell_structure():
    c = Circuit(2)
    c.h(1)
    c.cz(0, 1)
    c.h(1)
    # H1 CZ H1 == CX (control 0, target 1), big-endian
    expected = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                        dtype=complex)
    np.testing.assert_allclose(c.unitary(), expected, atol=1e-12)


def test_circuit_unitary_matches_jax_sim():
    """Host IR unitary vs the device simulator on the same gate sequence."""
    import jax.numpy as jnp
    from cpflow_tpu.sim.apply import apply_gate_to_tensor
    from cpflow_tpu.ops import gates

    c = Circuit(3)
    c.rx(0.3, 0).cz(0, 2).ry(1.1, 1).cp(2.2, 2, 1).rz(0.7, 2)

    u_host = c.unitary()

    u = jnp.eye(8, dtype=jnp.complex64).reshape([2] * 6)
    u = apply_gate_to_tensor(gates.rx_mat(0.3), u, [0])
    u = apply_gate_to_tensor(jnp.array(gates.cz_mat).reshape(2, 2, 2, 2), u, [0, 2])
    u = apply_gate_to_tensor(gates.ry_mat(1.1), u, [1])
    u = apply_gate_to_tensor(gates.cp_mat(2.2).reshape(2, 2, 2, 2), u, [2, 1])
    u = apply_gate_to_tensor(gates.rz_mat(0.7), u, [2])
    u_dev = np.asarray(u.reshape(8, 8))

    np.testing.assert_allclose(u_host, u_dev, atol=1e-5)


def test_counts_and_depth():
    c = Circuit(3)
    c.cz(0, 1).cz(1, 2).cz(0, 1).rx(0.5, 2)
    assert c.gates_count(['cz']) == 3
    assert c.gates_depth(['cz']) == 3  # all three chain through shared qubits
    assert c.count_ops() == {'cz': 3, 'rx': 1}


def test_cz_depth_chain():
    c = Circuit(3)
    c.cz(0, 1).cz(1, 2)
    assert c.gates_depth(['cz']) == 2
    c2 = Circuit(4)
    c2.cz(0, 1).cz(2, 3)
    assert c2.gates_depth(['cz']) == 1


def test_qasm_roundtrip():
    c = Circuit(3)
    c.h(0).cx(0, 1).t(2).tdg(1).x(0).rz(0.25, 2)
    text = c.to_qasm()
    c2 = parse_qasm(text)
    assert c2.num_qubits == 3
    np.testing.assert_allclose(c2.unitary(), c.unitary(), atol=1e-12)


def test_qasm_benchmark_files():
    import glob
    files = sorted(glob.glob('/root/reference/paper/benchmark_circuits/*/*.qasm'))
    assert len(files) == 15
    for f in files:
        c = Circuit.from_qasm_file(f)
        assert c.num_qubits == 5
        u = c.unitary()
        np.testing.assert_allclose(u @ u.conj().T, np.eye(32), atol=1e-9)


def test_qasm_pi_expressions():
    text = 'OPENQASM 2.0;\nqreg q[1];\nrz(pi/2) q[0];\nrx(-3*pi/4) q[0];\n'
    c = parse_qasm(text)
    assert c.instructions[0].param == pytest.approx(math.pi / 2)
    assert c.instructions[1].param == pytest.approx(-3 * math.pi / 4)


def test_zxz_angles_random():
    for seed in range(20):
        u = random_u2(seed)
        z1, x1, z2 = euler.zxz_angles(u)
        v = euler.zxz_reconstruct(z1, x1, z2)
        # equal up to global phase
        d = passes.hst_distance(u, v)
        assert d < 1e-12, f"seed {seed}: hst {d}"


def test_zxz_angles_degenerate():
    for u in [np.eye(2), np.diag([1, 1j]), np.array([[0, 1], [1, 0]]),
              np.array([[0, -1j], [-1j, 0]])]:
        z1, x1, z2 = euler.zxz_angles(np.asarray(u, dtype=complex))
        v = euler.zxz_reconstruct(z1, x1, z2)
        assert passes.hst_distance(np.asarray(u, dtype=complex), v) < 1e-12


def test_cp_to_cz_projection():
    c = Circuit(2)
    c.rx(0.4, 0)
    c.cp(math.pi - 1e-8, 0, 1)   # -> cz
    c.cp(1e-9, 1, 0)             # -> dropped
    new = passes.cp_to_cz_circuit(c, cp_threshold=0.01)
    ops = new.count_ops()
    assert ops.get('cz', 0) == 1
    assert 'cp' not in ops


def test_cp_to_cz_residual():
    c = Circuit(2)
    c.cp(1.3, 0, 1)  # residual: must expand to exactly 2 CZ + rotations
    new = passes.cp_to_cz_circuit(c, cp_threshold=0.01)
    assert new.gates_count(['cz']) == 2
    assert 'cp' not in new.count_ops()
    assert passes.hst_distance(new.unitary(), c.unitary()) < 1e-12


def test_convert_to_zxz():
    c = Circuit(2)
    c.h(0).t(0).rx(0.7, 0).cz(0, 1).s(1).rz(0.2, 1).h(1)
    new = passes.convert_to_zxz(c)
    # only rz/rx/cz remain, 1q runs merged into zxz triples
    assert set(new.count_ops()) <= {'rz', 'rx', 'cz'}
    assert passes.hst_distance(new.unitary(), c.unitary()) < 1e-12


def test_remove_zero_rgates():
    c = Circuit(1)
    c.rz(1e-9, 0).rx(0.5, 0).ry(0.0, 0)
    new = passes.remove_zero_rgates(c)
    assert new.count_ops() == {'rx': 1}


def test_rationalize():
    c = Circuit(1)
    c.rz(math.pi / 4 + 1e-7, 0).rx(1.113, 0)  # 1.113 is >1e-3 from any pi*p/q, q<=32
    new = passes.rationalize_all_rgates(c, max_denominator=32, angle_threshold=1e-3)
    assert new.instructions[0].param == pytest.approx(math.pi / 4, abs=1e-12)
    assert new.instructions[1].param == pytest.approx(1.113)
    assert passes.angle_is_rational(new.instructions[0].param, 5)
    assert not passes.angle_is_rational(new.instructions[1].param, 5)
    assert not passes.all_rgates_are_rational(new, 5)
    only_rational = Circuit(1).rz(math.pi / 2, 0).rx(-math.pi, 0)
    assert passes.all_rgates_are_rational(only_rational, 5)


def test_project_circuit():
    c = Circuit(1)
    c.rz(math.pi / 4, 0).rx(math.pi, 0).rz(-math.pi / 2, 0)
    new = passes.project_circuit(c, threshold=1e-6)
    ops = new.count_ops()
    assert ops.get('t', 0) == 1
    assert ops.get('x', 0) == 1
    assert ops.get('sdg', 0) == 1
    assert 'rz' not in ops and 'rx' not in ops


def test_move_and_merge_rgates():
    c = Circuit(2)
    c.rz(0.3, 0).h(0).rx(0.2, 1).cz(0, 1).rx(0.4, 1)
    moved = passes.move_all_rgates(c)
    assert passes.hst_distance(moved.unitary(), c.unitary()) < 1e-12
    merged = passes.merge_all_rgates(moved)
    assert passes.hst_distance(merged.unitary(), c.unitary()) < 1e-12
    # the two rx on wire 1 commute past cz and should merge
    assert merged.gates_count(['rx']) + merged.gates_count(['rz']) \
        < c.gates_count(['rx']) + c.gates_count(['rz']) + 1


def test_check_approximation_raises():
    c1 = Circuit(1).x(0)
    c2 = Circuit(1).z(0)
    with pytest.raises(ValueError):
        passes.check_approximation(c1, c2)


def test_draw_smoke():
    c = Circuit(2).h(0).cz(0, 1).rx(0.5, 1)
    s = c.draw()
    assert 'q0' in s and 'q1' in s


def test_qasm_expr_rejects_non_arithmetic():
    from cpflow_tpu.circuits.ir import _eval_qasm_expr
    import math as _math
    import pytest as _pytest

    assert _eval_qasm_expr('3*pi/4') == _pytest.approx(3 * _math.pi / 4)
    assert _eval_qasm_expr('-pi/2') == _pytest.approx(-_math.pi / 2)
    assert _eval_qasm_expr(' 2e-1 ') == _pytest.approx(0.2)
    for bad in ('pie', 'ee1', 'pi**2', '__import__("os")', 'pi(1)', ''):
        with _pytest.raises(ValueError):
            _eval_qasm_expr(bad)
