"""Simulator vs a dense-matmul oracle (SURVEY.md §4: gradient correctness and
contraction semantics are the single hottest code path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpflow_tpu.ops import gates
from cpflow_tpu.sim.apply import apply_gate_to_tensor, inverse_leg_permutation
from cpflow_tpu.sim import ansatz_kernel as ak
from cpflow_tpu.topology import fill_layers, chain_layer, connected_layer


def embed_gate(gate, placement, n):
    """Independent oracle: dense 2^n x 2^n matrix of `gate` acting on qubits
    `placement` (big-endian bit order: qubit 0 = MSB)."""
    gate = np.asarray(gate).reshape(2 ** len(placement), 2 ** len(placement))
    d = 2 ** n
    full = np.zeros((d, d), dtype=complex)
    others = [q for q in range(n) if q not in placement]
    for r in range(d):
        rbits = [(r >> (n - 1 - q)) & 1 for q in range(n)]
        for c in range(d):
            cbits = [(c >> (n - 1 - q)) & 1 for q in range(n)]
            if any(rbits[q] != cbits[q] for q in others):
                continue
            gr = sum(rbits[q] << (len(placement) - 1 - i) for i, q in enumerate(placement))
            gc = sum(cbits[q] << (len(placement) - 1 - i) for i, q in enumerate(placement))
            full[r, c] = gate[gr, gc]
    return full


def test_inverse_leg_permutation_examples():
    # same layout-restoring permutations the reference documents
    # (circuit_assembly.py:16-19), derived here as an argsort inverse
    assert inverse_leg_permutation(6, [1, 3]) == [2, 0, 3, 1, 4, 5]
    assert inverse_leg_permutation(6, [3, 1]) == [2, 1, 3, 0, 4, 5]


@pytest.mark.parametrize("n,placement", [
    (2, [0]), (2, [1]), (2, [0, 1]), (2, [1, 0]),
    (3, [0, 2]), (3, [2, 0]), (3, [1, 2]),
    (4, [1, 3]), (4, [3, 1]), (4, [2, 0]),
])
def test_apply_gate_matches_dense_oracle(n, placement):
    rng = np.random.default_rng(42)
    k = len(placement)
    g_np = rng.normal(size=(2 ** k, 2 ** k)) + 1j * rng.normal(size=(2 ** k, 2 ** k))
    u_np = rng.normal(size=(2 ** n, 2 ** n)) + 1j * rng.normal(size=(2 ** n, 2 ** n))

    gate = jnp.array(g_np, dtype=jnp.complex64).reshape([2] * (2 * k))
    u = jnp.array(u_np, dtype=jnp.complex64).reshape([2] * (2 * n))

    result = np.asarray(apply_gate_to_tensor(gate, u, placement)).reshape(2 ** n, 2 ** n)
    expected = embed_gate(g_np, placement, n) @ u_np
    np.testing.assert_allclose(result, expected, atol=1e-4)


def test_block_matrix_cp_identity_angles():
    # CP(0) with zero rotations = identity block
    angles = jnp.zeros(2 * 3 + 1)
    u = np.asarray(ak.block_matrix('cp', 'xyz', angles))
    np.testing.assert_allclose(u, np.eye(4), atol=1e-6)


def test_block_matrix_composition_oracle():
    rng = np.random.default_rng(0)
    angles = jnp.array(rng.uniform(0, 2 * np.pi, size=5), dtype=jnp.float32)
    u = np.asarray(ak.block_matrix('cp', 'xz', angles))
    # oracle: kron(rz(a2),rz(a3)) @ kron(rx(a0),rx(a1)) @ cp(a4)
    rx = lambda a: np.cos(a / 2) * np.eye(2) - 1j * np.sin(a / 2) * np.array([[0, 1], [1, 0]])
    rz = lambda a: np.cos(a / 2) * np.eye(2) - 1j * np.sin(a / 2) * np.diag([1, -1])
    a = np.asarray(angles)
    expected = (np.kron(rz(a[2]), rz(a[3])) @ np.kron(rx(a[0]), rx(a[1]))
                @ np.diag([1, 1, 1, np.exp(1j * a[4])]))
    np.testing.assert_allclose(u, expected, atol=1e-5)


def test_split_angles_layout():
    n, nba = 3, 7  # cp + xyz
    total = 3 * n + 5 * nba
    angles = jnp.arange(total, dtype=jnp.float32)
    d = ak.split_angles(angles, n, nba, layer_len=2, num_layers=2)
    assert d['surface angles'].shape == (3, 3)
    assert d['block angles'].shape == (5, nba)
    assert d['layers angles'].shape == (2, 2, nba)
    assert d['free block angles'].shape == (1, nba)
    # cp angles sit at the last slot of each block
    np.testing.assert_array_equal(
        np.asarray(jnp.array(d['cp angles'])),
        np.asarray(d['block angles'][:, -1]))


def test_cp_angle_indices():
    idx = ak.cp_angle_indices(3, 7, 5)
    total = 3 * 3 + 5 * 7
    angles = jnp.arange(total, dtype=jnp.float32)
    d = ak.split_angles(angles, 3, 7)
    np.testing.assert_array_equal(np.asarray(angles[jnp.array(idx)]),
                                  np.asarray(d['block angles'][:, -1]))


@pytest.mark.parametrize("n,k,rot,layer_fn", [
    (2, 3, 'xz', chain_layer),
    (3, 5, 'xyz', chain_layer),
    (3, 4, 'xz', connected_layer),
])
def test_build_unitary_is_unitary(n, k, rot, layer_fn):
    placements = fill_layers(layer_fn(n), k)
    nba = ak.num_block_angles('cp', rot)
    num_angles = 3 * n + nba * k
    rng = np.random.default_rng(7)
    angles = jnp.array(rng.uniform(0, 2 * np.pi, num_angles), dtype=jnp.float32)
    u = np.asarray(ak.build_unitary(n, 'cp', rot, placements, angles))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(2 ** n), atol=1e-4)


def test_build_unitary_vs_sequential_oracle():
    """Full forward pass against an independent numpy composition."""
    n, k, rot = 3, 4, 'xz'
    layer = chain_layer(n)  # [[0,1],[1,2]]
    placements = fill_layers(layer, k)  # 2 complete layers, no free blocks
    nba = ak.num_block_angles('cp', rot)
    num_angles = 3 * n + nba * k
    rng = np.random.default_rng(3)
    angles_np = rng.uniform(0, 2 * np.pi, num_angles)
    angles = jnp.array(angles_np, dtype=jnp.float32)

    u = np.asarray(ak.build_unitary(n, 'cp', rot, placements, angles))

    # oracle
    rx = lambda a: np.cos(a / 2) * np.eye(2) - 1j * np.sin(a / 2) * np.array([[0, 1], [1, 0]])
    rz = lambda a: np.cos(a / 2) * np.eye(2) - 1j * np.sin(a / 2) * np.diag([1, -1])
    expected = np.eye(2 ** n, dtype=complex)
    sa = angles_np[:3 * n].reshape(n, 3)
    for q in range(n):
        g = rz(sa[q, 2]) @ rx(sa[q, 1]) @ rz(sa[q, 0])
        expected = embed_gate(g, [q], n) @ expected
    blocks = angles_np[3 * n:].reshape(k, nba)
    all_placements = layer * 2
    for b in range(k):
        a = blocks[b]
        block = (np.kron(rz(a[2]), rz(a[3])) @ np.kron(rx(a[0]), rx(a[1]))
                 @ np.diag([1, 1, 1, np.exp(1j * a[4])]))
        expected = embed_gate(block, all_placements[b], n) @ expected

    np.testing.assert_allclose(u, expected, atol=1e-4)


def test_build_unitary_with_free_blocks():
    """Depth not divisible by layer length exercises the free-block path."""
    n, k = 3, 3
    layer = chain_layer(n)  # len 2 -> 1 complete layer + 1 free block
    placements = fill_layers(layer, k)
    assert placements['free'] == [[0, 1]]
    nba = ak.num_block_angles('cp', 'xz')
    num_angles = 3 * n + nba * k
    angles = jnp.linspace(0.1, 5.9, num_angles)
    u = np.asarray(ak.build_unitary(n, 'cp', 'xz', placements, angles))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-4)


@pytest.mark.slow
def test_build_unitary_grad_finite_difference():
    n, k = 2, 2
    placements = fill_layers(chain_layer(n), k)
    nba = ak.num_block_angles('cp', 'xz')
    num_angles = 3 * n + nba * k
    target = np.asarray(gates.cz_mat)

    def loss(angles):
        u = ak.build_unitary(n, 'cp', 'xz', placements, angles)
        return 1 - jnp.abs((u * jnp.array(target).conj()).sum()) ** 2 / 16

    angles = jnp.linspace(0.2, 5.0, num_angles)
    g = np.asarray(jax.grad(loss)(angles))
    eps = 1e-3
    for i in range(num_angles):
        e = np.zeros(num_angles)
        e[i] = eps
        fd = (float(loss(angles + e)) - float(loss(angles - e))) / (2 * eps)
        assert g[i] == pytest.approx(fd, abs=3e-3)


def test_build_unitary_vmap_jit():
    n, k = 3, 4
    placements = fill_layers(chain_layer(n), k)
    nba = ak.num_block_angles('cp', 'xyz')
    num_angles = 3 * n + nba * k
    batch = jnp.array(np.random.default_rng(0).uniform(0, 6.28, (16, num_angles)),
                      dtype=jnp.float32)
    f = jax.jit(jax.vmap(lambda a: ak.build_unitary(n, 'cp', 'xyz', placements, a)))
    us = np.asarray(f(batch))
    assert us.shape == (16, 8, 8)
    for u in us:
        np.testing.assert_allclose(u @ u.conj().T, np.eye(8), atol=1e-4)


def test_trig_min_angle():
    from cpflow_tpu.ops.trig import min_angle
    rng = np.random.default_rng(5)
    for _ in range(10):
        f0, f1, c = rng.normal(size=3)
        F = lambda x: f0 * jnp.cos(x) + f1 * jnp.sin(x) + c
        a = float(min_angle(F))
        xs = np.linspace(-np.pi, np.pi, 20001)
        brute = xs[np.argmin(f0 * np.cos(xs) + f1 * np.sin(xs) + c)]
        # compare function values (argmin may differ by 2pi)
        assert float(F(a)) == pytest.approx(
            f0 * np.cos(brute) + f1 * np.sin(brute) + c, abs=1e-3)


def test_circuit_to_jax_unitary_roundtrip():
    """Parity with reference qiskit_circ_to_jax_unitary (circuit_assembly.py:48-81)."""
    import jax.numpy as jnp
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.sim.circuit_exec import circuit_to_jax_unitary

    c = Circuit(3)
    c.rz(0.3, 0).h(1).cz(0, 1).rx(1.2, 2).cp(2.0, 1, 2).ry(0.5, 1).t(0)
    u_func, angles, wires = circuit_to_jax_unitary(c)
    assert wires == [0, 2, 1]
    assert len(angles) == 3
    u = np.asarray(u_func(jnp.array(angles, dtype=jnp.float32)))
    np.testing.assert_allclose(u, c.unitary(), atol=1e-5)
    # different angles -> different unitary, still unitary
    u2 = np.asarray(u_func(jnp.array([1.0, 2.0, 3.0], dtype=jnp.float32)))
    np.testing.assert_allclose(u2 @ u2.conj().T, np.eye(8), atol=1e-5)


def test_insert_params_and_constrained_function():
    import jax.numpy as jnp
    from cpflow_tpu.optimize.candidates import insert_params, constrained_function

    res = insert_params(jnp.array([0., 1., 2., 3.]),
                        jnp.array([-1., -2., -4.]), [0, 2, 4])
    np.testing.assert_allclose(np.asarray(res), [-1, 0, -2, 1, -4, 2, 3])

    f = lambda xs: (xs ** 2).sum()
    cf = constrained_function(f, jnp.array([1., 10.]), [0, 2])
    assert float(cf(jnp.array([2.]))) == pytest.approx(1 + 4 + 100)
