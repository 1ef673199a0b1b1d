"""Loss functions vs closed forms and structural oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from cpflow_tpu.ops import gates, losses


def random_unitary(n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    q, _ = np.linalg.qr(m)
    return jnp.array(q, dtype=jnp.complex64)


def test_theoretical_lower_bound():
    assert losses.theoretical_lower_bound(3) == 14
    assert losses.theoretical_lower_bound(4) == 61


def test_trace_prod():
    u = random_unitary(8, 1)
    assert complex(losses.trace_prod(u, u)) == pytest.approx(8.0, abs=1e-5)


def test_disc_and_hst():
    u = random_unitary(8, 2)
    assert float(losses.disc(u, u)) == pytest.approx(0.0, abs=1e-6)
    assert float(losses.cost_HST(u, u)) == pytest.approx(0.0, abs=1e-6)
    # global phase invariance
    assert float(losses.cost_HST(np.exp(1j * 0.7) * u, u)) == pytest.approx(0.0, abs=1e-6)
    # orthogonal matrices
    v = jnp.array(np.diag([1, 1, 1, 1, 1, 1, 1, -1]) @ np.asarray(random_unitary(8, 3)),
                  dtype=jnp.complex64)
    tp = abs(complex(losses.trace_prod(u, v)))
    assert float(losses.cost_HST(u, v)) == pytest.approx(1 - tp ** 2 / 64, abs=1e-5)


def test_state_prep_loss():
    n = 8
    u = random_unitary(n, 4)
    target = u[:, 0]
    assert float(losses.state_prep_loss(u, target)) == pytest.approx(0.0, abs=1e-6)
    ortho = u[:, 1]
    assert float(losses.state_prep_loss(u, ortho)) == pytest.approx(1.0, abs=1e-6)


def test_fubini_study_psd():
    from cpflow_tpu.sim.ansatz_kernel import build_unitary
    from cpflow_tpu.topology import fill_layers, chain_layer

    placements = fill_layers(chain_layer(2), 2)
    u_func = lambda angs: build_unitary(2, 'cp', 'xz', placements, angs)
    num_angles = 3 * 2 + 5 * 2
    x = jnp.linspace(0.1, 2.0, num_angles)
    g = losses.fubini_study(u_func, x)
    assert g.shape == (num_angles, num_angles)
    evals = np.linalg.eigvalsh(np.asarray(g))
    assert evals.min() > -1e-4


def test_tensor_identity_loss():
    n = 3
    # u = I ⊗ V on wires [0]: acts as identity on qubit 0
    v = random_unitary(4, 5)
    u = jnp.kron(jnp.eye(2, dtype=jnp.complex64), v)
    assert float(losses.tensor_identity_loss(u, n, [0])) == pytest.approx(0.0, abs=1e-5)
    # X on qubit 0: not identity on wire 0
    ux = jnp.kron(gates.x_mat, jnp.eye(4, dtype=jnp.complex64))
    assert float(losses.tensor_identity_loss(ux, n, [0])) > 0.1


def test_tensor_diagonal_loss():
    n = 3
    # diagonal on qubit 0, arbitrary on others
    d = jnp.diag(jnp.array([1, np.exp(1j * 1.2)], dtype=jnp.complex64))
    v = random_unitary(4, 6)
    u = jnp.kron(d, v)
    assert float(losses.tensor_diagonal_loss(u, n, [0])) == pytest.approx(0.0, abs=1e-5)
    ux = jnp.kron(gates.x_mat, v)
    assert float(losses.tensor_diagonal_loss(ux, n, [0])) > 0.1


def test_disc_modulo_identity():
    n = 3
    target = random_unitary(8, 7)
    # u equals target up to identity-on-wires transform: exactly equal case
    assert float(losses.disc_modulo_identity(target, target.conj().T, n, [0, 1])) == pytest.approx(0.0, abs=1e-5)


def test_disc2_swap():
    u = random_unitary(4, 8)
    # swapping wires of a 2q unitary: disc2_swap is zero when u matches target
    # under SOME permutation; the product over perms includes the identity perm.
    assert float(losses.disc2_swap(u, u, 2)) == pytest.approx(0.0, abs=1e-5)


def test_permutation_matrices_are_permutations():
    mats = losses.permutation_matrices(3)
    assert len(mats) == 6
    for m in mats:
        mn = np.asarray(m)
        np.testing.assert_allclose(mn @ mn.conj().T, np.eye(8), atol=1e-7)
        assert set(np.unique(mn)) <= {0.0, 1.0}


def test_shift_matrices():
    import numpy as np
    m = losses.shifting_matrix(3)
    np.testing.assert_array_equal(m, [[0, 1, 0], [0, 0, 1], [1, 0, 0]])
    d = jnp.diag(jnp.array([1.0, 2.0, 3.0, 4.0]))
    shifted = losses.shift_matrix(d)
    np.testing.assert_allclose(np.diag(np.asarray(shifted)), [2, 3, 4, 1])
    # block shift: 2x2 blocks of a 4x4
    b = jnp.array(np.diag([1, 1, 2, 2]).astype(np.float32))
    np.testing.assert_allclose(np.diag(np.asarray(
        losses.shift_block_diagonal_matrix(b, 2))), [2, 2, 1, 1])


def test_tensor_identity_loss_frobenius():
    v = random_unitary(4, 9)
    u = jnp.kron(jnp.eye(2, dtype=jnp.complex64), v)
    assert float(losses.tensor_identity_loss_frobenius(u, 3, [0])) == pytest.approx(0.0, abs=1e-5)
    ux = jnp.kron(gates.x_mat, jnp.eye(4, dtype=jnp.complex64))
    assert float(losses.tensor_identity_loss_frobenius(ux, 3, [0])) > 0.5


def test_modulo_losses_numpy_path_matches_jax():
    """LossSpec.numpy for modulo kinds runs on the numpy substrate and
    agrees with the jax evaluation."""
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.ops import gates

    rng = np.random.default_rng(3)
    n = 3
    d = 2 ** n

    def ru(seed):
        g = np.random.default_rng(seed)
        q, _ = np.linalg.qr(g.normal(size=(d, d)) + 1j * g.normal(size=(d, d)))
        return q.astype(np.complex64)

    u = ru(3)
    target = ru(4)

    for kind in ('modulo_identity', 'modulo_diagonal'):
        spec = LossSpec(kind, target=target, wires=[0, 1], num_qubits=n)
        ref = float(spec(jnp.asarray(u)))
        got = spec.numpy(u)
        assert got == pytest.approx(ref, abs=1e-5)
