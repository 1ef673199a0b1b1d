"""Pins the modulo-identity/diagonal loss CONVENTION for non-Hermitian
targets (ops/losses.py disc_modulo_identity / disc_modulo_diagonal).

Both compute a property of (u @ u_target): zero iff u == A @ u_target^dag
with A identity (resp. diagonal) on `wires`. For Hermitian targets (every
multi-controlled X) u_target^dag == u_target and this reads naively; for a
NON-Hermitian target (C4-sqrt-X) the huntED circuit implements the
target's INVERSE modulo a left diagonal — consumers must take
circuit.inverse() to get target-times-right-diagonal. Round 4's
relphase_toff6_composite exported at loss 4.078 because its RC4sqrtX
block skipped exactly this step (VERDICT r4 weak-2; the fix is
benchmarks/composite.py build_relphase_toff6_composite).
"""

import numpy as np
import pytest

from cpflow_tpu.ops import losses
from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                  multi_controlled_x)


def _rand_diag(n, rng):
    return np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 2 ** n)))


@pytest.mark.parametrize('seed', [0, 5])
def test_modulo_diagonal_nonhermitian_certifies_inverse(seed):
    rng = np.random.default_rng(seed)
    n = 3
    tgt = multi_controlled_sqrt_x(n).astype(complex)   # NON-Hermitian
    D = _rand_diag(n, rng)
    u = D @ tgt.conj().T   # what a zero-loss hunt against `tgt` finds
    wires = list(range(n))
    assert losses.disc_modulo_diagonal(tgt, u, n, wires, xp=np) < 1e-12
    # the found matrix is NOT target-modulo-diagonal...
    m = tgt.conj().T @ u
    off = np.abs(m - np.diag(np.diag(m))).max()
    assert off > 0.3
    # ...its INVERSE is: u^dag = tgt @ D^dag (right diagonal)
    m_inv = tgt.conj().T @ u.conj().T
    off_inv = np.abs(m_inv - np.diag(np.diag(m_inv))).max()
    assert off_inv < 1e-12


@pytest.mark.parametrize('seed', [1])
def test_modulo_diagonal_hermitian_naive_reading(seed):
    rng = np.random.default_rng(seed)
    n = 3
    tgt = multi_controlled_x(n).astype(complex)        # Hermitian
    D = _rand_diag(n, rng)
    u = D @ tgt
    wires = list(range(n))
    assert losses.disc_modulo_diagonal(tgt, u, n, wires, xp=np) < 1e-12


def test_modulo_identity_nonhermitian():
    n = 2
    tgt = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                    [0, 0, (1 + 1j) / 2, (1 - 1j) / 2],
                    [0, 0, (1 - 1j) / 2, (1 + 1j) / 2]], dtype=complex)
    u = tgt.conj().T
    assert losses.disc_modulo_identity(tgt, u, n, [0, 1], xp=np) < 1e-12
    # the target itself scores ~0 only if Hermitian; csqrtx is not
    assert losses.disc_modulo_identity(tgt, tgt, n, [0, 1], xp=np) > 1e-3
