"""Loss functions on unitary matrices.

Parity target: reference cpflow/matrix_utils.py. All losses are pure jnp and
differentiable; they are the objective inside the jitted multi-start Adam
loop, so they must stay fusable (elementwise + single reduction — no matmuls
are required: the trace inner product is an elementwise product-sum,
matrix_utils.py:17-23).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpflow_tpu import config


def theoretical_lower_bound(n: int) -> int:
    """Min CZ count for a generic n-qubit unitary (matrix_utils.py:11-14)."""
    return int((4 ** n - 3 * n - 1) / 4 + 1)


def trace_prod(u, v):
    """Tr(U^dagger V) via elementwise product (matrix_utils.py:17-23)."""
    return (u.conj() * v).sum()


def disc(u, u_target):
    """1 - |Tr(U^dag V)| / N  (matrix_utils.py:26-32)."""
    n = u_target.shape[0]
    return 1 - jnp.abs(trace_prod(u, u_target)) / n


def cost_HST(u, u_target):
    """Hilbert-Schmidt test cost 1 - |Tr(U^dag V)|^2 / N^2 (matrix_utils.py:35-42)."""
    n = u_target.shape[0]
    return 1 - jnp.abs((u * u_target.conj()).sum()) ** 2 / n ** 2


def state_prep_loss(u, target_state):
    """1 - |<target| U |0>|^2 : infidelity of preparing `target_state` from |0...0>.

    Implements the `target_state` objective that the reference's Synthesize
    docstring advertises (main.py:513) but never implements.
    """
    produced = u[:, 0]
    overlap = (target_state.conj() * produced).sum()
    return 1 - jnp.abs(overlap) ** 2


# --- Permutation-equivalence loss (matrix_utils.py:45-53) --------------------

def _permutation_matrix(perm, dtype=None):
    """Unitary permuting qubit wires: qubit i of the input goes to wire perm[i].

    Big-endian basis: basis index b has bit (n-1-i) for qubit i. Returns a
    host numpy array (embedded as a literal when used inside jit).
    """
    import numpy as np
    n = len(perm)
    d = 2 ** n
    m = np.zeros((d, d), dtype=dtype or np.complex64)
    for b in range(d):
        bits = [(b >> (n - 1 - i)) & 1 for i in range(n)]
        new_bits = [0] * n
        for i in range(n):
            new_bits[perm[i]] = bits[i]
        nb = sum(bit << (n - 1 - i) for i, bit in enumerate(new_bits))
        m[nb, b] = 1
    return m


def permutation_matrices(n):
    from itertools import permutations
    return [_permutation_matrix(p) for p in permutations(range(n))]


def disc2_swap(u, u_target, num_qubits):
    """Product of HST costs over all wire permutations (matrix_utils.py:45-49)."""
    mats = permutation_matrices(num_qubits)
    return jnp.prod(jnp.array([
        cost_HST(jnp.matmul(m, u, precision=config.PRECISION), u_target)
        for m in mats]))


# --- Fubini-Study metric (natural gradient; matrix_utils.py:56-67) -----------

def fubini_study(u_func, x, relative_coeff=1.0):
    u = u_func(x)
    u_norm2 = jnp.abs(trace_prod(u, u))
    u_jac = jax.jacfwd(u_func)(x)

    dudu = jnp.tensordot(u_jac, u_jac.conj(), axes=[[0, 1], [0, 1]],
                         precision=config.PRECISION)
    udu = jnp.tensordot(u_jac, u.conj(), axes=[[0, 1], [0, 1]],
                        precision=config.PRECISION)

    gij = dudu / u_norm2 - relative_coeff * jnp.outer(udu.conj(), udu) / u_norm2 ** 2
    return jnp.real(gij)


# --- Tensor-factorization losses (compile-modulo-identity / -diagonal) -------
# Reference matrix_utils.py:70-215.

def reorder_wires(wires, num_qubits):
    """[1,3], n=5 -> [1,3,0,2,4] (matrix_utils.py:70-74)."""
    all_wires = list(range(num_qubits))
    return list(wires) + [w for w in all_wires if w not in wires]


def move_wires_up(u, num_qubits, wires, xp=jnp):
    """Permute tensor legs so `wires` come first (matrix_utils.py:77-86)."""
    u = u.reshape([2] * (2 * num_qubits))
    in_legs = reorder_wires(wires, num_qubits)
    out_legs = [w + num_qubits for w in in_legs]
    u = xp.transpose(u, axes=in_legs + out_legs)
    return u.reshape(2 ** num_qubits, 2 ** num_qubits)


def _shift_indices(dim: int, block: int):
    """Row indices implementing the block-shift conjugation used by
    shift_block_diagonal_matrix (matrix_utils.py:89-115) without any matmuls:
    X u X^{-1} with X = shift(k) ⊗ I_m is a pure row+column permutation."""
    import numpy as np
    k = dim // block
    # shifting_matrix(k)[i, (i+1)%k] = 1, so (X u X^T)[i*m+a, j*m+b] =
    # u[((i+1)%k)*m+a, ((j+1)%k)*m+b]
    idx = np.arange(dim)
    blk = idx // block
    off = idx % block
    return ((blk + 1) % k) * block + off


def shifting_matrix(n):
    """Cyclic basis shift: m[i, (i+1)%n] = 1 (matrix_utils.py:89-94)."""
    import numpy as np
    m = np.zeros((n, n), dtype=np.float32)
    for i in range(n):
        m[i, (i + 1) % n] = 1
    return m


def shift_matrix(u):
    """Cyclically shift the eigenvalue order of a diagonal matrix
    (matrix_utils.py:97-101), as a pure index permutation."""
    src = _shift_indices(u.shape[0], 1)
    return u[src][:, src]


def shift_block_diagonal_matrix(u, m):
    """Cyclically shift the order of m x m diagonal blocks
    (matrix_utils.py:104-115)."""
    src = _shift_indices(u.shape[0], m)
    return u[src][:, src]


def block_diagonal_split(u, num_qubits, n, xp=jnp):
    """Split into block-diagonal part, its block-shifted version, and the
    off-block-diagonal remainder (matrix_utils.py:118-134)."""
    dim = 2 ** num_qubits
    block = 2 ** n
    identity_dim = num_qubits - n
    mask = xp.kron(xp.eye(2 ** identity_dim, dtype=u.dtype),
                   xp.ones((block, block), dtype=u.dtype))
    u_diag = mask * u
    u_off_diag = (1 - mask) * u
    src = _shift_indices(dim, block)
    u_diag_shifted = u_diag[src][:, src]
    return u_diag, u_diag_shifted, u_off_diag


def tensor_identity_loss_frobenius(u, num_qubits, wires):
    """Frobenius-norm variant of tensor_identity_loss
    (matrix_utils.py:137-148)."""
    u = move_wires_up(u, num_qubits, wires)
    block_size = num_qubits - len(wires)
    u_diag, u_diag_shifted, u_off_diag = block_diagonal_split(u, num_qubits,
                                                              block_size)
    loss_off = (jnp.abs(u_off_diag) ** 2).sum()
    loss_diag = (jnp.abs(u_diag - u_diag_shifted) ** 2).sum()
    return loss_diag + loss_off


def tensor_identity_loss(u, num_qubits, wires, xp=jnp):
    """0 iff u acts as identity on `wires` (up to factorization), else positive
    (matrix_utils.py:151-176)."""
    u = move_wires_up(u, num_qubits, wires, xp=xp)
    block_size = num_qubits - len(wires)
    u_diag, u_diag_shifted, u_off_diag = block_diagonal_split(
        u, num_qubits, block_size, xp=xp)

    sp_total = xp.abs((u_diag * u_diag_shifted.conj()).sum(axis=1).sum())
    loss_off = (xp.abs(u_off_diag) ** 2).sum()
    loss_diag = 1 - sp_total / 2 ** num_qubits
    return loss_diag + loss_off


def tensor_diagonal_loss(u, num_qubits, wires, xp=jnp):
    """0 iff u acts diagonally on `wires` (matrix_utils.py:179-201)."""
    u = move_wires_up(u, num_qubits, wires, xp=xp)
    block_size = num_qubits - len(wires)
    u_diag, u_diag_shifted, u_off_diag = block_diagonal_split(
        u, num_qubits, block_size, xp=xp)

    sp_vec = xp.abs((u_diag * u_diag_shifted.conj()).sum(axis=1))
    sp_total = (sp_vec ** 2).sum()
    loss_off = (xp.abs(u_off_diag) ** 2).sum()
    loss_diag = 1 - sp_total / 2 ** num_qubits
    return loss_diag + loss_off


def _matmul(a, b, xp=jnp):
    """Matmul with full f32 precision on TPU (bf16 passes otherwise corrupt
    loss values near convergence — CLAUDE.md); numpy has no precision arg."""
    if xp is jnp:
        return jnp.matmul(a, b, precision=config.PRECISION)
    return xp.matmul(a, b)


def disc_modulo_identity(u_target, u, num_qubits, wires, xp=jnp):
    """Zero iff (u @ u_target) acts as identity on `wires` — i.e.
    u == A @ u_target^dag with A identity on `wires` (matrix_utils.py:204-208;
    the reference computes the SAME relation, its docstring notwithstanding).
    For Hermitian targets (every multi-controlled X) u_target^dag == u_target,
    so this matches the naive reading; for a NON-Hermitian target pass
    u_target.conj().T — or use the found circuit's .inverse() — to get a
    circuit equivalent to the target itself (tests/test_losses_convention.py).

    xp: jnp (device pipeline, default) or numpy — the host refinement path
    evaluates the same math substrate-free (no device dispatch per probe).
    """
    return tensor_identity_loss(_matmul(u, u_target, xp).conj().T,
                                num_qubits, wires, xp=xp)


def disc_modulo_diagonal(u_target, u, num_qubits, wires, xp=jnp):
    """Zero iff (u @ u_target) is diagonal on `wires` (+ spectator
    transforms) — i.e. u == D @ u_target^dag with D diagonal
    (matrix_utils.py:211-215, same relation as the reference). As with
    disc_modulo_identity, this is u ~ u_target only for HERMITIAN targets;
    a circuit found against a non-Hermitian target (e.g. C4-sqrt-X)
    implements the target's INVERSE modulo a left diagonal, so consumers
    must use circuit.inverse() (= u_target @ D^dag) — the round-4
    relphase_toff6_composite exported at loss 4.078 because its RC4sqrtX
    block skipped exactly this step. See disc_modulo_identity for `xp`."""
    return tensor_diagonal_loss(_matmul(u, u_target, xp).conj().T,
                                num_qubits, wires, xp=xp)
