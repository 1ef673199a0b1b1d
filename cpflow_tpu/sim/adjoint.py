"""Hand-derived adjoint (reverse-mode) math for the gate chain.

These are the building blocks for kernels that cannot use JAX autodiff
(Pallas), validated against jax.grad by tests. Everything is batch-last.

Derivation. Let U = G_K ... G_1 (embedded gates), L = f(U) real. Writing
dL = 2 Re[ sum M ∘ dU ] defines the cotangent matrix M at the output. Then
  * chain step:   sum M ∘ (G dA) = sum (G^T M) ∘ dA     (plain transpose!)
  * gate grad:    sum M ∘ (dG A) = sum (contract_rest(M, A)) ∘ dG,
                  i.e. Gbar[p,k] = sum_rest M[p,rest] A[k,rest]
  * state rewind: A_{i-1} = G_i^dagger A_i               (unitarity)
  * angle grad:   dL/dtheta = 2 Re[ sum_{pk} Gbar ∘ dG/dtheta ]
For the HS-test loss L = 1 - |s|^2/N^2 with s = <T, U> = sum conj(T) U:
  M = -(conj(s)/N^2) * conj(T).
For state preparation L = 1 - |o|^2, o = sum conj(t) U[:,0]:
  M = -conj(o) * conj(t) e_0^T (nonzero only in column 0).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from cpflow_tpu import config
from cpflow_tpu.sim import batched as bt


# --------------------------------------------------------------------------
# Batched gate matrices WITH their angle derivatives
# --------------------------------------------------------------------------

_PAULI = {
    'x': np.array([[0, 1], [1, 0]], dtype=np.complex64),
    'y': np.array([[0, -1j], [1j, 0]], dtype=np.complex64),
    'z': np.array([[1, 0], [0, -1]], dtype=np.complex64),
}


def _rot_and_deriv(letter: str, a):
    """R(a) and dR/da = (-i/2) P R(a), both (2,2,B)."""
    r = bt._rot_batched(letter, a)
    p = _PAULI[letter]
    dr = (-0.5j) * jnp.einsum('pk,kqb->pqb', p, r, precision=config.PRECISION)
    return r, dr


def block_matrix_and_grads(entangling_gate_name: str, rotation_gates: str,
                           block_angles) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """(G, [dG/dtheta_j for each block angle]) — all (4,4,B).

    Block structure (reference main.py:69-82): G = K_m ... K_1 E where
    K_i = kron(R_i(a_{2i}), R_i(a_{2i+1})) and E = CP(a_last) (or fixed).
    """
    m = len(rotation_gates)
    B = block_angles.shape[-1]

    if entangling_gate_name == 'cp':
        e = bt._cp_batched(block_angles[-1])
        phase = jnp.exp(1j * block_angles[-1].astype(config.complex_dtype))
        de_diag = jnp.zeros((4, B), dtype=config.complex_dtype).at[3].set(1j * phase)
        de = jnp.zeros((4, 4, B), dtype=config.complex_dtype)
        de = de.at[3, 3].set(de_diag[3])
    else:
        from cpflow_tpu.ops import gates as gate_mats
        mat = gate_mats.cz_mat if entangling_gate_name == 'cz' else gate_mats.cx_mat
        e = jnp.broadcast_to(jnp.asarray(mat, dtype=config.complex_dtype)[:, :, None],
                             (4, 4, B))
        de = None

    ks = []       # K_i
    dks = []      # (dK/da_up, dK/da_down)
    for i, letter in enumerate(rotation_gates):
        up, dup = _rot_and_deriv(letter, block_angles[2 * i])
        down, ddown = _rot_and_deriv(letter, block_angles[2 * i + 1])
        ks.append(bt._kron_batched(up, down))
        dks.append((bt._kron_batched(dup, down), bt._kron_batched(up, ddown)))

    # prefix[i] = K_m ... K_{i+1} (left factors above K_i); suffix[i] =
    # K_{i-1} ... K_1 E (right factors below K_i)
    suffix = [e]
    for i in range(m):
        suffix.append(bt._matmul_batched(ks[i], suffix[-1]))
    g = suffix[-1]

    prefix = [None] * (m + 1)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=config.complex_dtype)[:, :, None],
                           (4, 4, B))
    acc = eye
    for i in reversed(range(m)):
        prefix[i] = acc
        acc = bt._matmul_batched(acc, ks[i])

    grads: List[jnp.ndarray] = []
    for i in range(m):
        dk_up, dk_down = dks[i]
        left = prefix[i]
        right = suffix[i]
        grads.append(bt._matmul_batched(bt._matmul_batched(left, dk_up), right))
        grads.append(bt._matmul_batched(bt._matmul_batched(left, dk_down), right))
    if entangling_gate_name == 'cp':
        grads.append(bt._matmul_batched(acc, de))  # acc = K_m ... K_1
    return g, grads


def surface_matrix_and_grads(a3) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Surface gate Rz(a2) Rx(a1) Rz(a0) and its three derivatives (2,2,B)."""
    r0, d0 = _rot_and_deriv('z', a3[0])
    r1, d1 = _rot_and_deriv('x', a3[1])
    r2, d2 = _rot_and_deriv('z', a3[2])
    g = bt._matmul_batched(bt._matmul_batched(r2, r1), r0)
    g0 = bt._matmul_batched(bt._matmul_batched(r2, r1), d0)
    g1 = bt._matmul_batched(bt._matmul_batched(r2, d1), r0)
    g2 = bt._matmul_batched(bt._matmul_batched(d2, r1), r0)
    return g, [g0, g1, g2]


# --------------------------------------------------------------------------
# Adjoint walk (pure-jnp reference implementation of the kernel math)
# --------------------------------------------------------------------------

def _gate_cotangent(m_cot, a_prev, placement, n):
    """Gbar[p,k,b] = sum_rest M[p,rest,b] * A_prev[k,rest,b]."""
    k = len(placement)
    dim_g = 2 ** k
    placement = list(placement)
    others = [q for q in range(n) if q not in placement]
    perm = placement + others + [n, n + 1]
    B = m_cot.shape[-1]
    mt = jnp.transpose(m_cot, perm).reshape(dim_g, -1, B)
    at = jnp.transpose(a_prev, perm).reshape(dim_g, -1, B)
    return jnp.einsum('prb,krb->pkb', mt, at, precision=config.PRECISION)


def _apply_transpose(gate, tensor, placement, n):
    """Apply G^T (plain transpose, no conjugation) at `placement`."""
    return bt._apply_gate_batched(jnp.swapaxes(gate, 0, 1), tensor, placement, n)


def _apply_dagger(gate, tensor, placement, n):
    return bt._apply_gate_batched(jnp.conj(jnp.swapaxes(gate, 0, 1)), tensor,
                                  placement, n)


def hst_output_cotangent(u, u_target):
    """M for the HS-test loss; u: (2,)*n+(2^n,B). Returns (loss_B, M)."""
    d = u_target.shape[0]
    t = jnp.asarray(u_target, dtype=config.complex_dtype).reshape(
        u.shape[:-1] + (1,))
    B = u.shape[-1]
    s = (u * t.conj()).reshape(-1, B).sum(axis=0)
    loss = 1 - jnp.abs(s) ** 2 / d ** 2
    m_cot = (-(jnp.conj(s) / d ** 2)) * jnp.conj(t)
    return loss, m_cot


def manual_value_and_grad(num_qubits: int, entangling_gate_name: str,
                          rotation_gates: str, placements: dict,
                          u_target):
    """Returns f(angles_PB) -> (loss_B, grad_PB): hand-written reverse mode
    for the HS loss (no penalty), used to validate the kernel math against
    jax.grad. Pure jnp; unrolled over all blocks."""
    layer, num_layers = placements['layers']
    free_placements = list(placements['free'])
    all_placements = list(layer) * num_layers + free_placements
    nba = bt.num_block_angles(entangling_gate_name, rotation_gates)
    n = num_qubits

    def f(angles):
        angles = jnp.asarray(angles, dtype=config.real_dtype)
        B = angles.shape[-1]
        surface = angles[:3 * n].reshape(n, 3, B)
        blocks = angles[3 * n:].reshape(-1, nba, B)

        # forward, storing nothing (rebuild structure info only)
        eye = jnp.eye(2 ** n, dtype=config.complex_dtype)
        u = jnp.broadcast_to(eye.reshape([2] * n + [2 ** n, 1]),
                             tuple([2] * n) + (2 ** n, B))
        surf_gates = []
        surf_grads = []
        for q in range(n):
            g, gs = surface_matrix_and_grads(surface[q])
            surf_gates.append(g)
            surf_grads.append(gs)
            u = bt._apply_gate_batched(g, u, [q], n)
        block_gates = []
        block_grads = []
        for j, p in enumerate(all_placements):
            g, gs = block_matrix_and_grads(entangling_gate_name,
                                           rotation_gates, blocks[j])
            block_gates.append(g)
            block_grads.append(gs)
            u = bt._apply_gate_batched(g, u, p, n)

        loss, m_cot = hst_output_cotangent(u, u_target)

        # backward walk
        a_state = u
        d_blocks = [None] * len(all_placements)
        for j in reversed(range(len(all_placements))):
            p = all_placements[j]
            g = block_gates[j]
            a_state = _apply_dagger(g, a_state, p, n)
            gbar = _gate_cotangent(m_cot, a_state, p, n)
            dthetas = [2 * jnp.real((gbar * dg).sum(axis=(0, 1)))
                       for dg in block_grads[j]]
            d_blocks[j] = jnp.stack(dthetas)          # (nba, B)
            m_cot = _apply_transpose(g, m_cot, p, n)

        d_surface = [None] * n
        for q in reversed(range(n)):
            g = surf_gates[q]
            a_state = _apply_dagger(g, a_state, [q], n)
            gbar = _gate_cotangent(m_cot, a_state, [q], n)
            dthetas = [2 * jnp.real((gbar * dg).sum(axis=(0, 1)))
                       for dg in surf_grads[q]]
            d_surface[q] = jnp.stack(dthetas)         # (3, B)
            m_cot = _apply_transpose(g, m_cot, [q], n)

        grad = jnp.concatenate(
            [jnp.stack(d_surface).reshape(3 * n, B)] +
            ([jnp.stack(d_blocks).reshape(len(all_placements) * nba, B)]
             if all_placements else []), axis=0)
        return loss, grad

    return f
