"""Batch-last fused ansatz kernel: the TPU-native hot path.

Why this exists: vmapping the per-restart builder (sim/ansatz_kernel.py) puts
the restart axis FIRST and lowers each 2q-gate application to a per-restart
(4x4)@(4x4^{n-1}) dot_general. On TPU those tiny dots pad to 128x128 MXU
tiles at <1% utilization — measured ~1.1k restart-iterations/s on a v5e,
thousands of times below the VPU roofline.

This module instead lays every tensor out with the restart batch as the
MINOR-MOST axis (filling the 8x128 vector tiles with restarts) and expresses
each gate application as an explicit broadcast-multiply + length-4 reduction
— pure VPU code with exact f32 arithmetic (no MXU, no bf16 passes, so no
Precision workarounds needed). Shapes:

    angles  (P, B)
    u       (2,)*n + (2^n,) + (B,)     row legs, flat column, batch last
    gates   (4, 4, B) / (2, 2, B)
    loss    (B,)

Semantics (angle layout, block structure, ordering) are identical to
build_unitary (reference main.py:106-146); tests check equality against the
vmapped reference path to f32 tolerance.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from cpflow_tpu import config
from cpflow_tpu.sim.ansatz_kernel import num_block_angles


# --------------------------------------------------------------------------
# Batched gate matrices (trailing batch axis)
# --------------------------------------------------------------------------

def _rot_batched(letter: str, a):
    """(2, 2, B) rotation matrix exp(-i a P / 2) for a: (B,)."""
    a = jnp.asarray(a, dtype=config.real_dtype)
    c = jnp.cos(a / 2).astype(config.complex_dtype)
    s = (-1j * jnp.sin(a / 2)).astype(config.complex_dtype)
    zero = jnp.zeros_like(c)
    if letter == 'x':
        rows = [[c, s], [s, c]]
    elif letter == 'y':
        sy = jnp.sin(a / 2).astype(config.complex_dtype)
        rows = [[c, -sy], [sy, c]]
    elif letter == 'z':
        e_m = jnp.exp(-1j * a.astype(config.complex_dtype) / 2)
        e_p = jnp.exp(1j * a.astype(config.complex_dtype) / 2)
        rows = [[e_m, zero], [zero, e_p]]
    else:
        raise ValueError(f'unknown rotation {letter!r}')
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def _kron_batched(a, b):
    """(2,2,B) x (2,2,B) -> (4,4,B) Kronecker product, elementwise."""
    B = a.shape[-1]
    out = a[:, None, :, None, :] * b[None, :, None, :, :]
    return out.reshape(4, 4, B)


def _matmul_batched(a, b):
    """(m,k,B) @ (k,n,B) -> (m,n,B) via broadcast-mul + small reduction
    (keeps everything on the VPU; k is 2 or 4)."""
    return (a[:, :, None, :] * b[None, :, :, :]).sum(axis=1)


def _cp_batched(a):
    """(4, 4, B) controlled-phase matrices for a: (B,)."""
    a = jnp.asarray(a, dtype=config.real_dtype)
    B = a.shape[-1]
    phase = jnp.exp(1j * a.astype(config.complex_dtype))
    one = jnp.ones_like(phase)
    zero = jnp.zeros_like(phase)
    diag = [one, one, one, phase]
    rows = [[diag[i] if i == j else zero for j in range(4)] for i in range(4)]
    return jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)


def block_matrix_batched(entangling_gate_name: str, rotation_gates: str,
                         block_angles):
    """(4, 4, B) block unitary for block_angles: (nba, B)
    (reference EntanglingBlock.unitary, main.py:69-82)."""
    B = block_angles.shape[-1]
    if entangling_gate_name == 'cp':
        u = _cp_batched(block_angles[-1])
    elif entangling_gate_name in ('cz', 'cx'):
        from cpflow_tpu.ops import gates as gate_mats
        m = gate_mats.cz_mat if entangling_gate_name == 'cz' else gate_mats.cx_mat
        u = jnp.broadcast_to(
            jnp.asarray(m, dtype=config.complex_dtype)[:, :, None], (4, 4, B))
    else:
        raise ValueError(entangling_gate_name)

    for i, letter in enumerate(rotation_gates):
        up = _rot_batched(letter, block_angles[2 * i])
        down = _rot_batched(letter, block_angles[2 * i + 1])
        u = _matmul_batched(_kron_batched(up, down), u)
    return u


def surface_gate_batched(a3):
    """(2, 2, B) Rz Rx Rz surface gate for a3: (3, B)
    (reference main.py:122-123)."""
    g = _matmul_batched(_rot_batched('z', a3[2]), _rot_batched('x', a3[1]))
    return _matmul_batched(g, _rot_batched('z', a3[0]))


# --------------------------------------------------------------------------
# Batched gate application
# --------------------------------------------------------------------------

def _apply_gate_batched(gate, u, placement: Sequence[int], n: int):
    """Left-multiply a batched k-qubit gate into the batched unitary tensor.

    gate: (2^k, 2^k, B); u: (2,)*n + (2^n, B); placement: k row legs.
    """
    k = len(placement)
    dim_g = 2 ** k
    rest = 2 ** (n - k)
    col = u.shape[n]
    B = u.shape[-1]

    placement = list(placement)
    others = [q for q in range(n) if q not in placement]
    # move placement legs to the front
    perm = placement + others + [n, n + 1]
    ut = jnp.transpose(u, perm).reshape(dim_g, rest * col, B)

    # out[p, r, b] = sum_k gate[p, k, b] * ut[k, r, b]
    # (measured on v5e: the reduce form beats an unrolled-adds variant —
    # XLA fuses the small reduction fine and the unroll bloats the VJP graph)
    out = (gate[:, :, None, :] * ut[None, :, :, :]).sum(axis=1)

    out = out.reshape([2] * n + [col, B])
    # inverse permutation
    inv = np.argsort(np.array(perm))
    return jnp.transpose(out, inv)


def _apply_gate_batched_slices(gate, u, placement: Sequence[int], n: int):
    """Transpose-free variant: reads the 2^k x 2^k sub-blocks as static
    keepdim slices and assembles the output with nested concatenates along
    the original leg axes. Same semantics as _apply_gate_batched."""
    k = len(placement)
    assert k in (1, 2)
    ndim = u.ndim

    def slice_at(legs_vals):
        idx = [slice(None)] * ndim
        for leg, val in legs_vals:
            idx[leg] = slice(val, val + 1)
        return u[tuple(idx)]

    gshape = (1,) * (ndim - 1) + (gate.shape[-1],)

    if k == 1:
        (i,) = placement
        outs = []
        for p in (0, 1):
            acc = None
            for kk in (0, 1):
                term = gate[p, kk].reshape(gshape) * slice_at([(i, kk)])
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.concatenate(outs, axis=i)

    i, j = placement
    rows = []
    for pa in (0, 1):
        cols = []
        for pb in (0, 1):
            p = 2 * pa + pb
            acc = None
            for ka in (0, 1):
                for kb in (0, 1):
                    kidx = 2 * ka + kb
                    term = gate[p, kidx].reshape(gshape) * \
                        slice_at([(i, ka), (j, kb)])
                    acc = term if acc is None else acc + term
            cols.append(acc)
        rows.append(jnp.concatenate(cols, axis=j))
    return jnp.concatenate(rows, axis=i)


def build_unitary_batched(num_qubits: int, entangling_gate_name: str,
                          rotation_gates: str, placements: dict, angles,
                          columns=None):
    """angles: (P, B) -> batched unitary (2,)*n + (2^n, B).

    Mirrors build_unitary (reference main.py:106-146): surface 1q round,
    lax.scan over complete layers, unrolled free blocks.

    columns: optional list of input basis states. Gate application touches
    only the row legs, so each column of the unitary evolves independently;
    restricting to the columns a loss actually reads (state preparation
    needs only |0...0>) shrinks every tensor by 2^n/len(columns) — result
    shape (2,)*n + (len(columns), B).
    """
    layer, num_layers = placements['layers']
    free_placements = placements['free']
    layer_depth = len(layer)
    nba = num_block_angles(entangling_gate_name, rotation_gates)
    n = num_qubits

    angles = jnp.asarray(angles, dtype=config.real_dtype)
    B = angles.shape[-1]

    surface = angles[:3 * n].reshape(n, 3, B)
    block_angles = angles[3 * n:].reshape(-1, nba, B)
    layers_angles = block_angles[:layer_depth * num_layers].reshape(
        num_layers, layer_depth, nba, B)
    free_angles = block_angles[layer_depth * num_layers:]

    if columns is None:
        eye = jnp.eye(2 ** n, dtype=config.complex_dtype)
    else:
        eye = jnp.zeros((2 ** n, len(columns)), dtype=config.complex_dtype)
        eye = eye.at[np.asarray(columns), np.arange(len(columns))].set(1.0)
    ncols = eye.shape[1]
    u = jnp.broadcast_to(eye.reshape([2] * n + [ncols, 1]),
                         tuple([2] * n) + (ncols, B))

    for q in range(n):
        u = _apply_gate_batched(surface_gate_batched(surface[q]), u, [q], n)

    if num_layers > 0 and layer_depth > 0:
        def apply_layer(u, la):
            for j, p in enumerate(layer):
                g = block_matrix_batched(entangling_gate_name, rotation_gates,
                                         la[j])
                u = _apply_gate_batched(g, u, p, n)
            return u, None
        u, _ = lax.scan(apply_layer, u, layers_angles)

    for j, p in enumerate(free_placements):
        g = block_matrix_batched(entangling_gate_name, rotation_gates,
                                 free_angles[j])
        u = _apply_gate_batched(g, u, p, n)

    return u


# --------------------------------------------------------------------------
# Reversible (storage-free) backward pass
# --------------------------------------------------------------------------

def make_reversible_builder(num_qubits: int, entangling_gate_name: str,
                            rotation_gates: str, placements: dict,
                            columns=None):
    """build_unitary_batched with a custom VJP that exploits unitarity:
    instead of storing every intermediate state for the backward pass (what
    autodiff through the gate chain does — k tensors of B x 4^n complex per
    loss evaluation), the backward pass reconstructs each intermediate by
    applying inverse gates while walking the chain backwards. This trades a
    little recompute for eliminating residual HBM traffic — the classic
    reversible-network trick, a natural fit since every gate is unitary.

    Gradients agree with autodiff to f32 roundoff (intermediates reconstruct
    through <=k unitary applications).
    """
    layer, num_layers = placements['layers']
    free_placements = list(placements['free'])
    layer_depth = len(layer)
    nba = num_block_angles(entangling_gate_name, rotation_gates)
    n = num_qubits

    def forward(angles):
        return build_unitary_batched(num_qubits, entangling_gate_name,
                                     rotation_gates, placements, angles,
                                     columns=columns)

    def _dagger(g):
        return jnp.conj(jnp.swapaxes(g, 0, 1))

    def _step_back(u_after, u_bar, gate_of, a, p):
        """One reverse step through a gate: reconstruct the pre-gate state
        (u_before = G^dag u_after), pull the cotangent back and get the
        angle cotangent via one joint vjp. (A stacked variant that rode the
        rewind and the cotangent pull on one doubled-column application
        measured 649k vs 731k restart-iter/s on v5e — the concat/slice
        materialization costs more than the saved kernel.)"""
        g = gate_of(a)
        u_before = _apply_gate_batched(_dagger(g), u_after, p, n)

        def apply_fn(aa, uu):
            return _apply_gate_batched(gate_of(aa), uu, p, n)

        _, pull = jax.vjp(apply_fn, a, u_before)
        a_bar, u_bar_prev = pull(u_bar)
        return u_before, u_bar_prev, a_bar

    def _block_step_back(u_after, u_bar, a, p):
        gate_of = lambda aa: block_matrix_batched(entangling_gate_name,
                                                  rotation_gates, aa)
        return _step_back(u_after, u_bar, gate_of, a, p)

    def _surface_step_back(u_after, u_bar, a3, q):
        return _step_back(u_after, u_bar, surface_gate_batched, a3, [q])

    def fwd(angles):
        u = forward(angles)
        return u, (angles, u)

    def bwd(res, u_bar):
        angles, u = res
        angles = jnp.asarray(angles, dtype=config.real_dtype)
        B = angles.shape[-1]

        surface = angles[:3 * n].reshape(n, 3, B)
        block_angles = angles[3 * n:].reshape(-1, nba, B)
        layers_angles = block_angles[:layer_depth * num_layers].reshape(
            num_layers, layer_depth, nba, B)
        free_angles = block_angles[layer_depth * num_layers:]

        # free blocks, last applied first
        free_bars = [None] * len(free_placements)
        for j in reversed(range(len(free_placements))):
            u, u_bar, a_bar = _block_step_back(u, u_bar, free_angles[j],
                                               free_placements[j])
            free_bars[j] = a_bar

        # layers, reversed scan
        if num_layers > 0 and layer_depth > 0:
            def layer_back(carry, la):
                u, u_bar = carry
                bars = [None] * layer_depth
                for j in reversed(range(layer_depth)):
                    u, u_bar, a_bar = _block_step_back(u, u_bar, la[j], layer[j])
                    bars[j] = a_bar
                return (u, u_bar), jnp.stack(bars)

            (u, u_bar), layer_bars = lax.scan(layer_back, (u, u_bar),
                                              layers_angles, reverse=True)
        else:
            layer_bars = jnp.zeros((num_layers, layer_depth, nba, B),
                                   dtype=config.real_dtype)

        # surface round, last qubit first
        surf_bars = [None] * n
        for q in reversed(range(n)):
            u, u_bar, a_bar = _surface_step_back(u, u_bar, surface[q], q)
            surf_bars[q] = a_bar

        d_angles = jnp.concatenate([
            jnp.stack(surf_bars).reshape(3 * n, B),
            layer_bars.reshape(layer_depth * num_layers * nba, B),
            (jnp.stack(free_bars).reshape(-1, B) if free_bars
             else jnp.zeros((0, B), dtype=config.real_dtype)),
        ], axis=0)
        return (d_angles,)

    rev = jax.custom_vjp(forward)
    rev.defvjp(fwd, bwd)
    return rev


# --------------------------------------------------------------------------
# Batched losses on the (..., B) unitary
# --------------------------------------------------------------------------

def batched_cost_hst(u, u_target):
    """(B,) HS-test losses; u: (2,)*n + (2^n, B), u_target: (2^n, 2^n)."""
    n_legs = u.ndim - 1
    d = u_target.shape[0]
    t = jnp.asarray(u_target, dtype=config.complex_dtype).reshape(
        u.shape[:-1] + (1,))
    s = (u * t.conj()).reshape(-1, u.shape[-1]).sum(axis=0)
    return 1 - jnp.abs(s) ** 2 / d ** 2


def batched_disc(u, u_target):
    d = u_target.shape[0]
    t = jnp.asarray(u_target, dtype=config.complex_dtype).reshape(
        u.shape[:-1] + (1,))
    s = (u.conj() * t).reshape(-1, u.shape[-1]).sum(axis=0)
    return 1 - jnp.abs(s) / d


def batched_state_prep(u, target_state):
    """(B,) state-prep infidelities: uses only column 0 of the unitary."""
    n = u.ndim - 2
    d = 2 ** n
    col0 = u[..., 0, :].reshape(d, u.shape[-1])
    t = jnp.asarray(target_state, dtype=config.complex_dtype)[:, None]
    overlap = (t.conj() * col0).sum(axis=0)
    return 1 - jnp.abs(overlap) ** 2


def batched_unitary_loss(unitary_loss_func, u):
    """Evaluate a LossSpec (fast vectorized path) or an arbitrary per-unitary
    callable (vmap fallback over the trailing batch axis) on the batched u."""
    kind = getattr(unitary_loss_func, 'kind', None)
    target = getattr(unitary_loss_func, 'target', None)
    if kind == 'hst':
        return batched_cost_hst(u, target)
    if kind == 'disc':
        return batched_disc(u, target)
    if kind == 'state':
        return batched_state_prep(u, target)
    # generic: reshape to (2^n, 2^n, B) and vmap the callable over B
    n = u.ndim - 2
    d = 2 ** n
    um = u.reshape(d, d, u.shape[-1])
    return jax.vmap(unitary_loss_func, in_axes=-1)(um)


def make_batched_loss_and_penalty(num_qubits: int, entangling_gate_name: str,
                                  rotation_gates: str, placements: dict,
                                  unitary_loss_func, cp_mask,
                                  regularization_func,
                                  reversible: bool = True) -> Callable:
    """f(angles_PB) -> (loss_B, penalty_B) with the regularization weight
    NOT baked in: the caller combines `loss + r * penalty` with a runtime r,
    so one executable serves every (r, template-mask) trial of the adaptive
    search (see Synthesize.adaptive bucketed mode). State-preparation
    losses build only the |0...0> column (build_unitary_batched columns)."""
    columns = [0] if getattr(unitary_loss_func, 'kind', None) == 'state' \
        else None
    if reversible:
        builder = make_reversible_builder(num_qubits, entangling_gate_name,
                                          rotation_gates, placements,
                                          columns=columns)
    else:
        builder = lambda angles: build_unitary_batched(
            num_qubits, entangling_gate_name, rotation_gates, placements,
            angles, columns=columns)
    cp_mask = jnp.asarray(cp_mask, dtype=config.real_dtype)

    def f(angles):
        u = builder(angles)
        loss = batched_unitary_loss(unitary_loss_func, u)
        pen = regularization_func(angles * cp_mask[:, None]).sum(axis=0)
        return loss, pen
    return f


def make_batched_regloss(num_qubits: int, entangling_gate_name: str,
                         rotation_gates: str, placements: dict,
                         unitary_loss_func,
                         cp_mask=None, regularization_func=None,
                         r: float = 0.0, reversible: bool = False) -> Callable:
    """Returns f(angles_PB) -> (regloss_B, loss_B): the fused hot-path
    objective (loss + r * sum(penalty(cp angles))). reversible=True swaps in
    the storage-free custom-VJP builder (see make_reversible_builder).
    State-preparation losses build only the |0...0> column."""
    columns = [0] if getattr(unitary_loss_func, 'kind', None) == 'state' \
        else None
    if reversible:
        builder = make_reversible_builder(num_qubits, entangling_gate_name,
                                          rotation_gates, placements,
                                          columns=columns)
    else:
        builder = lambda angles: build_unitary_batched(
            num_qubits, entangling_gate_name, rotation_gates, placements,
            angles, columns=columns)

    def f(angles):
        u = builder(angles)
        loss = batched_unitary_loss(unitary_loss_func, u)
        if regularization_func is not None and cp_mask is not None:
            masked = angles * cp_mask[:, None]
            reg = r * regularization_func(masked).sum(axis=0)
            return loss + reg, loss
        return loss, loss
    return f
