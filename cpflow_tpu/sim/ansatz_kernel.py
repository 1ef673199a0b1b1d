"""The ansatz forward pass: angles -> 2^n x 2^n unitary.

Parity target: reference cpflow/main.py:23-146 (EntanglingBlock, split_angles,
build_unitary). Semantics (angle layout, block structure, ordering) match the
reference exactly; the implementation is a jit/vmap-friendly ``lax.scan`` over
complete connectivity layers with the (static-placement) blocks unrolled
inside each layer, so compile time scales with layer length, not total depth,
and XLA fuses the whole chain of small contractions.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from cpflow_tpu import config
from cpflow_tpu.ops import gates
from cpflow_tpu.sim.apply import apply_gate_to_tensor


def num_block_angles(entangling_gate_name: str, rotation_gates: str) -> int:
    """2 rotation angles per rotation letter + 1 CP angle if applicable
    (main.py:32-34)."""
    return 2 * len(rotation_gates) + (entangling_gate_name == 'cp')


def block_matrix(entangling_gate_name: str, rotation_gates: str, angles):
    """4x4 unitary of one entangling block (main.py:69-82).

    Layout of `angles` (length 2m or 2m+1): up rotations at even indices,
    down rotations at odd indices, CP angle last (main.py:43-46).
    """
    if entangling_gate_name == 'cx':
        u = gates.cx_mat.astype(config.complex_dtype)
    elif entangling_gate_name == 'cz':
        u = gates.cz_mat.astype(config.complex_dtype)
    elif entangling_gate_name == 'cp':
        u = gates.cp_mat(angles[-1])
    else:
        raise ValueError(f"Unknown entangling gate {entangling_gate_name!r}")

    for i, letter in enumerate(rotation_gates):
        rot = gates.ROTATION_MATS[letter]
        up = rot(angles[2 * i])
        down = rot(angles[2 * i + 1])
        u = jnp.matmul(jnp.kron(up, down), u, precision=config.PRECISION)
    return u


def split_angles(angles, num_qubits, nba, layer_len=0, num_layers=0):
    """Slice the flat angle vector into surface / per-block groups
    (main.py:85-103). The layout contract is part of the public API: results
    from the reference and from this build index angles identically.
    """
    surface_angles = angles[:3 * num_qubits].reshape(num_qubits, 3)
    block_angles = angles[3 * num_qubits:].reshape(-1, nba)
    if num_layers is None:
        layers_angles = []
    else:
        layers_angles = block_angles[:layer_len * num_layers].reshape(
            num_layers, layer_len, nba)
    free_block_angles = block_angles[layer_len * num_layers:]
    if nba % 2 == 1:  # CP blocks carry their CP angle last.
        cp_angles = [b[-1] for b in block_angles]
    else:
        cp_angles = []

    return {'surface angles': surface_angles,
            'block angles': block_angles,
            'layers angles': layers_angles,
            'free block angles': free_block_angles,
            'cp angles': cp_angles}


def cp_angle_indices(num_qubits: int, nba: int, num_blocks: int):
    """Flat indices of CP angles: 3n + j*nba + (nba-1)."""
    return [3 * num_qubits + j * nba + (nba - 1) for j in range(num_blocks)]


def surface_gate(a):
    """Initial per-qubit 1q round: Rz(a2) Rx(a1) Rz(a0) (main.py:122-123)."""
    zx = jnp.matmul(gates.rz_mat(a[2]), gates.rx_mat(a[1]), precision=config.PRECISION)
    return jnp.matmul(zx, gates.rz_mat(a[0]), precision=config.PRECISION)


def build_unitary(num_qubits, entangling_gate_name, rotation_gates, placements,
                  angles):
    """Assemble the full ansatz unitary (main.py:106-146).

    placements: {'layers': [layer, num_layers], 'free': [...]} from
    topology.fill_layers. Returns a 2^n x 2^n complex matrix (big-endian).
    """
    layer, num_layers = placements['layers']
    free_placements = placements['free']
    layer_depth = len(layer)
    nba = num_block_angles(entangling_gate_name, rotation_gates)

    angles = jnp.asarray(angles, dtype=config.real_dtype)
    angles_dict = split_angles(angles, num_qubits, nba, layer_depth, num_layers)
    surface_angles = angles_dict['surface angles']
    layers_angles = angles_dict['layers angles']
    free_block_angles = angles_dict['free block angles']

    u = jnp.eye(2 ** num_qubits, dtype=config.complex_dtype)
    u = u.reshape([2] * (2 * num_qubits))

    # Initial round of single-qubit gates.
    for i in range(num_qubits):
        u = apply_gate_to_tensor(surface_gate(surface_angles[i]), u, [i])

    # Complete layers: scan over the layer axis; placements are static inside.
    if num_layers > 0 and layer_depth > 0:
        def apply_layer(u, layer_angles):
            for j, p in enumerate(layer):
                g = block_matrix(entangling_gate_name, rotation_gates,
                                 layer_angles[j]).reshape(2, 2, 2, 2)
                u = apply_gate_to_tensor(g, u, p)
            return u, None

        u, _ = lax.scan(apply_layer, u, layers_angles)

    # Remainder (free) blocks, unrolled.
    for j, p in enumerate(free_placements):
        g = block_matrix(entangling_gate_name, rotation_gates,
                         free_block_angles[j]).reshape(2, 2, 2, 2)
        u = apply_gate_to_tensor(g, u, p)

    return u.reshape(2 ** num_qubits, 2 ** num_qubits)
