"""Qubit-connectivity layers. Parity target: reference cpflow/topology.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_layer(num_qubits):
    """All-to-all pairs (topology.py:7-8)."""
    return [[i, j] for i in range(num_qubits) for j in range(i + 1, num_qubits)]


def chain_layer(num_qubits):
    """Nearest-neighbour chain (topology.py:11-12)."""
    return [[i, i + 1] for i in range(num_qubits - 1)]


def star_layer(num_qubits):
    """Star topology centered on qubit 0 (paper/CPFlow.tex Table 2 workloads)."""
    return [[0, i] for i in range(1, num_qubits)]


def square_layer(num_qubits=4):
    """Cycle topology (paper/CPFlow.tex tab toff4, 'square' diagram)."""
    return [[i, (i + 1) % num_qubits] for i in range(num_qubits)]


def kite_layer():
    """4q 'kite': triangle {1,2,3} with tail 0-1
    (paper/CPFlow.tex tab toff4, second diagram)."""
    return [[0, 1], [1, 2], [1, 3], [2, 3]]


def fill_layers(layer, depth):
    """Tile `layer` to produce `depth` blocks: full repetitions under 'layers'
    plus the remainder under 'free' (topology.py:15-20)."""
    num_complete_layers = depth // len(layer)
    complete_layers = [layer, num_complete_layers]
    incomplete_layer = layer[:depth % len(layer)]
    return {'layers': complete_layers, 'free': incomplete_layer}


def random_placement(num_qubits, coupling_map=None, key=None):
    if key is None:
        key = jax.random.PRNGKey(0)
    i, j = jax.random.choice(key, jnp.arange(num_qubits), (2,), replace=False)
    return [i, j]


def random_placements(num_qubits, num_gates, coupling_map=None, key=None):
    if key is None:
        key = jax.random.PRNGKey(0)
    placements = []
    for _ in range(num_gates):
        key, subkey = jax.random.split(key)
        placements.append(random_placement(num_qubits, coupling_map, subkey))
    return placements


def num_qubits_from_layer(layer):
    """Max index in the coupling map, plus 1 (topology.py:36-38)."""
    return max(item for sublist in layer for item in sublist) + 1
