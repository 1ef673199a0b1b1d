"""circuit_to_ansatz round-trip: embedding a concrete circuit into the
cp-ansatz template must reproduce its unitary up to global phase — the
warm-start contract (circuits/to_ansatz.py)."""

import math

import numpy as np
import pytest

from cpflow_tpu.circuits.ir import Circuit
from cpflow_tpu.circuits.to_ansatz import (circuit_to_ansatz, zyx_angles,
                                           zyx_reconstruct)


def _phase_dist(u, v):
    d = u.shape[0]
    return 1.0 - abs(np.sum(u * v.conj())) / d


def _random_su2(rng):
    z = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    q, r = np.linalg.qr(z)
    return q * (np.diag(r) / np.abs(np.diag(r)))


@pytest.mark.parametrize('seed', range(8))
def test_zyx_angles_random(seed):
    rng = np.random.default_rng(seed)
    u = _random_su2(rng)
    ax, ay, az = zyx_angles(u)
    v = zyx_reconstruct(ax, ay, az)
    assert _phase_dist(u, v) < 1e-12


@pytest.mark.parametrize('gate', ['id', 'x', 'y', 'z', 'h', 's', 't'])
def test_zyx_angles_named_gates(gate):
    from cpflow_tpu.circuits.ir import FIXED_GATES
    u = FIXED_GATES[gate]
    v = zyx_reconstruct(*zyx_angles(u))
    assert _phase_dist(u, v) < 1e-12


def _ansatz_unitary(n, placements, angles):
    import jax
    from cpflow_tpu.api import Ansatz
    from cpflow_tpu.topology import fill_layers
    anz = Ansatz(n, 'cp', fill_layers(placements, len(placements)), 'xyz')
    assert anz.num_angles == len(angles)
    return np.asarray(jax.jit(anz.unitary)(angles))


@pytest.mark.parametrize('seed', [0, 3, 11])
def test_random_circuit_round_trip(seed):
    rng = np.random.default_rng(seed)
    n = 3
    qc = Circuit(n)
    names = ['h', 'x', 's', 't', 'sdg', 'rx', 'ry', 'rz']
    for _ in range(30):
        r = rng.integers(0, 4)
        if r == 0:
            i, j = rng.choice(n, size=2, replace=False)
            if rng.integers(0, 2):
                qc.cz(int(i), int(j))
            else:
                qc.cp(float(rng.uniform(-np.pi, np.pi)), int(i), int(j))
        else:
            g = names[rng.integers(0, len(names))]
            q = int(rng.integers(0, n))
            if g in ('rx', 'ry', 'rz'):
                qc.append(g, q, float(rng.uniform(-np.pi, np.pi)))
            else:
                qc.append(g, q)
    placements, angles = circuit_to_ansatz(qc)
    u = _ansatz_unitary(n, placements, angles)
    assert _phase_dist(qc.unitary(), u) < 1e-6  # f32 ansatz build


def test_artifact_embedding_toffoli5():
    """Embed a committed 5q artifact circuit; the ansatz must reproduce
    its target to the artifact's own loss scale."""
    import json
    import os
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts',
        'toffoli5_connected_composite.json')
    meta = json.load(open(art))
    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))
    placements, angles = circuit_to_ansatz(qc)
    assert len(placements) == meta['cz_count']
    u = _ansatz_unitary(meta['num_qubits'], placements, angles)
    assert _phase_dist(qc.unitary(), u) < 1e-5


def test_unflattened_cx_rejected():
    qc = Circuit(2)
    qc.cx(0, 1)
    with pytest.raises(ValueError, match='flatten'):
        circuit_to_ansatz(qc)


def test_two_letter_basis_rejected():
    with pytest.raises(ValueError, match='xyz'):
        circuit_to_ansatz(Circuit(2), rotation_gates='xz')
