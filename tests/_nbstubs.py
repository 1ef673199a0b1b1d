"""Minimal qiskit stand-in for executing the REFERENCE tutorial notebook
against the cpflow shim (tests/test_reference_notebooks.py).

The notebook uses qiskit ONLY to build target unitaries/states
(QuantumCircuit + ccx/mct, Operator(qc.reverse_bits()).data,
Statevector.from_label); the unitaries are computed here directly with
numpy. install() registers the stub modules in sys.modules.
"""

import sys
import types

import numpy as np


def _mcx_unitary(n, qubits, big_endian):
    dim = 2 ** n
    u = np.eye(dim, dtype=complex)
    *controls, target = qubits

    def bit(i, q):
        return (i >> (n - 1 - q)) & 1 if big_endian else (i >> q) & 1

    for i in range(dim):
        if all(bit(i, c) for c in controls):
            j = i ^ (1 << (n - 1 - target) if big_endian else 1 << target)
            if j > i:
                u[[i, j]] = u[[j, i]]
    return u


class QuantumCircuit:
    def __init__(self, n):
        self.n = n
        self.ops = []
        self.big_endian = False

    def ccx(self, a, b, c):
        self.ops.append(('mcx', (a, b, c)))

    def mct(self, controls, target):
        self.ops.append(('mcx', (*controls, target)))

    def x(self, q):
        self.ops.append(('mcx', (q,)))

    def reverse_bits(self):
        out = QuantumCircuit(self.n)
        out.ops = list(self.ops)
        out.big_endian = not self.big_endian
        return out

    def draw(self, *a, **k):
        return None


class Operator:
    def __init__(self, qc):
        u = np.eye(2 ** qc.n, dtype=complex)
        for name, qubits in qc.ops:
            # qiskit is little-endian; reverse_bits() flips to big-endian,
            # this library's native convention (CLAUDE.md)
            u = _mcx_unitary(qc.n, qubits, qc.big_endian) @ u
        self.data = u


class Statevector:
    def __init__(self, data):
        self.data = data

    @classmethod
    def from_label(cls, label):
        v = np.zeros(2 ** len(label), dtype=complex)
        v[int(label, 2)] = 1.0
        return cls(v)


def install():
    qiskit = types.ModuleType('qiskit')
    qi = types.ModuleType('qiskit.quantum_info')
    qiskit.QuantumCircuit = QuantumCircuit
    qi.Operator = Operator
    qi.Statevector = Statevector
    qiskit.quantum_info = qi
    sys.modules['qiskit'] = qiskit
    sys.modules['qiskit.quantum_info'] = qi
