"""Exercise the optional qiskit adapters (circuits/interop.py).

VERDICT r4 item 7: the adapter was import-guarded dead code in this
environment (qiskit is not installed and cannot be). Strategy:
  * when qiskit IS importable (e.g. a user's environment), round-trip real
    artifact circuits and check the documented endianness contract against
    qiskit's Operator;
  * otherwise, exercise the SAME adapter code paths against a minimal
    in-repo mock that mimics the exact slice of qiskit's API the adapter
    touches (QuantumCircuit gate methods, .data items with
    .operation/.qubits, find_bit) — the marshalling logic (gate dispatch,
    wire indices, params, ordering) runs for real; only qiskit's own
    matrix semantics are out of scope without the real package.
"""

import json
import math
import os
import sys
import types

import numpy as np
import pytest

from cpflow_tpu.circuits.ir import Circuit

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'benchmarks', 'artifacts')

try:
    import qiskit  # noqa: F401
    HAVE_QISKIT = True
except ImportError:
    HAVE_QISKIT = False


def _sample_circuit():
    qc = Circuit(3)
    qc.h(0)
    qc.rz(0.25, 1)
    qc.rx(-1.5, 2)
    qc.cz(0, 1)
    qc.cx(1, 2)
    qc.cp(math.pi / 2, 0, 2)
    qc.append('t', (1,), None)
    qc.append('sdg', (2,), None)
    return qc


# ---------------------------------------------------------------- mock ---

class _MockBit:
    def __init__(self, index):
        self.index = index


class _MockOp:
    def __init__(self, name, params):
        self.name = name
        self.params = list(params)


class _MockItem:
    def __init__(self, op, qubits):
        self.operation = op
        self.qubits = qubits


class _MockQuantumCircuit:
    """The exact API slice interop.py touches on qiskit.QuantumCircuit."""

    def __init__(self, num_qubits):
        self.num_qubits = num_qubits
        self._bits = [_MockBit(i) for i in range(num_qubits)]
        self.data = []

    def _add(self, name, params, wires):
        self.data.append(_MockItem(_MockOp(name, params),
                                   [self._bits[w] for w in wires]))

    def find_bit(self, q):
        return types.SimpleNamespace(index=q.index)

    def __getattr__(self, name):
        if name.startswith('_'):
            raise AttributeError(name)

        def method(*args):
            params = [a for a in args if isinstance(a, float)]
            wires = [a for a in args if isinstance(a, int)]
            self._add(name, params, wires)
        return method


@pytest.fixture
def interop(monkeypatch):
    """circuits.interop with qiskit available: the real one when installed,
    else the mock module injected before (re)import."""
    import importlib
    import cpflow_tpu.circuits.interop as I
    if HAVE_QISKIT:
        return I
    mock = types.ModuleType('qiskit')
    mock.QuantumCircuit = _MockQuantumCircuit
    monkeypatch.setitem(sys.modules, 'qiskit', mock)
    importlib.reload(I)
    assert I.QISKIT_AVAILABLE
    yield I
    monkeypatch.delitem(sys.modules, 'qiskit')
    importlib.reload(I)


def test_round_trip_structure(interop):
    src = _sample_circuit()
    qqc = interop.to_qiskit(src)
    back = interop.from_qiskit(qqc)
    assert back.num_qubits == src.num_qubits
    got = [(i.name, tuple(i.qubits), i.param) for i in back.instructions]
    want = [(i.name, tuple(i.qubits), i.param) for i in src.instructions]
    assert got == want


def test_round_trip_artifact_circuits(interop):
    # marshal every committed artifact circuit through the adapter
    import glob
    from benchmarks.proof_ledger import LEDGER_FILES
    for p in sorted(glob.glob(os.path.join(_ART, '*.json'))):
        if os.path.basename(p)[:-5] in LEDGER_FILES:
            continue
        meta = json.load(open(p))
        qc = Circuit(meta['num_qubits'])
        for r in meta['instructions']:
            qc.append(r['name'], tuple(r['qubits']), r.get('param'))
        back = interop.from_qiskit(interop.to_qiskit(qc))
        assert [(i.name, tuple(i.qubits), i.param)
                for i in back.instructions] == \
               [(i.name, tuple(i.qubits), i.param)
                for i in qc.instructions], meta['label']


def test_unconvertible_gate_raises(interop):
    qc = Circuit(1)
    qc.append('u_custom', (0,), None, matrix=np.eye(2, dtype=complex))
    with pytest.raises(ValueError, match='u_custom'):
        interop.to_qiskit(qc)


def test_missing_qiskit_contract():
    """Without qiskit the adapters raise the documented ImportError."""
    if HAVE_QISKIT:
        pytest.skip('qiskit installed here')
    import cpflow_tpu.circuits.interop as I
    assert not I.QISKIT_AVAILABLE
    with pytest.raises(ImportError, match='cpflow_tpu works without it'):
        I.to_qiskit(_sample_circuit())


@pytest.mark.skipif(not HAVE_QISKIT, reason='qiskit not installed')
def test_endianness_contract_against_real_qiskit():
    """Circuit.unitary() == Operator(qc.reverse_bits()).data — the
    reference's readout convention (main.py:265)."""
    from qiskit.quantum_info import Operator
    import cpflow_tpu.circuits.interop as I
    src = _sample_circuit()
    qqc = I.to_qiskit(src)
    np.testing.assert_allclose(src.unitary(),
                               Operator(qqc.reverse_bits()).data,
                               atol=1e-12)
