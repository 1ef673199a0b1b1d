"""Optional qiskit interop.

The reference is built ON qiskit; this library is self-contained, but users
coming from it may want their results as qiskit circuits (drawing,
transpiling, running). These adapters activate only when qiskit happens to
be installed; nothing else in the library imports them.
"""

from __future__ import annotations

from cpflow_tpu.circuits.ir import Circuit, ROTATION_NAMES

try:
    import qiskit  # noqa: F401
    QISKIT_AVAILABLE = True
except ImportError:
    QISKIT_AVAILABLE = False


def _require_qiskit():
    if not QISKIT_AVAILABLE:
        raise ImportError(
            'qiskit is not installed; cpflow_tpu works without it — this '
            'adapter only converts circuits for external tooling.')


def to_qiskit(circ: Circuit):
    """IR circuit -> qiskit.QuantumCircuit (same gate order and wires).

    Note the endianness contract: this library's Circuit.unitary() equals
    qiskit's Operator(qc.reverse_bits()).data for the converted circuit
    (the reference reads unitaries exactly that way, main.py:265)."""
    _require_qiskit()
    from qiskit import QuantumCircuit

    qc = QuantumCircuit(circ.num_qubits)
    for inst in circ.instructions:
        name, qs, p = inst.name, list(inst.qubits), inst.param
        if name in ROTATION_NAMES:
            getattr(qc, name)(p, qs[0])
        elif name == 'cp':
            qc.cp(p, qs[0], qs[1])
        elif name in ('cz', 'cx', 'swap'):
            getattr(qc, name)(qs[0], qs[1])
        elif name in ('h', 'x', 'y', 'z', 's', 'sdg', 't', 'tdg', 'id'):
            if name == 'id':
                qc.id(qs[0])
            else:
                getattr(qc, name)(qs[0])
        else:
            raise ValueError(f'cannot convert gate {name!r} to qiskit')
    return qc


def from_qiskit(qc) -> Circuit:
    """qiskit.QuantumCircuit -> IR circuit (supported gate set only)."""
    _require_qiskit()
    circ = Circuit(qc.num_qubits)
    for item in qc.data:
        gate = item[0] if isinstance(item, tuple) else item.operation
        qargs = item[1] if isinstance(item, tuple) else item.qubits
        wires = [qc.find_bit(q).index for q in qargs]
        name = gate.name.lower()
        param = float(gate.params[0]) if gate.params else None
        circ.append(name, wires, param)
    return circ
