"""Generate golden fixtures by RUNNING the reference implementation
(/root/reference/cpflow) on CPU and recording its outputs.

The reference imports qiskit/hyperopt at module scope but the recorded
surfaces (build_unitary, cost_HST/disc, random_cp_angles, mynimize) are pure
jax — so those deps are stubbed with tripwires that raise if actually
exercised. Run from the repo root:

    python tests/golden/make_goldens.py

Produces tests/golden/reference_goldens.npz consumed by
tests/test_golden_reference.py. The fixtures are recorded outputs, not
reference code.
"""

import os
import sys
import types

import numpy as np

sys.path.insert(0, '/root/reference')

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)


def _tripwire(name):
    def fail(*a, **k):
        raise RuntimeError(f'stubbed {name} was called — golden surface '
                           f'is not pure-jax anymore')
    return fail


def install_stubs():
    qiskit = types.ModuleType('qiskit')
    circuit = types.ModuleType('qiskit.circuit')
    library = types.ModuleType('qiskit.circuit.library')
    quantum_info = types.ModuleType('qiskit.quantum_info')
    transpiler = types.ModuleType('qiskit.transpiler')
    passes = types.ModuleType('qiskit.transpiler.passes')

    class Parameter(str):
        pass

    # reference gates.py builds its toffoli constants at import time via
    # QuantumCircuit(...).mct(...) + Operator(reverse_bits()).data; provide
    # just enough for that (the constants are not goldened — our targets
    # below are independent diagonals)
    class _StubQC:
        def __init__(self, n):
            self.n = n
            self._mct = []

        def ccx(self, a, b, c):
            self._mct.append(([a, b], c))

        def mct(self, controls, target):
            self._mct.append((list(controls), target))

        def reverse_bits(self):
            return self

    class _StubOperator:
        def __init__(self, qc):
            d = 2 ** qc.n
            u = np.eye(d, dtype=np.complex64)
            for controls, target in qc._mct:
                # big-endian after reverse_bits: qubit 0 = MSB
                for b in range(d):
                    if all((b >> (qc.n - 1 - c)) & 1 for c in controls):
                        pass
                m = np.eye(d, dtype=np.complex64)
                tbit = 1 << (qc.n - 1 - target)
                for b in range(d):
                    if all((b >> (qc.n - 1 - c)) & 1 for c in controls):
                        m[b, b] = 0
                        m[b, b ^ tbit] = 1
                u = m @ u
            self.data = u

    qiskit.QuantumCircuit = _StubQC
    qiskit.transpile = _tripwire('qiskit.transpile')
    circuit.Parameter = Parameter
    library.Permutation = _tripwire('qiskit Permutation')
    for gname in ('RXGate', 'RYGate', 'RZGate', 'CPhaseGate', 'CZGate',
                  'CXGate'):
        setattr(library, gname, _tripwire(f'qiskit {gname}'))

    class _StubGate:  # instantiated in dicts at reference module scope
        def inverse(self):
            return self

    for gname in ('IGate', 'XGate', 'YGate', 'ZGate', 'HGate', 'SGate',
                  'SdgGate', 'TGate', 'TdgGate'):
        setattr(library, gname, _StubGate)
    quantum_info.Operator = _StubOperator
    quantum_info.OneQubitEulerDecomposer = _tripwire('EulerDecomposer')
    transpiler.PassManager = _tripwire('PassManager')
    passes.Optimize1qGates = _tripwire('Optimize1qGates')
    qiskit.circuit = circuit
    qiskit.quantum_info = quantum_info
    qiskit.transpiler = transpiler
    sys.modules['qiskit'] = qiskit
    sys.modules['qiskit.circuit'] = circuit
    sys.modules['qiskit.circuit.library'] = library
    sys.modules['qiskit.quantum_info'] = quantum_info
    sys.modules['qiskit.transpiler'] = transpiler
    sys.modules['qiskit.transpiler.passes'] = passes

    hyperopt = types.ModuleType('hyperopt')
    for name in ('hp', 'fmin', 'tpe', 'Trials', 'STATUS_OK'):
        setattr(hyperopt, name, _tripwire(f'hyperopt.{name}'))
    pyll = types.ModuleType('hyperopt.pyll')
    pyll.scope = _tripwire('hyperopt.pyll.scope')
    hyperopt.pyll = pyll
    sys.modules['hyperopt'] = hyperopt
    sys.modules['hyperopt.pyll'] = pyll

    # modern jax removed jax.ops (cp_utils does `from jax import ops`)
    if not hasattr(jax, 'ops'):
        jax.ops = types.ModuleType('jax.ops')

    # reference's qiskit-dependent exact_decompositions must not load
    sys.modules.setdefault('qiskit.dagcircuit', types.ModuleType('q.d'))


def main():
    install_stubs()
    # the reference was written against an older jax whose fori_loop allowed
    # concretizing the index; run everything eagerly instead (goldens are
    # tiny, speed is irrelevant)
    jax.config.update('jax_disable_jit', True)

    from cpflow.main import build_unitary  # reference, pure jax
    from cpflow.matrix_utils import cost_HST, disc
    from cpflow.cp_utils import random_cp_angles
    from cpflow.optimization import mynimize
    from cpflow.topology import fill_layers, chain_layer, connected_layer

    out = {}

    configs = [
        ('3q_chain_cp_xyz_k4', 3, chain_layer(3), 'cp', 'xyz', 4, 7),
        ('3q_conn_cp_xz_k5', 3, connected_layer(3), 'cp', 'xz', 5, 11),
        ('4q_chain_cz_xyz_k6', 4, chain_layer(4), 'cz', 'xyz', 6, 3),
        ('5q_chain_cp_xyz_k8', 5, chain_layer(5), 'cp', 'xyz', 8, 42),
    ]
    for tag, n, layer, ent, rot, k, seed in configs:
        placements = fill_layers(layer, k)
        anz_unitary = lambda a: build_unitary(n, ent, rot, placements, a)
        nba = {'cp': 2 * len(rot) + 1, 'cz': 2 * len(rot),
               'cx': 2 * len(rot)}[ent]
        num_angles = 3 * n + nba * k

        key = jax.random.PRNGKey(seed)
        # cp mask layout: angles after the 3n surface round, every nba-th is
        # the block's CP angle ('uniform' draw ignores it, but pass it anyway)
        import jax.numpy as jnp
        cpm = np.zeros(num_angles, dtype=np.float32)
        if ent == 'cp':
            cpm[3 * n + nba - 1::nba] = 1
        angles = random_cp_angles(num_angles, jnp.array(cpm),
                                  cp_dist='uniform', key=key)
        angles = np.asarray(angles)

        u = np.asarray(anz_unitary(angles)).reshape(2 ** n, 2 ** n)
        out[f'{tag}/angles'] = angles
        out[f'{tag}/unitary'] = u

        # losses of this unitary against a fixed diagonal target
        d = 2 ** n
        tgt = np.diag(np.exp(1j * np.linspace(0, 1, d))).astype(np.complex64)
        out[f'{tag}/cost_hst'] = np.float32(cost_HST(u, tgt))
        out[f'{tag}/disc'] = np.float32(disc(u, tgt))

    # one short reference Adam run (keep_history=True trajectory)
    tag, n, layer, ent, rot, k, seed = configs[0]
    placements = fill_layers(layer, k)
    anz_unitary = lambda a: build_unitary(n, ent, rot, placements, a)
    d = 2 ** n
    tgt = np.zeros((d, d), dtype=np.complex64)
    tgt[d - 2, d - 1] = tgt[d - 1, d - 2] = 1
    for i in range(d - 2):
        tgt[i, i] = 1
    loss = lambda a: cost_HST(anz_unitary(a), tgt)
    angles0 = out['3q_chain_cp_xyz_k4/angles']
    params_hist, loss_hist = mynimize(
        loss, len(angles0), method='adam', learning_rate=0.1,
        num_iterations=60, initial_params=angles0.astype(np.float32))
    out['adam/initial'] = np.asarray(angles0)
    out['adam/loss_history'] = np.asarray(loss_hist)
    out['adam/final_params'] = np.asarray(params_hist)[-1]

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'reference_goldens.npz')
    np.savez_compressed(path, **out)
    print(f'wrote {path}: {sorted(out)[:6]}... ({len(out)} arrays)')


if __name__ == '__main__':
    main()
