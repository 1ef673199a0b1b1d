"""Polish committed artifacts IN PLACE: float64 Adam + exact coordinate
sweeps on the artifact's rotation angles against its stored target, gate
counts untouched (VERDICT r3 weak-item 1: two rows escaped the f64 pass
because their Results pickles are gitignored and did not survive the VM;
the committed JSON artifact is the durable record, so polish that).

Same machinery as benchmarks/polish_results.py (which needs the Results
pickle); here the circuit rebuilds from benchmarks/artifacts/<label>.json
and the target from targets.npz, exactly like tests/test_artifacts.py.

Usage: python -m benchmarks.polish_artifacts <label ...>
       python -m benchmarks.polish_artifacts --below 1e-9   # all stale rows
"""

from __future__ import annotations

from benchmarks.proof_ledger import LEDGER_FILES

import glob
import json
import os
import sys

import numpy as np

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


def _load(label: str):
    from cpflow_tpu.circuits.ir import Circuit
    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    target = np.load(os.path.join(_ART, 'targets.npz'))[label]
    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))
    return meta, qc, target


def polish_artifact(label: str) -> dict:
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.circuits.ir import ROTATION_NAMES
    from cpflow_tpu.circuits.refine import host_loss_adapter, polish_angles
    from benchmarks.polish_results import _adam_polish

    meta, qc, target = _load(label)
    kw = {'wires': meta['wires'], 'num_qubits': meta['num_qubits']} \
        if meta['loss_kind'] in ('modulo_diagonal', 'modulo_identity') else {}
    spec = LossSpec(meta['loss_kind'], target=target.astype(np.complex128),
                    **kw)
    loss_fn = host_loss_adapter(spec)

    def loss_of_angles(a):
        it = iter(a)
        probe = qc.copy()
        for inst in probe.instructions:
            if inst.name in ROTATION_NAMES:
                inst.param = float(next(it))
        return float(loss_fn(probe.unitary()))

    before = float(meta['loss'])
    polished, mid = _adam_polish(qc, spec, adam_iters=6000, lr=1e-3)
    polished = polish_angles(loss_of_angles, polished, sweeps=3)
    after = loss_of_angles(polished)
    if after < before:
        it = iter(polished)
        for inst in qc.instructions:
            if inst.name in ROTATION_NAMES:
                inst.param = float(next(it))
        rows = [{'name': i.name, 'qubits': list(i.qubits),
                 **({'param': float(i.param)} if i.param is not None else {})}
                for i in qc.instructions]
        meta['instructions'] = rows
        meta['loss'] = after
        with open(os.path.join(_ART, f'{label}.json'), 'w') as f:
            json.dump(meta, f, indent=1)
    return {'label': label, 'cz': meta['cz_count'], 'loss_before': before,
            'adam': mid, 'loss_after': min(after, before)}


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    args = sys.argv[1:]
    if args[:1] == ['--below']:
        floor = float(args[1])
        labels = []
        for p in sorted(glob.glob(os.path.join(_ART, '*.json'))):
            name = os.path.basename(p)[:-5]
            if name in LEDGER_FILES:
                continue
            if json.load(open(p))['loss'] > floor:
                labels.append(name)
    else:
        labels = args
    for label in labels:
        try:
            print(json.dumps(polish_artifact(label)), flush=True)
        except Exception as e:  # noqa: BLE001 — keep polishing the rest
            print(json.dumps({'label': label,
                              'error': f'{type(e).__name__}: {e}'}),
                  flush=True)


if __name__ == '__main__':
    main()
