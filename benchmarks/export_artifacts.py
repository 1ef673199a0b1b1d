"""Export the best stored decompositions as committed, verifiable
artifacts: benchmarks/artifacts/<label>.json holds the instruction list,
CZ count and loss; targets.npz holds each label's target unitary. The
paper-table claims in RESULTS_r2.md are then reproducible from the repo
alone — tests/test_artifacts.py rebuilds every circuit and re-verifies it
against its target below the 1e-6 criterion.

Usage: python -m benchmarks.export_artifacts [label ...]  (default: all
stored results)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results')
_ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'artifacts')


def export_label(label: str) -> dict:
    from cpflow_tpu.api import Results

    res = Results.load(os.path.join(_RESULTS, label))
    if not res.decompositions:
        return {'label': label, 'skipped': 'no decompositions'}
    best = min(res.decompositions, key=lambda d: (d.cz_count, d.loss))
    spec = res.loss_function

    os.makedirs(_ARTIFACTS, exist_ok=True)
    rows = [{'name': i.name, 'qubits': list(i.qubits),
             **({'param': float(i.param)} if i.param is not None else {})}
            for i in best.circuit.instructions]
    meta = {'label': label, 'cz_count': int(best.cz_count),
            'cz_depth': int(best.cz_depth), 'loss': float(best.loss),
            'loss_kind': spec.kind, 'num_qubits': best.circuit.num_qubits,
            'instructions': rows}
    if spec.kind in ('modulo_diagonal', 'modulo_identity'):
        meta['wires'] = spec.wires
    with open(os.path.join(_ARTIFACTS, f'{label}.json'), 'w') as f:
        json.dump(meta, f, indent=1)

    tpath = os.path.join(_ARTIFACTS, 'targets.npz')
    targets = dict(np.load(tpath)) if os.path.exists(tpath) else {}
    targets[label] = np.asarray(spec.target, dtype=np.complex64)
    np.savez_compressed(tpath, **targets)
    return {'label': label, 'cz': int(best.cz_count), 'loss': float(best.loss)}


def main():
    labels = sys.argv[1:] or sorted(
        d for d in os.listdir(_RESULTS)
        if os.path.isfile(os.path.join(_RESULTS, d)))
    for label in labels:
        try:
            out = export_label(label)
        except Exception as e:  # noqa: BLE001 — keep exporting the rest
            out = {'label': label, 'error': f'{type(e).__name__}: {e}'}
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
