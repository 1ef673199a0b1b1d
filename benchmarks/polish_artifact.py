"""Polish a COMMITTED artifact in place: f64 Adam + exact coordinate
sweeps on the artifact's own instruction list, against the target stored
in targets.npz — for rows whose Results dill no longer exists (the r5 VM
reset ate the gitignored stores; the 144-CZ toffoli-7 composite survives
only as its artifact). Same numeric stages as polish_results, same
never-regress discipline: the artifact is rewritten only if the recomputed
loss IMPROVES at the identical gate list (CZ count cannot change).

Usage: python -m benchmarks.polish_artifact label [label ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


def polish_artifact(label: str, adam_iters: int = 4000) -> dict:
    from benchmarks.polish_results import _adam_polish
    from benchmarks.rational_survey import artifact_circuit, artifact_loss
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.circuits.ir import ROTATION_NAMES
    from cpflow_tpu.circuits.refine import polish_angles

    path = os.path.join(_ART, f'{label}.json')
    meta = json.load(open(path))
    target = np.load(os.path.join(_ART, 'targets.npz'))[label].astype(
        np.complex128)
    qc = artifact_circuit(meta)
    loss_fn = artifact_loss(meta, target)
    spec = LossSpec(meta['loss_kind'], target=target,
                    wires=meta.get('wires'), num_qubits=meta['num_qubits'])

    def loss_of_angles(a):
        it = iter(a)
        probe = qc.copy()
        for inst in probe.instructions:
            if inst.name in ROTATION_NAMES:
                inst.param = float(next(it))
        return float(loss_fn(probe.unitary()))

    before = float(loss_fn(qc.unitary()))
    polished, _ = _adam_polish(qc, spec, adam_iters=adam_iters)
    polished = polish_angles(loss_of_angles, polished, sweeps=3)
    after = loss_of_angles(polished)
    if after >= before:
        return {'label': label, 'cz': meta['cz_count'],
                'loss_before': before, 'loss_after': before,
                'skipped': 'no improvement'}

    it = iter(polished)
    for inst in qc.instructions:
        if inst.name in ROTATION_NAMES:
            inst.param = float(next(it))
    rows = [{'name': i.name, 'qubits': list(i.qubits),
             **({'param': float(i.param)} if i.param is not None else {})}
            for i in qc.instructions]
    assert sum(r['name'] == 'cz' for r in rows) == sum(
        1 for i0 in meta['instructions'] if i0['name'] == 'cz')
    meta['instructions'] = rows
    meta['loss'] = float(after)
    with open(path, 'w') as f:
        json.dump(meta, f, indent=1)
    return {'label': label, 'cz': meta['cz_count'],
            'loss_before': before, 'loss_after': after}


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    for label in sys.argv[1:]:
        try:
            print(json.dumps(polish_artifact(label)), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({'label': label,
                              'error': f'{type(e).__name__}: {e}'}),
                  flush=True)


if __name__ == '__main__':
    main()
