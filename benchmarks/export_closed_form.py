"""Export benchmarks/artifacts/exact/<label>_closed_form.json: the
greedy-reduced instruction stream of a committed artifact with one
angle_spec per rotation (closed_form_search's identified forms), the
constants used, and the 50-digit arbitrary-precision loss of the exact
form. This file is the input to the modular-CRT provers
(benchmarks/v199_proof.prove_qx and kin); prove updates it in place with
the certificate fields.

Usage: python -m benchmarks.export_closed_form <label> [label ...]
"""
from __future__ import annotations

import json
import os
import sys

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


def export(label: str) -> dict:
    from benchmarks.closed_form_search import reduced_artifact, search

    res = search(label, verbose=True)
    if res['unidentified']:
        raise RuntimeError(f'{label}: {len(res["unidentified"])} angles '
                           'unidentified — nothing to export')
    qc, meta, _target = reduced_artifact(label)
    specs = res['specs']
    it = iter(specs)
    rows = []
    for inst in qc.instructions:
        if inst.param is not None:
            rows.append({'name': inst.name, 'qubits': list(inst.qubits),
                         'angle_spec': next(it)})
        else:
            rows.append({'name': inst.name, 'qubits': list(inst.qubits)})
    assert next(it, None) is None

    constants = sorted({s.lstrip('+-0123456789/').replace('1-', '')
                        for s in specs if any(c.isalpha() for c in s)})
    out = {'label': label,
           'num_qubits': meta['num_qubits'],
           'cx_count': qc.gates_count(['cz']),
           'constants': constants,
           'mp_loss_50dig': res['mp_loss_50dig'],
           'status': 'closed form identified, proof pending',
           'proven': False,
           'instructions': rows}
    path = os.path.join(_ART, 'exact', f'{label}_closed_form.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f'wrote {path}')
    print(json.dumps({'label': label, 'specs': specs,
                      'mp_loss_50dig': res['mp_loss_50dig']}))
    return out


def main():
    for label in sys.argv[1:]:
        export(label)


if __name__ == '__main__':
    main()
