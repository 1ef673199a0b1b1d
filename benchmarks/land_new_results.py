"""Land freshly stored decompositions as COMMITTED-GREEN artifacts in one
step: for every dill in benchmarks/results/ with no matching artifact,
export -> f64-polish -> re-verify (< 1e-6 or the artifact is deleted
again) -> record a ledger attempt row so the proof-ledger gates stay
green. The r4/r5 failure mode this kills: records found on the TPU but
never exported (or exported without ledger rows) leave the suite red at
the next snapshot (VERDICT r4 weak-1/weak-4).

A new artifact additionally needs a benchmarks/proof_ledger.PROOF_STATUS
registry row; this tool prints a loud reminder listing any label it
landed that is missing one (the suite's test_proof_ledger gate enforces
it at commit time).

Usage: python -m benchmarks.land_new_results [label ...]
       (default: every results/ dill without an artifacts/<label>.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from benchmarks.proof_ledger import PROOF_STATUS

_DIR = os.path.dirname(os.path.abspath(__file__))
_RESULTS = os.path.join(_DIR, 'results')
_ART = os.path.join(_DIR, 'artifacts')


def _recompute_loss(label: str) -> float:
    """Re-verify exactly the way tests/test_artifacts.py does, in a
    subprocess so a bad artifact cannot poison this interpreter."""
    code = (
        'import jax; jax.config.update("jax_platforms", "cpu")\n'
        'import json, os, numpy as np\n'
        'from tests.test_artifacts import _loss, _ART\n'
        'from cpflow_tpu.circuits.ir import Circuit\n'
        f'label = {label!r}\n'
        'meta = json.load(open(os.path.join(_ART, label + ".json")))\n'
        'target = np.load(os.path.join(_ART, "targets.npz"))[label]'
        '.astype(np.complex128)\n'
        'qc = Circuit(meta["num_qubits"])\n'
        'for r in meta["instructions"]:\n'
        '    qc.append(r["name"], tuple(r["qubits"]), r.get("param"))\n'
        'assert qc.gates_count(["cz"]) == meta["cz_count"]\n'
        'print(_loss(meta, qc.unitary(), target))\n')
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=600, cwd=os.path.dirname(_DIR))
    if r.returncode != 0:
        raise RuntimeError(f're-verify failed: {r.stderr.strip()[-500:]}')
    return float(r.stdout.strip().splitlines()[-1])


def land(label: str) -> dict:
    art_path = os.path.join(_ART, f'{label}.json')
    steps = {}

    r = subprocess.run([sys.executable, '-m', 'benchmarks.export_artifacts',
                        label], capture_output=True, text=True, timeout=600)
    steps['export'] = r.stdout.strip()
    if r.returncode != 0 or not os.path.exists(art_path):
        return {'label': label, 'landed': False, 'steps': steps,
                'error': f'export failed: {r.stderr.strip()[-300:]}'}

    r = subprocess.run([sys.executable, '-m', 'benchmarks.polish_artifacts',
                        label], capture_output=True, text=True, timeout=1800)
    steps['polish'] = r.stdout.strip().splitlines()[-1:] or ''

    loss = _recompute_loss(label)
    steps['reverified_loss'] = loss
    if not loss < 1e-6:
        os.remove(art_path)
        return {'label': label, 'landed': False, 'steps': steps,
                'error': f'recomputed loss {loss:.3e} >= 1e-6; artifact '
                         'removed (never land a non-verifying artifact)'}

    # ledger attempt row (keeps test_cyclotomic_claims_agree_with_ledger
    # green); a real proof attempt runs later in the serial proof pipeline
    ledger_path = os.path.join(_ART, 'exact_proofs.json')
    ledger = json.load(open(ledger_path))
    if label not in ledger:
        ledger[label] = {
            'label': label, 'proven': False,
            'reason': 'landed by land_new_results; closed-form/exact '
                      'attempt queued in the serial proof pipeline'}
        tmp = ledger_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
        os.replace(tmp, ledger_path)
        steps['ledger'] = 'attempt row added'

    return {'label': label, 'landed': True, 'loss': loss,
            'registry_row': label in PROOF_STATUS, 'steps': steps}


def main():
    labels = sys.argv[1:]
    if not labels:
        have = {os.path.basename(p)[:-5]
                for p in os.listdir(_ART) if p.endswith('.json')}
        labels = sorted(d for d in os.listdir(_RESULTS)
                        if os.path.isfile(os.path.join(_RESULTS, d))
                        and not d.endswith('.json')  # envelope/ref records
                        and d not in have) if os.path.isdir(_RESULTS) else []
    missing_registry = []
    for label in labels:
        try:
            out = land(label)
        except Exception as e:  # noqa: BLE001 — keep landing the rest
            out = {'label': label, 'landed': False,
                   'error': f'{type(e).__name__}: {e}'}
        if out.get('landed') and not out.get('registry_row'):
            missing_registry.append(label)
        print(json.dumps(out), flush=True)
    if missing_registry:
        print(json.dumps({'WARNING': 'labels landed WITHOUT a '
                          'proof_ledger.PROOF_STATUS registry row — the '
                          'suite will stay red until one is added',
                          'labels': missing_registry}), flush=True)
        sys.exit(3)


if __name__ == '__main__':
    main()
