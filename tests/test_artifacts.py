"""Every committed benchmark artifact (benchmarks/artifacts/<label>.json,
the paper-table circuits RESULTS_r2.md claims) must rebuild and re-verify
against its stored target unitary below the paper's 1e-6 criterion, with
the claimed CZ count. This makes the headline rows reproducible from the
repo alone, with no saved optimizer state."""

import glob
import json
import os

import numpy as np
import pytest

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'benchmarks', 'artifacts')

from benchmarks.proof_ledger import LEDGER_FILES

_LABELS = sorted(os.path.basename(p)[:-5]
                 for p in glob.glob(os.path.join(_ART, '*.json'))
                 if os.path.basename(p)[:-5] not in LEDGER_FILES)


def _loss(meta, u, target):
    from cpflow_tpu.ops import losses

    kind = meta['loss_kind']
    if kind == 'hst':
        d = target.shape[0]
        return float(1 - abs((u * target.conj()).sum()) ** 2 / d ** 2)
    if kind == 'disc':
        d = target.shape[0]
        return float(1 - abs((u.conj() * target).sum()) / d)
    if kind == 'modulo_diagonal':
        return float(losses.disc_modulo_diagonal(
            target, u, meta['num_qubits'], meta['wires'], xp=np))
    if kind == 'modulo_identity':
        return float(losses.disc_modulo_identity(
            target, u, meta['num_qubits'], meta['wires'], xp=np))
    if kind == 'state':
        # state-prep artifacts store the target STATE in targets.npz; only
        # column |0..0> of the circuit matters (LossSpec.numpy, api.py)
        return float(1 - abs((target.conj() * u[:, 0]).sum()) ** 2)
    raise ValueError(kind)


@pytest.mark.parametrize('label', _LABELS)
def test_artifact_verifies(label):
    from cpflow_tpu.circuits.ir import Circuit

    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    targets = np.load(os.path.join(_ART, 'targets.npz'))
    target = targets[label].astype(np.complex128)

    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))

    assert qc.gates_count(['cz']) == meta['cz_count'], \
        f'{label}: claimed {meta["cz_count"]} CZ'
    loss = _loss(meta, qc.unitary(), target)
    # targets are stored complex64; allow f32-storage roundoff on top of
    # the paper's 1e-6 criterion
    assert loss < 1.5e-6, f'{label}: recomputed loss {loss:.3e}'


def test_clamp_parallel_trials_safe_envelope():
    """parallel_trials must never push the effective restart batch past the
    measured safe envelope (5q crash observed at 2048 samples x 2 trials)."""
    from benchmarks.configs import clamp_parallel_trials

    assert clamp_parallel_trials(5, 2048, 2) == 1
    assert clamp_parallel_trials(5, 1024, 2) == 2
    assert clamp_parallel_trials(5, 1024, 4) == 2
    assert clamp_parallel_trials(6, 512, 2) == 1
    assert clamp_parallel_trials(4, 2048, 4) == 4
    assert clamp_parallel_trials(5, 4096, 3) == 1  # never below 1
