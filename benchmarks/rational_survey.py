"""Which committed artifacts reduce to fully-rational-angle circuits?

For every artifact in benchmarks/artifacts/: rebuild, run the refine
pipeline's first two stages (greedy angle reduction + rationalization,
reference exact_decompositions.py:193-258 semantics), and report whether
every surviving rotation angle is an exact rational multiple of pi
(denominator <= 32). Rational survivors are candidates for the exact
cyclotomic-integer proofs in benchmarks/exact_proofs.py.

Host-CPU only; one JSON line per artifact to stdout.
"""

import glob
import json
import math
import os
import sys
import time
from fractions import Fraction

from benchmarks.proof_ledger import LEDGER_FILES

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'benchmarks', 'artifacts')


def artifact_circuit(meta):
    from cpflow_tpu.circuits.ir import Circuit
    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))
    return qc


def artifact_loss(meta, target):
    from cpflow_tpu.ops import losses
    kind = meta['loss_kind']
    d = target.shape[0]
    if kind == 'hst':
        return lambda u: float(1 - abs((u * target.conj()).sum()) ** 2 / d ** 2)
    if kind == 'modulo_diagonal':
        return lambda u: float(losses.disc_modulo_diagonal(
            target, u, meta['num_qubits'], meta['wires'], xp=np))
    if kind == 'modulo_identity':
        return lambda u: float(losses.disc_modulo_identity(
            target, u, meta['num_qubits'], meta['wires'], xp=np))
    if kind == 'state':
        # target is the stored state vector; column |0..0> of the circuit.
        # Normalize: a unit vector stored complex64 carries a ~3e-8 norm
        # deficit that would floor the infidelity of an EXACT circuit at
        # that deficit (measured on ghz8: raw 3.42e-8 vs 9.5e-17 after
        # normalization, RESULTS_r5).
        t = target.reshape(-1)
        t = t / np.linalg.norm(t)
        return lambda u: float(1 - abs((t.conj() * u[:, 0]).sum()) ** 2)
    raise ValueError(kind)


def survey_label(label, max_denominator=32):
    from cpflow_tpu.circuits import refine as refine_mod
    from cpflow_tpu.circuits.passes import (all_rgates_are_rational,
                                            rationalize_all_rgates,
                                            remove_zero_rgates)

    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    targets = np.load(os.path.join(_ART, 'targets.npz'))
    target = targets[label].astype(np.complex128)
    qc = artifact_circuit(meta)
    loss = artifact_loss(meta, target)

    t0 = time.time()
    row = {'label': label, 'num_qubits': meta['num_qubits'],
           'cz': meta['cz_count'], 'loss_kind': meta['loss_kind']}
    try:
        qc2 = refine_mod.reduce_angles(qc, loss)
        qc2 = remove_zero_rgates(qc2)
        qc3 = rationalize_all_rgates(qc2, max_denominator=max_denominator,
                                     angle_threshold=1e-3)
        qc3 = remove_zero_rgates(qc3)
        rational = all_rgates_are_rational(qc3,
                                           int(math.log2(max_denominator)))
        fr = [Fraction(p / math.pi).limit_denominator(max_denominator)
              for p in qc3.parameters]
        row.update({
            'rational': bool(rational),
            'final_loss': loss(qc3.unitary()),
            'num_angles': len(fr),
            'denominators': sorted({f.denominator for f in fr}),
            'cz_after': qc3.gates_count(['cz']),
        })
    except Exception as e:  # noqa: BLE001 — survey rows must not abort the run
        row.update({'rational': False, 'error': f'{type(e).__name__}: {e}'})
    row['wall_s'] = round(time.time() - t0, 1)
    return row



def main():
    labels = sys.argv[1:] or sorted(
        os.path.basename(p)[:-5]
        for p in glob.glob(os.path.join(_ART, '*.json'))
        if os.path.basename(p)[:-5] not in LEDGER_FILES)
    for label in labels:
        row = survey_label(label)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
