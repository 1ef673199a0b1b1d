"""Every committed symbolic artifact (benchmarks/artifacts/exact/<label>.json)
must re-prove from the repo alone: rebuild the circuit from its exact
pi-fraction instructions, evaluate it over cyclotomic integers, and re-check
the equality certificate against the exactly-constructed target.

These are complete symbolic proofs (arbitrary-precision integer arithmetic,
no floats) — the in-repo version of the paper's external Mathematica
verification (reference paper/CPFlow.tex:430)."""

import glob
import json
import math
import os

import pytest

_EXACT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      'benchmarks', 'artifacts', 'exact')

def _meta(label):
    return json.load(open(os.path.join(_EXACT, f'{label}.json')))


# Only pi-rational instruction-list artifacts (keyed by the cyclotomic
# modulus 'q') re-prove here; certificate-style files — the modular-CRT
# proofs of the 37-CZ toffoli-5 and the 30/48-CZ composites, whose
# instruction streams carry irrational 'angle_spec's — have their own
# dedicated tests (tests/test_toffoli5_proof.py,
# tests/test_composite_proof.py).
_LABELS = sorted(l for l in (os.path.basename(p)[:-5]
                             for p in glob.glob(os.path.join(_EXACT, '*.json')))
                 if 'q' in _meta(l))


def _rebuild(meta):
    from cpflow_tpu.circuits.ir import Circuit
    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        if 'angle_pi_fraction' in r:
            num, den = r['angle_pi_fraction']
            qc.append(r['name'], tuple(r['qubits']), math.pi * num / den)
        else:
            qc.append(r['name'], tuple(r['qubits']))
    return qc


def _prove(label):
    from benchmarks.exact_proofs import exact_target
    from cpflow_tpu.circuits import exact_unitary as ex

    meta = json.load(open(os.path.join(_EXACT, f'{label}.json')))
    qc = _rebuild(meta)
    assert qc.gates_count(['cz']) == meta['cz_count']
    q = meta['q']
    target, cert_kind = exact_target(label, meta['num_qubits'], q)
    assert cert_kind == meta['certificate']
    u = ex.exact_unitary(qc, q)
    if cert_kind == 'hst':
        assert ex.hst_equal_certificate(u, target), \
            f'{label}: exact HST certificate failed'
    else:
        assert ex.diagonal_certificate(ex.matmul_exact(u, target)), \
            f'{label}: exact diagonal certificate failed'


@pytest.mark.parametrize('label',
                         [l for l in _LABELS if _meta(l)['num_qubits'] <= 4])
def test_exact_artifact_reproves(label):
    _prove(label)


@pytest.mark.slow
@pytest.mark.parametrize('label',
                         [l for l in _LABELS if _meta(l)['num_qubits'] > 4])
def test_exact_artifact_reproves_large(label):
    _prove(label)
