"""qx_alu-v3_35_chain's closed form and its tower-field certificate
(benchmarks/qx_tower_proof.py): the row's irrational angles are the
toffoli-5 constant w3 (tan^2 w3 = 4 + 2 sqrt2), and the full 16-prime
modular-CRT proof is committed as
benchmarks/artifacts/exact/qx_alu-v3_35_chain_certificate.json."""

import json
import os

import pytest

_EXACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact')


def test_closed_form_matches_reduced_circuit():
    from benchmarks.closed_form_search import reduced_artifact
    from benchmarks.qx_tower_proof import QX_TOWER_FORMS

    qasm_name, specs = QX_TOWER_FORMS['qx_alu-v3_35_chain']
    assert qasm_name == 'alu-v3_35'
    qc, meta, _target = reduced_artifact('qx_alu-v3_35_chain')
    rot = [i for i in qc.instructions if i.param is not None]
    assert len(rot) == len(specs) == 83
    assert meta['loss_kind'] == 'hst'
    # the irrational family is exactly w3, appearing 4 times
    assert sum(1 for s in specs if 'w3' in s) == 4


def test_exact_target_is_signed_monomial():
    """alu-v3_35's qasm unitary is exactly a signed monomial matrix over
    Z[zeta_64] (e = 0, one +-x^k entry per row) — which is why the
    certificate is cheap."""
    from benchmarks.qx_tower_proof import M, _exact_target

    ent, e = _exact_target('alu-v3_35', 32)
    assert e == 0
    for i in range(32):
        nz = [(j, [int(c) for c in ent[i, j]]) for j in range(32)
              if any(int(c) for c in ent[i, j])]
        assert len(nz) == 1
        coeffs = [c for c in nz[0][1] if c]
        assert len(coeffs) == 1 and abs(coeffs[0]) == 1


def test_certificate_artifact_recorded():
    art = json.load(open(os.path.join(
        _EXACT, 'qx_alu-v3_35_chain_certificate.json')))
    assert art['proven'] is True
    assert art['cx_count'] == 24
    assert art['qasm'] == 'alu-v3_35'
    assert art['num_primes'] * 26 > art['bound_bits'] + 2
    from benchmarks.qx_tower_proof import QX_TOWER_FORMS
    assert art['closed_form'] == QX_TOWER_FORMS['qx_alu-v3_35_chain'][1]


@pytest.mark.slow
def test_closed_form_50_digits():
    from benchmarks.closed_form_search import mp_verify, reduced_artifact
    from benchmarks.qx_tower_proof import QX_TOWER_FORMS

    label = 'qx_alu-v3_35_chain'
    qc, meta, _ = reduced_artifact(label)
    meta['label'] = label
    loss = mp_verify(qc, QX_TOWER_FORMS[label][1], meta)
    assert abs(loss) < 1e-30, loss
