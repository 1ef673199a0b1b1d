"""qx_alu-v3_35_chain's 24-CX closed form and its tower-field certificate
(benchmarks/qx_tower_proof.py): the row's irrational angles are the
toffoli-5 constant w3 (tan^2 w3 = 4 + 2 sqrt2), and the full 16-prime
modular-CRT proof is committed as
benchmarks/artifacts/exact/qx_alu-v3_35_chain_certificate.json.

The certificate is SELF-CONTAINED: it records the full 107-instruction
stream it proves, so it stays valid now that the capability artifact has
moved on to a lower count (the 23-CX row found later in queue 16)."""

import json
import math
import os

import pytest

_EXACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact')


def _cert():
    return json.load(open(os.path.join(
        _EXACT, 'qx_alu-v3_35_chain_certificate.json')))


def test_certificate_artifact_recorded():
    art = _cert()
    assert art['proven'] is True
    assert art['cx_count'] == 24
    assert art['qasm'] == 'alu-v3_35'
    assert art['num_primes'] * 26 > art['bound_bits'] + 2
    from benchmarks.qx_tower_proof import QX_TOWER_FORMS
    specs = QX_TOWER_FORMS['qx_alu-v3_35_chain'][1]
    assert art['closed_form'] == specs
    # the recorded stream matches the registered closed form
    got = [r['angle_spec'] for r in art['instructions']
           if 'angle_spec' in r]
    assert got == specs
    assert sum(1 for r in art['instructions'] if r['name'] == 'cz') == 24
    # the irrational family is exactly w3, appearing 4 times
    assert sum(1 for s in specs if 'w3' in s) == 4


def test_exact_target_is_signed_monomial():
    """alu-v3_35's qasm unitary is exactly a signed monomial matrix over
    Z[zeta_64] (e = 0, one +-x^k entry per row) — which is why the
    certificate is cheap."""
    from benchmarks.qx_tower_proof import _exact_target

    ent, e = _exact_target('alu-v3_35', 32)
    assert e == 0
    for i in range(32):
        nz = [(j, [int(c) for c in ent[i, j]]) for j in range(32)
              if any(int(c) for c in ent[i, j])]
        assert len(nz) == 1
        coeffs = [c for c in nz[0][1] if c]
        assert len(coeffs) == 1 and abs(coeffs[0]) == 1


@pytest.mark.slow
def test_certificate_stream_50_digits():
    """The recorded 24-CX stream IS the qasm unitary up to global phase
    at 50 digits (the certificate's claim, checked numerically)."""
    from benchmarks.closed_form_search import mp_verify
    from cpflow_tpu.circuits.ir import Circuit

    art = _cert()
    qc = Circuit(5)
    specs = []
    for r in art['instructions']:
        if 'angle_spec' in r:
            specs.append(r['angle_spec'])
            qc.append(r['name'], tuple(r['qubits']), 0.0)
        else:
            qc.append('cz', tuple(r['qubits']))
    loss = mp_verify(qc, specs, {'label': 'qx_alu-v3_35_chain',
                                 'loss_kind': 'hst'})
    assert abs(loss) < 1e-30, loss
