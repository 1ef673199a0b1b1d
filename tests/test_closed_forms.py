"""Closed-form identification of the 6-CZ relative-phase toffoli-4.

Round-3 discovery (RESULTS_r3 §17): the numerically-synthesized 6-CZ
relphase toffoli-4 (benchmarks/artifacts/relphase_toff4_connected.json,
beats the paper's 11-CZ chain row structurally) has an EXACT closed-form
angle set — every angle is either a rational multiple of pi (denominators
1,2,3,4) or in the arctan(sqrt 2) family (the Margolus magic angle;
arctan(1/sqrt 2) = pi/2 - arctan(sqrt 2)).

Two tiers: a 60-digit mpmath verification (U * toffoli4 diagonal with
unit-modulus entries to 1e-50), and the FULL symbolic proof over the
quadratic extension Z[zeta_48][Y]/(Y^2 - 6(3+sqrt 3)) — exact integer
arithmetic end to end (benchmarks/exact_relphase_proof.py)."""

import json
import math
import os

import numpy as np
import pytest

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'benchmarks', 'artifacts')


def _reduced_relphase_circuit():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from benchmarks.rational_survey import artifact_circuit, artifact_loss
    from cpflow_tpu.circuits.refine import reduce_angles
    from cpflow_tpu.circuits.passes import remove_zero_rgates

    label = 'relphase_toff4_connected'
    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    targets = np.load(os.path.join(_ART, 'targets.npz'))
    target = targets[label].astype(np.complex128)
    qc = artifact_circuit(meta)
    loss = artifact_loss(meta, target)
    return remove_zero_rgates(reduce_angles(qc, loss)), target


# the closed form, as (kind, value) with value in units of pi or 'magic'
# family members; order matches the reduced circuit's rotation sequence
CLOSED_FORM = ['1', '3/4', '-magic', '1/3', '1-magic', '3/4', '1/4', '1',
               '-magic', '1/3', '1/2-magic', '1/2', '-3/4', '1/2']


def _angle(spec, mp):
    magic = mp.atan(mp.sqrt(2))
    if spec == '-magic':
        return -magic
    if spec == '1-magic':
        return mp.pi - magic
    if spec == '1/2-magic':
        return mp.pi / 2 - magic
    num, _, den = spec.partition('/')
    return mp.pi * mp.mpf(int(num)) / mp.mpf(int(den) if den else 1)


def test_relphase_toff4_closed_form_60_digits():
    from mpmath import mp, matrix, cos, sin, mpc, fabs

    mp.dps = 60
    qc, _ = _reduced_relphase_circuit()
    rot = [i for i in qc.instructions if i.param is not None]
    assert len(rot) == len(CLOSED_FORM)
    # The closed form sits on the same coupled gauge family as the float
    # reduction: the last three rotations move together (pinning one moves
    # the others), so individual angles can differ by up to ~0.03*pi while
    # the clean rationals and the magic pair match to f64 accuracy.
    for inst, spec in zip(rot, CLOSED_FORM):
        assert abs(inst.param - float(_angle(spec, mp))) < 0.1, \
            (inst.param, spec)

    n = qc.num_qubits
    d = 2 ** n
    u = matrix(d, d)
    for i in range(d):
        u[i, i] = mpc(1)
    ai = 0
    for inst in qc.instructions:
        if inst.param is not None:
            a = _angle(CLOSED_FORM[ai], mp)
            ai += 1
            c, s = cos(a / 2), sin(a / 2)
            if inst.name == 'rx':
                g = [[c, -1j * s], [-1j * s, c]]
            elif inst.name == 'rz':
                g = [[c - 1j * s, 0], [0, c + 1j * s]]
            else:
                raise AssertionError(inst.name)
            b = 1 << (n - 1 - inst.qubits[0])
            for col in range(d):
                for i0 in range(d):
                    if i0 & b:
                        continue
                    i1 = i0 | b
                    x0, x1 = u[i0, col], u[i1, col]
                    u[i0, col] = g[0][0] * x0 + g[0][1] * x1
                    u[i1, col] = g[1][0] * x0 + g[1][1] * x1
        else:
            assert inst.name == 'cz'
            b0 = 1 << (n - 1 - inst.qubits[0])
            b1 = 1 << (n - 1 - inst.qubits[1])
            for col in range(d):
                for i0 in range(d):
                    if (i0 & b0) and (i0 & b1):
                        u[i0, col] = -u[i0, col]

    # modulo-diagonal equivalence: (U * T) diagonal, unit-modulus diagonal
    # toffoli-4 permutation: swaps the last two basis states
    perm = list(range(d))
    perm[d - 2], perm[d - 1] = perm[d - 1], perm[d - 2]
    tol = mp.mpf(10) ** (-50)
    for i in range(d):
        for j in range(d):
            v = u[i, perm[j]]          # (U*T)[i,j] = U[i, perm(j)]
            if i == j:
                assert fabs(fabs(v) - 1) < tol, (i, fabs(v))
            else:
                assert fabs(v) < tol, (i, j, fabs(v))


def test_relphase_toff4_ring_proof():
    """Full symbolic proof over the quadratic extension
    Z[zeta_48][Y]/(Y^2 - 6(3+sqrt 3)) — exact integer arithmetic end to
    end, no floats: the 6-CZ relative-phase toffoli-4 closed form
    implements toffoli-4 up to relative phases, PROVEN."""
    from benchmarks.exact_relphase_proof import prove

    result = prove()
    assert result['proven']
    assert result['cz_count'] == 6


def test_relphase_toff4_chain_ring_proof():
    """The paper's own 11-CZ chain relphase toffoli-4 row (CPFlow.tex tab
    toff4) also has a closed form — dyadics/thirds plus the magic family,
    identified by benchmarks/closed_form_search.py — proven symbolically
    over the same quadratic ring."""
    from benchmarks.exact_relphase_proof import prove

    result = prove('relphase_toff4_chain')
    assert result['proven']
    assert result['cz_count'] == 11


def test_relphase_toff4_chain_closed_form_60_digits():
    from benchmarks.closed_form_search import reduced_artifact, mp_verify
    from benchmarks.exact_relphase_proof import CLOSED_FORMS

    label = 'relphase_toff4_chain'
    qc, meta, _ = reduced_artifact(label)
    meta['label'] = label
    loss = mp_verify(qc, CLOSED_FORMS[label], meta)
    assert loss < 1e-100, loss


def test_spec_languages_agree():
    """closed_form_search emits specs in the same language the ring proofs
    consume: float values must agree on every registry entry."""
    from benchmarks.closed_form_search import spec_value
    from benchmarks.exact_relphase_proof import (CLOSED_FORMS,
                                                 closed_form_value)

    for specs in CLOSED_FORMS.values():
        for s in specs:
            assert abs(spec_value(s) - closed_form_value(s)) < 1e-15, s


def test_identify_round_trips():
    from benchmarks.closed_form_search import identify, spec_value

    for s in ['1', '-3/4', '1/3', '-magic', '1-magic', '1/2-magic',
              '1/6+magic', '-2/3', '1/4']:
        got = identify(spec_value(s))
        assert got is not None and abs(
            spec_value(got) - spec_value(s)) < 1e-12, (s, got)


def test_alu_v3_34_hst_ring_proof():
    """qx_alu-v3_34's published-optimal 14-CX decomposition (paper tab
    bench I) is fully closed-form — rationals + thirds + the magic pair as
    pi - arctan(sqrt2) twice — and PROVEN equal to its qasm circuit up to
    global phase: the target is evaluated exactly from the reference qasm
    over Z[zeta_48] and the inner-product certificate |<U,T>| == d holds
    as a ring identity. First ibm_qx row with irrational angles proven."""
    from benchmarks.exact_relphase_proof import prove_hst

    result = prove_hst('qx_alu-v3_34')
    assert result['proven']
    assert result['cx_count'] == 14


@pytest.mark.slow
def test_alu_v0_26_chain_hst_ring_proof():
    """qx_alu-v0_26_chain's 25-CX row (beats the published 28 by 3) is
    fully closed-form — rationals (denominators <= 4 plus thirds) and the
    magic family — and PROVEN equal to its qasm circuit up to global
    phase over the same quadratic ring as alu-v3_34 (round-3
    closed_form_sweep identification; mp loss 2.2e-32 at 50 digits)."""
    from benchmarks.exact_relphase_proof import prove_hst

    result = prove_hst('qx_alu-v0_26_chain')
    assert result['proven']
    assert result['cx_count'] == 25


@pytest.mark.slow
def test_toffoli5_closed_form_60_digits():
    """The 37-CZ connected toffoli-5 row is fully closed-form: dyadic
    rationals (denominators up to 16) plus the three certified toffoli-5
    constants w1/w2/w3 — verified here to 50 digits (1.9e-210 in the
    discovery run; symbolic ring proof needs the w-tower ring, ROADMAP)."""
    from benchmarks.closed_form_search import (KNOWN_CLOSED_FORMS,
                                               mp_verify, reduced_artifact)

    label = 'toffoli5_connected'
    qc, meta, _ = reduced_artifact(label)
    meta['label'] = label
    loss = mp_verify(qc, KNOWN_CLOSED_FORMS[label], meta)
    assert loss < 1e-50, loss


def test_v1_99_closed_form_artifact_recorded():
    """qx_one-two-three-v1_99's 46-CX row (the LARGEST published-table
    beat, 52 -> 46) is fully closed-form: pi-rationals (denominators
    <= 8) + the sqrt2 family, incl. the combination constants
    q1 = pi - 2 w2, q2 = magic + w1, q3 = pi + w1 - magic. The stream
    artifact is self-contained (survives later capability updates)."""
    import json, os
    from benchmarks.closed_form_search import KNOWN_CLOSED_FORMS

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact',
        'qx_one-two-three-v1_99_closed_form.json')
    art = json.load(open(path))
    assert art['cx_count'] == 46
    specs = [r['angle_spec'] for r in art['instructions']
             if 'angle_spec' in r]
    assert specs == KNOWN_CLOSED_FORMS['qx_one-two-three-v1_99']
    assert sum(1 for r in art['instructions'] if r['name'] == 'cz') == 46


def test_combination_constants_60_digits():
    """q1/q2/q3 equal their quartic/quadratic tangent-minpoly forms found
    by the sweep: tan^2 q1 = 23 + 16 sqrt2, tan q2 = 6 + 4 sqrt2,
    tan q3 = (2 sqrt2 - 6)/7."""
    from mpmath import mp
    from benchmarks.closed_form_search import mp_constant

    mp.dps = 60
    s2 = mp.sqrt(2)
    tol = mp.mpf(10) ** -55
    assert abs(mp_constant('q1', mp)
               - mp.atan(mp.sqrt(23 + 16 * s2))) < tol
    assert abs(mp_constant('q2', mp) - mp.atan(6 + 4 * s2)) < tol
    assert abs(mp_constant('q3', mp)
               - (mp.pi + mp.atan((2 * s2 - 6) / 7))) < tol


@pytest.mark.slow
def test_v1_99_closed_form_50_digits():
    """The recorded 46-CX stream IS the qasm unitary up to global phase
    at 50+ digits."""
    import json, os
    from benchmarks.closed_form_search import mp_verify
    from cpflow_tpu.circuits.ir import Circuit

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact',
        'qx_one-two-three-v1_99_closed_form.json')
    art = json.load(open(path))
    qc = Circuit(5)
    specs = []
    for r in art['instructions']:
        if 'angle_spec' in r:
            specs.append(r['angle_spec'])
            qc.append(r['name'], tuple(r['qubits']), 0.0)
        else:
            qc.append('cz', tuple(r['qubits']))
    loss = mp_verify(qc, specs, {'label': 'qx_one-two-three-v1_99',
                                 'loss_kind': 'hst'})
    assert abs(loss) < 1e-30, loss


def test_4gt13_91_chain_closed_form_artifact_recorded():
    """qx_4gt13_91_chain's 24-CX row (beats the published 25) is fully
    closed-form: pi-rationals (denominators <= 12) + {magic, w1, q1} of
    the sqrt2 family — identified by the round-3 sweep in one
    Gauss-Newton round. The stream artifact is self-contained."""
    from benchmarks.closed_form_search import KNOWN_CLOSED_FORMS

    path = os.path.join(_ART, 'exact',
                        'qx_4gt13_91_chain_closed_form.json')
    art = json.load(open(path))
    assert art['cx_count'] == 24
    specs = [r['angle_spec'] for r in art['instructions']
             if 'angle_spec' in r]
    assert specs == KNOWN_CLOSED_FORMS['qx_4gt13_91_chain']
    assert sum(1 for r in art['instructions'] if r['name'] == 'cz') == 24


@pytest.mark.slow
def test_4gt13_91_chain_closed_form_50_digits():
    """The recorded 24-CX stream IS the 4gt13_91 qasm unitary up to
    global phase at 50+ digits."""
    from benchmarks.closed_form_search import mp_verify
    from cpflow_tpu.circuits.ir import Circuit

    path = os.path.join(_ART, 'exact',
                        'qx_4gt13_91_chain_closed_form.json')
    art = json.load(open(path))
    qc = Circuit(5)
    specs = []
    for r in art['instructions']:
        if 'angle_spec' in r:
            specs.append(r['angle_spec'])
            qc.append(r['name'], tuple(r['qubits']), 0.0)
        else:
            qc.append('cz', tuple(r['qubits']))
    loss = mp_verify(qc, specs, {'label': 'qx_4gt13_91_chain',
                                 'loss_kind': 'hst'})
    assert abs(loss) < 1e-30, loss
