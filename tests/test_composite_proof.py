"""The 30-CZ connected toffoli-5 composite closed form and its symbolic
certificate (benchmarks/composite_closed_form.py +
benchmarks/composite_proof.py).

The full 14-prime certificate takes ~2 min and its outcome is committed
as benchmarks/artifacts/exact/toffoli5_composite_certificate.json; these
tests validate the layers it rests on: the exact field arithmetic over
Q(zeta_192)[Y], the 50-digit embedding of every constant, the operator /
modular-multiplication layer, the Phi_192 projection, and the
closed-form instruction stream itself (high-precision hst vs toffoli-5).
"""

import json
import os
from fractions import Fraction

import numpy as np
import pytest

_ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks', 'artifacts')


def test_field_constants_50_digits():
    from mpmath import mp
    from benchmarks import composite_proof as cp

    mp.dps = 50
    magic = mp.atan(mp.sqrt(2))
    tol = mp.mpf(10) ** -45
    assert abs(cp.to_mp(cp.SQRT3, mp) - mp.sqrt(3)) < tol
    assert abs(cp.to_mp(cp.SQRT2, mp) - mp.sqrt(2)) < tol
    assert abs(cp.to_mp(cp.W_REL, mp)
               - (6 * mp.cos(magic / 2)) ** 2) < tol
    assert abs(cp.to_mp(cp.C_MAGIC, mp) - mp.cos(magic / 2)) < tol
    assert abs(cp.to_mp(cp.S_MAGIC, mp) - mp.sin(magic / 2)) < tol


def test_half_trig_matches_specs():
    from mpmath import mp
    from benchmarks import composite_proof as cp
    from benchmarks.exact_relphase_proof import parse_spec

    mp.dps = 40
    tol = mp.mpf(10) ** -35
    for spec in ['1/16', '-7/16', '1/3', '-1', '-magic', '1-magic',
                 '1/2-magic', '-1/2+magic', '3/4', '9/16']:
        r, sg = parse_spec(spec)
        a = (mp.mpf(r.numerator) / r.denominator) * mp.pi \
            + sg * mp.atan(mp.sqrt(2))
        c, s = cp.half_trig(spec)
        assert abs(cp.to_mp(c, mp) - mp.cos(a / 2)) < tol, spec
        assert abs(cp.to_mp(s, mp) - mp.sin(a / 2)) < tol, spec


def test_operator_and_modular_mult_agree_with_field():
    import random
    from benchmarks import composite_proof as cp

    random.seed(7)
    const, _ = cp.half_trig('1/2-magic')
    op, d = cp.mult_operator(const)
    v = cp.zero()
    for _ in range(4):
        v[random.randrange(2), random.randrange(cp.M)] = \
            Fraction(random.randrange(-3, 4))
    want = cp.mul(const, v).reshape(cp.DIM) * d
    got = np.zeros(cp.DIM, dtype=object)
    vf = v.reshape(cp.DIM)
    for j in range(cp.DIM):
        if vf[j]:
            got += op[:, j] * vf[j]
    assert all((x - y) == 0 for x, y in zip(got, want))

    p = 67108859
    a, b = cp.zero(), cp.zero()
    for _ in range(5):
        a[random.randrange(2), random.randrange(cp.M)] = \
            Fraction(random.randrange(-5, 6))
        b[random.randrange(2), random.randrange(cp.M)] = \
            Fraction(random.randrange(-5, 6))
    av = np.array([int(x) % p for x in a.reshape(cp.DIM)], dtype=np.int64)
    bv = np.array([int(x) % p for x in b.reshape(cp.DIM)], dtype=np.int64)
    got = cp._ring_mul_mod(av, bv, p)
    want = cp.mul(a, b).reshape(cp.DIM)
    assert all(int(got[k]) == int(want[k]) % p for k in range(cp.DIM))


def test_phi192_projection_is_the_true_component():
    """x^96+1 = Phi_192 * Phi_64; the reduction must agree with evaluating
    at zeta_192 (i.e. be the identity on the complex embedding)."""
    from mpmath import mp
    from benchmarks import composite_proof as cp

    mp.dps = 30
    p = 67108859
    vec = np.zeros(cp.M, dtype=np.int64)
    vec[70] = 3
    vec[95] = 1
    vec[10] = -2
    red = cp._phi192_reduce_mod(vec % p, p)
    assert len(red) == 64
    x = mp.e ** (1j * mp.pi / cp.M)
    orig = 3 * x ** 70 + x ** 95 - 2 * x ** 10
    # interpret reduced coords centered mod p
    val = mp.mpc(0)
    for k in range(64):
        c = int(red[k])
        if c > p // 2:
            c -= p
        val += c * x ** k
    assert abs(val - orig) < 1e-20


def test_composite_instruction_streams():
    from benchmarks.composite_closed_form import BUILDERS, cz_cost
    instrs = BUILDERS['toffoli5_connected_composite']()
    assert cz_cost(instrs) == 30          # the paper-beating count
    names = {nm for nm, _q, _s in instrs}
    assert names == {'rx', 'rz', 'cz', 'h', 'cp'}
    # W appears twice (inverse + direct): 8 magic-family rotations total
    n_magic = sum(1 for _nm, _q, sp in instrs
                  if sp is not None and 'magic' in sp)
    assert n_magic == 8
    chain = BUILDERS['toffoli5_chain_composite']()
    assert cz_cost(chain) == 48           # the paper's chain count
    n_magic = sum(1 for _nm, _q, sp in chain
                  if sp is not None and 'magic' in sp)
    assert n_magic == 4                   # 2 magic angles per chain W


@pytest.mark.parametrize('label,phase_num', [
    ('toffoli5_connected_composite', -1),
    ('toffoli5_chain_composite', 3),
])
def test_composite_closed_form_is_toffoli5_mpmath(label, phase_num):
    """End-to-end: the closed-form instruction streams ARE toffoli-5 up
    to global phase at 40 digits (the symbolic certificates' claim)."""
    from mpmath import mp
    from benchmarks.composite_closed_form import (BUILDERS,
                                                  hst_vs_toffoli5,
                                                  mp_unitary)
    U = mp_unitary(BUILDERS[label](), dps=40)
    loss, s = hst_vs_toffoli5(U)
    assert loss < mp.mpf(10) ** -38
    # the global phases are zeta_64 powers, as the ring says
    mp.dps = 40
    want = mp.e ** (phase_num * 1j * mp.pi / 32)
    assert abs(s / 32 - want) < mp.mpf(10) ** -38


@pytest.mark.parametrize('artname,label,cz', [
    ('toffoli5_composite_certificate.json',
     'toffoli5_connected_composite', 30),
    ('toffoli5_chain_composite_certificate.json',
     'toffoli5_chain_composite', 48),
])
def test_certificate_artifact_recorded(artname, label, cz):
    path = os.path.join(_ART, 'exact', artname)
    art = json.load(open(path))
    assert art['proven'] is True
    assert art['cz_count'] == cz
    assert art['num_primes'] * 26 > art['bound_bits'] + 2
    # the committed instruction stream must match the builder exactly
    from benchmarks.composite_closed_form import BUILDERS
    instrs = BUILDERS[label]()
    assert len(art['instructions']) == len(instrs)
    for got, (nm, qs, sp) in zip(art['instructions'], instrs):
        assert got['name'] == nm and got['qubits'] == list(qs)
        assert got.get('angle_spec') == (sp if sp is not None else None)


@pytest.mark.slow
def test_full_certificate_reproduces():
    from benchmarks.composite_proof import prove
    res = prove(verbose=False)
    assert res['proven'] is True
    assert res['cz_count'] == 30
