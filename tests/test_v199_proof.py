"""The 5-tower field behind the qx_one-two-three-v1_99 certificate
(benchmarks/v199_proof.py): Q(zeta_192)[Y][Z][G1][G2][G3], dim 3072 —
the compositum of the magic half-angle tower (zeta_48 proofs) and the
w-tower (toffoli-5 proofs) over the zeta_192 grid. The full 24-prime
run (~1-2 h) is recorded in the closed-form artifact; these tests
validate the layers: embeddings, relations, angle-addition constants,
operators, and the structure table."""

from fractions import Fraction

import numpy as np
import pytest


def test_field_constants_45_digits():
    from mpmath import mp
    from benchmarks import v199_proof as vp

    mp.dps = 50
    tol = mp.mpf(10) ** -42
    s2 = mp.sqrt(2)
    magic = mp.atan(s2)
    w = {'w1': mp.atan(2 - s2), 'w2': mp.atan(mp.sqrt(7 - 4 * s2)),
         'w3': mp.atan(mp.sqrt(4 + 2 * s2))}
    gen = {vp.BIT_Y: 6 * mp.cos(magic / 2),
           vp.BIT_Z: mp.sqrt(5 + 2 * s2),
           vp.BIT_G1: 34 * mp.cos(w['w1'] / 2),
           vp.BIT_G2: 4 * mp.cos(w['w2'] / 2),
           vp.BIT_G3: 34 * mp.cos(w['w3'] / 2)}
    for bit, val in gen.items():
        assert abs(vp.to_mp(vp._REL[bit], mp) - val ** 2) < tol
    # combination constants via exact angle addition
    combos = {'q1': mp.pi - 2 * w['w2'], 'q2': magic + w['w1'],
              'q3': mp.pi + w['w1'] - magic}
    for nm, ang in {**w, 'magic': magic, **combos}.items():
        c, s = vp.HALF[nm]
        assert abs(vp.to_mp(c, mp) - mp.cos(ang / 2)) < tol, nm
        assert abs(vp.to_mp(s, mp) - mp.sin(ang / 2)) < tol, nm


def test_embedding_is_ring_hom():
    """zeta_64 = zeta_192^3: embedded tower_field products must equal
    products of embeddings."""
    import random
    from mpmath import mp
    from benchmarks import tower_field as tf
    from benchmarks import v199_proof as vp

    random.seed(11)
    a, b = tf.zero(), tf.zero()
    for _ in range(4):
        a[(random.randrange(2), random.randrange(2), random.randrange(2),
           random.randrange(2), random.randrange(32))] = \
            Fraction(random.randrange(-3, 4))
        b[(random.randrange(2), random.randrange(2), random.randrange(2),
           random.randrange(2), random.randrange(32))] = \
            Fraction(random.randrange(-3, 4))
    lhs = vp.embed32(tf.mul(a, b))
    rhs = vp.mul(vp.embed32(a), vp.embed32(b))
    assert all((x - y) == 0
               for x, y in zip(lhs.reshape(-1), rhs.reshape(-1)))


def test_block_operator_matches_field_mul():
    import random
    from benchmarks import v199_proof as vp

    random.seed(5)
    const, _ = vp.half_trig('q2')          # exercises Y x G1 blocks
    blocks, D, l1 = vp.mult_operator(const)
    v = vp.zero()
    for _ in range(4):
        v[random.randrange(vp.NLVL), random.randrange(vp.M)] = \
            Fraction(random.randrange(-3, 4))
    want = vp.mul(const, v) * D
    got = vp.zero()
    for (t_out, t_in), blk in blocks.items():
        seg = v[t_in]
        acc = np.zeros(vp.M, dtype=object)
        for i in range(vp.M):
            if seg[i]:
                acc = acc + blk[:, i].astype(object) * seg[i]
        got[t_out] = got[t_out] + acc
    assert all((x - y) == 0
               for x, y in zip(got.reshape(-1), want.reshape(-1)))
    # l1 is a true row bound for this operator
    rowsum = max(int(sum(abs(int(c)) for c in blk[i]))
                 for blk in blocks.values() for i in range(vp.M))
    assert rowsum <= l1


def test_target_is_signed_monomial():
    from benchmarks.v199_proof import _monomial_target
    perm, kpow, sign = _monomial_target('one-two-three-v1_99', 32)
    assert sorted(perm) == list(range(32))
    assert set(np.abs(sign)) == {1}


@pytest.mark.slow
def test_certificate_recorded():
    """After the full run, the closed-form artifact carries the
    certificate metadata."""
    import json
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact',
        'qx_one-two-three-v1_99_closed_form.json')
    art = json.load(open(path))
    assert art.get('proven') is True
    assert art['num_primes'] * 26 > art['bound_bits'] + 2
    assert 'dim 3072' in art['field']
