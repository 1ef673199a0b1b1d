"""The toffoli-5 closed-form certificate machinery (benchmarks/
tower_field.py + benchmarks/toffoli5_proof.py).

The full 19-prime certificate takes ~20 min and its outcome is committed
as benchmarks/artifacts/exact/toffoli5_connected_certificate.json; these
tests validate every layer it rests on: exact tower-field arithmetic,
the 50-digit embedding of all derived constants, operator/scale
correctness, and the mod-p ring multiplication."""

import numpy as np
import pytest
from fractions import Fraction


def test_tower_field_relations_and_inverse():
    from benchmarks import tower_field as tf

    for idx, rel in [((0, 0, 1, 0, 0), tf.G1SQ), ((0, 1, 0, 0, 0), tf.G2SQ),
                     ((1, 0, 0, 0, 0), tf.G3SQ), ((0, 0, 0, 1, 0), tf.Z2)]:
        g = tf.zero()
        g[idx] = Fraction(1)
        assert tf.is_zero(tf.mul(g, g) - rel)
    a = tf.zero()
    a[(1, 0, 1, 1, 5)] = Fraction(3, 2)
    a[(0, 1, 0, 0, 11)] = Fraction(-2, 7)
    a[(0, 0, 0, 0, 0)] = Fraction(1)
    assert tf.equals_scalar(tf.mul(a, tf.inv(a)), 1)
    x5 = tf.from_x_power(5)
    assert tf.equals_scalar(tf.mul(x5, tf.conj(x5)), 1)


def test_constants_50_digits():
    from mpmath import mp
    from benchmarks import toffoli5_proof as tp
    from benchmarks import tower_field as tf

    mp.dps = 50
    sqrt2 = mp.sqrt(2)
    w = {'w1': mp.atan(2 - sqrt2), 'w2': mp.atan(mp.sqrt(7 - 4 * sqrt2)),
         'w3': mp.atan(mp.sqrt(4 + 2 * sqrt2))}
    for nm, ang in w.items():
        for el, want in [
                (getattr(tp, f'COS_{nm.upper()}'), mp.cos(ang)),
                (getattr(tp, f'SIN_{nm.upper()}'), mp.sin(ang)),
                (tp.COS_HALF[nm], mp.cos(ang / 2)),
                (tp.SIN_HALF[nm], mp.sin(ang / 2))]:
            assert abs(tf.to_mp(el, mp) - want) < mp.mpf(10) ** -40


def test_half_trig_field_matches_spec_values():
    from mpmath import mp
    from benchmarks import toffoli5_proof as tp
    from benchmarks import tower_field as tf
    from benchmarks.closed_form_search import spec_value

    mp.dps = 30
    for s in ['1/2', '-3/4', '15/16', '1-w1', '-1/2-w3', 'w2', '7/16']:
        c, sn = tp.half_trig_field(s)
        a = mp.mpf(spec_value(s))
        assert abs(tf.to_mp(c, mp) - mp.cos(a / 2)) < 1e-12, s
        assert abs(tf.to_mp(sn, mp) - mp.sin(a / 2)) < 1e-12, s


def test_operator_and_modular_mult_agree_with_field():
    import random
    from benchmarks import toffoli5_proof as tp
    from benchmarks import tower_field as tf

    random.seed(3)
    const, _ = tp.half_trig_field('1-w2')
    op, d = tp.mult_operator(const)
    v = tf.zero()
    for _ in range(4):
        idx = (random.randrange(2), random.randrange(2), random.randrange(2),
               random.randrange(2), random.randrange(32))
        v[idx] = Fraction(random.randrange(-3, 4))
    want = tf.mul(const, v).reshape(512) * d
    got = np.zeros(512, dtype=object)
    vf = v.reshape(512)
    for j in range(512):
        if vf[j]:
            got += op[:, j] * vf[j]
    assert all((x - y) == 0 for x, y in zip(got, want))

    p = 67108859
    a, b = tf.zero(), tf.zero()
    for _ in range(5):
        a[(random.randrange(2), random.randrange(2), random.randrange(2),
           random.randrange(2), random.randrange(32))] = \
            Fraction(random.randrange(-5, 6))
        b[(random.randrange(2), random.randrange(2), random.randrange(2),
           random.randrange(2), random.randrange(32))] = \
            Fraction(random.randrange(-5, 6))
    av = np.array([int(x) % p for x in a.reshape(512)], dtype=np.int64)
    bv = np.array([int(x) % p for x in b.reshape(512)], dtype=np.int64)
    got = tp._ring_mul_mod(av, bv, p)
    want = tf.mul(a, b).reshape(512)
    assert all(int(got[k]) == int(want[k]) % p for k in range(512))


@pytest.mark.slow
def test_certificate_artifact_recorded_and_reproducible_prefix():
    """The committed certificate artifact says proven=true with the primes
    and bound recorded; re-verify the artifact's claim structure."""
    import json, os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'benchmarks', 'artifacts', 'exact',
        'toffoli5_connected_certificate.json')
    art = json.load(open(path))
    assert art['proven'] is True
    assert art['cz_count'] == 37
    # primes are just under 2^26 (see toffoli5_proof._primes)
    assert art['num_primes'] * 26 > art['bound_bits'] + 2
