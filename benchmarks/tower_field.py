"""Exact arithmetic in F = Q(zeta_64)[Z][G1][G2][G3] — the number field of
the 37-CZ connected toffoli-5 closed form (closed_form_search.
KNOWN_CLOSED_FORMS): dyadic angles live in Q(zeta_64); the three certified
constants w1/w2/w3 need one common square root

    Z^2 = 5 + 2 sqrt2          (sec^2 w3; also 7 - 4 sqrt2 = (sqrt2-1)^2 Z^2)

plus one scaled half-angle generator each:

    G1 = 34 cos(w1/2),  G1^2 = 578 + 34 (3 sqrt2 + 1) Z
    G2 =  4 cos(w2/2),  G2^2 = 8 + 2 sqrt2 (2 cos pi/8)
    G3 = 34 cos(w3/2),  G3^2 = 578 + 34 (5 - 2 sqrt2) Z

Elements are (2,2,2,2,32) arrays of Fractions: tower bits (G3,G2,G1,Z)
times the power basis of Z[x]/(x^32+1), x -> zeta_64. Exact end to end;
every derived constant is validated against 50-digit mpmath in
tests/test_toffoli5_proof.py. dim_Q F = 512.

Used by toffoli5_proof.py (modular-CRT certificate that the closed form
implements toffoli-5 exactly up to global phase).
"""

from fractions import Fraction

import numpy as np

M = 32              # x^M = -1, x -> zeta_64
SHAPE = (2, 2, 2, 2, M)   # (g3, g2, g1, z, cyclotomic)


def zero():
    a = np.empty(SHAPE, dtype=object)
    a[...] = Fraction(0)
    return a


def from_x_power(k, coeff=1):
    """coeff * x^k as a field element (x^M = -1)."""
    a = zero()
    k %= 2 * M
    s = 1
    if k >= M:
        k -= M
        s = -1
    a[0, 0, 0, 0, k] = Fraction(coeff) * s
    return a


def one():
    return from_x_power(0)


def scalar(q):
    return from_x_power(0, Fraction(q))


def add(a, b):
    return a + b


def neg(a):
    return -a


def _cyc_mul(u, v):
    """Negacyclic convolution of two length-M object vectors."""
    out = np.empty(M, dtype=object)
    out[...] = Fraction(0)
    for i in range(M):
        ui = u[i]
        if not ui:
            continue
        for j in range(M):
            vj = v[j]
            if not vj:
                continue
            k = i + j
            if k >= M:
                out[k - M] -= ui * vj
            else:
                out[k] += ui * vj
    return out


SQRT2 = from_x_power(8) - from_x_power(24)          # 2 cos(pi/4)
C8 = from_x_power(4) - from_x_power(28)             # 2 cos(pi/8)

# Z^2, then G_i^2 (each lives in the subtower below its own generator)
Z2 = scalar(5) + SQRT2 * Fraction(2)


def _with_z(coeff_1, coeff_z):
    """coeff_1 + coeff_z * Z, coefficients field elements without Z."""
    a = coeff_1.copy()
    a[0, 0, 0, 1, :] = a[0, 0, 0, 1, :] + coeff_z[0, 0, 0, 0, :]
    return a


G1SQ = _with_z(scalar(578), (SQRT2 * 3 + one()) * Fraction(34))
# 2*sqrt2*c8 expanded in the power basis: (x^8-x^24)(x^4-x^28) =
# x^12 + x^4 - x^20 - x^28 (note `*` on these arrays is coordinate
# scaling, not field multiplication — expand products by hand here)
G2SQ = (scalar(8) + (from_x_power(12) + from_x_power(4)
                     - from_x_power(20) - from_x_power(28)) * Fraction(2))
G3SQ = _with_z(scalar(578), (scalar(5) - SQRT2 * 2) * Fraction(34))

_RELS = None


def _rels():
    global _RELS
    if _RELS is None:
        _RELS = (G3SQ, G2SQ, G1SQ, Z2)
    return _RELS


def mul(a, b):
    """Field multiplication: recurse over tower bits, negacyclic at base."""
    return _mul_level(a, b, 0)


def _mul_level(a, b, level):
    if level == 4:
        out = np.empty(SHAPE[4:], dtype=object)
        out[:] = _cyc_mul(a, b)
        return out
    u1, v1 = a[0], a[1]
    u2, v2 = b[0], b[1]
    rel = _rels()[level]
    lo = _mul_level(u1, u2, level + 1)
    cross = (_mul_level(u1, v2, level + 1)
             + _mul_level(v1, u2, level + 1))
    vv = _mul_level(v1, v2, level + 1)
    if np.any(vv != Fraction(0)):
        # v1*v2*G^2: rel lives strictly below this level's generator
        lo = lo + _mul_level(vv, _project(rel, level + 1), level + 1)
    out = np.empty(SHAPE[level:], dtype=object)
    out[0] = lo
    out[1] = cross
    return out


def _project(full, level):
    """Slice a SHAPE element down to SHAPE[level:] — valid when the
    element has no components involving generators above `level`."""
    v = full
    for _ in range(level):
        assert not np.any(v[1] != Fraction(0))
        v = v[0]
    return v


def conj(a):
    """Complex conjugation: x^k -> x^{-k} (= -x^{M-k}); Z, G_i real."""
    res = np.empty(SHAPE, dtype=object)
    res[...] = Fraction(0)
    res[..., 0] = a[..., 0]
    for k in range(1, M):
        res[..., M - k] = -a[..., k]
    return res


def is_zero(a):
    return not np.any(a != Fraction(0))


def equals_scalar(a, q):
    return is_zero(a - scalar(q))


def inv(a):
    """Inverse by conjugation descent: at each tower level,
    1/(u+vG) = (u-vG) / (u^2 - v^2 G^2); at the base, solve the 32x32
    rational linear system for the cyclotomic inverse."""
    return _inv_level(a, 0)


def _inv_level(a, level):
    if level == 4:
        return _cyc_inv(a)
    u, v = a[0], a[1]
    if not np.any(v != Fraction(0)):
        out = np.empty(SHAPE[level:], dtype=object)
        out[...] = Fraction(0)
        out[0] = _inv_level(u, level + 1)
        return out
    # (u - vG) / (u^2 - v^2 G^2)
    rel = _rels()[level]
    uu = _mul_level(u, u, level + 1)
    vv = _mul_level(v, v, level + 1)
    denom = uu - _mul_level(vv, _project(rel, level + 1), level + 1)
    dinv = _inv_level(denom, level + 1)
    out = np.empty(SHAPE[level:], dtype=object)
    out[0] = _mul_level(u, dinv, level + 1)
    out[1] = -_mul_level(v, dinv, level + 1)
    return out


def _cyc_inv(u):
    """Inverse in Q[x]/(x^32+1) via Gaussian elimination (object dtype)."""
    mat = np.empty((M, M), dtype=object)
    for j in range(M):
        col = np.empty(M, dtype=object)
        col[...] = Fraction(0)
        col[j] = Fraction(1)
        mat[:, j] = _cyc_mul(u, col)
    rhs = np.empty(M, dtype=object)
    rhs[...] = Fraction(0)
    rhs[0] = Fraction(1)
    # solve mat @ x = rhs
    A = mat.copy()
    x = rhs.copy()
    for c in range(M):
        piv = None
        for r in range(c, M):
            if A[r, c]:
                piv = r
                break
        assert piv is not None, 'singular element'
        if piv != c:
            A[[c, piv]] = A[[piv, c]]
            x[[c, piv]] = x[[piv, c]]
        p = A[c, c]
        A[c] = A[c] / p
        x[c] = x[c] / p
        for r in range(M):
            if r != c and A[r, c]:
                f = A[r, c]
                A[r] = A[r] - f * A[c]
                x[r] = x[r] - f * x[c]
    return x


# ---------------------------------------------------------------------------
# numeric embedding (validation only — never part of a certificate)
# ---------------------------------------------------------------------------

def to_mp(a, mp):
    x = mp.exp(1j * mp.pi / M)
    sqrt2 = mp.sqrt(2)
    zv = mp.sqrt(5 + 2 * sqrt2)
    w1 = mp.atan(2 - sqrt2)
    w2 = mp.atan(mp.sqrt(7 - 4 * sqrt2))
    w3 = mp.atan(mp.sqrt(4 + 2 * sqrt2))
    g1 = 34 * mp.cos(w1 / 2)
    g2 = 4 * mp.cos(w2 / 2)
    g3 = 34 * mp.cos(w3 / 2)
    tot = mp.mpc(0)
    for i3 in range(2):
        for i2 in range(2):
            for i1 in range(2):
                for iz in range(2):
                    fac = (g3 ** i3) * (g2 ** i2) * (g1 ** i1) * (zv ** iz)
                    for k in range(M):
                        c = a[i3, i2, i1, iz, k]
                        if c:
                            tot += (mp.mpf(c.numerator)
                                    / c.denominator) * fac * x ** k
    return tot
