"""Ross-Selinger-style exact synthesis of Rz rotations over Clifford+T.

Replaces the Solovay-Kitaev fallback for angles that are not multiples of
pi/4 (reference path: qiskit-fork SolovayKitaevDecomposition,
exact_decompositions.py:261-269). Three stages, all exact integer
arithmetic over the rings in rings.py:

  1. Grid search: find u in Z[w] with u / sqrt2^k inside an eps-box around
     exp(-i theta/2), subject to the bullet-embedding bound |u^bullet| <=
     sqrt2^k. Enumeration is the 1D two-embedding interval walk per
     coordinate — O(sqrt2^k) vectorized numpy work per denominator
     exponent k, with k growing until a candidate admits a solution.
  2. Diophantine: solve t t^dag = 2^k - |u|^2 in Z[w] by factoring the
     rational norm and splitting each prime class (p = 2, p mod 8 in
     {1,3,5,7}) via Euclidean gcds in Z[w] / Z[sqrt2] and square roots
     mod p. Unsolvable candidates are skipped (expected O(log) tries).
  3. Exact synthesis: the matrix [[u, -t^dag],[t, u^dag]] / sqrt2^k is a
     det-1 Clifford+T unitary; column reduction by H T^-m factors
     (Kliuchnikov-Maslov-Mosca) emits the gate word, T-count ~ 2k.

Result: Rz(theta) to distance eps with T-count ~ 4 log2(1/eps), minutes-free
(milliseconds at eps ~ 1e-5), versus the BFS-table Solovay-Kitaev whose
word length explodes past eps ~ 1e-2.
"""

from __future__ import annotations

import cmath
import math
from typing import List, Optional, Tuple

import numpy as np

from cpflow_tpu.circuits.rings import (DELTA, LAMBDA, OMEGA, ZOmega, ZRt2,
                                       factorize, sqrt_mod)

_SQRT2 = math.sqrt(2.0)


# --------------------------------------------------------------------------
# Stage 1: grid candidates
# --------------------------------------------------------------------------

_LOG_LAMBDA = math.log(1.0 + _SQRT2)


def _solve_zrt2_intervals(A: float, B: float, C: float, D: float,
                          cap: int = 200_000) -> List[Tuple[int, int]]:
    """All (m, n) in Z^2 with  m + n sqrt2 in [A, B]  and
    m - n sqrt2 in [C, D].

    The naive scan costs O(max(widths)); rescaling by the fundamental unit
    lambda = 1 + sqrt2 (an automorphism of the lattice that stretches one
    embedding by lambda and shrinks the other by 1/lambda) equalizes the two
    intervals first, so the scan costs O(sqrt(w W)) — the 1D grid-problem
    trick from the Ross-Selinger synthesis paper."""
    w, W = B - A, D - C
    if w <= 0 or W <= 0:
        return []
    # v = lambda^j vt widens [A,B] by lambda^-j and shrinks [C,D] by
    # lambda^j (|lambda_bullet| = 1/lambda): equal widths at
    # lambda^(2j) = w/W
    j = int(math.floor(0.5 * math.log(w / W) / _LOG_LAMBDA + 0.5))

    lam_j = LAMBDA ** j if j >= 0 else ZRt2(-1, 1) ** (-j)  # exact lambda^j
    # scale factors in log space: the exact coefficients of lambda^j are
    # exponentially large and catastrophically cancel in float
    lj = math.exp(j * _LOG_LAMBDA)
    lbj = math.exp(-j * _LOG_LAMBDA) * (1.0 if j % 2 == 0 else -1.0)
    # v = lambda^j vt: vt in [A,B]/lambda^j; vt_bullet in [C,D]/lambda_bullet^j
    A2, B2 = A / lj, B / lj
    if A2 > B2:
        A2, B2 = B2, A2
    C2, D2 = C / lbj, D / lbj
    if C2 > D2:
        C2, D2 = D2, C2

    m_lo = math.floor((A2 + C2) / 2.0) - 1
    m_hi = math.ceil((B2 + D2) / 2.0) + 1
    if m_hi - m_lo > cap:
        return []
    out: List[Tuple[int, int]] = []
    ms = np.arange(m_lo, m_hi + 1, dtype=np.float64)
    n_lo = np.ceil(np.maximum(A2 - ms, ms - D2) / _SQRT2 - 1e-9)
    n_hi = np.floor(np.minimum(B2 - ms, ms - C2) / _SQRT2 + 1e-9)
    ok = np.nonzero(n_lo <= n_hi)[0]
    for i in ok:
        mt = int(ms[i])
        for nt in range(int(n_lo[i]), int(n_hi[i]) + 1):
            # back to the original frame: (m + n sqrt2) = lambda^j (mt + nt sqrt2)
            v = lam_j * ZRt2(mt, nt)
            out.append((v.a, v.b))
            if len(out) > cap:
                return out
    return out


def _halfplane_interval(zx: float, zy: float, x: float, R: float,
                        eps: float) -> Tuple[float, float]:
    """y-interval of {w : zx wx + zy wy >= R (1 - eps^2/2), |w| <= R} at
    wx = x. Assumes |zy| bounded away from 0 (caller picks the frame)."""
    rad2 = R * R - x * x
    if rad2 < 0:
        return 1.0, 0.0
    rad = math.sqrt(rad2)
    thresh = (R * (1.0 - eps * eps / 2.0) - zx * x) / zy
    if zy > 0:
        return max(thresh, -rad), rad
    return -rad, min(thresh, rad)


def _grid_candidates(theta: float, eps: float, k: int,
                     max_candidates: int = 64) -> List[ZOmega]:
    """u in Z[w] with u / sqrt2^k in the eps-sliver around exp(-i theta/2)
    (phase-invariant distance <= eps) and the bullet embedding inside the
    radius-sqrt2^k disc, best-first.

    Enumerates the axis whose sliver extent is smaller as the outer loop
    (the tangential extent is ~eps R along the direction perpendicular to
    z, so the outer axis is the one z mostly points along), then solves the
    inner axis exactly per outer point. Z[w] coordinates: u = a + b w +
    c w^2 + d w^3 has Re = a + (b - d)/sqrt2, Im = c + (b + d)/sqrt2 with
    (b - d) = alpha, (b + d) = beta, alpha = beta mod 2.
    """
    R = _SQRT2 ** k
    zx, zy = math.cos(theta / 2.0), -math.sin(theta / 2.0)
    target = cmath.exp(-1j * theta / 2.0)

    swap = abs(zy) > abs(zx)  # outer axis must have |z component| >= 1/sqrt2
    if swap:
        zx, zy = zy, zx

    # outer extent: the sliver spans ~ +-(eps sqrt2) R tangentially around
    # z R; project on the outer axis and pad a little
    span = 1.6 * eps * R + 1e-12 * R
    lo, hi = zx * R - span, zx * R + span
    lo = max(lo, -R)
    hi = min(hi, R)

    # outer axis lattice: x = a + alpha/sqrt2 -> sqrt2 x = alpha + a sqrt2;
    # bullet: sqrt2 x_bullet = -(alpha - a sqrt2) -> alpha - a sqrt2 in
    # -sqrt2 [-R, R] = [-sqrt2 R, sqrt2 R]
    s2R = _SQRT2 * R
    outer = _solve_zrt2_intervals(_SQRT2 * lo, _SQRT2 * hi, -s2R, s2R)

    scored: List[Tuple[float, ZOmega]] = []
    for (alpha, a) in outer:  # v = alpha + a sqrt2 = sqrt2 x
        x = a + alpha / _SQRT2
        y_lo, y_hi = _halfplane_interval(zx, zy, x, R, eps)
        if y_lo > y_hi:
            continue
        x_b = a - alpha / _SQRT2
        yb = math.sqrt(max(0.0, R * R - x_b * x_b))
        p = alpha & 1  # inner beta must match alpha's parity
        # y = c + (2 n + p)/sqrt2: solve yt = y - p/sqrt2 = c + n sqrt2
        sh = p / _SQRT2
        inner = _solve_zrt2_intervals(y_lo - sh, y_hi - sh,
                                      -yb + sh, yb + sh)
        for (c, nb) in inner:
            beta = 2 * nb + p
            y = c + beta / _SQRT2
            # x is the outer coordinate: the IMAG axis when swapped
            w = (complex(y, x) if swap else complex(x, y)) / R
            re = (w.conjugate() * target).real
            dist = math.sqrt(max(0.0, 1.0 - min(1.0, re)))
            if dist <= eps:
                a1 = (alpha + beta) // 2
                a3 = (beta - alpha) // 2
                zo = (ZOmega(a, a1, c, a3) if not swap
                      else ZOmega(c, a1, a, -a3))
                scored.append((dist, zo))
    scored.sort(key=lambda s: s[0])
    return [z for _, z in scored[:max_candidates]]


# --------------------------------------------------------------------------
# Stage 2: the norm equation t t^dag = xi over Z[w]
# --------------------------------------------------------------------------

def _zrt2_multiplicity(xi: ZRt2, pi: ZRt2) -> Tuple[int, ZRt2]:
    e = 0
    while True:
        q = pi.divides_exactly(xi)
        if q is None:
            return e, xi
        e += 1
        xi = q


def _tau_for_prime(p: int) -> Optional[ZOmega]:
    """tau in Z[w] with |N(tau)| = p, for p inert in Z[sqrt2]
    (p mod 8 in {3, 5})."""
    if p % 8 == 5:
        h = sqrt_mod(-1, p)
        if h is None:
            return None
        tau = ZOmega(p).gcd(ZOmega(h, 0, 1, 0))      # gcd(p, h + i)
    else:  # p % 8 == 3
        h = sqrt_mod(-2, p)
        if h is None:
            return None
        tau = ZOmega(p).gcd(ZOmega(h, 1, 0, 1))      # gcd(p, h + sqrt(-2))
    return tau if tau.norm_int() == p else None


def _tau_for_split_prime(pi: ZRt2, p: int) -> Optional[ZOmega]:
    """tau with tau tau^dag ~ pi (up to Z[sqrt2] unit), for N(pi) = +-p,
    p = 1 mod 8 (p splits completely in Z[w])."""
    h = sqrt_mod(-1, p)
    if h is None:
        return None
    for cand in (ZOmega(h, 0, 1, 0), ZOmega(h, 0, -1, 0)):
        tau = pi.to_zomega().gcd(cand)
        if abs(tau.norm_int()) == p:
            return tau
    return None


def solve_norm_equation(xi: ZRt2) -> Optional[ZOmega]:
    """t in Z[w] with t t^dag = xi, or None. Requires xi >= 0 in both
    embeddings (checked)."""
    if not xi:
        return ZOmega(0)
    if not (xi.is_nonneg() and xi.adj2().is_nonneg()):
        return None
    n = abs(xi.norm_int())
    fac = factorize(n)
    if fac is None:
        return None

    t = ZOmega(1)
    rem = xi
    for p in sorted(fac):
        if p == 2:
            e, rem = _zrt2_multiplicity(rem, ZRt2(0, 1))
            t = t * (DELTA ** e)
        elif p % 8 == 7:
            s2 = sqrt_mod(2, p)
            if s2 is None:
                return None
            pi = ZRt2(p).gcd(ZRt2(s2, -1))
            if abs(pi.norm_int()) != p:
                return None
            for piv in (pi, pi.adj2()):
                e, rem = _zrt2_multiplicity(rem, piv)
                if e % 2:
                    return None  # 7 mod 8 primes must pair up
                t = t * (piv ** (e // 2)).to_zomega()
        elif p % 8 == 1:
            s2 = sqrt_mod(2, p)
            if s2 is None:
                return None
            pi = ZRt2(p).gcd(ZRt2(s2, -1))
            if abs(pi.norm_int()) != p:
                return None
            for piv in (pi, pi.adj2()):
                e, rem = _zrt2_multiplicity(rem, piv)
                if e:
                    tau = _tau_for_split_prime(piv, p)
                    if tau is None:
                        return None
                    t = t * (tau ** e)
        else:  # p mod 8 in {3, 5}: inert in Z[sqrt2]
            e, rem = _zrt2_multiplicity(rem, ZRt2(p))
            if 2 * e != fac[p]:
                return None
            tau = _tau_for_prime(p)
            if tau is None:
                return None
            t = t * (tau ** e)

    # fix the leftover unit: xi / (t t^dag) is lambda^(2m) (positive in both
    # embeddings since xi and t t^dag are)
    q = t.norm_zrt2()
    unit = q.divides_exactly(xi)
    if unit is None:
        return None
    m = 0
    while unit != ZRt2(1):
        v = unit.value()
        if v > 1.0:
            nxt = LAMBDA.divides_exactly(unit)
            m += 1
        else:
            nxt = unit * LAMBDA
            unit = None  # replaced below
            unit = nxt
            m -= 1
            continue
        if nxt is None:
            return None
        unit = nxt
        if abs(m) > 64:
            return None
    if m % 2:
        return None
    half = m // 2
    lam_half = (LAMBDA ** half).to_zomega() if half >= 0 else None
    if half >= 0:
        t = t * lam_half
    else:
        inv = (ZRt2(-1, 1) ** (-half)).to_zomega()  # lambda^-1 = -1 + sqrt2
        t = t * inv
    return t if t.norm_zrt2() == xi else None


# --------------------------------------------------------------------------
# Stage 3: exact synthesis of the Z[w] unitary to an H/T word
# --------------------------------------------------------------------------

_TPOW_WORDS = {0: [], 1: ['t'], 2: ['s'], 3: ['s', 't']}


def _strip(u: ZOmega, t: ZOmega, k: int) -> Tuple[ZOmega, ZOmega, int]:
    """Remove sqrt2 factors common to both entries (vector sde)."""
    while k > 0:
        du, dt = u.div_sqrt2(), t.div_sqrt2()
        if du is None or dt is None:
            break
        u, t, k = du, dt, k - 1
    return u, t, k


def _ht_step(u: ZOmega, t: ZOmega, k: int, m: int
             ) -> Tuple[ZOmega, ZOmega, int]:
    """Apply H T^-m on the left: (u, t) -> ((u + w^-m t), (u - w^-m t)),
    exponent k+1, then strip."""
    wm = OMEGA ** ((-m) % 8)
    return _strip(u + wm * t, u - wm * t, k + 1)


def _find_descent(u: ZOmega, t: ZOmega, k: int, max_depth: int = 5
                  ) -> Optional[List[int]]:
    """Shortest sequence of H T^-m left-factors that strictly lowers the
    vector sde. A single greedy step is not enough: the walk sometimes needs
    a plateau move (k unchanged) before the exponent can drop, so search
    breadth-first over the 8 m-branches to a small depth."""
    frontier = [((), u, t, k)]
    seen = {(u.a, t.a)}
    for _ in range(max_depth):
        nxt = []
        for path, cu, ct, ck in frontier:
            for m in range(8):
                nu, nt, nk = _ht_step(cu, ct, ck, m)
                if nk < k:
                    return list(path) + [m]
                if nk == k:
                    key = (nu.a, nt.a)
                    if key not in seen:
                        seen.add(key)
                        nxt.append((path + (m,), nu, nt, nk))
        frontier = nxt
        if not frontier:
            break
    return None


def _reduce_column(u: ZOmega, t: ZOmega, k: int
                   ) -> Tuple[List[int], ZOmega, ZOmega, int]:
    """Left-multiply H T^-m factors until the denominator exponent hits 0.
    Returns (ms, u, t, 0) where applying H T^-m_i for each m in order
    reduces the original column to (u, t) at exponent 0."""
    u, t, k = _strip(u, t, k)
    ms: List[int] = []
    while k > 0:
        path = _find_descent(u, t, k)
        if path is None:
            raise ArithmeticError('column reduction stalled (invalid input?)')
        for m in path:
            u, t, k = _ht_step(u, t, k, m)
            ms.append(m)
        if len(ms) > 20_000:
            raise ArithmeticError('column reduction runaway')
    return ms, u, t, k


def synthesize_unitary_word(u: ZOmega, t: ZOmega, k: int) -> List[str]:
    """Gate word (circuit order: first-applied first) for
    U = [[u, -t^dag],[t, u^dag]] / sqrt2^k, exact up to global phase."""
    ms, _, _, _ = _reduce_column(u, t, k)

    # F = T^{m_1} H T^{m_2} H ... T^{m_L} H satisfies F^dag U = residual
    # Clifford; build F exactly (2x2 over Z[w], exponent = number of H's)
    fa, fb, fc, fd = ZOmega(1), ZOmega(0), ZOmega(0), ZOmega(1)
    for m in ms:
        wm = OMEGA ** (m % 8)
        # right-multiply by T^m H = [[1, 1], [w^m, -w^m]] / sqrt2
        fa, fb = fa + fb * wm, fa - fb * wm
        fc, fd = fc + fd * wm, fc - fd * wm
    e = len(ms)  # F numerator exponent

    # D = F^dag U, numerator exponent e + k, then strip to 0
    ua, ub, uc, ud = u, -t.conj(), t, u.conj()
    da = fa.conj() * ua + fc.conj() * uc
    db = fa.conj() * ub + fc.conj() * ud
    dc = fb.conj() * ua + fd.conj() * uc
    dd = fb.conj() * ub + fd.conj() * ud
    kk = e + k
    while kk > 0:
        parts = [x.div_sqrt2() for x in (da, db, dc, dd)]
        if any(p is None for p in parts):
            break
        da, db, dc, dd = parts
        kk -= 1
    assert kk == 0, 'residual is not Clifford (reduction bug)'

    tail: List[str] = []
    if not da:  # residual is antidiagonal: flip with X
        tail.append('x')
        da, dc = dc, da
        db, dd = dd, db
    assert not db and not dc, (da, db, dc, dd)
    rel = (_omega_power(dd) - _omega_power(da)) % 8
    diag_word = {0: [], 1: ['t'], 2: ['s'], 3: ['s', 't'], 4: ['z'],
                 5: ['z', 't'], 6: ['sdg'], 7: ['tdg']}[rel]

    # U = F * [X?] * diag up to global phase — application right-to-left
    gates: List[str] = list(diag_word) + tail
    for m in reversed(ms):
        gates.append('h')
        gates.extend(_TPOW_WORDS[m % 4] if m % 8 < 4
                     else ['z'] + _TPOW_WORDS[m % 4])
    return gates


def _omega_power(z: ZOmega) -> int:
    for j in range(8):
        if OMEGA ** j == z:
            return j
    raise ArithmeticError(f'{z} is not a power of omega')


# --------------------------------------------------------------------------
# Top level
# --------------------------------------------------------------------------

def gridsynth_rz(theta: float, eps: float = 1e-5, max_k: int = 60
                 ) -> Optional[List[str]]:
    """Clifford+T word for Rz(theta) to phase-invariant distance <= eps
    (circuit order), or None if no candidate solved within max_k."""
    theta = math.remainder(theta, 4.0 * math.pi)
    # first solutions appear when eps^3 R^4 ~ 1 (sliver area x bullet disc),
    # i.e. k ~ 1.5 log2(1/eps); starting a little low costs nothing now
    k0 = max(0, int(1.5 * math.log2(1.0 / max(eps, 1e-12))) - 4)
    for k in range(k0, max_k):
        for u in _grid_candidates(theta, eps, k):
            xi = ZRt2(2 ** k, 0) - u.norm_zrt2()
            t = solve_norm_equation(xi)
            if t is None:
                continue
            word = synthesize_unitary_word(u, t, k)
            return word
    return None


def word_matrix(word: List[str]) -> np.ndarray:
    """Dense matrix of a gate word in circuit order (for tests/验证)."""
    from cpflow_tpu.circuits.ir import FIXED_GATES
    m = np.eye(2, dtype=complex)
    for g in word:
        m = FIXED_GATES[g] @ m
    return m


def phase_invariant_distance(u: np.ndarray, v: np.ndarray) -> float:
    t = abs((u.conj() * v).sum()) / 2.0
    return math.sqrt(max(0.0, 1.0 - min(1.0, t)))
