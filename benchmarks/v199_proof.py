"""Machine-checked proof that qx_one-two-three-v1_99's 46-CX closed form
equals its qasm circuit up to a GLOBAL phase — the project's LARGEST
published-table beat (52 -> 46), ring-proven.

The closed form (closed_form_search.KNOWN_CLOSED_FORMS) uses
pi-rationals with denominators {1,2,3,4,6,8} plus the whole sqrt2
family: magic = arctan(sqrt2), w1, w2, w3 (the toffoli-5 constants) and
the combinations q1 = pi - 2 w2, q2 = magic + w1, q3 = pi + w1 - magic.
The smallest ring holding every gate entry is the 5-tower compositum

    F = Q(zeta_192)[Y][Z][G1][G2][G3],   dim_Q = 32 * 96 = 3072,

with Y (magic half-angle, Y^2 = 18 + 6 sqrt3) from the zeta_48 proofs
scaled up, and Z/G1/G2/G3 (the w-tower) imported from
benchmarks/tower_field.py through the index-tripling embedding
zeta_64 = zeta_192^3 (coordinate k -> 3k, a ring hom). Elements are
(32, 96) Fraction arrays: 5 tower bits (y, z, g1, g2, g3) x the power
basis of Z[x]/(x^96 + 1).

Certificate — the established modular-CRT scheme (toffoli5_proof.py /
composite_proof.py / qx_tower_proof.py), with per-gate multiplication
operators stored as SPARSE tower-level block maps (a dense 3072^2
operator per spec would not fit):

  1. Exact integer-scaled (cos, -i sin) mult operators per distinct
     spec; combination constants enter through exact angle-addition in
     F (q2/2 = magic/2 + w1/2 needs Y x G1 products, etc.); q1's
     half-angle is pi/2 - w2, whose trig is the FULL-angle w2 pair.
  2. The target is evaluated exactly from the reference qasm over
     Z[zeta_192] (circuits/exact_unitary.py): it is a SIGNED MONOMIAL
     matrix (one +-x^k per row, denominator 1 — tested), so
     s = <U, T> assembles by coordinate shifts.
  3. s * conj(s) == d^2 * DEN^2 is checked mod 26-bit primes until an
     EXACT coordinate bound (operator L1s x the structure-table L1 x
     the Phi_192 projection factor) forces the identity over Z by CRT.
  4. Z[x]/(x^96+1) = Phi_192 x Phi_64 is not a domain: the final
     identity is projected mod Phi_192(x) = x^64 - x^32 + 1 (ring hom
     onto the true component), exactly as in composite_proof.py.

Usage: python -m benchmarks.v199_proof          (host CPU, ~1-2 h)
Tested by tests/test_v199_proof.py.
"""

import json
import math
import os
from fractions import Fraction

import numpy as np

from benchmarks import composite_proof as cpx   # zeta_192 helpers + magic
from benchmarks import toffoli5_proof as tp     # w-constants (M=32 ring)
from benchmarks import tower_field as tf

M = 96                  # x^M = -1, x -> zeta_192
NLVL = 32               # 5 tower bits: (y, z, g1, g2, g3) little-endian
DIM = NLVL * M
_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')

BIT_Y, BIT_Z, BIT_G1, BIT_G2, BIT_G3 = 1, 2, 4, 8, 16


def zero():
    a = np.empty((NLVL, M), dtype=object)
    a[...] = Fraction(0)
    return a


def from_x_power(k, coeff=1, lvl=0):
    a = zero()
    k %= 2 * M
    s = 1
    if k >= M:
        k -= M
        s = -1
    a[lvl, k] = Fraction(coeff) * s
    return a


def scalar(q):
    return from_x_power(0, Fraction(q))


def _cyc_mul(u, v):
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


SQRT2 = from_x_power(24) + from_x_power(-24)
SQRT3 = from_x_power(16) + from_x_power(-16)
TWO_COS_PI8 = from_x_power(12) + from_x_power(-12)

# level relations: generator^2 as an element on LOWER levels
_REL = {
    BIT_Y: scalar(18) + SQRT3 * 6,
    BIT_Z: scalar(5) + SQRT2 * 2,
    BIT_G1: None,    # filled below (needs mul)
    BIT_G2: None,
    BIT_G3: None,
}


def mul(a, b):
    """Full product in F: convolve cyclotomic axes, resolve shared tower
    bits through the relations (e_t1 e_t2 = e_{t1 XOR t2} * prod REL_g
    over shared bits g)."""
    out = zero()
    for t1 in range(NLVL):
        if not any(a[t1]):
            continue
        for t2 in range(NLVL):
            if not any(b[t2]):
                continue
            conv = _cyc_mul(a[t1], b[t2])
            shared = t1 & t2
            term = zero()
            term[t1 ^ t2] = conv
            g = 1
            while g < NLVL and shared:
                if shared & g:
                    term = mul(term, _REL[g])
                    shared ^= g
                g <<= 1
            out = out + term
    return out


_REL[BIT_G1] = scalar(578) + mul((SQRT2 * 3 + scalar(1)) * 34,
                                 from_x_power(0, lvl=BIT_Z))
_REL[BIT_G2] = scalar(8) + mul(SQRT2 * 2, TWO_COS_PI8)
_REL[BIT_G3] = scalar(578) + mul((scalar(5) - SQRT2 * 2) * 34,
                                 from_x_power(0, lvl=BIT_Z))


def embed32(a32):
    """tower_field element (2,2,2,2,32) -> F via zeta_64 = zeta_192^3
    (coordinate k -> 3k) and the level map (g3,g2,g1,z) -> tower bits."""
    out = zero()
    flat = a32.reshape(16, tf.M)
    for t in range(16):
        g3, g2, g1, z = (t >> 3) & 1, (t >> 2) & 1, (t >> 1) & 1, t & 1
        lvl = g3 * BIT_G3 + g2 * BIT_G2 + g1 * BIT_G1 + z * BIT_Z
        for k in range(tf.M):
            c = flat[t][k]
            if c:
                kk = 3 * k
                s = 1
                if kk >= M:
                    kk -= M
                    s = -1
                out[lvl, kk] = out[lvl, kk] + Fraction(c) * s
    return out


def to_mp(a, mp):
    x = mp.e ** (1j * mp.pi / M)
    s2 = mp.sqrt(2)
    gen = {BIT_Y: 6 * mp.cos(mp.atan(s2) / 2),
           BIT_Z: mp.sqrt(5 + 2 * s2),
           BIT_G1: 34 * mp.cos(mp.atan(2 - s2) / 2),
           BIT_G2: 4 * mp.cos(mp.atan(mp.sqrt(7 - 4 * s2)) / 2),
           BIT_G3: 34 * mp.cos(mp.atan(mp.sqrt(4 + 2 * s2)) / 2)}
    tot = mp.mpc(0)
    for t in range(NLVL):
        gv = mp.mpf(1)
        for g, v in gen.items():
            if t & g:
                gv *= v
        for k in range(M):
            c = a[t, k]
            if c:
                tot += (mp.mpf(c.numerator) / c.denominator) * x ** k * gv
    return tot


# ---------------------------------------------------------------------------
# exact constants: magic (native) + w1/w2/w3 (embedded from tower_field)
# ---------------------------------------------------------------------------

C_MAGIC = from_x_power(0, Fraction(1, 6), lvl=BIT_Y)
_smc = mul(mul(SQRT2, SQRT3), scalar(3) - SQRT3)
S_MAGIC = zero()
S_MAGIC[BIT_Y] = _smc[0] * Fraction(1, 36)

HALF = {
    'magic': (C_MAGIC, S_MAGIC),
    'w1': (embed32(tp.COS_HALF['w1']), embed32(tp.SIN_HALF['w1'])),
    'w2': (embed32(tp.COS_HALF['w2']), embed32(tp.SIN_HALF['w2'])),
    'w3': (embed32(tp.COS_HALF['w3']), embed32(tp.SIN_HALF['w3'])),
}
# full-angle w2 pair (for q1/2 = pi/2 - w2): cos/sin w2 embedded
COS_W2 = embed32(tp.COS_W2)
SIN_W2 = embed32(tp.SIN_W2)


def _add_angles(cs1, cs2):
    """(cos, sin) of a sum from the pairs."""
    c1, s1 = cs1
    c2, s2 = cs2
    return (mul(c1, c2) - mul(s1, s2), mul(s1, c2) + mul(c1, s2))


def _neg(cs):
    c, s = cs
    return (c, -s)


# half-angle (cos, sin) pairs of the combination constants:
#   q1/2 = pi/2 - w2          -> (sin w2, cos w2)
#   q2/2 = magic/2 + w1/2
#   q3/2 = pi/2 + w1/2 - magic/2
HALF['q1'] = (SIN_W2, COS_W2)
HALF['q2'] = _add_angles(HALF['magic'], HALF['w1'])
_q3h = _add_angles(HALF['w1'], _neg(HALF['magic']))
HALF['q3'] = (-_q3h[1], _q3h[0])          # +pi/2: (c,s) -> (-s, c)


def half_trig(spec):
    """Exact (cos(a/2), sin(a/2)) in F; rational parts on the /48 grid."""
    from benchmarks.closed_form_search import parse_spec_general
    r, sg, name = parse_spec_general(spec)
    k2 = 48 * r.numerator
    assert k2 % r.denominator == 0, spec
    k = k2 // r.denominator
    cr = (from_x_power(k) + from_x_power(-k)) * Fraction(1, 2)
    sr = (from_x_power(k - 48) - from_x_power(-k - 48)) * Fraction(1, 2)
    if name is None:
        return cr, sr
    cw, sw = HALF[name]
    if sg < 0:
        sw = -sw
    return (mul(cr, cw) - mul(sr, sw), mul(sr, cw) + mul(cr, sw))


# ---------------------------------------------------------------------------
# sparse-block integer mult operators
# ---------------------------------------------------------------------------

def _toeplitz(vec, dscale):
    """96x96 int64 matrix of y -> (dscale * vec) * y on the x-axis."""
    out = np.zeros((M, M), dtype=np.int64)
    for k in range(M):
        c = vec[k]
        if not c:
            continue
        ci = int(c * dscale)
        for i in range(M):
            j = i + k
            if j >= M:
                out[j - M, i] -= ci
            else:
                out[j, i] += ci
    return out


def mult_operator(const):
    """(blocks, D, l1): blocks maps (t_out, t_in) -> 96x96 int64 of the
    scaled operator y -> D * const * y; l1 = max row L1 of the full
    operator (exact)."""
    base = [mul(const, from_x_power(0, lvl=t)) for t in range(NLVL)]
    D = 1
    for b in base:
        for row in b:
            for c in row:
                if c:
                    D = D * c.denominator // math.gcd(D, c.denominator)
    blocks = {}
    for t_in in range(NLVL):
        b = base[t_in]
        for t_out in range(NLVL):
            if any(b[t_out]):
                blocks[(t_out, t_in)] = _toeplitz(b[t_out], D)
    # max row L1 over the full operator: rows group by (t_out, i)
    l1 = 0
    for t_out in range(NLVL):
        rows = np.zeros(M, dtype=object)
        for (to, ti), blk in blocks.items():
            if to == t_out:
                rows = rows + np.abs(blk.astype(object)).sum(axis=1)
        l1 = max(l1, int(max(rows)) if len(rows) else 0)
    return blocks, D, l1


# structure-table L1 for the product bound: max L1 of e_t1 * e_t2
_TAB_L1 = None


def tab_l1():
    global _TAB_L1
    if _TAB_L1 is None:
        best = 1
        for t1 in range(NLVL):
            for t2 in range(t1, NLVL):
                prod = mul(from_x_power(0, lvl=t1), from_x_power(0, lvl=t2))
                tot = sum(abs(c) for row in prod for c in row)
                assert tot.denominator == 1
                best = max(best, int(tot))
        _TAB_L1 = best
    return _TAB_L1


# ---------------------------------------------------------------------------
# the certificate
# ---------------------------------------------------------------------------

def _monomial_target(qasm_name, d):
    """(perm, kpow, sign): T[perm[j], j] = sign[j] * x^kpow[j], exact."""
    import glob
    from cpflow_tpu.circuits import exact_unitary as ex
    from cpflow_tpu.circuits.ir import Circuit as IRCircuit

    path = glob.glob('/root/reference/paper/benchmark_circuits/'
                     f'*/{qasm_name}.qasm')[0]
    t = ex.exact_unitary(IRCircuit.from_qasm_file(path), M // 2)
    assert t.m == M and t.dim == d and t.e == 0
    perm = np.zeros(d, dtype=np.int64)
    kpow = np.zeros(d, dtype=np.int64)
    sign = np.zeros(d, dtype=np.int64)
    for j in range(d):
        hits = [(i, k, int(t.entries[i][j][k])) for i in range(d)
                for k in range(M) if t.entries[i][j][k]]
        assert len(hits) == 1 and abs(hits[0][2]) == 1
        perm[j], kpow[j], sign[j] = hits[0]
    return perm, kpow, sign


def prove(verbose=True, max_primes=None):
    label = 'qx_one-two-three-v1_99'
    from benchmarks.closed_form_search import KNOWN_CLOSED_FORMS
    specs = KNOWN_CLOSED_FORMS[label]
    art = json.load(open(os.path.join(
        _ART, 'exact', f'{label}_closed_form.json')))
    stream = art['instructions']
    got = [r['angle_spec'] for r in stream if 'angle_spec' in r]
    assert got == specs
    n, d = 5, 32

    if verbose:
        print(f'[{label}] building exact operators for '
              f'{len(set(specs))} distinct specs...', flush=True)
    ops = {}
    for s in sorted(set(specs)):
        c, sn = half_trig(s)
        mi_s = mul(from_x_power(-48), sn)            # -i sin(a/2)
        bc, dc, l1c = mult_operator(c)
        bm, dm, l1m = mult_operator(mi_s)
        D = dc * dm // math.gcd(dc, dm)
        fc, fm = D // dc, D // dm
        bc = {k: v * fc for k, v in bc.items()}
        bm = {k: v * fm for k, v in bm.items()}
        ops[s] = (bc, bm, D, l1c * fc + l1m * fm)
        if verbose:
            print(f'  {s}: D={D} l1={ops[s][3]} blocks='
                  f'{len(bc)}+{len(bm)}', flush=True)

    DEN = 1
    bound = 1
    plan = []
    for r in stream:
        if 'angle_spec' in r:
            bc, bm, D, l1 = ops[r['angle_spec']]
            DEN *= D
            bound *= l1
            plan.append((r['name'], r['qubits'][0], r['angle_spec']))
        else:
            plan.append(('cz', tuple(r['qubits']), None))

    perm, kpow, sign = _monomial_target('one-two-three-v1_99', d)

    # bound: |s coords| <= d * bound (monomial target, unit L1 entries);
    # s*conj(s) coords <= L1(s) * NLVL * |s|_inf * TAB_L1; Phi_192 x2
    s_inf = d * bound
    prod_bound = (DIM * s_inf) * NLVL * s_inf * tab_l1()
    final_bound = 2 * prod_bound + (d * DEN) ** 2
    bits = final_bound.bit_length() + 2
    primes = cpx._primes(bits)
    if verbose:
        print(f'DEN bits={DEN.bit_length()} bound bits='
              f'{final_bound.bit_length()} primes={len(primes)} '
              f'tab_l1={tab_l1()}', flush=True)

    # conj: x^k -> -x^(M-k) per level (generators are real positive)
    conj_perm = np.zeros(DIM, dtype=np.int64)
    conj_sign = np.zeros(DIM, dtype=np.int64)
    for t in range(NLVL):
        base = t * M
        conj_perm[base] = base
        conj_sign[base] = 1
        for k in range(1, M):
            conj_perm[base + k] = base + M - k
            conj_sign[base + k] = -1

    # structure table for the final ring product, scaled to integers
    tab = {}
    for t1 in range(NLVL):
        for t2 in range(t1, NLVL):
            prod = mul(from_x_power(0, lvl=t1), from_x_power(0, lvl=t2))
            ent = {}
            for t in range(NLVL):
                if any(prod[t]):
                    assert all(c.denominator == 1 for c in prod[t])
                    ent[t] = np.array([int(c) for c in prod[t]],
                                      dtype=np.int64)
            tab[(t1, t2)] = ent

    def ring_mul_mod(a, b, p):
        a2 = a.reshape(NLVL, M)
        b2 = b.reshape(NLVL, M)
        out = np.zeros((NLVL, M), dtype=np.int64)
        for t1 in range(NLVL):
            if not np.any(a2[t1]):
                continue
            for t2 in range(NLVL):
                if not np.any(b2[t2]):
                    continue
                conv = cpx._negacyclic_conv_mod(a2[t1], b2[t2], p)
                for t, vec in tab[(t1, t2) if t1 <= t2
                                  else (t2, t1)].items():
                    out[t] = (out[t] + cpx._negacyclic_conv_mod(
                        conv, vec % p, p)) % p
        return out.reshape(DIM)

    def apply_blocks(blocks_p, r):
        """r: (N, NLVL, M) int64 mod p -> op @ r."""
        out = np.zeros_like(r)
        for (t_out, t_in), blk in blocks_p.items():
            out[:, t_out, :] = (out[:, t_out, :]
                                + r[:, t_in, :] @ blk.T) % p
        return out

    ok_all = True
    results = []
    for pi, p in enumerate(primes if max_primes is None
                           else primes[:max_primes]):
        opsp = {s: ({k: v % p for k, v in o[0].items()},
                    {k: v % p for k, v in o[1].items()})
                for s, o in ops.items()}
        state = np.zeros((d, d, NLVL, M), dtype=np.int64)
        for i in range(d):
            state[i, i, 0, 0] = 1
        for name, q, s in plan:
            if name == 'cz':
                b0 = 1 << (n - 1 - q[0])
                b1 = 1 << (n - 1 - q[1])
                for i in range(d):
                    if (i & b0) and (i & b1):
                        state[i] = (p - state[i]) % p
                continue
            bc, bm = opsp[s]
            b = 1 << (n - 1 - q)
            i0 = np.array([i for i in range(d) if not i & b])
            i1 = i0 | b
            r0 = state[i0].reshape(-1, NLVL, M)
            r1 = state[i1].reshape(-1, NLVL, M)
            if name == 'rx':
                n0 = (apply_blocks(bc, r0) + apply_blocks(bm, r1)) % p
                n1 = (apply_blocks(bm, r0) + apply_blocks(bc, r1)) % p
            else:                        # rz: diag(c - i s, c + i s)
                n0 = (apply_blocks(bc, r0) + apply_blocks(bm, r0)) % p
                n1 = (apply_blocks(bc, r1) - apply_blocks(bm, r1)) % p
            state[i0] = n0.reshape(len(i0), d, NLVL, M)
            state[i1] = n1.reshape(len(i1), d, NLVL, M)

        # s = sum_j conj(U[perm_j, j]) * sign_j * x^kpow_j
        svec = np.zeros(DIM, dtype=np.int64)
        for j in range(d):
            u = state[perm[j], j].reshape(DIM)
            cu = np.zeros(DIM, dtype=np.int64)
            cu[conj_perm] = (conj_sign * u) % p
            # multiply by sign * x^k: negacyclic coordinate shift per level
            shifted = np.zeros(DIM, dtype=np.int64)
            for t in range(NLVL):
                seg = cu[t * M:(t + 1) * M]
                tgt = np.zeros(M, dtype=np.int64)
                k = int(kpow[j])
                for i in range(M):
                    jj = i + k
                    sgn2 = 1
                    while jj >= M:
                        jj -= M
                        sgn2 = -sgn2
                    tgt[jj] = (sgn2 * seg[i]) % p
                shifted[t * M:(t + 1) * M] = tgt
            svec = (svec + int(sign[j]) * shifted) % p
        sconj = np.zeros(DIM, dtype=np.int64)
        sconj[conj_perm] = (conj_sign * svec) % p
        prod = ring_mul_mod(svec, sconj, p).reshape(NLVL, M)
        red = [cpx._phi192_reduce_mod(prod[t], p) for t in range(NLVL)]
        want = (d * d) % p * pow(DEN % p, 2, p) % p
        ok = (int(red[0][0]) == want and not np.any(red[0][1:])
              and not any(np.any(r) for r in red[1:]))
        ok_all = ok_all and ok
        results.append(ok)
        if verbose:
            print(f'  prime {pi + 1}/{len(primes)} p={p}: '
                  f'{"ok" if ok else "FAIL"}', flush=True)
        if not ok:
            break

    return {'label': f'{label} (closed form, modular-CRT hst certificate)',
            'cx_count': 46,
            'field': 'Q(zeta_192)[Y][Z][G1][G2][G3] (dim 3072)',
            'den_bits': DEN.bit_length(),
            'bound_bits': final_bound.bit_length(),
            'num_primes': len(primes),
            'primes_checked': len(results),
            'proven': bool(ok_all and max_primes is None)}


def _cyclotomic_target(qasm_name, d):
    """Exact qasm unitary over Z[zeta_192]: (entries (d,d,M) object ints,
    e) with value = entries / 2^e (H gates make e > 0; the monomial
    shortcut of _monomial_target does not apply)."""
    import glob
    from cpflow_tpu.circuits import exact_unitary as ex
    from cpflow_tpu.circuits.ir import Circuit as IRCircuit

    path = glob.glob('/root/reference/paper/benchmark_circuits/'
                     f'*/{qasm_name}.qasm')[0]
    t = ex.exact_unitary(IRCircuit.from_qasm_file(path), M // 2)
    t.reduce_denominator()
    assert t.m == M and t.dim == d
    return np.array(t.entries, dtype=object), t.e


def _toffoli_target(d):
    """Exact permutation target for the generalized toffoli C^{n-1}X
    (benchmarks/configs.toffoli5_connected_record): entries are 0/1
    integers at cyclotomic power 0, scale e=0."""
    from cpflow_tpu.ops.gates import multi_controlled_x
    n = d.bit_length() - 1
    u = np.rint(multi_controlled_x(n).real).astype(int)
    tent = np.zeros((d, d, M), dtype=object)
    for i in range(d):
        for j in range(d):
            tent[i, j, 0] = int(u[i, j])
    return tent, 0


def prove_qx(label, qasm_name, verbose=True, max_primes=None):
    """Generalization of prove() to any recorded 5q closed-form stream
    whose constants live in F, against a GENERAL exact-cyclotomic qasm
    target (qx_tower_proof.py's scheme lifted to the 5-tower field):
    s = <U, T> assembles by per-entry negacyclic convolutions instead of
    coordinate shifts, and the identity becomes
    s * conj(s) == d^2 * DEN^2 * 4^e (target scale 2^e from H gates),
    projected mod Phi_192 and CRT-forced by an exact coordinate bound."""
    stream = json.load(open(os.path.join(
        _ART, 'exact', f'{label}_closed_form.json')))['instructions']
    from benchmarks.closed_form_search import KNOWN_CLOSED_FORMS
    specs = [r['angle_spec'] for r in stream if 'angle_spec' in r]
    assert specs == KNOWN_CLOSED_FORMS[label]
    n, d = 5, 32

    # qasm_name 'toffoli' selects the exact permutation target (the
    # 35-CZ direct toffoli-5 record row); anything else is a qasm file
    tent, te = (_toffoli_target(d) if qasm_name == 'toffoli'
                else _cyclotomic_target(qasm_name, d))

    # float sanity (not part of the certificate): the exact target IS the
    # matrix the artifact was synthesized against
    zs = np.exp(1j * math.pi * np.arange(M) / M)
    tfloat = np.array([[complex(sum(int(c) * z for c, z in zip(v, zs)))
                        for v in row] for row in tent]) / 2 ** te
    stored = np.load(os.path.join(_ART, 'targets.npz'))[label]
    assert np.max(np.abs(tfloat - stored)) < 1e-6

    if verbose:
        print(f'[{label}] building exact operators for '
              f'{len(set(specs))} distinct specs (target e={te})...',
              flush=True)
    ops = {}
    for s in sorted(set(specs)):
        c, sn = half_trig(s)
        mi_s = mul(from_x_power(-48), sn)            # -i sin(a/2)
        bc, dc, l1c = mult_operator(c)
        bm, dm, l1m = mult_operator(mi_s)
        D = dc * dm // math.gcd(dc, dm)
        fc, fm = D // dc, D // dm
        bc = {k: v * fc for k, v in bc.items()}
        bm = {k: v * fm for k, v in bm.items()}
        ops[s] = (bc, bm, D, l1c * fc + l1m * fm)
        if verbose:
            print(f'  {s}: D={D} l1={ops[s][3]} blocks='
                  f'{len(bc)}+{len(bm)}', flush=True)

    DEN = 1
    bound = 1
    plan = []
    for r in stream:
        if 'angle_spec' in r:
            bc, bm, D, l1 = ops[r['angle_spec']]
            DEN *= D
            bound *= l1
            plan.append((r['name'], r['qubits'][0], r['angle_spec']))
        else:
            plan.append(('cz', tuple(r['qubits']), None))

    # per-entry target data: nonzero (i, j) -> int64 coefficient vector
    t_vecs = {}
    t_l1_total = 0
    t_cmax = 0
    for i in range(d):
        for j in range(d):
            if any(int(c) for c in tent[i, j]):
                v = np.array([int(c) for c in tent[i, j]], dtype=np.int64)
                t_vecs[(i, j)] = v
                t_l1_total += int(np.abs(v).sum())
                t_cmax = max(t_cmax, int(np.abs(v).max()))
    # einsum overflow guard: p < 2^26, |T coeff| * p * M * NLVL products
    assert t_cmax * (1 << 26) * M * NLVL < 1 << 62

    s_inf = bound * t_l1_total
    prod_bound = (DIM * s_inf) * NLVL * s_inf * tab_l1()
    final_bound = 2 * prod_bound + (d * DEN) ** 2 * 4 ** te
    bits = final_bound.bit_length() + 2
    primes = cpx._primes(bits)
    if verbose:
        print(f'DEN bits={DEN.bit_length()} target L1 bits='
              f'{t_l1_total.bit_length()} bound bits='
              f'{final_bound.bit_length()} primes={len(primes)}',
              flush=True)

    conj_perm = np.zeros(DIM, dtype=np.int64)
    conj_sign = np.zeros(DIM, dtype=np.int64)
    for t in range(NLVL):
        base = t * M
        conj_perm[base] = base
        conj_sign[base] = 1
        for k in range(1, M):
            conj_perm[base + k] = base + M - k
            conj_sign[base + k] = -1

    tab = {}
    for t1 in range(NLVL):
        for t2 in range(t1, NLVL):
            prod = mul(from_x_power(0, lvl=t1), from_x_power(0, lvl=t2))
            ent = {}
            for t in range(NLVL):
                if any(prod[t]):
                    assert all(c.denominator == 1 for c in prod[t])
                    ent[t] = np.array([int(c) for c in prod[t]],
                                      dtype=np.int64)
            tab[(t1, t2)] = ent

    def ring_mul_mod(a, b, p):
        a2 = a.reshape(NLVL, M)
        b2 = b.reshape(NLVL, M)
        out = np.zeros((NLVL, M), dtype=np.int64)
        for t1 in range(NLVL):
            if not np.any(a2[t1]):
                continue
            for t2 in range(NLVL):
                if not np.any(b2[t2]):
                    continue
                conv = cpx._negacyclic_conv_mod(a2[t1], b2[t2], p)
                for t, vec in tab[(t1, t2) if t1 <= t2
                                  else (t2, t1)].items():
                    out[t] = (out[t] + cpx._negacyclic_conv_mod(
                        conv, vec % p, p)) % p
        return out.reshape(DIM)

    def apply_blocks(blocks_p, r, p):
        out = np.zeros_like(r)
        for (t_out, t_in), blk in blocks_p.items():
            out[:, t_out, :] = (out[:, t_out, :]
                                + r[:, t_in, :] @ blk.T) % p
        return out

    # Toeplitz operators of each nonzero target entry (raw small ints)
    t_toep = {ij: _toeplitz(v, 1) for ij, v in t_vecs.items()}

    ok_all = True
    results = []
    for pi, p in enumerate(primes if max_primes is None
                           else primes[:max_primes]):
        opsp = {s: ({k: v % p for k, v in o[0].items()},
                    {k: v % p for k, v in o[1].items()})
                for s, o in ops.items()}
        state = np.zeros((d, d, NLVL, M), dtype=np.int64)
        for i in range(d):
            state[i, i, 0, 0] = 1
        for name, q, s in plan:
            if name == 'cz':
                b0 = 1 << (n - 1 - q[0])
                b1 = 1 << (n - 1 - q[1])
                for i in range(d):
                    if (i & b0) and (i & b1):
                        state[i] = (p - state[i]) % p
                continue
            bc, bm = opsp[s]
            b = 1 << (n - 1 - q)
            i0 = np.array([i for i in range(d) if not i & b])
            i1 = i0 | b
            r0 = state[i0].reshape(-1, NLVL, M)
            r1 = state[i1].reshape(-1, NLVL, M)
            if name == 'rx':
                n0 = (apply_blocks(bc, r0, p) + apply_blocks(bm, r1, p)) % p
                n1 = (apply_blocks(bm, r0, p) + apply_blocks(bc, r1, p)) % p
            else:                        # rz: diag(c - i s, c + i s)
                n0 = (apply_blocks(bc, r0, p) + apply_blocks(bm, r0, p)) % p
                n1 = (apply_blocks(bc, r1, p) - apply_blocks(bm, r1, p)) % p
            state[i0] = n0.reshape(len(i0), d, NLVL, M)
            state[i1] = n1.reshape(len(i1), d, NLVL, M)

        # s = sum_ij conj(U_ij) * T_ij by per-level Toeplitz action
        conj_state = np.zeros_like(state).reshape(d, d, DIM)
        flat = state.reshape(d, d, DIM)
        conj_state[:, :, conj_perm] = flat * conj_sign
        conj_state %= p
        cs_lvl = conj_state.reshape(d, d, NLVL, M)
        svec = np.zeros((NLVL, M), dtype=np.int64)
        for (i, j), toep in t_toep.items():
            svec = (svec + cs_lvl[i, j] @ toep.T) % p
        svec = svec.reshape(DIM)
        sconj = np.zeros(DIM, dtype=np.int64)
        sconj[conj_perm] = (conj_sign * svec) % p
        prod = ring_mul_mod(svec, sconj, p).reshape(NLVL, M)
        red = [cpx._phi192_reduce_mod(prod[t], p) for t in range(NLVL)]
        want = (d * d) % p * pow(DEN % p, 2, p) % p * pow(4, te, p) % p
        ok = (int(red[0][0]) == want and not np.any(red[0][1:])
              and not any(np.any(r) for r in red[1:]))
        ok_all = ok_all and ok
        results.append(ok)
        if verbose:
            print(f'  prime {pi + 1}/{len(primes)} p={p}: '
                  f'{"ok" if ok else "FAIL"}', flush=True)
        if not ok:
            break

    return {'label': f'{label} (closed form, modular-CRT hst certificate)',
            'cx_count': sum(1 for r in stream if r['name'] == 'cz'),
            'field': 'Q(zeta_192)[Y][Z][G1][G2][G3] (dim 3072)',
            'target_e': te,
            'den_bits': DEN.bit_length(),
            'bound_bits': final_bound.bit_length(),
            'num_primes': len(primes),
            'primes_checked': len(results),
            'proven': bool(ok_all and max_primes is None)}


def main_qx(label, qasm_name):
    res = prove_qx(label, qasm_name)
    if res['proven']:
        path = os.path.join(_ART, 'exact', f'{label}_closed_form.json')
        art = json.load(open(path))
        art['status'] = ('closed form, PROVEN (modular-CRT hst '
                         'certificate over the 3072-dim 5-tower field)')
        art.update({k: res[k] for k in ('field', 'den_bits', 'bound_bits',
                                        'num_primes', 'target_e')})
        art['proven'] = True
        with open(path, 'w') as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f'certificate recorded -> {path}')
    print(json.dumps(res))
    return res


def main():
    res = prove()
    if res['proven']:
        path = os.path.join(_ART, 'exact',
                            'qx_one-two-three-v1_99_closed_form.json')
        art = json.load(open(path))
        art['status'] = ('closed form, PROVEN (modular-CRT hst '
                         'certificate over the 3072-dim 5-tower field)')
        art.update({k: res[k] for k in ('field', 'den_bits', 'bound_bits',
                                        'num_primes')})
        art['proven'] = True
        with open(path, 'w') as f:
            json.dump(art, f, indent=1, sort_keys=True)
        print(f'certificate recorded -> {path}')
    print(json.dumps(res))
    return res


if __name__ == '__main__':
    import sys
    if len(sys.argv) == 3:           # e.g. qx_4gt13_91_chain 4gt13_91
        main_qx(sys.argv[1], sys.argv[2])
    else:
        main()
