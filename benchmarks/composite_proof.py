"""Machine-checked proof that the closed-form 30-CZ connected toffoli-5
composite (benchmarks/composite_closed_form.py) implements toffoli-5
exactly up to a global phase.

The composite's angles are pi-rationals with denominators dividing 48
(the c3sqrtx block's sixteenths, the W block's quarters and thirds) plus
the Margolus magic angle arctan(sqrt 2) (the W block), and the assembly
uses exact H and CP(+-pi/2) gates. Everything therefore lives in

    R = B[Y] / (Y^2 - w),  B = Z[x]/(x^96 + 1)  (x -> zeta_192),
    w = 18 + 6 sqrt3,      Y -> 6 cos(arctan(sqrt 2)/2) > 0

(dim_Q = 192; same quadratic-extension trick as exact_relphase_proof.py,
scaled from zeta_48 to zeta_192 to absorb the sixteenths). B is NOT a
domain: x^96+1 = Phi_192(x) * Phi_64(x), so — exactly as in the zeta_48
proofs — the final identity is checked after projecting the cyclotomic
axis modulo Phi_192(x) = x^64 - x^32 + 1, a ring hom onto the true
component.

Certificate (the toffoli5_proof.py modular-CRT scheme): with U the
integer-scaled circuit product, T the toffoli-5 permutation, DEN the
product of the per-gate scale factors and s = <U, T>, check

    s * conj(s) == d^2 * DEN^2   (d = 32)   in R projected mod Phi_192,

modulo enough 26-bit primes that an exact coordinate bound (propagated
through per-gate operator L1 norms, the ring structure constants, and
the Phi_192 reduction) forces the integer identity by CRT. In the
complex embedding |<U/DEN, T>| = d with both unitary gives
U/DEN = phase * T — i.e. the 30-CZ composite IS toffoli-5 up to global
phase (numerically the phase is e^{-i pi/32} = x^{-3},
composite_closed_form.main).

Soundness of the assembly itself needs NO extra lemmas: the proof
multiplies out the full 98-gate closed-form instruction stream, so the
gauge-cancellation argument in composite_closed_form.py is only
motivation, not a proof dependency.

Paper context: the reference's exactness verification was
machine-precision Mathematica (CPFlow.tex:430); the 30-CZ count itself
beats the paper's published 36 (CPFlow.tex sec toff5).

Usage: python -m benchmarks.composite_proof    (host CPU, ~10-20 min)
Tested by tests/test_composite_proof.py.
"""

import json
import math
import os
from fractions import Fraction

import numpy as np

M = 96                 # x^M = -1, x -> zeta_192
DIM = 2 * M            # Y-degree x cyclotomic
_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


# ---------------------------------------------------------------------------
# exact arithmetic in R: elements are (2, M) Fraction arrays (Y-power, x^k)
# ---------------------------------------------------------------------------

def zero():
    a = np.empty((2, M), dtype=object)
    a[...] = Fraction(0)
    return a


def from_x_power(k, coeff=1, y=0):
    a = zero()
    k %= 2 * M
    s = 1
    if k >= M:
        k -= M
        s = -1
    a[y, k] = Fraction(coeff) * s
    return a


def one():
    return from_x_power(0)


def scalar(q):
    return from_x_power(0, Fraction(q))


SQRT3 = from_x_power(16) + from_x_power(-16)     # zeta_12 + zeta_12^-1
SQRT2 = from_x_power(24) + from_x_power(-24)     # zeta_8 + zeta_8^-1
W_REL = scalar(18) + SQRT3 * 6                   # Y^2 = 18 + 6 sqrt3


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


def mul(a, b):
    """(a0 + a1 Y)(b0 + b1 Y) = a0 b0 + a1 b1 w + (a0 b1 + a1 b0) Y."""
    out = zero()
    out[0] = _cyc_mul(a[0], b[0]) + _cyc_mul(_cyc_mul(a[1], b[1]), W_REL[0])
    out[1] = _cyc_mul(a[0], b[1]) + _cyc_mul(a[1], b[0])
    return out


def to_mp(a, mp):
    """Complex embedding x -> zeta_192, Y -> 6 cos(magic/2)."""
    x = mp.e ** (1j * mp.pi / M)
    yv = 6 * mp.cos(mp.atan(mp.sqrt(2)) / 2)
    tot = mp.mpc(0)
    for y in range(2):
        for k in range(M):
            c = a[y, k]
            if c:
                tot += (mp.mpf(c.numerator) / c.denominator
                        ) * x ** k * yv ** y
    return tot


# exact cos/sin of the magic half-angle (exact_relphase_proof.py:173-176,
# rescaled): c = Y/6, s = sqrt6 * Y * (3 - sqrt3) / 36
C_MAGIC = from_x_power(0, Fraction(1, 6), y=1)
_S_MAGIC_CYC = mul(mul(SQRT2, SQRT3), scalar(3) - SQRT3) * Fraction(1, 36)
S_MAGIC = zero()
S_MAGIC[1] = _S_MAGIC_CYC[0]


def half_trig(spec):
    """Exact (cos(a/2), sin(a/2)) in R for a = r*pi + sign*magic, with
    48*r integral (r*pi/2 = k*pi/96 on the zeta_192 grid)."""
    from benchmarks.exact_relphase_proof import parse_spec
    r, sg = parse_spec(spec)
    k2 = 48 * r.numerator
    assert k2 % r.denominator == 0, spec
    k = k2 // r.denominator
    cr = (from_x_power(k) + from_x_power(-k)) * Fraction(1, 2)
    # sin t = (x^k - x^-k)/(2i), 1/i = x^-48
    sr = (from_x_power(k - 48) - from_x_power(-k - 48)) * Fraction(1, 2)
    if sg == 0:
        return cr, sr
    sm = S_MAGIC if sg > 0 else -S_MAGIC
    return (mul(cr, C_MAGIC) - mul(sr, sm),
            mul(sr, C_MAGIC) + mul(cr, sm))


# ---------------------------------------------------------------------------
# integer-scaled multiplication operators (toffoli5_proof.py:154-196 pattern)
# ---------------------------------------------------------------------------

def _shift_cols(vec, k):
    """Negacyclic shift of a length-M object vector by x^k."""
    out = np.empty(M, dtype=object)
    for i in range(M):
        j = i + k
        s = 1
        while j >= M:
            j -= M
            s = -s
        out[j] = vec[i] * s if s < 0 else vec[i]
    return out


def mult_operator(const):
    """DIM x DIM integer operator of y -> D * const * y, plus the exact
    scale D. Columns come from const * Y^t * x^k: two dense products
    (const * 1, const * Y) and coordinate shifts for x^k."""
    base = [mul(const, one()),
            mul(const, from_x_power(0, y=1))]
    dmax = 1
    for b in base:
        for row in b:
            for c in row:
                if c:
                    dmax = dmax * c.denominator // math.gcd(
                        dmax, c.denominator)
    op = np.zeros((DIM, DIM), dtype=object)
    for t in range(2):
        bt = base[t]
        for k in range(M):
            j = t * M + k
            for tout in range(2):
                sh = _shift_cols(bt[tout], k)
                for i in range(M):
                    c = sh[i]
                    if c:
                        op[tout * M + i, j] = int(c * dmax)
    return op, dmax


def op_l1(op):
    """Max row L1 norm: |op @ v|_inf <= op_l1 * |v|_inf."""
    best = 0
    for i in range(DIM):
        tot = sum(abs(int(x)) for x in op[i] if x)
        best = max(best, tot)
    return best


# ---------------------------------------------------------------------------
# the certificate
# ---------------------------------------------------------------------------

def _primes(n_bits_needed, p_max=1 << 26):
    out, prod_bits = [], 0
    p = p_max - 1
    while prod_bits < n_bits_needed:
        while True:
            if all(p % q for q in range(2, int(p ** 0.5) + 1)):
                break
            p -= 1
        out.append(p)
        prod_bits += math.log2(p)
        p -= 1
    return out


def _phi192_reduce_mod(vec, p):
    """Project a length-M coordinate vector (coeffs of x^0..x^95 in
    Z[x]/(x^96+1)) modulo Phi_192(x) = x^64 - x^32 + 1:
    x^(64+j) -> x^(32+j) - x^j for j = 0..31."""
    out = vec[:64].copy()
    out[32:64] = (out[32:64] + vec[64:]) % p
    out[:32] = (out[:32] - vec[64:]) % p
    return out


def _x_shift_indices(k):
    """Index/sign arrays for multiplication by x^k on (2, M) coords."""
    idx = np.zeros(DIM, dtype=np.int64)
    sgn = np.zeros(DIM, dtype=np.int64)
    for t in range(2):
        for i in range(M):
            j = i + k
            s = 1
            while j >= M:
                j -= M
                s = -s
            while j < 0:
                j += M
                s = -s
            idx[t * M + i] = t * M + j
            sgn[t * M + i] = s
    return idx, sgn


def _negacyclic_conv_mod(u, v, p):
    full = np.convolve(u.astype(object), v.astype(object))
    out = np.zeros(M, dtype=object)
    out[: min(M, len(full))] = full[:M]
    if len(full) > M:
        out[: len(full) - M] -= full[M:]
    return (out % p).astype(np.int64)


def _ring_mul_mod(a, b, p):
    """s * t in R mod p for DIM int64 coordinate vectors."""
    a2 = a.reshape(2, M)
    b2 = b.reshape(2, M)
    w = np.array([int(x) % p for x in W_REL[0]], dtype=np.int64)
    c00 = _negacyclic_conv_mod(a2[0], b2[0], p)
    c11 = _negacyclic_conv_mod(a2[1], b2[1], p)
    c01 = _negacyclic_conv_mod(a2[0], b2[1], p)
    c10 = _negacyclic_conv_mod(a2[1], b2[0], p)
    out = np.zeros((2, M), dtype=np.int64)
    out[0] = (c00 + _negacyclic_conv_mod(c11, w, p)) % p
    out[1] = (c01 + c10) % p
    return out.reshape(DIM)


def build_plan(instrs, verbose=True):
    """Per-gate integer operators + exact DEN and coordinate bound."""
    rot_specs = sorted({sp for nm, _q, sp in instrs
                        if nm in ('rx', 'rz')})
    ops = {}
    for s in rot_specs:
        c, sn = half_trig(s)
        mi_s = mul(from_x_power(-48), sn)            # -i sin(a/2)
        opc, dc = mult_operator(c)
        opm, dm = mult_operator(mi_s)
        D = dc * dm // math.gcd(dc, dm)
        opc = opc * (D // dc)
        opm = opm * (D // dm)
        ops[s] = (opc, opm, D, op_l1(opc) + op_l1(opm))
        if verbose:
            print(f'  {s}: D={D} l1={ops[s][3]}', flush=True)
    oph, dh = mult_operator(SQRT2 * Fraction(1, 2))  # H = (sqrt2/2) [[1,1],[1,-1]]
    h_l1 = 2 * op_l1(oph)                            # rows mix r0 +- r1

    DEN = 1
    bound = 1
    plan = []
    for name, qubits, spec in instrs:
        if name in ('rx', 'rz'):
            opc, opm, D, l1 = ops[spec]
            DEN *= D
            bound *= l1
            plan.append((name, qubits[0], spec))
        elif name == 'h':
            DEN *= dh
            bound *= h_l1
            plan.append(('h', qubits[0], None))
        elif name == 'cp':
            from benchmarks.exact_relphase_proof import parse_spec
            r, sg = parse_spec(spec)
            assert sg == 0 and abs(r) == Fraction(1, 2)
            k = int(96 * r)                          # e^{i r pi} = x^{96 r}
            plan.append(('cp', tuple(qubits), k))    # bound factor 1
        else:
            assert name == 'cz'
            plan.append(('cz', tuple(qubits), None))
    return plan, ops, oph, DEN, bound


def prove(label='toffoli5_connected_composite', verbose=True):
    from benchmarks.composite_closed_form import BUILDERS, cz_cost
    instrs = BUILDERS[label]()
    n, d = 5, 32
    if verbose:
        print(f'[{label}] building exact gate operators...', flush=True)
    plan, ops, oph, DEN, bound = build_plan(instrs, verbose=verbose)

    # s = <U, T>: 32 entries, DIM coords each, |coord| <= bound
    l1_s = d * bound * DIM
    # s*conj(s): |coord| <= L1(s) * |s|_inf * K_ring; K_ring = L1(w) for
    # the Y^2 relation (the cyclotomic axis is coordinate-permuting)
    k_ring = sum(abs(int(x)) for x in W_REL[0] if x)
    prod_bound = (l1_s ** 2) * max(1, k_ring)
    # Phi_192 reduction doubles at most: x^(64+j) -> x^(32+j) - x^j
    final_bound = 2 * prod_bound + (d * DEN) ** 2
    bits = final_bound.bit_length() + 2
    primes = _primes(bits)
    if verbose:
        print(f'DEN bits={DEN.bit_length()} bound bits='
              f'{final_bound.bit_length()} primes={len(primes)}', flush=True)

    perm = list(range(d))
    perm[d - 2], perm[d - 1] = perm[d - 1], perm[d - 2]

    # conj: x^k -> -x^(M-k) (k>0) on the cyclotomic axis, Y -> Y
    conj_perm = np.zeros(DIM, dtype=np.int64)
    conj_sign = np.zeros(DIM, dtype=np.int64)
    for t in range(2):
        base = t * M
        conj_perm[base] = base
        conj_sign[base] = 1
        for k in range(1, M):
            conj_perm[base + k] = base + M - k
            conj_sign[base + k] = -1

    cp_shift = {k: _x_shift_indices(k) for k in (-48, 48)}

    ok_all = True
    for pi, p in enumerate(primes):
        opsp = {s: (np.asarray(o[0] % p, dtype=np.int64),
                    np.asarray(o[1] % p, dtype=np.int64))
                for s, o in ops.items()}
        ophp = np.asarray(oph % p, dtype=np.int64)
        state = np.zeros((d, d, DIM), dtype=np.int64)
        for i in range(d):
            state[i, i, 0] = 1
        for name, q, s in plan:
            if name == 'cz':
                b0 = 1 << (n - 1 - q[0])
                b1 = 1 << (n - 1 - q[1])
                for i in range(d):
                    if (i & b0) and (i & b1):
                        state[i] = (p - state[i]) % p
                continue
            if name == 'cp':
                b0 = 1 << (n - 1 - q[0])
                b1 = 1 << (n - 1 - q[1])
                idx, sgn = cp_shift[s]
                rows = [i for i in range(d) if (i & b0) and (i & b1)]
                for i in rows:
                    new = np.zeros((d, DIM), dtype=np.int64)
                    new[:, idx] = state[i] * sgn
                    state[i] = new % p
                continue
            b = 1 << (n - 1 - q)
            i0 = np.array([i for i in range(d) if not i & b])
            i1 = i0 | b
            r0 = state[i0].reshape(-1, DIM).T % p
            r1 = state[i1].reshape(-1, DIM).T % p
            if name == 'h':
                n0 = (ophp @ ((r0 + r1) % p)) % p
                n1 = (ophp @ ((r0 - r1) % p)) % p
            elif name == 'rx':
                opc, opm = opsp[s]
                n0 = (opc @ r0 + opm @ r1) % p
                n1 = (opm @ r0 + opc @ r1) % p
            else:                                    # rz: diag(c -+ i s)
                opc, opm = opsp[s]
                e0 = (opc + opm) % p
                e1 = (opc - opm) % p
                n0 = (e0 @ r0) % p
                n1 = (e1 @ r1) % p
            state[i0] = n0.T.reshape(len(i0), d, DIM)
            state[i1] = n1.T.reshape(len(i1), d, DIM)
        svec = np.zeros(DIM, dtype=np.int64)
        for j in range(d):
            svec = (svec + state[perm[j], j]) % p
        sconj = np.zeros(DIM, dtype=np.int64)
        sconj[conj_perm] = (conj_sign * svec) % p
        prod = _ring_mul_mod(svec, sconj, p).reshape(2, M)
        # project onto the Phi_192 component (the true embedding)
        red0 = _phi192_reduce_mod(prod[0], p)
        red1 = _phi192_reduce_mod(prod[1], p)
        want = (d * d) % p * pow(DEN % p, 2, p) % p
        ok = (int(red0[0]) == want and not np.any(red0[1:])
              and not np.any(red1))
        ok_all = ok_all and ok
        if verbose:
            print(f'  prime {pi + 1}/{len(primes)} p={p}: '
                  f'{"ok" if ok else "FAIL"}', flush=True)
        if not ok:
            break

    return {'label': f'{label} (closed form, modular-CRT hst certificate)',
            'cz_count': cz_cost(instrs),
            'field': 'Q(zeta_192)[Y]/(Y^2 - (18 + 6 sqrt3)) (dim 192)',
            'den_bits': DEN.bit_length(),
            'bound_bits': final_bound.bit_length(),
            'num_primes': len(primes),
            'proven': bool(ok_all)}


# global phases measured by composite_closed_form.main (exact zeta_64
# powers, consistent with the ring: x^{-3} and x^9)
_PHASES = {'toffoli5_connected_composite': 'e^{-i pi/32}',
           'toffoli5_chain_composite': 'e^{+3i pi/32}'}
_ART_NAMES = {'toffoli5_connected_composite':
              'toffoli5_composite_certificate.json',
              'toffoli5_chain_composite':
              'toffoli5_chain_composite_certificate.json'}


def main(labels=None):
    import sys
    from benchmarks.composite_closed_form import BUILDERS, cz_cost
    labels = labels or sys.argv[1:] or list(BUILDERS)
    out_all = []
    for label in labels:
        res = prove(label)
        if res['proven']:
            out = os.path.join(_ART, 'exact', _ART_NAMES[label])
            instrs = BUILDERS[label]()
            art = {'label': label,
                   'num_qubits': 5,
                   'cz_count': cz_cost(instrs),
                   'certificate': 'hst (modular-CRT over '
                                  'Q(zeta_192)[Y]/(Y^2-(18+6*sqrt3)))',
                   'field': res['field'],
                   'proven': res['proven'],
                   'den_bits': res['den_bits'],
                   'bound_bits': res['bound_bits'],
                   'num_primes': res['num_primes'],
                   'global_phase': _PHASES[label],
                   'instructions': [
                       {'name': nm, 'qubits': list(qs),
                        **({'angle_spec': sp} if sp is not None else {})}
                       for nm, qs, sp in instrs]}
            with open(out, 'w') as f:
                json.dump(art, f, indent=1, sort_keys=True)
            print(f'certificate artifact -> {out}')
        print(json.dumps(res))
        out_all.append(res)
    return out_all


if __name__ == '__main__':
    main()
