"""Machine-checked proof that the 37-CZ connected toffoli-5 closed form
(closed_form_search.KNOWN_CLOSED_FORMS) implements toffoli-5 exactly up to
a global phase.

The decomposition's angles live in F = Q(zeta_64)[Z][G1][G2][G3]
(benchmarks/tower_field.py, dim_Q = 512). A direct symbolic product of
139 gates over F with Fraction coordinates is infeasible, so the
certificate is modular-CRT over the ABSTRACT quotient ring:

  1. Every gate's exact half-angle (cos, sin) is computed ONCE in F
     (Fractions) and scaled to integer coordinate vectors (denominator
     D_g recorded exactly).
  2. The scaled circuit is applied to all 2^5 basis columns modulo many
     26-bit primes (numpy int64 matmuls; the per-gate multiplication
     operators are exact integer 512x512 matrices, block-diagonal 32x32
     for the dyadic gates).
  3. With s = <U, T> (T the toffoli-5 permutation), the claim is the ring
     identity  s * conj(s) == d^2 * DEN^2,  DEN = prod D_g. Each checked
     prime p verifies the identity mod p.
  4. Soundness: every coordinate of s*conj(s) - d^2*DEN^2 is an integer
     bounded by an EXACT bound propagated through operator L1 norms; once
     prod(p) exceeds twice that bound, CRT forces the integers to be 0,
     i.e. the identity holds over Z — a proof, not a sampling argument.
     The identity in the abstract ring maps to the real embedding (ring
     hom), where |<U,T>| = d with U, T unitary forces U = phase * T.

Paper context: the reference verified decompositions numerically in an
external Mathematica notebook (CPFlow.tex:430). This is the first fully
symbolic certificate for a 5-qubit row in this project; the toffoli-4
family proofs (exact_relphase_proof.py) cover the 4-qubit rows.

Usage: python -m benchmarks.toffoli5_proof     (host CPU, ~10 min)
Tested by tests/test_toffoli5_proof.py.
"""

import json
import math
from fractions import Fraction

import numpy as np

from benchmarks import tower_field as tf

M = tf.M
DIM = 512


# ---------------------------------------------------------------------------
# exact constants of the three w-angles (validated in tests at 50 digits)
# ---------------------------------------------------------------------------

def _zel(coeff_1, coeff_z):
    """coeff_1 + coeff_z * Z for pure-cyclotomic inputs."""
    a = coeff_1.copy()
    a[0, 0, 0, 1, :] = a[0, 0, 0, 1, :] + coeff_z[0, 0, 0, 0, :]
    return a


def _gen(level_idx):
    a = tf.zero()
    a[level_idx] = Fraction(1)
    return a


G1 = _gen((0, 0, 1, 0, 0))
G2 = _gen((0, 1, 0, 0, 0))
G3 = _gen((1, 0, 0, 0, 0))
Z = _gen((0, 0, 0, 1, 0))

_X = tf.from_x_power

# sqrt2*c8 = x^12 + x^4 - x^20 - x^28 ; s8 = 2 sin(pi/8) = x^12 - x^20
_S2C8 = _X(12) + _X(4) - _X(20) - _X(28)
_S8 = _X(12) - _X(20)
_S2S8 = _X(20) - _X(28) + _X(4) - _X(12)     # sqrt2 * s8

COS_W = {
    'w1': tf.mul(_zel(tf.zero(), (tf.SQRT2 * 3 + tf.one())), Z) * Fraction(1, 17) if False else None,
}

# cos/sin of the full w angles (see closed_form_search.CONSTANTS and
# RESULTS_r3 §17 for the derivations; each is checked numerically in tests)
COS_W1 = tf.mul((tf.SQRT2 * 3 + tf.one()) * Fraction(1, 17), Z)
SIN_W1 = tf.mul((tf.SQRT2 * 5 - tf.scalar(4)) * Fraction(1, 17), Z)
COS_W2 = _S2C8 * Fraction(1, 4)
SIN_W2 = tf.mul(_S2S8 * Fraction(1, 4), Z)
COS_W3 = tf.mul((tf.scalar(5) - tf.SQRT2 * 2) * Fraction(1, 17), Z)
SIN_W3 = tf.mul(tf.mul(_S2C8 * Fraction(1, 17),
                       tf.scalar(5) - tf.SQRT2 * 2), Z)

# half-angle trig: cos(w/2) from the generators, sin(w/2) = sin w/(2cos(w/2))
COS_HALF = {'w1': G1 * Fraction(1, 34), 'w2': G2 * Fraction(1, 4),
            'w3': G3 * Fraction(1, 34)}
SIN_HALF = {
    'w1': tf.mul(SIN_W1 * 17, tf.inv(G1)),
    'w2': tf.mul(SIN_W2 * 2, tf.inv(G2)),
    'w3': tf.mul(SIN_W3 * 17, tf.inv(G3)),
}


def half_trig_field(spec):
    """Exact (cos(a/2), sin(a/2)) in F for a closed-form spec
    'r', 'r+w_i', 'r-w_i' with dyadic r (denominator | 16)."""
    from benchmarks.closed_form_search import parse_spec_general
    r, sg, name = parse_spec_general(spec)
    k2 = 16 * r.numerator
    assert k2 % r.denominator == 0, spec
    k = k2 // r.denominator          # r*pi/2 = k*pi/32 on the zeta_64 grid
    cr = (_X(k) + _X(-k)) * Fraction(1, 2)
    sr = (_X(16 - k) - _X(16 + k)) * Fraction(1, 2)
    if name is None:
        return cr, sr
    assert name in COS_HALF, spec
    cw, sw = COS_HALF[name], SIN_HALF[name]
    if sg < 0:
        sw = -sw
    return (tf.mul(cr, cw) - tf.mul(sr, sw),
            tf.mul(sr, cw) + tf.mul(cr, sw))


# ---------------------------------------------------------------------------
# integer-scaled multiplication operators
# ---------------------------------------------------------------------------

def _flat(a):
    return a.reshape(DIM)


def _tower_basis_elems():
    out = []
    for t in range(16):
        e = tf.zero()
        e.reshape(DIM)[t * M] = Fraction(1)   # e_{t, x^0}
        out.append(e)
    return out


_TBASIS = None


def _shift_cols(vec32, k):
    """Negacyclic shift of a length-M object vector by x^k."""
    out = np.empty(M, dtype=object)
    for i in range(M):
        j = i + k
        s = 1
        while j >= M:
            j -= M
            s = -s
        out[j] = vec32[i] * s if s < 0 else vec32[i]
    return out


def mult_operator(const):
    """512x512 integer operator of y -> D * const * y, plus the exact
    scale D. Columns come from const * e_{t,k} = x^k * (const * e_t):
    only 16 dense field products are needed; the 32 cyclotomic shifts are
    coordinate rotations (x^M = -1)."""
    global _TBASIS
    if _TBASIS is None:
        _TBASIS = _tower_basis_elems()
    base = [_flat(tf.mul(const, et)).reshape(16, M) for et in _TBASIS]
    dens = set()
    for b in base:
        for row in b:
            for c in row:
                if c:
                    dens.add(c.denominator)
    d = 1
    for q in dens:
        d = d * q // math.gcd(d, q)
    op = np.zeros((DIM, DIM), dtype=object)
    for t in range(16):
        bt = base[t]
        for k in range(M):
            col = np.empty((16, M), dtype=object)
            for tout in range(16):
                col[tout] = _shift_cols(bt[tout], k)
            colf = col.reshape(DIM)
            j = t * M + k
            for i in range(DIM):
                c = colf[i]
                if c:
                    op[i, j] = int(c * d)
    return op, d


def op_l1(op):
    """Max column L1 norm (exact int): |op @ v|_inf <= op_l1 * |v|_inf * nnz
    is loose; we use |op @ v|_inf <= (max_j sum_i |op_ij|) * |v|_inf since
    each output coordinate sums |row| * |v|_inf terms — take max ROW L1."""
    best = 0
    for i in range(DIM):
        tot = sum(abs(int(x)) for x in op[i] if x)
        best = max(best, tot)
    return best


# ---------------------------------------------------------------------------
# the certificate
# ---------------------------------------------------------------------------

def _primes(n_bits_needed, p_max=1 << 26):
    """Largest primes below p_max until their product exceeds the bound."""
    out, prod_bits = [], 0
    p = p_max - 1
    while prod_bits < n_bits_needed:
        while True:
            is_p = all(p % q for q in range(2, int(p ** 0.5) + 1))
            if is_p:
                break
            p -= 1
        out.append(p)
        prod_bits += math.log2(p)
        p -= 1
    return out


def prove(verbose=True):
    from benchmarks.closed_form_search import (KNOWN_CLOSED_FORMS,
                                               reduced_artifact)
    label = 'toffoli5_connected'
    specs = KNOWN_CLOSED_FORMS[label]
    qc, meta, target = reduced_artifact(label)
    n = qc.num_qubits
    d = 2 ** n
    rot = [i for i in qc.instructions if i.param is not None]
    assert len(rot) == len(specs)
    assert meta['loss_kind'] == 'hst'

    # exact per-gate operators (cache identical specs)
    if verbose:
        print(f'building exact operators for {len(set(specs))} distinct '
              f'specs...', flush=True)
    ops = {}
    for s in set(specs):
        c, sn = half_trig_field(s)
        mi_s = tf.mul(tf.from_x_power(-16), sn)      # -i sin(a/2)
        opc, dc = mult_operator(c)
        opm, dm = mult_operator(mi_s)
        D = dc * dm // math.gcd(dc, dm)
        opc = opc * (D // dc)
        opm = opm * (D // dm)
        ops[s] = (opc, opm, D, op_l1(opc) + op_l1(opm))
        if verbose:
            print(f'  {s}: D={D} l1={ops[s][3]}', flush=True)

    # exact bound + total denominator
    DEN = 1
    bound = 1
    ai = 0
    plan = []
    for inst in qc.instructions:
        if inst.param is not None:
            s = specs[ai]
            ai += 1
            opc, opm, D, l1 = ops[s]
            DEN *= D
            bound *= l1
            plan.append((inst.name, inst.qubits[0], s))
        else:
            plan.append(('cz', inst.qubits, None))
    # s = sum over 32 entries; product coords bound: L1(s)^2 * K_ring
    l1_s = d * bound * DIM          # |coords|<=bound, L1 over DIM coords
    k_ring = 816 * 884 * 16 * 9    # prod of relation L1 norms (tower_field)
    final_bound = (l1_s ** 2) * k_ring + (d * DEN) ** 2
    bits = final_bound.bit_length() + 2
    primes = _primes(bits)
    if verbose:
        print(f'DEN bits={DEN.bit_length()} bound bits='
              f'{final_bound.bit_length()} primes={len(primes)}', flush=True)

    # permutation target: toffoli-5 swaps the last two basis states
    perm = list(range(d))
    perm[d - 2], perm[d - 1] = perm[d - 1], perm[d - 2]

    # conj as a coordinate map: x^k -> -x^(M-k) on the cyclotomic axis
    conj_perm = np.zeros(DIM, dtype=np.int64)
    conj_sign = np.zeros(DIM, dtype=np.int64)
    for t in range(16):
        base = t * M
        conj_perm[base] = base
        conj_sign[base] = 1
        for k in range(1, M):
            conj_perm[base + k] = base + M - k
            conj_sign[base + k] = -1

    ok_all = True
    for pi, p in enumerate(primes):
        opsp = {s: (np.asarray(o[0] % p, dtype=np.int64),
                    np.asarray(o[1] % p, dtype=np.int64))
                for s, o in ops.items()}
        # state: rows of U — U starts as identity; coords axis last
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
            opc, opm = opsp[s]
            b = 1 << (n - 1 - q)
            i0 = np.array([i for i in range(d) if not i & b])
            i1 = i0 | b
            r0 = state[i0].reshape(-1, DIM).T % p
            r1 = state[i1].reshape(-1, DIM).T % p
            if name == 'rx':
                n0 = (opc @ r0 + opm @ r1) % p
                n1 = (opm @ r0 + opc @ r1) % p
            else:  # rz: diag(c - i s, c + i s): conj on cyclotomic axis
                e0 = (opc + opm) % p
                e1 = (opc - opm) % p
                n0 = (e0 @ r0) % p
                n1 = (e1 @ r1) % p
            state[i0] = n0.T.reshape(len(i0), d, DIM)
            state[i1] = n1.T.reshape(len(i1), d, DIM)
        # s = sum_j conj(U[perm(j), j])
        svec = np.zeros(DIM, dtype=np.int64)
        for j in range(d):
            svec = (svec + state[perm[j], j]) % p
        sconj = np.zeros(DIM, dtype=np.int64)
        sconj[conj_perm] = (conj_sign * svec) % p
        # s * conj(s) mod p via one exact ring mult in F_p
        prod = _ring_mul_mod(svec, sconj, p)
        want = (d * d) % p * pow(DEN % p, 2, p) % p
        ok = int(prod[0]) == want and not np.any(prod[1:])
        ok_all = ok_all and ok
        if verbose:
            print(f'  prime {pi + 1}/{len(primes)} p={p}: '
                  f'{"ok" if ok else "FAIL"}', flush=True)
        if not ok:
            break

    return {'label': f'{label} (closed form, modular-CRT hst certificate)',
            'cz_count': qc.gates_count(['cz']),
            'field': 'Q(zeta_64)[Z][G1][G2][G3] (dim 512)',
            'den_bits': DEN.bit_length(),
            'bound_bits': final_bound.bit_length(),
            'num_primes': len(primes),
            'proven': bool(ok_all)}


_TOWER_TAB = None


def _tower_tab():
    """e_t1 * e_t2 for the 16 tower bits, as (16, M) integer coordinate
    arrays (relations have integer coordinates)."""
    global _TOWER_TAB, _TBASIS
    if _TOWER_TAB is not None:
        return _TOWER_TAB
    if _TBASIS is None:
        _TBASIS = _tower_basis_elems()
    tab = {}
    for t1 in range(16):
        for t2 in range(t1, 16):
            prod = _flat(tf.mul(_TBASIS[t1], _TBASIS[t2])).reshape(16, M)
            arr = np.zeros((16, M), dtype=object)
            for t in range(16):
                for k in range(M):
                    c = prod[t, k]
                    if c:
                        assert c.denominator == 1
                        arr[t, k] = int(c)
            tab[(t1, t2)] = arr
    _TOWER_TAB = tab
    return tab


def _negacyclic_conv_mod(u, v, p):
    """Negacyclic convolution of two int64 length-M vectors mod p."""
    full = np.convolve(u.astype(object), v.astype(object))
    out = np.zeros(M, dtype=object)
    out[: len(full[:M])] = full[:M]
    out[: len(full) - M] -= full[M:]
    return (out % p).astype(np.int64)


def _ring_mul_mod(a, b, p):
    """One exact multiplication in the ring mod p (used once per prime on
    the final inner product). a, b are DIM int64 vectors."""
    tab = _tower_tab()
    a2 = a.reshape(16, M)
    b2 = b.reshape(16, M)
    out = np.zeros((16, M), dtype=np.int64)
    for t1 in range(16):
        if not np.any(a2[t1]):
            continue
        for t2 in range(16):
            if not np.any(b2[t2]):
                continue
            conv = _negacyclic_conv_mod(a2[t1], b2[t2], p)
            struct = tab[(t1, t2) if t1 <= t2 else (t2, t1)]
            for t in range(16):
                row = struct[t]
                if not np.any(row != 0):
                    continue
                rowi = np.array([int(x) % p for x in row], dtype=np.int64)
                out[t] = (out[t]
                          + _negacyclic_conv_mod(conv, rowi, p)) % p
    return out.reshape(DIM)


if __name__ == '__main__':
    print(json.dumps(prove()))
