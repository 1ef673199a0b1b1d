"""Symbolic proof of the 6-CZ relative-phase toffoli-4 closed form over a
quadratic extension of a cyclotomic ring.

RESULTS_r3 §17 identifies the closed form of the 6-CZ relphase toffoli-4
(the connected-topology structure behind benchmarks/artifacts/
relphase_toff4_connected.json): every angle is a rational multiple of pi
(denominators 1..4) or lies in the arctan(sqrt 2) family — the Margolus
magic angle, whose cos/sin live OUTSIDE every cyclotomic ring. The proof
therefore runs over

    R = B[Y] / (Y^2 - w),   B = Z[x]/(x^24 + 1)  (x -> zeta_48),
    w = 6*(3 + sqrt 3),     Y -> 6*cos(arctan(sqrt 2)/2) > 0,

with elements (u + v*Y)/den, u,v integer coefficient vectors, den a
positive int — exact arbitrary-precision arithmetic end to end, no
floats. cos(am/2) = Y/6 and sin(am/2) = sqrt6*Y*(3-sqrt3)/36 close the
gate algebra. Z[x]/(x^24+1) is Z[zeta_48] x Z[zeta_16] (not a domain), so
final equality checks project onto the true component by reducing modulo
Phi_48(x) = x^16 - x^8 + 1 — a ring hom, keeping the certificate sound.

Certificate: U x toffoli4 is EXACTLY diagonal with exactly unit-modulus
entries, i.e. the circuit implements toffoli-4 up to relative phases —
the modulo-diagonal equivalence the artifact claims, now machine-proven
(paper context: exactness verification was external Mathematica,
CPFlow.tex:430).

Usage: python -m benchmarks.exact_relphase_proof
Tested by tests/test_closed_forms.py.
"""

import json
import math
import os

import numpy as np

M = 24  # ring degree: x^M = -1, x -> zeta_48


def _zero():
    return [0] * M


def _unit():
    return [1] + [0] * (M - 1)


def _zpow(k):
    k %= 2 * M
    s = 1
    if k >= M:
        k -= M
        s = -1
    v = _zero()
    v[k] = s
    return v


def _vadd(a, b):
    return [x + y for x, y in zip(a, b)]


def _vsub(a, b):
    return [x - y for x, y in zip(a, b)]


def _vneg(a):
    return [-x for x in a]


def _vscale(a, c):
    return [c * x for x in a]


def _vmul(a, b):
    out = _zero()
    for i, ai in enumerate(a):
        if not ai:
            continue
        for j, bj in enumerate(b):
            if not bj:
                continue
            k = i + j
            if k >= M:
                out[k - M] -= ai * bj
            else:
                out[k] += ai * bj
    return out


def _vconj(a):
    out = _zero()
    out[0] = a[0]
    for k in range(1, M):
        out[M - k] = -a[k]
    return out


SQRT3 = _vadd(_zpow(4), _zpow(-4))      # 2 cos(pi/6)
SQRT2 = _vadd(_zpow(6), _zpow(-6))      # 2 cos(pi/4)
W = _vadd(_vscale(_unit(), 18), _vscale(SQRT3, 6))   # Y^2 = 18 + 6 sqrt3


def q(u=None, v=None, den=1):
    return (u or _zero(), v or _zero(), den)


def qadd(a, b):
    ua, va, da = a
    ub, vb, db = b
    g = math.gcd(da, db)
    l = da // g * db
    fa, fb = l // da, l // db
    return (_vadd(_vscale(ua, fa), _vscale(ub, fb)),
            _vadd(_vscale(va, fa), _vscale(vb, fb)), l)


def qmul(a, b):
    ua, va, da = a
    ub, vb, db = b
    u = _vadd(_vmul(ua, ub), _vmul(_vmul(va, vb), W))
    v = _vadd(_vmul(ua, vb), _vmul(va, ub))
    return (u, v, da * db)


def qconj(a):
    return (_vconj(a[0]), _vconj(a[1]), a[2])   # Y is real


def qneg(a):
    return (_vneg(a[0]), _vneg(a[1]), a[2])


def qreduce(a):
    u, v, d = a
    g = d
    for c in u:
        g = math.gcd(g, c)
    for c in v:
        g = math.gcd(g, c)
    if g > 1:
        u = [c // g for c in u]
        v = [c // g for c in v]
        d //= g
    return (u, v, d)


def phi48_reduce(a):
    """Project onto Z[zeta_48] = Z[x]/(x^16 - x^8 + 1): x^16 = x^8 - 1."""
    r = list(a)
    for k in range(M - 1, 15, -1):
        c = r[k]
        if c:
            r[k] = 0
            r[k - 8] += c
            r[k - 16] -= c
    return r[:16]


def qis_zero_true(a):
    u, v, _ = a
    return (all(x == 0 for x in phi48_reduce(u))
            and all(x == 0 for x in phi48_reduce(v)))


def qis_const_true(a, c):
    u, v, d = qreduce(a)
    u = _vsub(u, _vscale(_unit(), c * d))
    return (all(x == 0 for x in phi48_reduce(u))
            and all(x == 0 for x in phi48_reduce(v)))


# exact cos/sin of the magic half-angle: c = Y/6, s = sqrt6*Y*(3-sqrt3)/36
C_MAGIC = q(v=_unit(), den=6)
S_MAGIC = q(v=_vmul(_vmul(SQRT2, SQRT3),
                    _vsub(_vscale(_unit(), 3), SQRT3)), den=36)

# the closed forms (RESULTS_r3 §17), in rotation order of each label's
# greedy-reduced circuit; every half-angle lands in R (pi-rational parts
# have 12*r integral, i.e. r*pi/2 on the zeta_48 grid)
CLOSED_FORMS = {
    'relphase_toff4_connected':
        ['1', '3/4', '-magic', '1/3', '1-magic', '3/4', '1/4', '1',
         '-magic', '1/3', '1/2-magic', '1/2', '-3/4', '1/2'],
    # the paper's own 11-CZ chain row (CPFlow.tex tab toff4), identified by
    # benchmarks/closed_form_search.py: dyadics/thirds + the magic family
    'relphase_toff4_chain':
        ['1/2', '1-magic', '1/2', '1', '1/2', '1', '-1/6', '1/2', '1/2',
         '-2/3', '1/2', '-1/6', '+magic', '-3/4', '1/4', '-1/2', '3/4',
         '1', '1/2', '1/2', '1', '1/2', '-1/2', '1/2', '1/4', '1/2', '1',
         '1/2', '-1/2', '1/2', '-3/4', '1/2'],
}
CLOSED_FORM = CLOSED_FORMS['relphase_toff4_connected']  # back-compat

# ibm_qx rows whose reduced decomposition is fully identified (hst loss:
# equality with the qasm circuit up to GLOBAL phase, not just relative
# phases). alu-v3_34's published-optimal 14-CX row carries the magic pair
# as pi - arctan(sqrt2) twice plus exact thirds (RESULTS_r3 §17) —
# identified in one Gauss-Newton round by closed_form_search (all 56
# angles rigid, no gauge family at all).
CLOSED_FORMS_HST = {
    'qx_alu-v3_34': (
        'alu-v3_34',
        ['1', '1/2', '1/2', '1', '1/4', '1/4', '1-magic', '1/2', '-1/2',
         '1/3', '1/2', '1/2', '1/2', '1/2', '1/2', '1/2', '-2/3',
         '1-magic', '1', '3/4', '1/2', '1', '1/4', '-3/4', '1/2', '-3/4',
         '1/2', '1/2', '1/2', '1/4', '1/2', '-3/4', '1/2', '1/2', '3/4',
         '-1/4', '1/2', '1', '-1/2', '1/2', '1/2', '3/4', '1/2', '1',
         '1/2', '1', '1/2', '-1/4', '-1/2', '3/4', '1/2', '1/2', '1/2',
         '1', '-1/2', '1/2']),
    # alu-v0_26's 25-CX CHAIN row (3 below published): identified by
    # the round-3 closed_form_sweep — rationals (denominators <= 4 plus
    # thirds) and the magic family again (mp loss 2.2e-32 at 50 digits)
    'qx_alu-v0_26_chain': (
        'alu-v0_26',
        ['1/2', '-1/2', '1/2', '1', '3/4', '1', '-1/2', '1/2', '1/4',
         '1/2', '3/4', '1/2', '1/2', '1', '1/2', '1', '1/2-magic',
         '1/2', '1/2', '2/3', '1/2', '1', '2/3', '-1/2', '1/2', '1',
         '1-magic', '1', 'magic', '1', '1', '1/3', '1', '1/2', '1',
         '1', '1/2', '1', '2/3', '1/2', '1/2', '1', '-1/2', '1/2',
         '-1/2+magic', '1/2', '-1/2', '1/2', '-1/2', '1/4', '1/2',
         '1/2', '1', '-1/4', '1/2', '1/2', '1/2', '-1/2', '1/2',
         '1/4', '1/2', '1/2', '1/2', '1/2', '1/2', '-1/2', '1/2', '1',
         '1/2', '-1/2', '3/4', '1/4', '1/2', '-1/2', '-1/2', '1/2',
         '1/2', '-1/2', '1/2', '-1/2', '-1/2', '1/2', '-1/4', '1']),
}


def parse_spec(spec):
    """'r', 'r+magic', 'r-magic', '(+|-)magic' -> (Fraction r, sign)."""
    from fractions import Fraction
    s = spec.strip()
    if s in ('magic', '+magic'):
        return Fraction(0), 1
    if s == '-magic':
        return Fraction(0), -1
    for tag, sg in (('+magic', 1), ('-magic', -1)):
        if s.endswith(tag):
            return Fraction(s[:-len(tag)]), sg
    return Fraction(s), 0


def closed_form_value(spec):
    r, sg = parse_spec(spec)
    return math.pi * float(r) + sg * math.atan(math.sqrt(2))


def half_trig(spec):
    """Exact (cos(a/2), sin(a/2)) in R for a = r*pi + sign*magic: the
    rational part sits on the zeta_48 grid (r*pi/2 = k*pi/24) and the
    magic part enters through the angle-addition formulas with
    (C_MAGIC, S_MAGIC)."""
    r, sg = parse_spec(spec)
    k2 = 12 * r.numerator
    assert k2 % r.denominator == 0, spec
    k = k2 // r.denominator      # r*pi/2 = k*pi/24, e^{i r pi/2} = zeta^k
    cr = q(u=_vadd(_zpow(k), _zpow(-k)), den=2)
    # sin t = (zeta^k - zeta^-k)/(2i), 1/i = zeta^{-12}
    sr = q(u=_vmul(_vsub(_zpow(k), _zpow(-k)), _zpow(-12)), den=2)
    if sg == 0:
        return cr, sr
    sm = S_MAGIC if sg > 0 else qneg(S_MAGIC)
    cosv = qadd(qmul(cr, C_MAGIC), qneg(qmul(sr, sm)))
    sinv = qadd(qmul(sr, C_MAGIC), qmul(cr, sm))
    return qreduce(cosv), qreduce(sinv)


def reduced_relphase_circuit(label='relphase_toff4_connected'):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from benchmarks.rational_survey import artifact_circuit, artifact_loss
    from cpflow_tpu.circuits.refine import reduce_angles
    from cpflow_tpu.circuits.passes import remove_zero_rgates

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'artifacts')
    meta = json.load(open(os.path.join(art, f'{label}.json')))
    target = np.load(os.path.join(art, 'targets.npz')
                     )[label].astype(np.complex128)
    qc = artifact_circuit(meta)
    loss = artifact_loss(meta, target)
    return remove_zero_rgates(reduce_angles(qc, loss)), meta, target


def build_closed_form_unitary(qc, closed_form):
    """The circuit's unitary, exactly, as a dim x dim array of R elements."""
    rot = [i for i in qc.instructions if i.param is not None]
    assert len(rot) == len(closed_form)
    n = qc.num_qubits
    d = 2 ** n
    U = [[q(u=_unit()) if i == j else q() for j in range(d)]
         for i in range(d)]
    mi = q(u=_vscale(_zpow(12), -1))     # -i
    ai = 0
    for inst in qc.instructions:
        if inst.param is not None:
            cq, sq = half_trig(closed_form[ai])
            ai += 1
            mis = qmul(mi, sq)
            if inst.name == 'rx':
                g = [[cq, mis], [mis, cq]]
            elif inst.name == 'rz':
                g = [[qadd(cq, mis), q()], [q(), qadd(cq, qneg(mis))]]
            else:
                raise AssertionError(inst.name)
            b = 1 << (n - 1 - inst.qubits[0])
            for i0 in range(d):
                if i0 & b:
                    continue
                i1 = i0 | b
                r0, r1 = U[i0], U[i1]
                U[i0] = [qreduce(qadd(qmul(g[0][0], r0[j]),
                                      qmul(g[0][1], r1[j])))
                         for j in range(d)]
                U[i1] = [qreduce(qadd(qmul(g[1][0], r0[j]),
                                      qmul(g[1][1], r1[j])))
                         for j in range(d)]
        else:
            assert inst.name == 'cz'
            b0 = 1 << (n - 1 - inst.qubits[0])
            b1 = 1 << (n - 1 - inst.qubits[1])
            for i0 in range(d):
                if (i0 & b0) and (i0 & b1):
                    U[i0] = [qneg(x) for x in U[i0]]
    return U


def prove(label='relphase_toff4_connected'):
    """Build the closed-form unitary exactly in R and certify U x target
    (a multi-controlled-X permutation) is diagonal with unit-modulus
    entries. Returns a result dict."""
    closed_form = CLOSED_FORMS[label]
    qc, meta, target = reduced_relphase_circuit(label)
    n = qc.num_qubits
    d = 2 ** n
    U = build_closed_form_unitary(qc, closed_form)

    # certificate: (U*T)[i,j] = U[i, perm(j)], T = toffoli-4 permutation
    perm = list(range(d))
    perm[d - 2], perm[d - 1] = perm[d - 1], perm[d - 2]
    proven = True
    for i in range(d):
        for j in range(d):
            v = U[i][perm[j]]
            if i == j:
                if not qis_const_true(qreduce(qmul(v, qconj(v))), 1):
                    proven = False
            elif not qis_zero_true(v):
                proven = False

    return {'label': f'{label} (closed form)',
            'cz_count': qc.gates_count(['cz']),
            'ring': 'Z[zeta_48][Y]/(Y^2 - 6(3+sqrt3))',
            'closed_form': closed_form,
            'proven': bool(proven)}


def prove_hst(label):
    """Certify that `label`'s closed-form decomposition equals its qasm
    circuit up to a GLOBAL phase, exactly: with s = <U, T> the ring
    identity s * conj(s) == d^2 * den(s)^2 (Cauchy-Schwarz tightness for
    unitaries). The target is evaluated exactly from the reference qasm
    over Z[zeta_48] (circuits/exact_unitary.py); the closed-form circuit
    lives in the quadratic extension R. Returns a result dict."""
    import glob
    from cpflow_tpu.circuits import exact_unitary as ex
    from cpflow_tpu.circuits.ir import Circuit as IRCircuit

    qasm_name, closed_form = CLOSED_FORMS_HST[label]
    qc, meta, target = reduced_relphase_circuit(label)
    assert meta['loss_kind'] == 'hst', meta['loss_kind']
    d = 2 ** qc.num_qubits
    U = build_closed_form_unitary(qc, closed_form)

    path = glob.glob('/root/reference/paper/benchmark_circuits/'
                     f'*/{qasm_name}.qasm')[0]
    t = ex.exact_unitary(IRCircuit.from_qasm_file(path), M // 2)
    assert t.m == M and t.dim == d

    # float sanity only (not part of the certificate): the qasm target is
    # the same matrix the artifact was synthesized against
    import numpy as np
    assert np.max(np.abs(t.to_complex() - target)) < 1e-9

    s = q()
    den = 2 ** t.e
    for i in range(d):
        ui, ti = U[i], t.entries[i]
        for j in range(d):
            if any(ti[j]):
                s = qreduce(qadd(s, qmul(qconj(ui[j]),
                                         q(u=list(ti[j]), den=den))))
    proven = qis_const_true(qmul(s, qconj(s)), d * d)
    return {'label': f'{label} (closed form, hst)',
            'cx_count': qc.gates_count(['cz']),
            'ring': 'Z[zeta_48][Y]/(Y^2 - 6(3+sqrt3))',
            'closed_form': closed_form,
            'proven': bool(proven)}


if __name__ == '__main__':
    for lbl in CLOSED_FORMS:
        print(json.dumps(prove(lbl)), flush=True)
    for lbl in CLOSED_FORMS_HST:
        print(json.dumps(prove_hst(lbl)), flush=True)
