"""Closed form of the 30-CZ connected toffoli-5 BY CONSTRUCTION.

benchmarks/composite.py assembles the 30-CZ connected toffoli-5 (the
best-known ancilla-free count; beats the paper's 36, CPFlow.tex sec
toff5) from two synthesized blocks: a 6-CZ relative-phase toffoli-4 W
and a 14-CZ C3-sqrt-X block. BOTH blocks now have machine-proven closed
forms (exact_relphase_proof.CLOSED_FORMS for W — rationals + the
Margolus magic angle; the exact artifact of c3sqrtx_connected — purely
pi-rational at denominator 16). Substituting the closed-form pieces into
the composite yields a fully closed-form 30-CZ toffoli-5.

Why substitution is sound even though the closed-form W sits at a
DIFFERENT point of the modulo-diagonal gauge family than the originally
stored W: any diagonal D on qubits 0-3 cancels out of the composite.
With W = D.T (T the exact toffoli-4 permutation), matrix order

    U = c3sx . W . CsqrtX(-pi/2; 3,4) . W^dag . CsqrtX(+pi/2; 3,4)

gives W CsqrtX W^dag = D T CsqrtX T^dag D^dag (D commutes with any gate
on (3,4): both are diagonal in bits 0-3... the controlled gate's control
projector is diagonal in bit 3 and it acts on bit 4 only), and
T CsqrtX(-) T^dag . CsqrtX(+) is BLOCK-diagonal over the computational
basis of bits 0-3 (T permutes basis states of 0-3, the CsqrtX factors
act on bit 4 under bit-3-diagonal controls), so D (T CsqrtX(-) T^dag
CsqrtX(+)) D^dag drops the D entirely. The c3sx block is proven equal to
C3-sqrt-X up to GLOBAL phase, which passes through the hst certificate.

This module builds the closed-form instruction stream (exact angle
specs: 'p/q' pi-rationals and the 'r(+|-)magic' family of
exact_relphase_proof.parse_spec, plus exact H and CP(+-pi/2) gates) and
verifies hst(U, toffoli5) = 0 in mpmath at high precision. The symbolic
ring certificate lives in composite_proof.py.

Usage: python -m benchmarks.composite_closed_form [dps]   (host CPU)
"""

import json
import os
from fractions import Fraction

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


def _neg_spec(spec):
    """Exact negation of a parse_spec string."""
    from benchmarks.exact_relphase_proof import parse_spec
    r, sg = parse_spec(spec)
    r = -r
    sg = -sg
    if sg == 0:
        return str(r)
    tail = '+magic' if sg > 0 else '-magic'
    if r == 0:
        return tail
    return f'{r}{tail}'


def w_closed_form_instructions(label='relphase_toff4_connected'):
    """A proven closed-form relative-phase toffoli-4 as
    [(name, qubits, spec)] on qubits 0-3 (spec None for cz)."""
    from benchmarks.exact_relphase_proof import (CLOSED_FORMS,
                                                 reduced_relphase_circuit)
    qc, _meta, _target = reduced_relphase_circuit(label)
    specs = CLOSED_FORMS[label]
    out, ai = [], 0
    for inst in qc.instructions:
        if inst.param is not None:
            out.append((inst.name, [inst.qubits[0]], specs[ai]))
            ai += 1
        else:
            out.append(('cz', list(inst.qubits), None))
    assert ai == len(specs)
    return out


def c3sqrtx_closed_form_instructions(label='c3sqrtx_connected'):
    """A proven pi-rational C3-sqrt-X block (exact artifact) as
    [(name, qubits, spec)] on qubits 0-3."""
    d = json.load(open(os.path.join(_ART, 'exact', f'{label}.json')))
    out = []
    for i in d['instructions']:
        if 'angle_pi_fraction' in i:
            p, qd = i['angle_pi_fraction']
            out.append((i['name'], list(i['qubits']), f'{Fraction(p, qd)}'))
        else:
            out.append(('cz', list(i['qubits']), None))
    return out


def _inverse(instrs):
    out = []
    for name, qubits, spec in reversed(instrs):
        if spec is None:
            out.append((name, qubits, None))
        else:
            out.append((name, qubits, _neg_spec(spec)))
    return out


def _map_qubits(instrs, mapping):
    return [(name, [mapping[qb] for qb in qubits], spec)
            for name, qubits, spec in instrs]


def composite_instructions():
    """The full closed-form 30-CZ connected toffoli-5 instruction stream
    on 5 qubits. Gate names: rz/rx (spec angle), cz, h, cp (spec angle).
    Circuit order (first instruction applied first), matching
    composite.build_toffoli5_connected (benchmarks/composite.py:61-78)."""
    w = w_closed_form_instructions()
    c3 = _map_qubits(c3sqrtx_closed_form_instructions(), {0: 0, 1: 1,
                                                          2: 2, 3: 4})
    instrs = []
    instrs += [('h', [4], None), ('cp', [3, 4], '1/2'), ('h', [4], None)]
    instrs += _inverse(w)
    instrs += [('h', [4], None), ('cp', [3, 4], '-1/2'), ('h', [4], None)]
    instrs += w
    instrs += c3
    return instrs


def _cx(c, t):
    """Exact cx expansion in the prover's gate set: cx = H_t CZ H_t."""
    return [('h', [t], None), ('cz', [c, t], None), ('h', [t], None)]


def composite_instructions_chain():
    """The closed-form 48-CZ CHAIN toffoli-5 (the paper's sec-toff5 chain
    count) from the proven chain pieces: the 11-CZ relphase toffoli-4
    chain closed form and the pi-rational 18-CZ c3sqrtx chain block, with
    the CX routing of composite.build_toffoli5_chain
    (benchmarks/composite.py:41-59) expanded exactly to H CZ H."""
    w = w_closed_form_instructions('relphase_toff4_chain')
    c3 = c3sqrtx_closed_form_instructions('c3sqrtx_chain')
    instrs = []
    instrs += [('h', [4], None), ('cp', [3, 4], '1/2'), ('h', [4], None)]
    instrs += _inverse(w)
    instrs += [('h', [4], None), ('cp', [3, 4], '-1/2'), ('h', [4], None)]
    instrs += w
    instrs += _cx(4, 3) + _cx(3, 4)
    instrs += c3
    instrs += _cx(3, 4) + _cx(4, 3)
    return instrs


def cz_cost(instrs):
    """CZ-equivalent cost: cz = 1, cp(+-pi/2) = 2 (reference cz_value
    convention, cpflow/cp_utils.py:45-56)."""
    c = 0
    for name, _qubits, _spec in instrs:
        if name == 'cz':
            c += 1
        elif name == 'cp':
            c += 2
    return c


def mp_unitary(instrs, dps=60):
    """Evaluate the instruction stream exactly-in-spirit with mpmath:
    every angle is spec-exact (r*pi + sign*arctan(sqrt 2))."""
    from mpmath import mp, mpc, sqrt, atan, cos, sin, pi

    from benchmarks.exact_relphase_proof import parse_spec
    mp.dps = dps
    magic = atan(sqrt(2))
    n = 5
    d = 2 ** n
    U = [[mpc(1) if i == j else mpc(0) for j in range(d)] for i in range(d)]

    def angle_of(spec):
        r, sg = parse_spec(spec)
        return (mp.mpf(r.numerator) / r.denominator) * pi + sg * magic

    for name, qubits, spec in instrs:
        if name in ('rx', 'rz'):
            a = angle_of(spec) / 2
            c, s = cos(a), sin(a)
            if name == 'rx':
                g = [[c, -1j * s], [-1j * s, c]]
            else:
                g = [[c - 1j * s, mpc(0)], [mpc(0), c + 1j * s]]
            b = 1 << (n - 1 - qubits[0])
            for i0 in range(d):
                if i0 & b:
                    continue
                i1 = i0 | b
                r0 = U[i0]
                r1 = U[i1]
                U[i0] = [g[0][0] * r0[j] + g[0][1] * r1[j]
                         for j in range(d)]
                U[i1] = [g[1][0] * r0[j] + g[1][1] * r1[j]
                         for j in range(d)]
        elif name == 'h':
            rt = 1 / sqrt(2)
            b = 1 << (n - 1 - qubits[0])
            for i0 in range(d):
                if i0 & b:
                    continue
                i1 = i0 | b
                r0 = U[i0]
                r1 = U[i1]
                U[i0] = [rt * (r0[j] + r1[j]) for j in range(d)]
                U[i1] = [rt * (r0[j] - r1[j]) for j in range(d)]
        elif name == 'cz':
            b = ((1 << (n - 1 - qubits[0])) | (1 << (n - 1 - qubits[1])))
            for i in range(d):
                if (i & b) == b:
                    U[i] = [-x for x in U[i]]
        elif name == 'cp':
            r, sg = parse_spec(spec)
            assert sg == 0
            ph = mp.e ** (1j * (mp.mpf(r.numerator) / r.denominator) * pi)
            b = ((1 << (n - 1 - qubits[0])) | (1 << (n - 1 - qubits[1])))
            for i in range(d):
                if (i & b) == b:
                    U[i] = [ph * x for x in U[i]]
        else:
            raise AssertionError(name)
    return U


def hst_vs_toffoli5(U):
    """1 - |<U, T>|^2 / d^2 with T the toffoli-5 permutation (big-endian:
    qubit 0 = MSB, target qubit 4 = LSB)."""
    d = 32
    s = 0
    for i in range(d):
        t = i ^ 1 if (i & 0b11110) == 0b11110 else i
        # <U, T> = tr(T^dag U) = sum_i U[t(i)][i]... T|i> = |t(i)> so
        # T_{t(i), i} = 1 and tr(T^H U) = sum_i conj(T_{ji}) U_{ji}
        s += U[t][i]
    return 1 - (abs(s) / d) ** 2, s


BUILDERS = {
    'toffoli5_connected_composite': composite_instructions,
    'toffoli5_chain_composite': composite_instructions_chain,
}


def main():
    import sys
    dps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    for name, builder in BUILDERS.items():
        instrs = builder()
        nrot = sum(1 for nm, _q, sp in instrs
                   if sp is not None and nm != 'cp')
        print(f'{name}: {len(instrs)} instructions, {nrot} closed-form '
              f'rotations, cz cost = {cz_cost(instrs)}')
        U = mp_unitary(instrs, dps=dps)
        loss, s = hst_vs_toffoli5(U)
        print(f'  hst loss vs toffoli-5 at {dps} digits: {loss}')
        print(f'  <U,T>/d (global phase): {s / 32}')


if __name__ == '__main__':
    main()
