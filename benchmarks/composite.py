"""Composite 5q Toffoli on the chain topology (reference paper sec toff5 /
app 5q): assemble the 48-CZ construction from the library's own
synthesized blocks.

The paper's identity (verified here numerically, tolerant of arbitrary
relative phases diagonal on qubits 0-3):

    C4X(0123->4) = [cx(3,4) cx(4,3)] C3sqrtX(012->3) [cx(4,3) cx(3,4)]
                   . W . CsqrtX_dag(3,4) . W_dag . CsqrtX(3,4)

(matrix order; W = any relative-phase toffoli-4 on 0123) with
CsqrtX(3,4) = H_4 CP(pi/2)(3,4) H_4 exactly. CZ cost:
2 x 11 (relative-phase toffoli-4, our verified block)
+ 18 (C3-sqrt-X on the 4q chain, our verified block)
+ 2 x 2 (the two CP(+-pi/2)) + 4 (CX) = 48 — the paper's count, which
beats its own direct chain synthesis (69 CZ) and qiskit transpile (61).

Usage: python -m benchmarks.composite
(requires benchmarks/results/{relphase_toff4_chain,c3sqrtx_chain} from
`python -m benchmarks.configs relphase_toff4_chain c3sqrtx_chain`).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

_RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results')


def _best_circuit(label, *fallback_labels):
    """Best stored block circuit: the Results pickle when present, else
    rebuilt from the committed artifact JSON (the pickles are gitignored
    and do not survive VM resets; the artifacts are the durable record).
    When several hunt labels target the same block (e.g. the xyz and xz
    relphase-toffoli-6 hunts), the cheapest available one wins."""
    candidates = []
    for lab in (label, *fallback_labels):
        path = os.path.join(_RESULTS, lab)
        if os.path.exists(path):
            from cpflow_tpu.api import Results
            res = Results.load(path)
            best = min(res.decompositions,
                       key=lambda d: (d.cz_count, d.loss), default=None)
            if best is not None:
                candidates.append((best.cz_count, best.circuit))
                continue
        art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'artifacts', f'{lab}.json')
        if os.path.exists(art):
            from cpflow_tpu.circuits.ir import Circuit
            meta = json.load(open(art))
            qc = Circuit(meta['num_qubits'])
            for r in meta['instructions']:
                qc.append(r['name'], tuple(r['qubits']), r.get('param'))
            candidates.append((meta['cz_count'], qc))
    if not candidates:
        raise FileNotFoundError(f'no results/artifact for {label} '
                                f'(or fallbacks {list(fallback_labels)})')
    cz, qc = min(candidates, key=lambda t: t[0])
    return qc, cz


def build_toffoli5_chain():
    """IR circuit for the 5q Toffoli on the chain, from synthesized blocks.
    Returns (circuit, metadata)."""
    from cpflow_tpu.circuits.ir import Circuit

    w, w_cz = _best_circuit('relphase_toff4_chain')
    c3sx, c3sx_cz = _best_circuit('c3sqrtx_chain')

    qc = Circuit(5)
    # CsqrtX(3,4) = H_4 CP(pi/2) H_4 (exact)
    qc.h(4); qc.cp(math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3])
    qc.h(4); qc.cp(-math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w, qubits=[0, 1, 2, 3])
    qc.cx(4, 3); qc.cx(3, 4)
    qc.compose(c3sx, qubits=[0, 1, 2, 3])
    qc.cx(3, 4); qc.cx(4, 3)
    return qc, {'w_cz': w_cz, 'c3sx_cz': c3sx_cz}


def build_toffoli5_connected():
    """30-CZ connected toffoli-5 (the best known ancilla-free count,
    CPFlow.tex sec toff5): 2 x 6 (rel-phase toffoli-4) + 14 (C3-sqrt-X)
    + 2 x 2 (CP(+-pi/2)); full connectivity needs no CX routing —
    C3-sqrt-X goes directly on qubits (0,1,2,4)."""
    from cpflow_tpu.circuits.ir import Circuit

    w, w_cz = _best_circuit('relphase_toff4_connected')
    c3sx, c3sx_cz = _best_circuit('c3sqrtx_connected')

    qc = Circuit(5)
    qc.h(4); qc.cp(math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3])
    qc.h(4); qc.cp(-math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w, qubits=[0, 1, 2, 3])
    qc.compose(c3sx, qubits=[0, 1, 2, 4])
    return qc, {'w_cz': w_cz, 'c3sx_cz': c3sx_cz}


def build_toffoli6_connected():
    """Connected toffoli-6 — BEYOND the reference paper (which stops at
    toffoli-5): the same recursion one level up,
    C5X(01234->5) = CsqrtX(4,5) . W5^dag . CsqrtX^dag(4,5) . W5
                    . C4sqrtX(0123->5)
    (any relative-phase toffoli-5 W5 works; identity verified exactly in
    tests/test_compat_shim.py). Full connectivity needs no routing."""
    from cpflow_tpu.circuits.ir import Circuit

    w, w_cz = _best_circuit('relphase_toff5_connected',
                              'relphase_toff5_xz')
    c4sx, c4sx_cz = _best_circuit('c4sqrtx_connected')

    qc = Circuit(6)
    qc.h(5); qc.cp(math.pi / 2, 4, 5); qc.h(5)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(-math.pi / 2, 4, 5); qc.h(5)
    qc.compose(w, qubits=[0, 1, 2, 3, 4])
    qc.compose(c4sx, qubits=[0, 1, 2, 3, 5])
    return qc, {'w5_cz': w_cz, 'c4sx_cz': c4sx_cz}


def build_c5sqrtx_connected():
    """C5-sqrt-X on full 6q connectivity — the inner block of toffoli-7,
    itself assembled by the SAME V-recursion one level down with
    V = X^(1/4):

    C5(X^1/2)(01234->t) = CX^1/4(4,t) . W5^dag . CX^1/4dag(4,t) . W5
                          . C4(X^1/4)(0123->t)

    (any relative-phase toffoli-5 W5 works; identity verified exactly in
    tests/test_compat_shim.py). CX^1/4(c,t) = H_t CP(pi/4)(c,t) H_t."""
    from cpflow_tpu.circuits.ir import Circuit

    w5, w5_cz = _best_circuit('relphase_toff5_connected',
                              'relphase_toff5_xz')
    c4r, c4r_cz = _best_circuit('c4xroot4_connected')

    qc = Circuit(6)
    qc.h(5); qc.cp(math.pi / 4, 4, 5); qc.h(5)
    qc.compose(w5.inverse(), qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(-math.pi / 4, 4, 5); qc.h(5)
    qc.compose(w5, qubits=[0, 1, 2, 3, 4])
    qc.compose(c4r, qubits=[0, 1, 2, 3, 5])
    return qc, {'w5_cz': w5_cz, 'c4xroot4_cz': c4r_cz}


def build_relphase_toff6_composite():
    """COMPOSITE relative-phase toffoli-6 from 5q blocks only:

    W6 = CsqrtX(4,5) . W5^dag . CsqrtX^dag(4,5) . W5 . RC4sqrtX(0123->5)

    equals C5X times a diagonal for ANY diagonal gauges on W5 (relphase
    toffoli-5) and RC4sqrtX (relphase C4-sqrt-X) — verified exactly with
    random gauges in tests/test_composite_w6.py. A diagonal-gauge block
    in the RIGHTMOST position rides through the product, so the inner
    block needs only the modulo-diagonal hunt (5q, reliable), not the
    36-CZ exact C4-sqrt-X. Returns (circuit, metadata)."""
    from cpflow_tpu.circuits.ir import Circuit

    w5, w5_cz = _best_circuit('relphase_toff5_connected',
                              'relphase_toff5_xz')
    rc4, rc4_cz = _best_circuit('relphase_c4sqrtx_connected')

    # Two r4 export bugs fixed here (the loss-4.078 artifact, VERDICT r4
    # weak-2), both invisible for exact/Hermitian blocks:
    #  * the modulo-diagonal hunt certifies u = D @ target^dag (losses.py
    #    disc_modulo_diagonal); C4-sqrt-X is NON-Hermitian, so the stored
    #    circuit is the inverse block — rc4.inverse() = C4sqrtX @ D^dag is
    #    the right-diagonal form the W6 identity needs;
    #  * Circuit.unitary() applies first-appended-FIRST, so the docstring's
    #    matrix product must be appended right-to-left: RC4sqrtX first.
    #    The exact-block composites hold in either order (their blocks are
    #    gauge-free); the gauged RC4 must sit in the applied-first slot.
    qc = Circuit(6)
    qc.compose(rc4.inverse(), qubits=[0, 1, 2, 3, 5])
    qc.compose(w5, qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(-math.pi / 2, 4, 5); qc.h(5)
    qc.compose(w5.inverse(), qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(math.pi / 2, 4, 5); qc.h(5)
    return qc, {'w5_cz': w5_cz, 'rc4sqrtx_cz': rc4_cz}


def build_toffoli7_connected():
    """Connected toffoli-7 — TWO recursion levels beyond the reference
    paper (which stops at toffoli-5):

    C6X(012345->6) = CsqrtX(5,6) . W6^dag . CsqrtX^dag(5,6) . W6
                     . C5sqrtX(01234->6)

    with W6 any relative-phase toffoli-6 (a directly-synthesized one when
    a hunt lands; else the composite W6 from 5q blocks above) and
    C5sqrtX the composite above on qubits (0,1,2,3,4,6). Both identity
    levels verified exactly in tests/test_compat_shim.py; W6's internal
    phases cancel (W6^dag ... W6) so only the rightmost C5sqrtX chain
    must be phase-exact."""
    from cpflow_tpu.circuits.ir import Circuit

    options = []
    try:
        options.append(_best_circuit('relphase_toff6_connected',
                                     'relphase_toff6_xz')[::-1])
    except FileNotFoundError:
        pass
    try:
        w6c, meta6 = build_relphase_toff6_composite()
        options.append((4 + 2 * meta6['w5_cz'] + meta6['rc4sqrtx_cz'], w6c))
    except FileNotFoundError:
        pass
    if not options:
        raise FileNotFoundError('no W6: neither a direct relphase-toff6 '
                                'row nor the 5q blocks of the composite')
    w6_cz, w6 = min(options, key=lambda t: t[0])
    c5sx, meta5 = build_c5sqrtx_connected()

    qc = Circuit(7)
    qc.h(6); qc.cp(math.pi / 2, 5, 6); qc.h(6)
    qc.compose(w6.inverse(), qubits=[0, 1, 2, 3, 4, 5])
    qc.h(6); qc.cp(-math.pi / 2, 5, 6); qc.h(6)
    qc.compose(w6, qubits=[0, 1, 2, 3, 4, 5])
    qc.compose(c5sx, qubits=[0, 1, 2, 3, 4, 6])
    return qc, {'w6_cz': w6_cz, **meta5}


def cz_count_exact(qc):
    """CZ count after compiling residual CP and CX gates exactly to
    CZ + 1q (cp -> 2 CZ via the exact realization pass; cx -> H CZ H)."""
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import cp_to_cz_circuit

    flat = Circuit(qc.num_qubits)
    for inst in qc.instructions:
        if inst.name == 'cx':
            c, t = inst.qubits
            flat.h(t); flat.cz(c, t); flat.h(t)
        else:
            flat.append(inst.name, inst.qubits, inst.param, inst.matrix)
    flat = cp_to_cz_circuit(flat, cp_threshold=1e-9)
    return flat.gates_count(['cz']), flat


def _report(builder, name, reference_cz, extra, target=None,
            loss_kind='hst'):
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.circuits.refine import polish_angles
    from cpflow_tpu.circuits.ir import ROTATION_NAMES
    from cpflow_tpu.ops.gates import u_toff5

    qc, meta = builder()
    tgt = (u_toff5 if target is None else target).astype(np.complex128)
    if loss_kind == 'modulo_diagonal':
        from cpflow_tpu.ops import losses

        def hst_distance(u, t):  # noqa: F811 — same (u, target) shape
            return float(losses.disc_modulo_diagonal(
                t, u, qc.num_qubits, list(range(qc.num_qubits)), xp=np))
    loss = hst_distance(qc.unitary(), tgt)

    # the blocks were verified independently to ~1e-6/1e-7 each; polishing
    # the composite's rotation angles against the toffoli-5 target removes
    # the accumulated drift (exact 3-point line search per angle, on host)
    angles = [float(i.param) for i in qc.instructions
              if i.name in ROTATION_NAMES]

    def loss_of_angles(a):
        it = iter(a)
        probe = qc.copy()
        for inst in probe.instructions:
            if inst.name in ROTATION_NAMES:
                inst.param = float(next(it))
        return hst_distance(probe.unitary(), tgt)

    # f64 Adam through the jax tracer first (reaches e-10..e-12 where
    # coordinate sweeps alone stall — benchmarks/polish_results.py), then
    # exact per-angle sweeps until the artifact bar (1e-9) or a sweep cap.
    polished = np.array(angles, dtype=float)
    try:
        from cpflow_tpu.api import LossSpec
        from benchmarks.polish_results import _adam_polish
        spec = (LossSpec('modulo_diagonal', target=tgt,
                         num_qubits=qc.num_qubits,
                         wires=list(range(qc.num_qubits)))
                if loss_kind == 'modulo_diagonal' else
                LossSpec('hst', target=tgt))
        adamed, adam_loss = _adam_polish(qc, spec, adam_iters=3000)
        if adam_loss < loss_of_angles(polished):
            polished = adamed
    except Exception as e:  # noqa: BLE001 — Adam is an accelerator only
        print(json.dumps({'config': name,
                          'adam_polish_skipped': f'{type(e).__name__}: {e}'}),
              flush=True)
    for _ in range(6):
        if loss_of_angles(polished) < 1e-9:
            break
        polished = polish_angles(loss_of_angles, polished, sweeps=1)
    it = iter(polished)
    for inst in qc.instructions:
        if inst.name in ROTATION_NAMES:
            inst.param = float(next(it))
    polished_loss = hst_distance(qc.unitary(), tgt)

    n_cz, flat = cz_count_exact(qc)
    row = {'config': name, 'cz_count': int(n_cz),
           'reference_cz': reference_cz,
           'loss_vs_toffoli5': float(loss),
           'polished_loss': float(polished_loss),
           'block_cz': meta, **extra}
    print(json.dumps(row))
    # non-JSON payload for export_composites: the POLISHED circuit and its
    # verification context (the r4 exporter rebuilt UNPOLISHED circuits)
    row['_qc'] = qc
    row['_target'] = tgt
    row['_kind'] = loss_kind
    return row


def main():
    rows = []
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x)
    for builder, name, target, extra, tgt_u, kind in (
        (build_toffoli5_chain, 'toffoli5_chain_composite', 48,
         {'qiskit_reference': 61, 'direct_synthesis_reference': 69}, None,
         'hst'),
        (build_toffoli5_connected, 'toffoli5_connected_composite', 30,
         {'note': 'best known ancilla-free count; the reference DESCRIBES '
                  'this construction but reports 36 from direct synthesis'},
         None, 'hst'),
        (build_toffoli6_connected, 'toffoli6_connected_composite', None,
         {'note': 'beyond the reference paper (which stops at toffoli-5)'},
         multi_controlled_x(6), 'hst'),
        (build_relphase_toff6_composite, 'relphase_toff6_composite', None,
         {'note': 'relative-phase toffoli-6 (C5X modulo diagonal) from 5q '
                  'blocks only via the composite-W6 identity '
                  '(tests/test_composite_w6.py)'},
         multi_controlled_x(6), 'modulo_diagonal'),
        (build_c5sqrtx_connected, 'c5sqrtx_connected_composite', None,
         {'note': 'inner block of toffoli-7 (V-recursion with X^(1/4))'},
         multi_controlled_sqrt_x(6), 'hst'),
        (build_toffoli7_connected, 'toffoli7_connected_composite', None,
         {'note': 'TWO recursion levels beyond the reference paper'},
         multi_controlled_x(7), 'hst'),
    ):
        # CPFLOW_COMPOSITES: comma-separated subset to (re)build. The 7q
        # toffoli-7 rebuild alone takes hours of single-core f64 polish —
        # and export_composites' never-regress guard refuses a worse
        # rebuild anyway — so targeted re-exports must not pay for it.
        only = os.environ.get('CPFLOW_COMPOSITES')
        if only and name not in only.split(','):
            continue
        try:
            rows.append(_report(builder, name, target, extra, target=tgt_u,
                                loss_kind=kind))
        except FileNotFoundError as e:
            print(json.dumps({'config': name,
                              'skipped': f'missing block results: {e}'}))
    return rows


if __name__ == '__main__':
    main()
