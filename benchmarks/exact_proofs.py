"""Symbolic exactness proofs for the committed artifact decompositions.

The paper proves exactness of its toffoli decompositions in an EXTERNAL
Mathematica notebook and flags integrating the check as future work
(reference paper/CPFlow.tex:430, README.md:8). This harness does it in-repo:

  artifact -> refine stages 1-2 (greedy angle reduction + rationalization,
  deterministic) -> if every angle is an exact rational multiple of pi,
  evaluate the whole circuit over the cyclotomic integers Z[zeta] with
  arbitrary-precision ints (cpflow_tpu/circuits/exact_unitary.py) and check
  the equality certificate against an exactly-constructed target.

A passing certificate is a PROOF (exact integer arithmetic end to end), not
a numerical check. Proven circuits are committed as fully symbolic artifacts
(angles stored as fractions of pi) in benchmarks/artifacts/exact/, and the
ledger benchmarks/artifacts/exact_proofs.json records every outcome.

Usage: python -m benchmarks.exact_proofs [label ...]
"""

import glob
import json
import math
import os
import sys
import time
from fractions import Fraction

from benchmarks.proof_ledger import LEDGER_FILES

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')

from benchmarks.rational_survey import artifact_circuit, artifact_loss  # noqa: E402

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    'benchmarks', 'artifacts')
_EXACT_DIR = os.path.join(_ART, 'exact')
MAX_DENOMINATOR = 32


_QX = '/root/reference/paper/benchmark_circuits'


def exact_target(label: str, num_qubits: int, q: int):
    """Exactly-constructed target + certificate kind for a label family."""
    from cpflow_tpu.circuits import exact_unitary as ex

    if label.startswith('ghz'):
        # GHZ state prep: the certificate (ghz_state_certificate) is
        # target-free — column |0..0> against the closed-form GHZ state.
        return 'ghz_state', 'state'
    if label.startswith('toffoli'):
        t = ex.ExactMatrix.from_int_matrix(
            ex.toffoli_permutation(num_qubits), m=2 * q)
        return t, 'hst'
    if label.startswith('relphase_toff'):
        t = ex.ExactMatrix.from_int_matrix(
            ex.toffoli_permutation(num_qubits), m=2 * q)
        return t, 'modulo_diagonal'
    if label.startswith(('c3sqrtx', 'c4sqrtx')):
        return ex.controlled_sqrt_x(num_qubits, q), 'hst'
    if label.startswith('relphase_c') and 'sqrtx' in label:
        # relative-phase C^(n-1)-sqrt-X: exact modulo a diagonal
        return ex.controlled_sqrt_x(num_qubits, q), 'modulo_diagonal'
    if label.startswith('qx_'):
        # The ibm_qx benchmark circuits are pure Clifford+T ({cx,h,t,tdg,x})
        # qasm, so the TARGET itself is exactly evaluable in the same ring
        # (q even covers h/t). Same IR conventions as the synthesis side.
        import glob as _glob
        from cpflow_tpu.circuits.ir import Circuit
        fname = label[3:]
        for suffix in ('_chain', '_star', '_square', '_kite'):
            if fname.endswith(suffix):
                fname = fname[: -len(suffix)]
        matches = _glob.glob(f'{_QX}/*/{fname}.qasm')
        if not matches:
            return None, None
        qasm_qc = Circuit.from_qasm_file(matches[0])
        return ex.exact_unitary(qasm_qc, max(q, 2)), 'hst'
    return None, None


def rational_form(label: str):
    """Deterministic refine stages 1-2 on the stored artifact; returns
    (circuit, fractions, float_loss) or (None, reason, None)."""
    from cpflow_tpu.circuits import refine as refine_mod
    from cpflow_tpu.circuits.passes import (all_rgates_are_rational,
                                            rationalize_all_rgates,
                                            remove_zero_rgates)

    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    targets = np.load(os.path.join(_ART, 'targets.npz'))
    target = targets[label].astype(np.complex128)
    qc = artifact_circuit(meta)
    loss = artifact_loss(meta, target)

    qc2 = remove_zero_rgates(refine_mod.reduce_angles(qc, loss))
    qc3 = remove_zero_rgates(rationalize_all_rgates(
        qc2, max_denominator=MAX_DENOMINATOR, angle_threshold=1e-3))
    if not all_rgates_are_rational(qc3, int(math.log2(MAX_DENOMINATOR))):
        # Cross-wire gauge freedoms can hide a dyadic form from the
        # same-wire greedy reducer — try the squeeze pass before giving up.
        qc2b, all_dyadic = refine_mod.squeeze_to_dyadic(
            qc2, loss, max_denominator=MAX_DENOMINATOR)
        if all_dyadic:
            qc3 = remove_zero_rgates(rationalize_all_rgates(
                remove_zero_rgates(qc2b), max_denominator=MAX_DENOMINATOR,
                angle_threshold=1e-3))
        if not all_dyadic or not all_rgates_are_rational(
                qc3, int(math.log2(MAX_DENOMINATOR))):
            # Last resort: the full gauge-family search (Gauss-Newton +
            # null-space DFS, closed_form_search). It found fully
            # pi-rational slices for both c3sqrtx rows where the same-wire
            # reducer AND the pairwise squeeze leave irrational angles
            # (the representable point lies far along the gauge family).
            from benchmarks.closed_form_search import (parse_spec_general,
                                                       reduced_artifact,
                                                       search as cf_search)
            res = cf_search(label, verbose=False)
            if res['unidentified']:
                return None, 'angles are not rational multiples of pi', None
            parsed = [parse_spec_general(s) for s in res['specs']]
            if any(name is not None or r.denominator > MAX_DENOMINATOR
                   for r, _, name in parsed):
                return None, ('closed form found but not pi-rational: '
                              f'{res["specs"]}'), None
            # The specs index closed_form_search's OWN reduction of the
            # artifact (reduced_artifact), which diverges from qc2 when
            # CPFLOW_CFS_SQUEEZE is set (the squeeze removes angles) —
            # rebuild from the same source so the assignment lines up.
            qc_cf, _, _ = reduced_artifact(label)
            qc3 = qc_cf.with_rotation_angles(
                [math.pi * float(r) for r, _, _ in parsed])
            qc3 = remove_zero_rgates(qc3)
    fr = [Fraction(p / math.pi).limit_denominator(MAX_DENOMINATOR)
          for p in qc3.parameters]
    # Snap angles to their exact rational values before the exact evaluation.
    qc3 = qc3.with_rotation_angles(
        [math.pi * f.numerator / f.denominator for f in fr])
    return qc3, fr, loss(qc3.unitary())


def prove_label(label: str) -> dict:
    from cpflow_tpu.circuits import exact_unitary as ex

    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    n = meta['num_qubits']
    t0 = time.time()
    row = {'label': label, 'num_qubits': n, 'cz': meta['cz_count'],
           'loss_kind': meta['loss_kind']}

    qc, fr, float_loss = rational_form(label)
    if qc is None:
        row.update({'proven': False, 'reason': fr})
        row['wall_s'] = round(time.time() - t0, 1)
        return row

    return _prove_rational_circuit(label, meta, qc, fr, float_loss, row, t0)


def _prove_rational_circuit(label, meta, qc, fr, float_loss, row, t0):
    from cpflow_tpu.circuits import exact_unitary as ex

    n = meta['num_qubits']
    q = 1
    for f in fr:
        q = q * f.denominator // math.gcd(q, f.denominator)
    q = max(q, 2)
    target, cert_kind = exact_target(label, n, q)
    if target is None:
        row.update({'proven': False, 'rational': True,
                    'reason': 'no exact target construction for this label'})
        row['wall_s'] = round(time.time() - t0, 1)
        return row

    # Guard against target-orientation mistakes before the symbolic run.
    if cert_kind == 'hst':
        approx = np.abs(target.to_complex()
                        - np.load(os.path.join(_ART, 'targets.npz')
                                  )[label].astype(np.complex128)).max()
        if approx > 1e-5:
            row.update({'proven': False, 'rational': True,
                        'reason':
                        f'exact target mismatch vs stored ({approx:.1e})'})
            row['wall_s'] = round(time.time() - t0, 1)
            return row

    u = ex.exact_unitary(qc, q)
    if cert_kind == 'hst':
        proven = ex.hst_equal_certificate(u, target)
    elif cert_kind == 'state':
        proven = ex.ghz_state_certificate(u)
    else:
        proven = ex.diagonal_certificate(ex.matmul_exact(u, target))

    row.update({'proven': bool(proven), 'rational': True, 'q': q,
                'certificate': cert_kind,
                'num_angles': len(fr),
                'denominators': sorted({f.denominator for f in fr}),
                'cz_after_reduction': qc.gates_count(['cz']),
                'float_loss_of_rational_form': float_loss})
    row['wall_s'] = round(time.time() - t0, 1)
    if proven:
        os.makedirs(_EXACT_DIR, exist_ok=True)
        out = {'label': label, 'num_qubits': n,
               'cz_count': qc.gates_count(['cz']),
               'certificate': cert_kind, 'q': q,
               'source_artifact': f'{label}.json',
               'instructions': [
                   {'name': i.name, 'qubits': list(i.qubits),
                    **({'angle_pi_fraction': [
                        Fraction(i.param / math.pi
                                 ).limit_denominator(MAX_DENOMINATOR).numerator,
                        Fraction(i.param / math.pi
                                 ).limit_denominator(MAX_DENOMINATOR).denominator]}
                       if i.param is not None else {})}
                   for i in qc.instructions]}
        with open(os.path.join(_EXACT_DIR, f'{label}.json'), 'w') as f:
            json.dump(out, f, indent=1)
    return row


def prove_from_closed_form(label: str) -> dict:
    """Prove a row whose closed_form_sweep record (artifacts/
    closed_forms.json) identified EVERY angle as a rational multiple of
    pi. The sweep's specs index its own reduction of the artifact
    (reduced_artifact under the recorded squeeze setting); rebuild the
    same circuit, snap the spec angles, check the float loss, then run
    the exact-ring certificate."""
    from benchmarks.closed_form_search import (parse_spec_general,
                                               reduced_artifact)
    from benchmarks.rational_survey import artifact_loss

    store = os.path.join(_ART, 'closed_forms.json')
    rec = json.load(open(store)).get(label) if os.path.exists(store) else None
    t0 = time.time()
    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    row = {'label': label, 'num_qubits': meta['num_qubits'],
           'cz': meta['cz_count'], 'loss_kind': meta['loss_kind'],
           'source': 'closed_form_sweep specs'}
    if not rec or not rec.get('specs'):
        row.update({'proven': False,
                    'reason': 'no fully identified closed form on record'})
        return row
    parsed = [parse_spec_general(s) for s in rec['specs']]
    if any(name is not None or r.denominator > MAX_DENOMINATOR
           for r, _, name in parsed):
        row.update({'proven': False, 'rational': False,
                    'reason': 'closed form found but not pi-rational: '
                              f'{rec["specs"]}'})
        return row
    prev = os.environ.get('CPFLOW_CFS_SQUEEZE')
    try:
        if rec.get('squeeze'):
            os.environ['CPFLOW_CFS_SQUEEZE'] = '1'
        else:
            os.environ.pop('CPFLOW_CFS_SQUEEZE', None)
        qc, meta2, target = reduced_artifact(label)
    finally:
        if prev is None:
            os.environ.pop('CPFLOW_CFS_SQUEEZE', None)
        else:
            os.environ['CPFLOW_CFS_SQUEEZE'] = prev
    fr = [Fraction(r) for r, _, _ in parsed]
    if len(fr) != len(qc.parameters):
        row.update({'proven': False,
                    'reason': f'spec count {len(fr)} != reduced circuit '
                              f'angles {len(qc.parameters)} (reduction '
                              'drifted since the sweep)'})
        return row
    qc = qc.with_rotation_angles(
        [math.pi * f.numerator / f.denominator for f in fr])
    float_loss = artifact_loss(meta, target.astype(np.complex128))(
        qc.unitary())
    if abs(float_loss) > 1e-6:
        row.update({'proven': False,
                    'reason': f'rational form float loss {float_loss:.3e} '
                              'above criterion'})
        return row
    return _prove_rational_circuit(label, meta, qc, fr, float_loss, row, t0)



def main():
    labels = sys.argv[1:] or sorted(
        os.path.basename(p)[:-5]
        for p in glob.glob(os.path.join(_ART, '*.json'))
        if os.path.basename(p)[:-5] not in LEDGER_FILES)
    ledger_path = os.path.join(_ART, 'exact_proofs.json')
    for label in labels:
        try:
            row = prove_label(label)
            if (not row.get('proven')
                    and 'not rational' in str(row.get('reason', ''))):
                # the direct /32 snap failed, but the closed-form sweep
                # may have identified an exactly pi-rational gauge
                # representative — prove THAT circuit instead
                cf = prove_from_closed_form(label)
                if cf.get('proven'):
                    row = cf
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            row = {'label': label, 'proven': False,
                   'reason': f'{type(e).__name__}: {e}'}
        print(json.dumps(row), flush=True)
        # read-modify-write PER LABEL, atomically (tmp+rename): a timeout
        # kill mid-dump must never truncate the shared ledger, and a slow
        # attempt must not clobber rows other writers landed while it ran
        # (the serial-pipeline discipline still applies; this bounds the
        # damage when it is accidentally broken)
        ledger = (json.load(open(ledger_path))
                  if os.path.exists(ledger_path) else {})
        ledger[label] = row
        tmp = ledger_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
        os.replace(tmp, ledger_path)


if __name__ == '__main__':
    main()
