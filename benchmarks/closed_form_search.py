"""Closed-form identification of relative-phase decomposition angles.

The relphase rows sit on continuous modulo-diagonal gauge families where
first-order polish stalls around 5e-8 — too coarse for integer-relation
detection. The recipe measured on the connected 6-CZ row (ROADMAP,
RESULTS_r3 §17):

1. Gauss-Newton on the modulo-diagonal RESIDUAL VECTOR (all off-diagonal
   entries of A = (U @ T)^dagger, whose squared norm / d is the loss when
   every wire participates) converges to ~2e-15 in ~10 iterations.
2. Identify each converged angle against the closed-form families seen in
   these circuits: pi-rationals p/q and the Margolus magic family
   r*pi +- arctan(sqrt 2).
3. Angles that resist identification are GAUGE-dependent (the residual
   Jacobian is rank-deficient): pin the identified ones to their exact
   values, re-run GN on the rest, and repeat — each pinning collapses
   part of the gauge family onto representable values.
4. Verify the fully-identified form with mpmath at 50 significant digits.

Paper context: the reference verified exactness externally in Mathematica
(CPFlow.tex:430); here identification + verification are in-repo, and the
verified forms feed the symbolic ring proofs (exact_relphase_proof.py).

Usage: python -m benchmarks.closed_form_search [label]   (host CPU)
"""

import json
import math
import os
import sys
from fractions import Fraction

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp  # noqa: E402

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')
MAGIC = math.atan(math.sqrt(2.0))


def reduced_artifact(label):
    """Artifact -> greedy-reduced rz/rx/cz circuit + target (f64 host)."""
    from benchmarks.rational_survey import artifact_circuit, artifact_loss
    from cpflow_tpu.circuits.refine import reduce_angles
    from cpflow_tpu.circuits.passes import remove_zero_rgates

    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    target = np.load(os.path.join(_ART, 'targets.npz'))[label].astype(
        np.complex128)
    qc = artifact_circuit(meta)
    loss = artifact_loss(meta, target)
    qc = remove_zero_rgates(reduce_angles(qc, loss))
    if os.environ.get('CPFLOW_CFS_SQUEEZE'):
        # Opt-in preprocessing for gauge-heavy rows: the pairwise
        # squeeze zeroes angles whose value is pure cross-wire gauge
        # (compensating +-a folds), shrinking both the angle count and
        # the Jacobian null space BEFORE the Gauss-Newton/DFS pipeline.
        # Off by default — on already-tight rows it can move a rigid
        # near-dyadic angle the sweep would have identified exactly.
        from cpflow_tpu.circuits.refine import squeeze_to_dyadic
        qc, _ = squeeze_to_dyadic(qc, loss)
        qc = remove_zero_rgates(reduce_angles(qc, loss))
    return qc, meta, target


def _gate_plan(qc):
    """Static instruction plan: ('rz'|'rx', wire, param_index) or
    ('cz', (q0, q1), None) — with_rotation_angles order."""
    plan, k = [], 0
    for inst in qc.instructions:
        if inst.param is not None:
            plan.append((inst.name, inst.qubits[0], k))
            k += 1
        else:
            assert inst.name == 'cz', inst.name
            plan.append(('cz', inst.qubits, None))
    return plan, k


def residual_fn(qc, target, loss_kind='modulo_diagonal'):
    """params -> real residual vector r with loss == sum(r^2)/d.

    modulo_diagonal (all wires): with A = (U @ T)^H unitary,
    1 - sum_i |A_ii|^2/d == sum_{i!=j} |A_ij|^2/d exactly.
    hst (global-phase equivalence): with M = U @ T^H unitary and
    z = tr(M)/d, sum |M - z*I|^2 == d - d|z|^2 == d * hst_loss exactly.
    """
    plan, n_par = _gate_plan(qc)
    n = qc.num_qubits
    d = 2 ** n
    off = np.nonzero(~np.eye(d, dtype=bool).ravel())[0]

    def build(params):
        u = jnp.eye(d, dtype=jnp.complex128)
        for name, q, k in plan:
            if name == 'cz':
                b0 = 1 << (n - 1 - q[0])
                b1 = 1 << (n - 1 - q[1])
                idx = np.arange(d)
                sign = np.where((idx & b0).astype(bool)
                                & (idx & b1).astype(bool), -1.0, 1.0)
                u = sign[:, None] * u
            else:
                half = params[k] / 2
                b = 1 << (n - 1 - q)
                idx = np.arange(d)
                i0 = idx[(idx & b) == 0]
                i1 = i0 | b
                r0, r1 = u[i0], u[i1]
                c = jnp.cos(half)
                if name == 'rx':
                    s = -1j * jnp.sin(half)
                    u = u.at[i0].set(c * r0 + s * r1)
                    u = u.at[i1].set(s * r0 + c * r1)
                else:  # rz
                    e0 = c - 1j * jnp.sin(half)
                    u = u.at[i0].set(e0 * r0)
                    u = u.at[i1].set(jnp.conj(e0) * r1)
        return u

    if loss_kind == 'modulo_diagonal':
        def resid(params):
            a = (build(params) @ jnp.asarray(target)).conj().T
            r = a.ravel()[off]
            return jnp.concatenate([jnp.real(r), jnp.imag(r)])
    elif loss_kind == 'hst':
        tH = jnp.asarray(target.conj().T)

        def resid(params):
            m = build(params) @ tH
            z = jnp.trace(m) / d
            r = (m - z * jnp.eye(d, dtype=m.dtype)).ravel()
            return jnp.concatenate([jnp.real(r), jnp.imag(r)])
    elif loss_kind == 'state':
        # State preparation: only column |0..0> matters. With c = U e_0
        # (unit norm) and z = <t|c>, c - z*t == 0 iff c == z*t with
        # |z| == 1 — the phase-projection residual; sum(r^2) == 1 - |z|^2
        # matches the fubini_study state loss exactly.
        tvec = jnp.asarray(np.asarray(target).reshape(-1))

        def resid(params):
            c = build(params)[:, 0]
            z = jnp.vdot(tvec, c)
            r = c - z * tvec
            return jnp.concatenate([jnp.real(r), jnp.imag(r)])
    else:
        raise ValueError(loss_kind)

    return resid, n_par, d


def compile_resid(resid):
    """Jit the residual and its Jacobian ONCE per search: every gauge-DFS
    node re-solves GN, and per-node jax.jit would recompile each time."""
    return jax.jit(resid), jax.jit(jax.jacfwd(resid))


def gauss_newton(fns, params, free_idx, iters=20, verbose=False):
    """Levenberg-damped Gauss-Newton restricted to free_idx coordinates.
    `fns` is the (residual, jacobian) pair from compile_resid."""
    rf, jac = fns
    params = np.array(params, dtype=float)
    lam = 1e-12
    for it in range(iters):
        r = np.asarray(rf(jnp.asarray(params)))
        j = np.asarray(jac(jnp.asarray(params)))[:, free_idx]
        # damped least squares step
        jtj = j.T @ j + lam * np.eye(len(free_idx))
        step = np.linalg.solve(jtj, j.T @ r)
        params[free_idx] -= step
        if verbose:
            print(f'  gn it={it} loss={float(np.sum(r ** 2)):.3e}',
                  flush=True)
        if np.sum(r ** 2) < 1e-28:
            break
    r = np.asarray(rf(jnp.asarray(params)))
    return params, float(np.sum(r ** 2))


# ---------------------------------------------------------------------------
# tie constraints: theta_i = sign * x_g + k2 * pi/2 within a group
# ---------------------------------------------------------------------------
# High-dimensional gauge families (relphase toffoli-5: ~22 free of 34)
# defeat value-pinning DFS, but their converged points expose RELATIONS —
# repeated, negated, and pi/2-shifted angles. Accepting a relation removes
# one gauge dimension WITHOUT committing a value, and the family shrinks
# until value hypotheses become decidable.

def _theta(params, groups, x):
    th = params.copy()
    for g, members in enumerate(groups):
        for i, s, k2 in members:
            th[i] = s * x[g] + k2 * (math.pi / 2)
    return th


def _group_x(params, groups):
    return np.array([params[g[0][0]] for g in groups])  # rep is (i, 1, 0)


def gauss_newton_groups(fns, params, groups, iters=20):
    """GN over one variable per group; returns (theta, loss)."""
    rf, jac = fns
    x = _group_x(params, groups)
    lam = 1e-12
    th = _theta(params, groups, x)
    for _ in range(iters):
        r = np.asarray(rf(jnp.asarray(th)))
        if np.sum(r ** 2) < 1e-28:
            break
        j = np.asarray(jac(jnp.asarray(th)))
        jx = np.zeros((len(r), len(groups)))
        for g, members in enumerate(groups):
            for i, s, _ in members:
                jx[:, g] += s * j[:, i]
        jtj = jx.T @ jx + lam * np.eye(len(groups))
        x -= np.linalg.solve(jtj, jx.T @ r)
        th = _theta(params, groups, x)
    r = np.asarray(rf(jnp.asarray(th)))
    return th, float(np.sum(r ** 2))


def _merge(groups, gi, hi, s, k2):
    """Tie group hi to gi: x_h = s * x_g + k2 * pi/2."""
    out = [list(g) for g in groups]
    out[gi].extend((i, si * s, si * k2 + k2i) for i, si, k2i in out[hi])
    del out[hi]
    return out


def try_ties(fns, d, params, groups, accept=1e-24, gn_iters=25,
             loose_tol=1e-6, verbose=True):
    """Greedily accept pairwise relations x_h = +-x_g + k*pi/2 that the
    residual confirms (loss returns below `accept` after constrained GN),
    closest-first. loose_tol is deliberately TIGHT: a relation that holds
    to ~1e-15 at a GN-converged point is structural (GN from a generic
    start does not land equalities by chance), while accepting merely
    nearby relations (tol 0.05) was measured to strand the chain row's
    family away from every representable point — ties have no backtracking
    of their own, so only near-exact ones are safe to commit greedily."""
    while len(groups) > 1:
        vals = _group_x(params, groups)
        cands = []
        for gi in range(len(groups)):
            for hi in range(gi + 1, len(groups)):
                for s in (1, -1):
                    k2f = (vals[hi] - s * vals[gi]) / (math.pi / 2)
                    k2 = round(k2f)
                    dist = abs(vals[hi] - (s * vals[gi]
                                           + k2 * (math.pi / 2)))
                    if dist < loose_tol and abs(k2) <= 4:
                        cands.append((dist, gi, hi, s, k2))
        cands.sort()
        committed = False
        for dist, gi, hi, s, k2 in cands:
            trial = _merge(groups, gi, hi, s, k2)
            th, loss = gauss_newton_groups(fns, params, trial,
                                           iters=gn_iters)
            if loss / d < accept:
                if verbose:
                    ri, hj = groups[gi][0][0], groups[hi][0][0]
                    print(f'  tie a{hj} = {s:+d}*a{ri} + {k2}*pi/2 '
                          f'(off {dist:.1e}) -> {len(trial)} dims '
                          f'loss={loss / d:.3e}', flush=True)
                groups, params = trial, th
                committed = True
                break
        if not committed:
            break
    return params, groups


def null_dim_groups(fns, params, groups, tol=1e-8):
    """Null-space dimension of the grouped residual Jacobian at `params`,
    plus per-group participation (max |null-vector component|)."""
    _, jac = fns
    x = _group_x(params, groups)
    th = _theta(params, groups, x)
    j = np.asarray(jac(jnp.asarray(th)))
    jx = np.zeros((j.shape[0], len(groups)))
    for g, members in enumerate(groups):
        for i, s, _ in members:
            jx[:, g] += s * j[:, i]
    _, sv, vt = np.linalg.svd(jx)
    null_dim = int(np.sum(sv < tol * max(sv[0], 1e-30)))
    null_dim += max(0, len(groups) - len(sv))
    part = (np.max(np.abs(vt[len(groups) - null_dim:, :]), axis=0)
            if null_dim else np.zeros(len(groups)))
    return null_dim, part


def null_space_report(fns, params, specs, tol=1e-8):
    """At a converged point, split the unidentified angles into GAUGE
    coordinates (participate in the residual Jacobian's null space — the
    continuous family) and RIGID ones (fixed by the equations but not
    matching any known family: candidates for new constants / algebraic
    identification). Returns dict with the null-space dimension and
    per-coordinate max |null-vector component|."""
    _, jac = fns
    free = [i for i in range(len(specs)) if specs[i] is None]
    j = np.asarray(jac(jnp.asarray(params)))[:, free]
    _, sv, vt = np.linalg.svd(j, full_matrices=True)
    null_dim = int(np.sum(sv < tol * sv[0])) + (vt.shape[0] - len(sv)
                                                if vt.shape[0] > len(sv)
                                                else 0)
    part = np.max(np.abs(vt[len(free) - null_dim:, :]), axis=0) \
        if null_dim else np.zeros(len(free))
    return {'free': free, 'null_dim': null_dim,
            'gauge': [i for i, p in zip(free, part) if p > 1e-6],
            'rigid': [i for i, p in zip(free, part) if p <= 1e-6],
            'participation': {i: float(p) for i, p in zip(free, part)},
            'singular_values_tail': sv[-(null_dim + 3):].tolist()}


def format_spec(r, sg, name='magic'):
    """(Fraction r, constant sign, constant name) -> spec string; r
    normalized into (-1, 1] mod 2 (a 2*pi angle shift only flips the
    gate's global sign, which every certificate here is invariant to)."""
    r = Fraction(r)
    r = 1 - ((1 - r) % 2)       # into (-1, 1]
    head = (f'{r.numerator}/{r.denominator}' if r.denominator != 1
            else f'{r.numerator}')
    if sg == 0:
        return head
    tag = ('+' if sg > 0 else '-') + name
    if r == 0:
        return name if sg > 0 else f'-{name}'
    return f'{head}{tag}'


# ---------------------------------------------------------------------------
# identification
# ---------------------------------------------------------------------------
# Named transcendental constants appearing in relphase closed forms.
# 'magic' is the Margolus angle (RESULTS_r3 §17). w1/w2/w3 are the RIGID
# constants of the relphase toffoli-5 row, found by null_space_report +
# mpmath.findpoly on the converged Gauss-Newton point: tan(w1) = 2-sqrt2,
# tan(w2)^2 = 7-4*sqrt2 (equivalently cos(w2) = cos(pi/8)/sqrt2),
# tan(w3)^2 = 4+2*sqrt2. All live in degree-<=4 extensions of Q.

CONSTANTS = {
    'magic': MAGIC,
    'w1': math.atan(2.0 - math.sqrt(2.0)),
    'w2': math.atan(math.sqrt(7.0 - 4.0 * math.sqrt(2.0))),
    'w3': math.atan(math.sqrt(4.0 + 2.0 * math.sqrt(2.0))),
}
# Combination constants found (as quartic/quadratic tangent minpolys) on
# qx_one-two-three-v1_99 and identified against the family at 60 digits:
#   q1 = pi - 2 w2          (tan^2 q1 = 23 + 16 sqrt2)
#   q2 = magic + w1         (tan q2  = 6 + 4 sqrt2 — the RESULTS_r3 §17
#                            byproduct identity arctan(sqrt2) +
#                            arctan(2 - sqrt2) = arctan(6 + 4 sqrt2))
#   q3 = pi + w1 - magic    (tan q3  = (2 sqrt2 - 6)/7)
CONSTANTS['q1'] = math.pi - 2.0 * CONSTANTS['w2']
CONSTANTS['q2'] = MAGIC + CONSTANTS['w1']
CONSTANTS['q3'] = math.pi + CONSTANTS['w1'] - MAGIC

# Closed forms discovered by this tool whose symbolic ring proof is still
# open (the toffoli-5 row needs Z[zeta_64] plus the three w-towers — a
# 2048-dimensional multi-quadratic ring; ROADMAP). Verified in mpmath to
# 210 digits (loss 1.9e-210) — the paper's own exactness checks were
# machine-precision Mathematica runs (CPFlow.tex:430).
KNOWN_CLOSED_FORMS = {
    'qx_4gt5_76_chain':   # 22 CX published-beat row; r5 squeeze
        # sweep: 70 pi-rationals (/8 and /3 grids) + one w3 pair
        ["-5/8", "1/2", "-5/8", "1/2", "1/2", "1/2", "1/8", "1/2", "1/2", "1/2", "1/2", "1", "1/2", "-1/2", "1/2", "3/8", "1/2", "1", "-1/8", "1/2", "1/2", "5/8", "1/2", "1/2", "1/2", "1", "1/2", "1/2", "7/8", "1/2", "1/2", "1/2", "5/8", "-1/2", "1/2", "-3/8", "1/2", "-5/8", "1/2", "-3/8", "1/2", "1", "1/2", "1", "1/2", "1/2", "1/2", "1/2", "1/2", "1", "5/8", "-1/2", "1/2", "-3/8", "1/2", "1", "1/2", "2/3-w3", "1/2", "1/8", "1/2", "1", "1/2", "1", "1/2", "3/8", "1/2", "1/2", "-1/2", "2/3-w3", "-1/2", "-1/2"],
    'toffoli5_connected':   # 37 CZ, paper sec toff5 parity row
        ['-1/2', '1/2', '7/8', '1/2', '1/2', '1/4', '1/2', '-1/2', '1/2',
         '1', '1/2', '7/16', '1', '1', '1/16', '1', '1/2', '-1/2', '1/4',
         '-3/4', '1-w1', '1/2', '-1/2', '1-w2', '-1/2', '1/2', '1',
         '-1/2-w3', '5/8', '1/2', '1/2', '-1/2', '1/2', '1', '15/16', '1',
         '15/16', '1/2', '1', '1/2', '1', '7/16', '1', '1/2', '-1/2',
         '1/2', '-1/2', '1/16', '1', '1', '1', '15/16', '5/8', '1',
         '-1/2+w3', '1/2', '1/2', '1/2', 'w2', '-1/2-w2', 'w3', '1', '1',
         '1/16', '1', '15/16', '-1/2', '1/2', '9/16', '1', '15/16', '1/8',
         '1/2', '1/2', '-1/2', '3/4', '1/4', '1/8', '1', '7/8', '1/2',
         '1/2', '1/2', '1/2', '7/8', '-1/2', '1/2', '15/16', '-9/16',
         '-1/16', '1/16', '1/2', '-1/2'],
    # qx_one-two-three-v1_99's 46-CX row (the LARGEST published-table
    # beat, 52 -> 46): identified by the round-3 sweep rerun — every
    # angle is a pi-rational (denominators <= 8) or in the sqrt2
    # family {magic, w1, w2, w3, q1, q2, q3} (mp loss 4.5e-32)
    'qx_one-two-three-v1_99':
        ['-1/2', '1/2', '1', '1-magic', '1/2', '1/2', '1/2', '1/3',
         '1/2', '1/2', '3/8', '1-w3', '1/2', '-1/2', 'w2', 'q1', 'q2',
         '1', '1/3', '1', '3/8', '-2/3', 'magic', 'magic', '1/3',
         '-1/3', 'q3', '1', '1-w2', '1/6', 'magic', '1', 'w3', '-3/4',
         '1/2', '-1/4', '1/2', '-1/2', '1/2', '1/4', '1/2', '5/8',
         '1/2', '-1/2', '1/2', '-1/2', '1/2', '1/2', '1/2', '-1/2',
         '3/4', '-1/2', '1/4', '1', '3/4', '1', '1/2', '1/4', '-7/8',
         '-3/4', '-1/2', '1/2', '1', '1/4', '1/4', '1/2', '5/8',
         '1/2', '1', '1', '3/4', '1', '1', '5/8', '1', '1', '-1/4',
         '1', '-1/2', '1/2', '-1/4', '1/2', '1/8', '1', '-1/2', '1/4',
         '7/8', '-1/2-magic', '1/2', '2/3', '1', '-3/4', '1/2', '1',
         '1/2', '1/2+magic', '1/4', '-7/8', '1', '1/2', '1', '1/2',
         '-1/2', '-1/2', '1/2', '-3/4'],
    # qx_4gt13_91_chain's 24-CX row (beats the published 25): identified
    # by the round-3 sweep rerun in ONE Gauss-Newton round — pi-rationals
    # (denominators <= 12) plus {magic, w1, q1} of the sqrt2 family
    # (mp loss -3.3e-32 at 50 digits)
    'qx_4gt13_91_chain':
        ['1/2', '-5/8', '1/2', '1', '1/2', '1/2', '1/2', '7/8', '1',
         '3/4', '1', '1/2', '1/4', '1/2', '1', '1/2', '1/2', '3/4', '1',
         '1/2', '-3/8', '1/2', '1', '3/4', '-1/2', '1/2', '1/4',
         '1-magic', '-1/2', '-7/8', '1/2', '1/2', '1/6', '1/2', '-1/8',
         '1/2', '1/2', '1/2', '1+magic', '1/2', '-1/2', '1/2', '-1/2',
         '1/4', '1/4', '1/4', '1', '1/2', '-1/2', '1/2', '1/2', '1/2',
         '5/8-w1', '1/2', '7/8', '1/2', '1', '1/2', '1', '-1/4', '1/2',
         '1/2', '1', '1/2', '1', '1/2', '1/2', '3/4', '-7/12-q1', '1/2',
         '1', '1/2', '1/2', '1', '1/2', '-1/3-q1', '1/2', '1/2', '1/4',
         '5/8', '1/2', '-7/8-w1', '1', '1', '3/4'],
    # the 35-CZ DIRECT toffoli-5 record row (beats the published 36,
    # RESULTS_r4 section 12): identified by the round-4 sweep — every
    # angle is a pi-rational (denominators <= 16) or in the proven
    # sqrt2 tower family {w1, w2, w3, q1} (mp loss 2.6e-60)
    'toffoli5_connected_record':
        ['1', '-1/2', '1/2', '1/2', '1/2', '1/2', '15/16', '1/2', '1',
         '1/4', '1', '1', '-w1', 'w2', '1', '1/2', '-1/2', '15/16',
         '1/2', '1/2', '1-w3', '1/8', '1/8', 'w3', '1/2', '1', '1-w2',
         '1', '9/16', '1', '1', '15/16', '1', '1/2+q1', '1/2',
         '15/16', '1/2', '1/2', '-1/2+w1', '3/4', '-3/16', '1/2', '1',
         '-1/2', '3/16', '-1/2', '1/2', '1/2', '1/2', '1/2', '1/2',
         '1/4', '1/2', 'w1', '1/2', '-1/2', '1-w2', '-1/2', '1/2',
         '1', '-11/16', '1', 'w3', '3/8', '1/2', '1/2', '-1/2',
         '15/16', '5/16', '-1/2', '1/2', '1', '1/2', '1/2', '-1/2',
         '7/8', '3/8', '1/2', '1', '1', '3/4', '1', '1', '5/16',
         '9/16', '-1/2', '1/2', '-15/16', '-3/4', '1/2', '-1/2',
         '-1/2', '1/2', '-3/16', '1', '13/16'],
    # qx_alu-v2_32's 25-CX row (beats the published 30 by five,
    # RESULTS_r4 section 12): pi-rationals (denominators <= 4 and
    # thirds) plus the magic family (mp loss -1.1e-31)
    'qx_alu-v2_32':
        ['1', '1/2', '1', '1/2', '-1/2', '1/2', '1/2', '-1/2', '1/2',
         '1', '1/2', '1/2', '1/2', '3/4', '1', '1/2', '1', '1', '3/4',
         '1/2', '-3/4', '1/2', '3/4', '1/2', '1/2', '-1/2', '1/2',
         '1', '3/4', '1', '1', '3/4', '3/4', '1', '1/4', '1', 'magic',
         '2/3', '1', '1/2', '3/4', '1', '1/4', '1', '-1/2',
         '1/2+magic', '1/2', '-1/2', '1/3', '-1/2', '1/2', '1', '1/2',
         '1', '1/2', '1', '1', '3/4', '1-magic', '3/4', '-2/3',
         'magic', '1', '1/2', '-1/2', '1/2', '-1/4', '1/2', '1/2',
         '1/2', '1/4', '1/2', '1', '-1/2', '1/2', '1', '-1/2', '1/2',
         '1', '-1/2', '1/2', '1'],
}

# Constants minted mid-search by algebraic identification of rigid
# unidentified values: name -> (tan minimal-poly coeffs highest-first,
# float approx of the tan root, integer k with a = atan(root) + k*pi).
DYNAMIC_POLY = {}


def register_dynamic_constant(value, degree=4, maxcoeff=64):
    """Try to identify `value` as atan(algebraic) + k*pi via its tangent's
    minimal polynomial; on success register it as a new named constant and
    return the name (else None). This is exactly how w1/w2/w3 were found
    on the relphase toffoli-5 row — rigid Jacobian coordinates whose
    tangents satisfy small integer polynomials."""
    from mpmath import mp, findpoly, tan, atan
    mp.dps = 30
    t = tan(mp.mpf(value))
    if abs(t) > 1e6:    # too close to a pi/2 pole for stable poly fits
        return None
    poly = findpoly(t, degree, maxcoeff=maxcoeff, tol=mp.mpf(10) ** -11)
    if poly is None:
        return None
    k = round((value - math.atan(float(t))) / math.pi)
    name = f'u{len(DYNAMIC_POLY)}'
    DYNAMIC_POLY[name] = ([int(c) for c in poly], float(t), k)
    try:
        refined = float(mp_constant(name, mp))
    except Exception:   # noqa: BLE001 — polyroots can fail to converge
        refined = math.inf
    # f64 values carry ~15 digits while deg-4/coeff-64 findpoly needs ~11
    # to accept: require the poly's own root to reproduce the value well
    # beyond the acceptance window, or drop the registration
    if abs(refined - value) > 1e-13:
        del DYNAMIC_POLY[name]
        return None
    CONSTANTS[name] = refined
    return name


def mp_constant(name, mp):
    if name == 'q1':
        return mp.pi - 2 * mp_constant('w2', mp)
    if name == 'q2':
        return mp_constant('magic', mp) + mp_constant('w1', mp)
    if name == 'q3':
        return mp.pi + mp_constant('w1', mp) - mp_constant('magic', mp)
    if name == 'magic':
        return mp.atan(mp.sqrt(2))
    if name == 'w1':
        return mp.atan(2 - mp.sqrt(2))
    if name == 'w2':
        return mp.atan(mp.sqrt(7 - 4 * mp.sqrt(2)))
    if name == 'w3':
        return mp.atan(mp.sqrt(4 + 2 * mp.sqrt(2)))
    if name in DYNAMIC_POLY:
        coeffs, approx, k = DYNAMIC_POLY[name]
        roots = [r for r in mp.polyroots([mp.mpf(c) for c in coeffs],
                                         maxsteps=2000, extraprec=500)
                 if abs(mp.im(r)) < mp.mpf(10) ** -20]
        if not roots:
            raise ValueError(f'{name}: no real roots')
        root = min(roots, key=lambda r: abs(mp.re(r) - approx))
        return mp.atan(mp.re(root)) + k * mp.pi
    raise KeyError(name)


def parse_spec_general(spec):
    """'r', 'r(+|-)name', '(+|-)name', 'name' -> (Fraction r, sign, name)."""
    s = spec.replace(' ', '')
    for name in CONSTANTS:
        if s in (name, '+' + name):
            return Fraction(0), 1, name
        if s == '-' + name:
            return Fraction(0), -1, name
        for pre, sg in (('+', 1), ('-', -1)):
            tag = pre + name
            if s.endswith(tag):
                return Fraction(s[:-len(tag)]), sg, name
    return Fraction(s), 0, None


def derive_spec(spec, sign, k2):
    """Spec of sign * a + k2 * pi/2 given a's spec."""
    r, sg, name = parse_spec_general(spec)
    return format_spec(sign * r + Fraction(k2, 2), sign * sg, name)


def identify(angle, tol=1e-9, max_den=48):
    """Match one angle against pi*p/q (q<=max_den) or r*pi +- c for a
    named constant c (r denominator <=16). Returns a spec string ('3/4',
    '1-magic', '1/2+w2', ...) or None."""
    a = float(angle)
    fr = Fraction(a / math.pi).limit_denominator(max_den)
    if abs(a - math.pi * fr) < tol:
        return format_spec(fr, 0)
    for name, c in CONSTANTS.items():
        for sign in (1, -1):
            r = Fraction((a - sign * c) / math.pi).limit_denominator(16)
            if abs(a - (math.pi * r + sign * c)) < tol:
                return format_spec(r, sign, name)
    return None


def spec_value(spec):
    """Float value of an identify() spec."""
    r, sg, name = parse_spec_general(spec)
    return math.pi * float(r) + (sg * CONSTANTS[name] if name else 0.0)


def mp_spec_value(spec, mp):
    r, sg, name = parse_spec_general(spec)
    v = mp.pi * r.numerator / r.denominator
    if name:
        v += sg * mp_constant(name, mp)
    return v


def mp_verify(qc, specs, meta, dps=60, target=None):
    """Rebuild the circuit unitary in mpmath at `dps` digits from the spec
    list and return the artifact's loss (float of an mpf). NOTE: with the
    default float64 target this only certifies down to ~1e-32 unless the
    target is exactly representable (permutation targets are); pass an
    mp-exact `target` matrix for more digits."""
    from mpmath import mp
    mp.dps = dps
    n = qc.num_qubits
    d = 2 ** n
    plan, n_par = _gate_plan(qc)
    assert len(specs) == n_par

    if target is None:
        target = np.load(os.path.join(_ART, 'targets.npz'))[meta['label']]
    tmp = mp.matrix(d, d)
    for i in range(d):
        for j in range(d):
            tmp[i, j] = mp.mpc(complex(target[i, j]))

    u = mp.eye(d)
    for name, q, k in plan:
        if name == 'cz':
            b0 = 1 << (n - 1 - q[0])
            b1 = 1 << (n - 1 - q[1])
            for i in range(d):
                if (i & b0) and (i & b1):
                    for j in range(d):
                        u[i, j] = -u[i, j]
        else:
            half = mp_spec_value(specs[k], mp) / 2
            c, s = mp.cos(half), mp.sin(half)
            b = 1 << (n - 1 - q)
            for i0 in range(d):
                if i0 & b:
                    continue
                i1 = i0 | b
                for j in range(d):
                    r0, r1 = u[i0, j], u[i1, j]
                    if name == 'rx':
                        u[i0, j] = c * r0 - 1j * s * r1
                        u[i1, j] = -1j * s * r0 + c * r1
                    else:
                        u[i0, j] = (c - 1j * s) * r0
                        u[i1, j] = (c + 1j * s) * r1
    if meta.get('loss_kind', 'modulo_diagonal') == 'hst':
        m = u * tmp.transpose_conj()
        z = mp.mpf(0)
        for i in range(d):
            z += m[i, i]
        return 1 - abs(z / d) ** 2
    a = (u * tmp).transpose_conj()
    tot = mp.mpf(0)
    for i in range(d):
        for j in range(d):
            if i != j:
                tot += abs(a[i, j]) ** 2
    return tot / d


def hypotheses(angle, loose_tol=0.08, max_den=12):
    """Candidate family values near `angle`, closest first — gauge-family
    members drift O(1e-2..1e-4) off their exact values, so the nearest
    representable value is the natural pin hypothesis."""
    a = float(angle)
    cands = []
    # rank by distance with a denominator penalty: on a multi-dimensional
    # gauge family many rationals pass within loose_tol, but the closed
    # forms seen in these circuits use dyadics/thirds + the magic family —
    # prefer those over den-5/7/11 coincidences at similar distance.
    for den in range(1, max_den + 1):
        fr = Fraction(round(a / math.pi * den), den)
        v = math.pi * fr
        if abs(a - v) < loose_tol and fr.denominator == den:
            s = (f'{fr.numerator}/{fr.denominator}' if den != 1
                 else f'{fr.numerator}')
            cands.append((abs(a - v) * (1 + den / 4), abs(a - v), s))
    for name, c in CONSTANTS.items():
        # canonical-form preference: the Margolus family ranks with the
        # rationals; row-specific constants (w*) and minted ones (u*) only
        # win when nothing classical fits
        fam = 1.0 if name == 'magic' else (
            2.0 if name in DYNAMIC_POLY else 1.5)
        for sign in (1, -1):
            for den in range(1, 9):
                r = Fraction(round((a - sign * c) / math.pi * den), den)
                if r.denominator != den and not (r == 0 and den == 1):
                    continue
                v = math.pi * r + sign * c
                if abs(a - v) < loose_tol:
                    cands.append((abs(a - v) * (1 + den / 4) * fam,
                                  abs(a - v), format_spec(r, sign, name)))
    cands.sort()
    return cands  # (rank_key, distance, spec), best first


def scan_last_dim(fns, d, params, groups, part, accept=1e-24, gn_iters=12,
                  n_scan=72, near=6e-2, verbose=True):
    """Enumerate pin hypotheses along a ONE-dimensional gauge family by
    slicing: fix the most mobile group at n_scan uniform values (every
    slice still lies on the family, so GN re-converges the rest), and at
    each slice record other coordinates that come close to a family
    value. Local hypothesis windows cannot see representable points far
    along the family; the scan covers the whole loop. Returns
    [(quality, g_index_in_groups, spec), ...] best first."""
    gpin = int(np.argmax(part))
    rest = groups[:gpin] + groups[gpin + 1:]
    found = {}
    for v in np.linspace(-math.pi, math.pi, n_scan, endpoint=False):
        trial = params.copy()
        for i, s, k2 in groups[gpin]:
            trial[i] = s * v + k2 * (math.pi / 2)
        trial, loss = gauss_newton_groups(fns, trial, rest, iters=gn_iters)
        if loss / d >= 1e-18:   # fell off the family (slice out of range)
            continue
        vals = _group_x(trial, rest)
        for g2, val in enumerate(vals):
            for key, dist, h in hypotheses(val, loose_tol=near):
                gidx = g2 if g2 < gpin else g2 + 1
                cur = found.get((gidx, h))
                if cur is None or dist < cur[0]:
                    # keep the slice point: pinning is applied from the
                    # nearest on-family point so GN only corrects locally
                    found[(gidx, h)] = (dist, trial.copy())
    out = sorted(((dist, gidx, h, base)
                  for (gidx, h), (dist, base) in found.items()),
                 key=lambda t: t[0])
    if verbose:
        print(f'  scan: {len(out)} family crossings along dim-1 loop',
              flush=True)
    return out


def _nearest_family(value, loose_tol=0.5):
    """(distance, spec) of the family value nearest to `value`."""
    best = (loose_tol, None)
    for _, dist, h in hypotheses(value, loose_tol=loose_tol):
        if dist < best[0]:
            best = (dist, h)
    return best


def nice_descent(fns, d, params, specs, steps=250, eta=0.5, gn_iters=4,
                 seed=0, kick=1.5, verbose=False):
    """Descend the 'niceness' objective N = sum_i dist(theta_i, nearest
    family value)^2 along the residual null manifold: gradient of N
    projected onto the Jacobian's null space, re-converged onto the
    zero-loss family by a few GN iterations after each step. DFS pinning
    needs the right 4-deep hypothesis ORDER; this instead solves for the
    simultaneously-representable point directly, from a random start on
    the family (`seed` controls the initial null-space kick)."""
    rng = np.random.default_rng(seed)
    rf, jac = fns
    free = [i for i in range(len(specs)) if specs[i] is None]
    params = params.copy()

    def null_basis(th):
        j = np.asarray(jac(jnp.asarray(th)))[:, free]
        _, sv, vt = np.linalg.svd(j)
        nd = int(np.sum(sv < 1e-8 * max(sv[0], 1e-30)))
        nd += max(0, len(free) - len(sv))
        return vt[len(free) - nd:, :].T if nd else None

    # random start: kick along the family and re-converge
    v = null_basis(params)
    if v is None:
        return params, 0.0
    k = v @ rng.normal(size=v.shape[1])
    params[free] += kick * k / max(np.linalg.norm(k), 1e-12)
    params, _ = gauss_newton(fns, params, free, iters=12)

    n_val = math.inf
    for it in range(steps):
        g = np.zeros(len(free))
        n_val = 0.0
        for a, i in enumerate(free):
            dist, h = _nearest_family(params[i])
            delta = (params[i] - spec_value(h)) if h else 0.0
            n_val += delta * delta
            g[a] = 2 * delta
        v = null_basis(params)
        if v is None:
            break
        gp = v @ (v.T @ g)
        step = eta * gp / (1 + 10 * it / steps)
        params[free] -= step
        params, loss = gauss_newton(fns, params, free, iters=gn_iters)
        if verbose and it % 25 == 0:
            print(f'  nice it={it} N={n_val:.3e} loss={loss / d:.1e}',
                  flush=True)
        if n_val < 1e-16:
            break
    return params, n_val


def mp_refine(qc, meta, specs, params, dps=160, iters=12, verbose=True):
    """Refine the FREE angles (specs[i] is None) to `dps`-digit precision
    by Gauss-Newton in mpmath, holding spec'd angles at their exact
    values. Requires the free coordinates to be RIGID (isolated solution:
    gauge-fix first by pinning null directions). Returns the mpf angle
    list. Used for algebraic identification: at 150+ digits, findpoly
    verdicts on tan(theta) are effectively certificates."""
    from mpmath import mp
    mp.dps = dps
    n = qc.num_qubits
    d = 2 ** n
    plan, n_par = _gate_plan(qc)
    free = [i for i in range(n_par) if specs[i] is None]
    target = np.load(os.path.join(_ART, 'targets.npz'))[meta['label']]
    tgt = mp.matrix(d, d)
    for i in range(d):
        for j in range(d):
            tgt[i, j] = mp.mpc(complex(target[i, j]))

    theta = [mp_spec_value(specs[i], mp) if specs[i] is not None
             else mp.mpf(float(params[i])) for i in range(n_par)]

    def build(th):
        u = mp.eye(d)
        for name, qb, k in plan:
            if name == 'cz':
                b0 = 1 << (n - 1 - qb[0])
                b1 = 1 << (n - 1 - qb[1])
                for i in range(d):
                    if (i & b0) and (i & b1):
                        for j in range(d):
                            u[i, j] = -u[i, j]
            else:
                half = th[k] / 2
                c, s = mp.cos(half), mp.sin(half)
                b = 1 << (n - 1 - qb)
                for i0 in range(d):
                    if i0 & b:
                        continue
                    i1 = i0 | b
                    for j in range(d):
                        r0, r1 = u[i0, j], u[i1, j]
                        if name == 'rx':
                            u[i0, j] = c * r0 - 1j * s * r1
                            u[i1, j] = -1j * s * r0 + c * r1
                        else:
                            u[i0, j] = (c - 1j * s) * r0
                            u[i1, j] = (c + 1j * s) * r1
        return u

    def residvec(th):
        if meta.get('loss_kind', 'modulo_diagonal') == 'hst':
            m = build(th) * tgt.transpose_conj()
            z = sum(m[i, i] for i in range(d)) / d
            ent = [m[i, j] - (z if i == j else 0)
                   for i in range(d) for j in range(d)]
        else:
            a = (build(th) * tgt).transpose_conj()
            ent = [a[i, j] for i in range(d) for j in range(d) if i != j]
        out = []
        for e in ent:
            out.append(mp.re(e))
            out.append(mp.im(e))
        return out

    h = mp.mpf(10) ** (-dps // 3)
    for it in range(iters):
        r0 = residvec(theta)
        norm = mp.sqrt(sum(x * x for x in r0))
        if verbose:
            print(f'  mp_refine it={it} |r|={mp.nstr(norm, 3)}', flush=True)
        if norm < mp.mpf(10) ** (-(dps * 3) // 4):
            break
        jcols = []
        for i in free:
            th2 = list(theta)
            th2[i] = th2[i] + h
            r1 = residvec(th2)
            jcols.append([(b - a) / h for a, b in zip(r0, r1)])
        m = len(r0)
        jtj = [[sum(jcols[p][t] * jcols[q][t] for t in range(m))
                for q in range(len(free))] for p in range(len(free))]
        jtr = [sum(jcols[p][t] * r0[t] for t in range(m))
               for p in range(len(free))]
        step = mp.lu_solve(mp.matrix(jtj), mp.matrix(jtr))
        for a, i in enumerate(free):
            theta[i] = theta[i] - step[a]
    return theta


def gauge_resolve(fns, d, params, specs, gn_iters=25, accept=1e-24,
                  verbose=True, budget=500, allow_mint=True):
    """Pin-and-reconverge over a continuous gauge family: pin the nearest
    family hypothesis for one free GROUP, Gauss-Newton the rest, keep the
    pin iff the residual returns below `accept` (measured discovery path
    of the connected row's coupled triple, RESULTS_r3 §17). Gauge families
    can be multi-dimensional, and a valid pin can still strand the
    REMAINING angles off every representable value (seen on the connected
    row: a11=pi/6+magic re-converges to zero loss but dead-ends a10/a12,
    while a12=-3pi/4 resolves all three) — so this is a depth-first
    search with backtracking, bounded by `budget` GN solves. Tie
    detection (try_ties) runs first and again after every accepted pin:
    relations shrink the family without committing values, which is what
    makes the ~22-dimensional relphase toffoli-5 family tractable."""
    spent = [0]
    scans = [10]

    def finish_rigid(params, specs, groups):
        """No gauge freedom left: every group value is pinned by the
        equations. Identify each against the families; mint new named
        constants (register_dynamic_constant) for the rest. Returns
        (params, specs) or None."""
        vals = _group_x(params, groups)
        child = list(specs)
        trial = params.copy()
        for g, members in enumerate(groups):
            h = identify(vals[g])
            if h is None:
                nm = (register_dynamic_constant(vals[g])
                      if allow_mint else None)
                if nm is None:
                    return None
                if verbose:
                    print(f'  new constant {nm}: a{members[0][0]} = '
                          f'{vals[g]:.15f}, tan poly '
                          f'{DYNAMIC_POLY[nm][0]}', flush=True)
                h = identify(vals[g])
                if h is None:
                    return None
            for i, s, k2 in members:
                child[i] = derive_spec(h, s, k2)
                trial[i] = spec_value(child[i])
        r = np.asarray(fns[0](jnp.asarray(trial)))
        if float(np.sum(r ** 2)) / d >= accept:
            return None
        return trial, child

    def dfs(params, specs, groups):
        if not groups:
            return params, specs
        null_dim, part = null_dim_groups(fns, params, groups)
        if null_dim == 0:
            res = finish_rigid(params, specs, groups)
            if res is not None or verbose is False:
                return res
            print('  rigid point failed identification; backtrack',
                  flush=True)
            return None
        # pin only gauge-participating groups: rigid groups are determined
        # by the others and resolve for free once the family is killed.
        # On the LAST gauge dimension, enumerate hypotheses by scanning
        # the whole one-dimensional loop instead of a local window.
        if null_dim == 1 and len(groups) > 1 and scans[0] > 0:
            scans[0] -= 1
            spent[0] += 20
            ranked = [(dist, dist, g, h, base) for dist, g, h, base in
                      scan_last_dim(fns, d, params, groups, part,
                                    accept=accept, verbose=verbose)]
        else:
            vals = _group_x(params, groups)
            ranked = []
            for g in range(len(groups)):
                if part[g] <= 1e-6:
                    continue
                for key, dist, h in hypotheses(vals[g]):
                    ranked.append((key, dist, g, h, None))
            ranked.sort(key=lambda t: t[0])
        for _, dist, g, h, base in ranked:
            if spent[0] >= budget:
                return None
            spent[0] += 1
            trial = (base if base is not None else params).copy()
            v = spec_value(h)
            for i, s, k2 in groups[g]:
                trial[i] = s * v + k2 * (math.pi / 2)
            rest = groups[:g] + groups[g + 1:]
            if rest:
                trial, loss = gauss_newton_groups(fns, trial, rest,
                                                  iters=gn_iters)
            else:
                r = np.asarray(fns[0](jnp.asarray(trial)))
                loss = float(np.sum(r ** 2))
            if loss / d >= accept:
                continue
            child = list(specs)
            for i, s, k2 in groups[g]:
                child[i] = derive_spec(h, s, k2)
                trial[i] = spec_value(child[i])
            if verbose:
                rep = groups[g][0][0]
                done = len(child) - child.count(None)
                print(f'  pin a{rep}={h} (off {dist:.1e}, {len(groups[g])} '
                      f'tied, gauge dim {null_dim}) -> '
                      f'{done}/{len(child)} loss={loss / d:.3e}',
                      flush=True)
            trial, rest = try_ties(fns, d, trial, rest, accept=accept,
                                   gn_iters=gn_iters, verbose=verbose)
            res = dfs(trial, child, rest)
            if res is not None:
                return res
            if verbose:
                print(f'  backtrack a{groups[g][0][0]}={h}', flush=True)
        return None

    free = [i for i in range(len(specs)) if specs[i] is None]
    groups = [[(i, 1, 0)] for i in free]
    params, groups = try_ties(fns, d, params, groups, accept=accept,
                              gn_iters=gn_iters, verbose=verbose)
    res = dfs(params, specs, groups)
    return res if res is not None else (params, specs)


# ---------------------------------------------------------------------------
# the pin-and-reconverge driver
# ---------------------------------------------------------------------------

def search(label, rounds=8, gn_iters=25, id_tol=1e-9, verbose=True,
           budget=500):
    """Iteratively identify/pin/reconverge. Returns dict with specs
    (None where unidentified) and the final losses."""
    qc, meta, target = reduced_artifact(label)
    meta['label'] = label
    resid, n_par, d = residual_fn(qc, target, meta['loss_kind'])
    fns = compile_resid(resid)
    params = np.array(qc.parameters, dtype=float)
    specs = [None] * n_par

    for rnd in range(rounds):
        free = [i for i in range(n_par) if specs[i] is None]
        if not free:
            break
        params, loss = gauss_newton(fns, params, free, iters=gn_iters)
        # only commit identifications of RIGID coordinates: the greedy
        # reducer PARKS gauge coordinates exactly at rationals (its whole
        # job is snapping angles), and Gauss-Newton's minimal-norm steps
        # never move along null directions — so a family value is no
        # evidence a gauge coordinate belongs there. Gauge coordinates are
        # resolved by the backtrackable DFS (their parked values rank
        # first as distance-zero hypotheses anyway).
        rep = null_space_report(fns, params, specs)
        if verbose:
            print(f'round {rnd}: loss={loss / d:.3e} free={len(free)} '
                  f'gauge_dim={rep["null_dim"]}', flush=True)
        newly = 0
        for i in rep['rigid']:
            s = identify(params[i], tol=id_tol)
            if s is not None:
                specs[i] = s
                params[i] = spec_value(s)
                newly += 1
        if verbose:
            print(f'  identified {newly} '
                  f'({n_par - specs.count(None)}/{n_par} total)', flush=True)
        if newly == 0:
            break

    if None in specs:
        # pass 1 without minting new constants (canonical forms are both
        # prettier and provable over smaller rings); mint only when the
        # known families cannot close the row at all
        p1, s1 = gauge_resolve(fns, d, params.copy(), list(specs),
                               gn_iters=gn_iters, verbose=verbose,
                               budget=budget, allow_mint=False)
        if None not in s1:
            params, specs = p1, s1
        else:
            if verbose:
                print('mint-free pass failed; retrying with new-constant '
                      'minting', flush=True)
            params, specs = gauge_resolve(fns, d, params, specs,
                                          gn_iters=gn_iters,
                                          budget=budget, verbose=verbose)

    out = {'label': label, 'n_angles': n_par, 'specs': specs,
           'unidentified': [i for i in range(n_par) if specs[i] is None],
           'residual_params': params.tolist(),
           'f64_loss': None, 'mp_loss_50dig': None}
    r = np.asarray(fns[0](jnp.asarray(params)))
    out['f64_loss'] = float(np.sum(r ** 2)) / d
    if not out['unidentified']:
        out['mp_loss_50dig'] = float(mp_verify(qc, specs, meta))
    return out


if __name__ == '__main__':
    lbl = sys.argv[1] if len(sys.argv) > 1 else 'relphase_toff4_chain'
    res = search(lbl)
    print(json.dumps(res))
