"""Targeted extended re-verification of located prospective decompositions.

Round-3 hunts recorded trials whose CHEAP evaluation stage projected to a
record CZ count but whose standard verification (5000 Adam iters at f32,
CP angles frozen at the 0.2-threshold projection) never reached the 1e-6
criterion (VERDICT r3 item 1: a prospective 34-CZ direct toffoli-5 and a
prospective 43-CX one-two-three-v1_99 sit in the committed TPE summaries).

Trials store (random_seed, num_cp_gates, r); the bucketed adaptive stage is
a deterministic function of those plus the config's static hyperparameters
(api.py Synthesize._bucketed_stage), so the exact restart batch that
produced a prospective can be reproduced in ONE device dispatch and the
candidates pushed far past the standard verification budget:

  stage re-run -> extended f32 verify (CPFLOW_REVERIFY_ITERS, two lr
  stages) -> decompositions built for the top candidates EVEN IF
  unconverged -> saved to benchmarks/results/reverify_<lead> for the
  host-side f64 polish (`--polish`, CPU-pinned, complex128 through the
  circuit tracer) which resolves whether the failure was an f32 floor or
  a genuinely non-convergent basin.

Usage:
  python -m benchmarks.reverify <lead>            # TPU: stage + verify
  python -m benchmarks.reverify <lead> --polish   # host CPU: f64 polish
  python -m benchmarks.reverify --list
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_RESULTS = os.path.join(_HERE, 'results')
_SUMMARIES = os.path.join(_HERE, 'trial_summaries')

# Each lead pins the config hyperparameters its trial ran under (they must
# match for the seed to reproduce the batch) plus the trial's identity.
LEADS = {
    'toffoli5_record_34': {
        'label': 'toffoli5_connected_record',
        'target': 'toff5', 'topology': 'connected', 'num_qubits': 5,
        'rotation_gates': 'xz', 'min_k': 28, 'max_k': 42,
        'num_samples': 2048, 'seed': 3562768819,
        'beat_below': 36, 'expect_prospective': 34,
    },
    'v199_43': {
        'label': 'qx_one-two-three-v1_99',
        'target': 'qasm:one-two-three-v1_99', 'topology': 'connected',
        'num_qubits': 5, 'rotation_gates': 'xyz', 'min_k': 40, 'max_k': 70,
        'num_samples': 2048, 'seed': 1924185128,
        'beat_below': 46, 'expect_prospective': 43,
    },
}


def _target_unitary(spec: str):
    if spec == 'toff5':
        from cpflow_tpu.ops.gates import u_toff5
        return u_toff5
    assert spec.startswith('qasm:')
    import glob
    from cpflow_tpu.circuits.ir import Circuit
    from benchmarks.configs import _QX
    matches = glob.glob(f'{_QX}/*/{spec[5:]}.qasm')
    qc = Circuit.from_qasm_file(matches[0])
    return qc.unitary().astype(np.complex64)


def _trial_params(lead: dict):
    """(num_cp_gates, r) recovered from the committed summary by seed."""
    path = os.path.join(_SUMMARIES, f"{lead['label']}.json")
    with open(path) as f:
        d = json.load(f)
    for t in d['trials']:
        if t['random_seed'] == lead['seed']:
            return int(t['num_cp_gates']), float(t['r']), t
    raise KeyError(f"seed {lead['seed']} not in {path}")


def _synthesize_and_options(lead: dict):
    from cpflow_tpu import AdaptiveOptions, Synthesize
    from cpflow_tpu.topology import chain_layer, connected_layer
    layer = connected_layer(lead['num_qubits']) \
        if lead['topology'] == 'connected' else chain_layer(lead['num_qubits'])
    s = Synthesize(layer, target_unitary=_target_unitary(lead['target']),
                   label=f"reverify_{lead['label']}")
    options = AdaptiveOptions(
        min_num_cp_gates=lead['min_k'], max_num_cp_gates=lead['max_k'],
        num_samples=lead['num_samples'], max_evals=1, bucketed=True,
        rotation_gates=lead['rotation_gates'])
    return s, options


def rerun_stage(name: str) -> dict:
    """Reproduce the trial's restart batch and push its record candidates
    through an extended verification. TPU workload: run through the queue."""
    import jax
    import jax.numpy as jnp
    from cpflow_tpu.optimize import candidates as cand

    lead = LEADS[name]
    k, r, trial = _trial_params(lead)
    print(f"[reverify:{name}] trial seed={lead['seed']} k={k} r={r:.3e} "
          f"recorded cz_counts={sorted(trial['cz_counts'])[:8]}", flush=True)

    s, options = _synthesize_and_options(lead)
    stage, anz_max = s._staged_run(options)
    p_k = 3 * s.num_qubits + k * anz_max.num_block_angles
    active = np.zeros(anz_max.num_angles, dtype=np.float32)
    active[:p_k] = 1.0
    cz, loss, angles = stage(jnp.asarray(lead['seed'], dtype=jnp.uint32),
                             jnp.float32(r), jnp.asarray(active))
    ev = cand.EvaluatedBatch(cz=np.asarray(cz), loss=np.asarray(loss),
                             angles=np.asarray(angles)[:, :p_k])

    entry = options.entry_loss
    pros = [i for i in range(len(ev.cz))
            if ev.loss[i] < entry and int(ev.cz[i]) < lead['beat_below']]
    repro = sorted(int(ev.cz[i]) for i in pros)
    print(f"[reverify:{name}] reproduced sub-{lead['beat_below']} "
          f"prospectives: {repro}", flush=True)
    if lead['expect_prospective'] not in repro:
        print(f"[reverify:{name}] WARNING: expected prospective "
              f"{lead['expect_prospective']} did not reproduce — config "
              f"hyperparameters may have drifted since the trial", flush=True)
    if not pros:
        return {'lead': name, 'status': 'no prospectives reproduced'}

    anz = s._ansatz(options.get_static(k, r))
    iters = int(os.environ.get('CPFLOW_REVERIFY_ITERS', 30000))

    cand_angles = ev.angles[pros]
    if os.environ.get('CPFLOW_REVERIFY_ANNEAL'):
        # penalty-annealed rescue: the hard CP projection can throw a
        # low-loss candidate out of its basin (measured on the 34-CZ
        # toffoli-5 prospective: raw 6.6e-5 -> 9.6e-3 frozen). Instead
        # drive the CP angles toward {0, pi} SMOOTHLY by re-optimizing the
        # raw candidate under progressively larger penalty weights, then
        # hand the settled point to the standard projection.
        from cpflow_tpu.optimize import engine
        from cpflow_tpu.sim import batched as bt
        import jax.numpy as jnp
        cur = cand_angles
        for mult in (8.0, 32.0, 128.0):
            regloss_fn = bt.make_batched_regloss(
                s.num_qubits, 'cp', lead['rotation_gates'], anz.placements,
                s.unitary_loss_func, cp_mask=anz.cp_mask,
                regularization_func=s.cp_regularization_func,
                r=r * mult, reversible=True)

            # one jitted executable per r stage: fused_adam_sweep contains
            # eager-unfriendly complex ops (the tunnel backend only
            # executes them under jit)
            def _stage(p0, _fn=regloss_fn):
                best_p, _, best_loss = engine.fused_adam_sweep(
                    _fn, p0, learning_rate=0.003,
                    num_iterations=iters // 3)
                return best_p, best_loss
            best_p, best_loss = jax.jit(_stage)(jnp.asarray(cur.T))
            cur = np.asarray(best_p).T
            print(f"[reverify:{name}] anneal r*{mult:g}: losses "
                  f"{np.sort(np.asarray(best_loss))[:4]}", flush=True)
        cand_angles = cur

    # stage 1: standard projection, extended budget
    import dataclasses
    o1 = dataclasses.replace(options,
                             num_gd_iterations_at_verification=iters,
                             learning_rate_at_verification=0.01)
    ver = s._verify(anz, cand_angles, o1)
    # stage 2: low-lr refinement warm-started from stage 1 (projection of
    # already-snapped CP angles is idempotent, so the frozen set is stable)
    o2 = dataclasses.replace(options,
                             num_gd_iterations_at_verification=iters,
                             learning_rate_at_verification=0.001)
    ver2 = s._verify(anz, ver.best_angles, o2)

    suffix = '_anneal' if os.environ.get('CPFLOW_REVERIFY_ANNEAL') else ''
    report = []
    out_res = None
    for pos, i in enumerate(pros):
        row = {'cz_projected': int(ev.cz[i]),
               'raw_loss': float(ev.loss[i]),
               'verify_loss_lr01': float(ver.best_loss[pos]),
               'verify_loss_lr001': float(ver2.best_loss[pos]),
               'cz_verified': int(ver2.cz[pos])}
        report.append(row)
        print(f"[reverify:{name}] cand cz={row['cz_projected']} raw="
              f"{row['raw_loss']:.2e} -> {row['verify_loss_lr01']:.2e} "
              f"-> {row['verify_loss_lr001']:.2e}", flush=True)

    # persist every candidate (converged or not) for the host f64 polish
    from cpflow_tpu.api import Results
    res = Results(s.unitary_loss_func, s.layer,
                  label=f'reverify_{name}{suffix}',
                  save_to=os.path.join(_RESULTS, f'reverify_{name}{suffix}'))
    ds = []
    for pos in range(len(pros)):
        d = s._make_decomposition(anz, ver2.best_angles[pos],
                                  static_options=options.get_static(k, r))
        ds.append(d)
    res.decompositions = tuple(ds)
    res.save()

    # a candidate at the criterion already: append to the hunt's own results
    best_pos = int(np.argmin(ver2.best_loss))
    if float(ver2.best_loss[best_pos]) <= options.target_loss:
        hunt_path = os.path.join(_RESULTS, lead['label'])
        try:
            hunt = Results.load(hunt_path)
            hunt.decompositions = list(hunt.decompositions) + [ds[best_pos]]
            hunt.save()
            out_res = f"VERIFIED cz={int(ver2.cz[best_pos])} appended to " \
                      f"{lead['label']}"
        except FileNotFoundError:
            out_res = f"VERIFIED cz={int(ver2.cz[best_pos])} (hunt results " \
                      f"missing; kept in reverify_{name})"
        print(f"[reverify:{name}] {out_res}", flush=True)

    out = {'lead': name, 'k': k, 'r': r, 'anneal': bool(suffix),
           'candidates': report, 'verified': out_res}
    with open(os.path.join(_RESULTS, f'reverify_{name}{suffix}.json'),
              'w') as f:
        json.dump(out, f, indent=1)
    return out


def polish(name: str) -> dict:
    """Host f64 Adam + coordinate sweeps on every persisted candidate
    (CPU-pinned process; complex128 cannot lower on the tunnel backend)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    from cpflow_tpu.api import Results
    from cpflow_tpu.circuits.ir import ROTATION_NAMES
    from cpflow_tpu.circuits.refine import host_loss_adapter, polish_angles
    from benchmarks.polish_results import _adam_polish

    lead = LEADS[name]
    path = os.path.join(_RESULTS, f'reverify_{name}')
    if os.environ.get('CPFLOW_REVERIFY_ANNEAL') and \
            os.path.exists(path + '_anneal'):
        path += '_anneal'
    res = Results.load(path)
    loss_fn = host_loss_adapter(res.loss_function)
    rows = []
    for d in sorted(res.decompositions, key=lambda d: (d.cz_count, d.loss)):
        qc = d.circuit

        def loss_of_angles(a, qc=qc):
            it = iter(a)
            probe = qc.copy()
            for inst in probe.instructions:
                if inst.name in ROTATION_NAMES:
                    inst.param = float(next(it))
            return float(loss_fn(probe.unitary()))

        before = float(d.loss)
        polished, mid = _adam_polish(qc, res.loss_function, adam_iters=6000,
                                     lr=1e-3)
        polished = polish_angles(loss_of_angles, polished, sweeps=3)
        after = loss_of_angles(polished)
        rows.append({'cz': int(d.cz_count), 'before': before,
                     'adam': mid, 'after': after})
        print(f"[polish:{name}] cz={d.cz_count} {before:.2e} -> "
              f"{mid:.2e} -> {after:.2e}", flush=True)
        if after < before:
            it = iter(polished)
            for inst in qc.instructions:
                if inst.name in ROTATION_NAMES:
                    inst.param = float(next(it))
            d.unitary = qc.unitary()
            d.loss = after
    res.save()
    out = {'lead': name, 'polished': rows}
    with open(os.path.join(_RESULTS, f'reverify_{name}_polish.json'),
              'w') as f:
        json.dump(out, f, indent=1)
    return out


def main():
    args = [a for a in sys.argv[1:]]
    if not args or args[0] == '--list':
        for k, v in LEADS.items():
            print(k, '->', v['label'], 'expect', v['expect_prospective'])
        return
    name = args[0]
    if '--polish' in args:
        out = polish(name)
    else:
        from benchmarks.configs import _setup_jax
        _setup_jax()
        out = rerun_stage(name)
    print(json.dumps(out, default=float))


if __name__ == '__main__':
    main()
