"""Warm-started direct 6q synthesis (VERDICT r4 item 4): seed the fused
raw stage from a KNOWN-GOOD 6q circuit instead of PRNG draws.

Protocol
--------
The direct 6q hunt has never produced a raw sample below entry_loss (460+
evals, RESULTS_r4 §13/§21: floor ~6.6e-3, two orders above entry). But the
repo has verified 6q circuits — the composite constructions. This driver:

1. loads a committed composite artifact (default the 68-CZ
   toffoli6_connected_composite), converts it EXACTLY into cp-ansatz form
   (circuits/to_ansatz.py: placements = its cz sequence, angles in the
   split_angles layout) — a zero-loss point of the 6q landscape;
2. builds a warm batch: one exact row, warm rows with graded Gaussian
   noise on the rotation angles (sigma ladder 3e-3..0.3; cp angles get
   sigma/3 — they sit at the cz value pi and the penalty must stay able
   to pull them DOWN), plus 25% fully random rows as the control arm;
3. drives the bucketed stage executable directly (api._staged_run's
   underlying fn) so the penalty weight r is a RUNTIME argument: one
   compile serves the whole r sweep. Each r gets `segments` chained
   dispatches of `iters` Adam steps (the 6q dispatch-depth wall is 4000
   iters — CLAUDE.md; chaining is the safe depth lever);
4. candidates with loss < entry_loss go through the standard verification
   stage (threshold snap + masked re-descent). Success = any verified 6q
   decomposition; the prize = one with cz_count < the source's 68.

Env: CPFLOW_BATCH (256), CPFLOW_ITERS (2000), CPFLOW_SEGMENTS (4),
CPFLOW_RS ('0.0001,0.0003,0.001,0.003'), CPFLOW_SOURCE (artifact label),
CPFLOW_SEED (0).

Usage: python -u -m benchmarks.warmstart6q   (real TPU; ~1 compile +
len(rs) x segments dispatches)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')


def load_artifact_circuit(label):
    from cpflow_tpu.circuits.ir import Circuit
    meta = json.load(open(os.path.join(_ART, f'{label}.json')))
    qc = Circuit(meta['num_qubits'])
    for r in meta['instructions']:
        qc.append(r['name'], tuple(r['qubits']), r.get('param'))
    return qc, meta


def build_warm_batch(angles, cp_mask, batch, seed):
    """(batch, P) f32: row 0 exact, 75% noisy-warm on a sigma ladder,
    25% random controls."""
    rng = np.random.default_rng(seed)
    P = angles.shape[0]
    rot_mask = 1.0 - cp_mask
    n_warm = max(1, (3 * batch) // 4)
    sigmas = np.array([0.003, 0.01, 0.03, 0.1, 0.3])
    out = np.empty((batch, P), dtype=np.float32)
    sig_of_row = np.zeros(batch, dtype=np.float64)
    for b in range(n_warm):
        # row 0 exact; Adam is deterministic per row, so never duplicate it
        s = sigmas[(b - 1) % len(sigmas)] if b else 0.0
        noise = rng.normal(0.0, 1.0, P) * (s * rot_mask + (s / 3) * cp_mask)
        out[b] = angles + noise
        sig_of_row[b] = s
    # control arm: the standard random init (uniform rotations, uniform cp)
    for b in range(n_warm, batch):
        out[b] = rng.uniform(0.0, 2 * np.pi, P)
        sig_of_row[b] = -1.0
    return out, sig_of_row


def build_ablate_batch(angles, cp_indices, batch, seed, sigma=0.01,
                       offset=0):
    """Leave-out scan: row j zeroes the CP angle of block offset+j (first
    min(k, batch) rows), remaining rows zero a random PAIR of blocks, all
    with light rotation noise. If a nearby solution without that block
    exists, gradient descent + the penalty keep the zeroed CP near 0 and
    the row verifies at a LOWER cz count — a structured probe the
    sigma-ladder warm start (which never left the 68-CZ basin) cannot
    make. `offset` (CPFLOW_DROP_OFFSET) windows the single-drop scan when
    k > batch (the 7q toffoli-7 embedding has k=144 while the VMEM guard
    caps the 7q batch at 64): runs at offsets 0/64/128 cover every block
    with one shared compiled executable."""
    rng = np.random.default_rng(seed + 1)
    P = angles.shape[0]
    k = len(cp_indices)
    out = np.empty((batch, P), dtype=np.float32)
    drop_of_row = []
    for b in range(batch):
        row = angles + rng.normal(0.0, sigma, P).astype(np.float32)
        if b < k:
            drops = [(b + offset) % k]
        else:
            drops = sorted(rng.choice(k, size=2, replace=False).tolist())
        for d in drops:
            row[cp_indices[d]] = 0.0
        out[b] = row
        drop_of_row.append(drops)
    return out, drop_of_row


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

    from cpflow_tpu import AdaptiveOptions, LossSpec, Synthesize
    from cpflow_tpu.circuits.to_ansatz import circuit_to_ansatz

    label = os.environ.get('CPFLOW_SOURCE', 'toffoli6_connected_composite')
    batch = int(os.environ.get('CPFLOW_BATCH', 256))
    iters = int(os.environ.get('CPFLOW_ITERS', 2000))
    segments = int(os.environ.get('CPFLOW_SEGMENTS', 4))
    seed = int(os.environ.get('CPFLOW_SEED', 0))
    rs = [float(x) for x in os.environ.get(
        'CPFLOW_RS', '0.0001,0.0003,0.001,0.003').split(',')]

    qc, meta = load_artifact_circuit(label)
    n = qc.num_qubits
    placements, warm_angles = circuit_to_ansatz(qc)
    # A wire no entangler touches (qx_aj-e11_165: qubit 4) would make the
    # ansatz infer fewer qubits than the target. Pad with an identity
    # block (zero rotations, cp=0 — snapped away at verification) so the
    # template spans all n wires; it also gives the scan a free slot.
    covered = {w for p in placements for w in p}
    for w in range(n):
        if w not in covered:
            placements.append((w, (w + 1) % n) if w + 1 < n
                              else ((w - 1), w))
            warm_angles = np.concatenate([warm_angles, np.zeros(7)])
    k = len(placements)
    # the artifact's own target and loss kind (targets.npz is the durable
    # record tests/test_artifacts.py re-verifies against)
    target = dict(np.load(os.path.join(_ART, 'targets.npz')))[label]
    if meta.get('loss_kind') == 'modulo_diagonal':
        spec = LossSpec('modulo_diagonal', target=target, num_qubits=n,
                        wires=meta['wires'])
    else:
        spec = LossSpec('hst', target=target)

    s = Synthesize(placements, unitary_loss_func=spec,
                   label=f'{label}_warmstart')
    options = AdaptiveOptions(min_num_cp_gates=k, max_num_cp_gates=k,
                              num_samples=batch, num_gd_iterations=iters,
                              bucketed=True, random_seed=seed)
    fn, anz = s._bucketed_stage(options)
    assert anz.num_angles == warm_angles.shape[0], \
        (anz.num_angles, warm_angles.shape)

    # sanity: the embedded circuit must reproduce the artifact's loss scale
    host_loss = float(s.unitary_loss_func.numpy(
        np.asarray(qc.unitary(), dtype=np.complex64)))
    print(json.dumps({'source': label, 'source_cz': meta['cz_count'],
                      'k': k, 'num_angles': int(anz.num_angles),
                      'host_loss_of_source': host_loss}), flush=True)

    cp_mask = np.asarray(anz.cp_mask, dtype=np.float64)
    mode = os.environ.get('CPFLOW_MODE', 'warm')
    if mode == 'ablate':
        from cpflow_tpu.sim.ansatz_kernel import cp_angle_indices
        cp_idx = cp_angle_indices(n, anz.num_block_angles, anz.num_blocks)
        warm_batch, drop_of_row = build_ablate_batch(
            warm_angles.astype(np.float32), cp_idx, batch, seed,
            sigma=float(os.environ.get('CPFLOW_ABLATE_SIGMA', 0.01)),
            offset=int(os.environ.get('CPFLOW_DROP_OFFSET', 0)))
        sig_of_row = np.zeros(batch)  # every row is a warm probe
    else:
        warm_batch, sig_of_row = build_warm_batch(
            warm_angles.astype(np.float32), cp_mask, batch, seed)
        drop_of_row = None
    active = np.ones(anz.num_angles, dtype=np.float32)

    import jax.numpy as jnp
    best_rows = []
    for r in rs:
        t0 = time.time()
        params = jnp.asarray(warm_batch)
        cz = loss = None
        for seg in range(segments):
            cz, loss, params = fn(seed, jnp.float32(r),
                                  jnp.asarray(active), params,
                                  jnp.float32(1.0))
        cz = np.asarray(cz)
        loss = np.asarray(loss)
        angles = np.asarray(params)
        order = np.argsort(loss)
        top = [{'cz': int(cz[i]), 'loss': float(loss[i]),
                **({'drops': drop_of_row[i]} if drop_of_row is not None
                   else {'sigma': float(sig_of_row[i])})}
               for i in order[:6]]
        if drop_of_row is not None:
            # the scan's real signal: the best sub-k rows
            sub = [i for i in order if cz[i] < k][:6]
            top += [{'cz': int(cz[i]), 'loss': float(loss[i]),
                     'drops': drop_of_row[i]} for i in sub]
        # per-arm minima: did ANY random-control row reach entry?
        warm_sel = sig_of_row >= 0
        row = {'r': r, 'wall_s': round(time.time() - t0, 1),
               'min_loss_warm': float(loss[warm_sel].min()),
               'min_loss_random': float(loss[~warm_sel].min())
               if (~warm_sel).any() else None,
               'n_entry': int((loss < options.entry_loss).sum()),
               'best': top}
        print(json.dumps(row), flush=True)
        best_rows.append((r, cz, loss, angles))

    # verification of everything at entry, across all r runs
    from cpflow_tpu.optimize import candidates as cand
    seen = []
    for r, cz, loss, angles in best_rows:
        sel = np.nonzero(loss < options.entry_loss)[0]
        # verify the best per distinct cz count to bound dispatches
        bycz = {}
        for i in sel:
            c = int(cz[i])
            if c not in bycz or loss[i] < loss[bycz[c]]:
                bycz[c] = i
        for c, i in sorted(bycz.items()):
            seen.append((r, c, angles[i]))
    if not seen:
        print(json.dumps({'verified': 0,
                          'note': 'no candidate reached entry_loss'}),
              flush=True)
        return

    ver_angles = np.stack([a for _, _, a in seen])
    ver = s._verify(anz, ver_angles, options)
    results = []
    for pos, (r, c_raw, _) in enumerate(seen):
        if not ver.success[pos]:
            results.append({'r': r, 'raw_cz': c_raw, 'verified': False})
            continue
        d = s._make_decomposition(anz, ver.best_angles[pos])
        results.append({'r': r, 'raw_cz': c_raw, 'verified': True,
                        'cz_count': int(d.cz_count),
                        'loss': float(d.loss)})
        if d.cz_count < meta['cz_count']:
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'results', f'{label}_warmstart_{d.cz_count}')
            from cpflow_tpu.api import Results
            res = Results(s.unitary_loss_func, placements,
                          label=f'{label}_warmstart')
            res.save_to = out
            res.decompositions = [d]
            res.save()
            print(json.dumps({'saved': out, 'cz_count': int(d.cz_count)}),
                  flush=True)
    print(json.dumps({'config': 'warmstart6q', 'source': label,
                      'source_cz': meta['cz_count'],
                      'verified_rows': results}), flush=True)


if __name__ == '__main__':
    main()
