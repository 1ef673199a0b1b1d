"""Full-budget reference-tutorial run on the real TPU (VERDICT r3 item 7).

tests/test_reference_notebooks.py executes the REFERENCE's tutorial against
the cpflow shim with smoke-shrunk budgets (right call for the 1-core CI
tier); this script runs the tutorial's pipeline stages at their ORIGINAL
budgets — including every "uncomment to reproduce locally" line the
notebook itself ships commented out — once, on the real chip, recording
wall-clock and outcomes. Cell indices refer to the code cells of
/root/reference/tutorial/CPFlow_tutorial.ipynb; option values are quoted
verbatim from those cells.

Usage: python -u -m benchmarks.full_notebook_run
Writes benchmarks/results/full_notebook_run.json (one entry per stage).
CPFLOW_NB_RESUME=1 skips stages already recorded there (the stage list
is append-only and stage names are stable), so a crashed run — e.g. the
cell-26 eager-custom-loss crash fixed in RESULTS_r4 section 6 — resumes
from the first missing cell instead of repaying the ~24 min of cells
6-18.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, 'results', 'full_notebook_run.json')


def main():
    from benchmarks.configs import _setup_jax
    _setup_jax()
    import jax.numpy as jnp

    # the notebook's `from cpflow import *` surface (the shim)
    from cpflow import (AdaptiveOptions, Results, StaticOptions, Synthesize)
    from cpflow_tpu.ops.gates import u_toff3, u_toff4

    import tempfile
    os.chdir(tempfile.mkdtemp())
    os.makedirs('results', exist_ok=True)

    stages = []
    if os.environ.get('CPFLOW_NB_RESUME') and os.path.exists(_OUT):
        with open(_OUT) as f:
            stages = json.load(f)
        print(f'[resume] {len(stages)} stages already recorded', flush=True)
    done = {s['stage'] for s in stages}

    def recorded(name):
        return next(s for s in stages if s['stage'] == name)

    def record(name, t0, results, extra=None):
        wall = time.time() - t0
        counts = sorted(d.cz_count for d in results.decompositions)
        entry = {'stage': name, 'wall_s': round(wall, 1),
                 'num_decompositions': len(results.decompositions),
                 'best_cz': counts[0] if counts else None,
                 'cz_counts': counts[:12],
                 'best_loss': min((float(d.loss)
                                   for d in results.decompositions),
                                  default=None)}
        if extra:
            entry.update(extra)
        stages.append(entry)
        print(json.dumps(entry), flush=True)
        _dump()
        return entry

    def _dump():
        os.makedirs(os.path.dirname(_OUT), exist_ok=True)
        with open(_OUT, 'w') as f:
            json.dump(stages, f, indent=1)

    # ---- cell 6-7: toff3_chain static (num_samples=4) + cell 10 refine
    if 'cell6 toff3_chain static (4 samples)' not in done:
        t0 = time.time()
        dec = Synthesize([[0, 1], [1, 2]], target_unitary=u_toff3,
                         label='toff3_chain')
        opts = StaticOptions(num_cp_gates=14, r=0.00055,
                             accepted_num_cz_gates=20, num_samples=4)
        results = dec.static(opts, verbose=False)
        d = results.decompositions[0] if results.decompositions else None
        refined = d.refine() if d is not None else 'no decomposition'
        record('cell6 toff3_chain static (4 samples)', t0, results,
               {'refine': str(refined)})

    # ---- cells 15-16: toff4_star adaptive, 500 samples x 5 evals
    dec4 = Synthesize([[0, 1], [0, 2], [0, 3]], target_unitary=u_toff4,
                      label='toff4_star')
    opts4 = AdaptiveOptions(min_num_cp_gates=10, max_num_cp_gates=30,
                            r_mean=0.0005, r_variance=0.5,
                            num_samples=500, max_evals=5)
    if 'cell16 toff4_star adaptive (500x5)' not in done:
        t0 = time.time()
        results = dec4.adaptive(opts4, verbose=False)
        record('cell16 toff4_star adaptive (500x5)', t0, results,
               {'evals': len(results.trials.results)})

    # ---- cell 18: the notebook's commented-out 50-eval reproduction
    if 'cell18 toff4_star adaptive (500x50 reproduce)' not in done:
        t0 = time.time()
        opts4.max_evals = 50
        results = dec4.adaptive(opts4, verbose=False)
        record('cell18 toff4_star adaptive (500x50 reproduce)', t0, results,
               {'evals': len(results.trials.results)})

    # ---- cell 24-26: GHZ custom-loss adaptive (default budgets)
    if 'cell26 GHZ custom loss adaptive' not in done:
        t0 = time.time()
        ghz = np.zeros(16, dtype=np.complex64)
        ghz[0] = ghz[15] = 1 / np.sqrt(2)
        psi0 = np.zeros(16, dtype=np.complex64)
        psi0[0] = 1.0
        custom_loss = lambda u: 1 - jnp.abs(ghz.conj() @ u @ psi0) ** 2  # noqa
        decg = Synthesize([[0, 1], [1, 2], [2, 3]],
                          unitary_loss_func=custom_loss,
                          label='GHZ_4q_linear')
        optsg = AdaptiveOptions(min_num_cp_gates=0, max_num_cp_gates=10,
                                target_num_cz_gates=3,
                                stop_if_target_reached=True)
        results = decg.adaptive(optsg, verbose=False)
        record('cell26 GHZ custom loss adaptive', t0, results,
               {'evals': len(results.trials.results)})

    # ---- cells 28-30: relative-phase toffoli custom loss
    if 'cell29 relphase toff3 adaptive' not in done:
        t0 = time.time()
        u3 = np.asarray(u_toff3)
        custom_rel = lambda u: 1 - (jnp.abs(u3.conj() * u) ** 2).sum() / 2 ** 3  # noqa
        decr = Synthesize([[0, 1], [1, 2], [0, 2]],
                          unitary_loss_func=custom_rel,
                          label='relative_toff3_connected')
        optsr = AdaptiveOptions(min_num_cp_gates=0, max_num_cp_gates=10,
                                target_num_cz_gates=3,
                                stop_if_target_reached=True)
        results = decr.adaptive(optsr, verbose=False)
        d = results.decompositions[-1] if results.decompositions else None
        refined = d.refine() if d is not None else 'no decomposition'
        record('cell29 relphase toff3 adaptive', t0, results,
               {'evals': len(results.trials.results), 'refine': str(refined)})

    # ---- cell 31: toff3_chain adaptive 50 evals (the notebook's own
    # "uncomment to reproduce locally" line)
    dec3 = Synthesize([[0, 1], [1, 2]], target_unitary=u_toff3,
                      label='toff3_chain_adaptive')
    if 'cell31 toff3_chain adaptive (100x50 reproduce)' not in done:
        t0 = time.time()
        opts3 = AdaptiveOptions(min_num_cp_gates=10, max_num_cp_gates=20,
                                max_evals=50)
        results = dec3.adaptive(opts3, verbose=False)
        best_k, best_r = results.best_hyperparameters()[0]
        record('cell31 toff3_chain adaptive (100x50 reproduce)', t0, results,
               {'evals': len(results.trials.results),
                'best_hyperparameters': [int(best_k), float(best_r)]})
    else:
        best_k, best_r = recorded(
            'cell31 toff3_chain adaptive (100x50 reproduce)'
        )['best_hyperparameters']

    # ---- cell 33: static at the best hyperparameters, 50 samples,
    # accepted=inf, refine every decomposition ("takes about 15 minutes"
    # in the reference)
    if 'cell33 toff3_chain static@best (50 samples) + refine all' not in done:
        t0 = time.time()
        opts_final = StaticOptions(
            num_cp_gates=int(best_k), r=float(best_r), num_samples=50,
            accepted_num_cz_gates=np.iinfo(np.int32).max)
        results = dec3.static(opts_final, verbose=False)
        n_ref = 0
        for d in results.decompositions:
            try:
                d.refine()
                n_ref += 1
            except Exception as e:  # noqa: BLE001 — rollback is graceful
                print(f'refine failed: {e}', flush=True)
        t_depths = [d.t_depth for d in results.decompositions
                    if getattr(d, 't_depth', None) is not None]
        record('cell33 toff3_chain static@best (50 samples) + refine all',
               t0, results, {'refined': n_ref,
                             'best_t_depth':
                                 min(t_depths) if t_depths else None})

    print(json.dumps({'total_wall_s':
                      round(sum(s['wall_s'] for s in stages), 1)}))


if __name__ == '__main__':
    main()
