"""Measured evals/hour improvement of AdaptiveOptions.parallel_trials.

Runs the same bucketed adaptive search (toffoli-4 connected, the paper's
tab-toff4 workload) with parallel_trials=1 and =4 and reports wall-clock
per TPE evaluation. The win on the tunnel is dispatch amortization: each
trial dispatch pays ~1-2 s of RTT; the vmapped stage evaluates N
suggestions in one dispatch.

Usage: python -u -m benchmarks.parallel_trials_bench
Env:   CPFLOW_PT_EVALS (default 12), CPFLOW_PT_SAMPLES (default 512),
       CPFLOW_PT_SET (comma list of parallel_trials values, default "1,4"),
       CPFLOW_PT_WARMUP=1 (run one throwaway search per N first so the
       timed pass measures steady state, compiles excluded)
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cpflow_tpu import AdaptiveOptions, Synthesize
    from cpflow_tpu.ops.gates import u_toff4
    from cpflow_tpu.topology import connected_layer

    evals = int(os.environ.get('CPFLOW_PT_EVALS', 12))
    samples = int(os.environ.get('CPFLOW_PT_SAMPLES', 512))
    pt_set = [int(v) for v in
              os.environ.get('CPFLOW_PT_SET', '1,4').split(',')]
    warmup = bool(os.environ.get('CPFLOW_PT_WARMUP'))

    rows = []
    for n_par in pt_set:
        opts = AdaptiveOptions(min_num_cp_gates=10, max_num_cp_gates=25,
                               num_samples=samples, max_evals=evals,
                               random_seed=7, bucketed=True,
                               parallel_trials=n_par)
        s = Synthesize(connected_layer(4), target_unitary=u_toff4,
                       label=f'pt_bench_{n_par}')
        if warmup:
            # throwaway pass populates every executable this N needs, so
            # the timed pass below is pure steady-state dispatch
            wu = AdaptiveOptions(min_num_cp_gates=10, max_num_cp_gates=25,
                                 num_samples=samples,
                                 max_evals=max(2, n_par),
                                 random_seed=11, bucketed=True,
                                 parallel_trials=n_par)
            s.adaptive(wu, save_results=False, verbose=False)
        t0 = time.time()
        res = s.adaptive(opts, save_results=False, verbose=False)
        wall = time.time() - t0
        rows.append({'parallel_trials': n_par, 'evals': evals,
                     'wall_s': round(wall, 1),
                     's_per_eval': round(wall / evals, 2),
                     'evals_per_hour': round(3600.0 * evals / wall, 1),
                     'num_decompositions': len(res.decompositions),
                     'best_cz': min((d.cz_count for d in res.decompositions),
                                    default=None)})
        print(json.dumps(rows[-1]), flush=True)
    if len(rows) > 1:
        speedup = rows[0]['s_per_eval'] / min(r['s_per_eval']
                                              for r in rows[1:])
        print(json.dumps({'config': 'parallel_trials_bench',
                          'speedup_evals_per_hour': round(speedup, 2),
                          'warmup': warmup,
                          'backend': jax.default_backend()}), flush=True)


if __name__ == '__main__':
    main()
