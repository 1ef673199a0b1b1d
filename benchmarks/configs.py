"""The five benchmark configurations from BASELINE.json, runnable
individually or as a suite. Each returns a dict of results; run_all prints
a JSON line per config.

Usage:
    python -m benchmarks.configs [readme_ccz|toffoli3_refine|ghz_state|
                                  cccz_adaptive|qasm_sweep|all]

These exercise the same workloads the reference's paper used
(paper/benchmark_circuits/decompose_script.py, README.md:24-46).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return jax


def readme_ccz():
    """Config 1: CCZ on 3q chain (README example: k=12, 10 samples, static).
    Target: 8-CZ decomposition; reference wall-clock 1-5 min."""
    _setup_jax()
    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.ops.gates import u_ccz3
    from cpflow_tpu.topology import chain_layer

    t0 = time.time()
    s = Synthesize(chain_layer(3), target_unitary=u_ccz3, label='readme_ccz')
    options = StaticOptions(num_cp_gates=12, num_samples=10,
                            accepted_num_cz_gates=8)
    results = s.static(options, save_results=False, verbose=False)
    wall = time.time() - t0
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    return {'config': 'readme_ccz', 'wall_s': round(wall, 1),
            'best_cz': best_cz, 'reference_cz': 8,
            'num_found': len(results.decompositions)}


def toffoli3_refine():
    """Config 2: Toffoli on complete 3q connectivity + refine() + Clifford+T.
    Reference: 6 CZ optimal (connected), CCZ-class refinement to 7 T."""
    _setup_jax()
    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.ops.gates import u_toff3
    from cpflow_tpu.topology import connected_layer

    t0 = time.time()
    s = Synthesize(connected_layer(3), target_unitary=u_toff3,
                   label='toff3_refine')
    # paper Table 1 best hyperparameters for connected toffoli-3: k=7, r=1.31e-3
    options = StaticOptions(num_cp_gates=7, r=1.31e-3, num_samples=100,
                            accepted_num_cz_gates=6)
    results = s.static(options, save_results=False, verbose=False)
    wall = time.time() - t0

    refined = {}
    if results.decompositions:
        best = min(results.decompositions, key=lambda d: d.cz_count)
        best.refine()
        refined = {'type': best.type, 't_count': best.t_count,
                   't_depth': best.t_depth, 'loss': float(best.loss)}
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    return {'config': 'toffoli3_refine', 'wall_s': round(wall, 1),
            'best_cz': best_cz, 'reference_cz': 6, 'refined': refined}


def ghz_state():
    """Config 3: 4q GHZ state preparation (state-fidelity objective).
    GHZ_n needs n-1 CZ gates on a chain."""
    _setup_jax()
    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.topology import chain_layer

    n = 4
    ghz = np.zeros(2 ** n, dtype=np.complex64)
    ghz[0] = ghz[-1] = 1 / np.sqrt(2)

    t0 = time.time()
    s = Synthesize(chain_layer(n), target_state=ghz, label='ghz4')
    options = StaticOptions(num_cp_gates=6, num_samples=100,
                            accepted_num_cz_gates=3, r=0.001)
    results = s.static(options, save_results=False, verbose=False)
    wall = time.time() - t0
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    return {'config': 'ghz_state', 'wall_s': round(wall, 1),
            'best_cz': best_cz, 'reference_cz': 3,
            'num_found': len(results.decompositions)}


def cccz_adaptive(max_evals=10):
    """Config 4: 5q CCCCZ with the adaptive (TPE) path. Reference: 'several
    hours' for 100 evals x 1000 samples; we run a reduced eval budget by
    default (set CPFLOW_FULL=1 for the paper-scale run)."""
    _setup_jax()
    from cpflow_tpu import Synthesize, AdaptiveOptions
    from cpflow_tpu.ops.gates import multi_controlled_z
    from cpflow_tpu.topology import connected_layer

    if os.environ.get('CPFLOW_FULL'):
        max_evals, num_samples = 100, 1000
    else:
        num_samples = 256

    t0 = time.time()
    s = Synthesize(connected_layer(5), target_unitary=multi_controlled_z(5),
                   label='cccz5')
    options = AdaptiveOptions(min_num_cp_gates=20, max_num_cp_gates=60,
                              num_samples=num_samples, max_evals=max_evals,
                              bucketed=True)
    results = s.adaptive(options, save_results=False, verbose=False)
    wall = time.time() - t0
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    return {'config': 'cccz_adaptive', 'wall_s': round(wall, 1),
            'best_cz': best_cz, 'reference_cz': 36,  # toff5 connected scale
            'evals': len(results.trials.results)}


def qasm_sweep(num_samples=None, max_evals=None):
    """Config 5: paper benchmark-circuit sweep at 5q (ibm_qx set) — the
    decompose_script.py workload. Reduced budget by default."""
    jax = _setup_jax()
    from cpflow_tpu import Synthesize, AdaptiveOptions
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.topology import connected_layer, chain_layer
    import glob

    if os.environ.get('CPFLOW_FULL'):
        num_samples = num_samples or 1000
        max_evals = max_evals or 50
    else:
        num_samples = num_samples or 128
        max_evals = max_evals or 3

    tables = {
        'Table 1': connected_layer(5),
        'Table 3': chain_layer(5),
        'Table 4': connected_layer(5),
    }
    out = []
    t0 = time.time()
    base = '/root/reference/paper/benchmark_circuits'
    for table, layer in tables.items():
        files = sorted(glob.glob(f'{base}/{table}/*.qasm'))[:1]  # 1 per table
        for f in files:
            qc = Circuit.from_qasm_file(f)
            u_target = qc.unitary().astype(np.complex64)
            s = Synthesize(layer, target_unitary=u_target,
                           label=f'qasm_{os.path.basename(f)[:-5]}')
            options = AdaptiveOptions(min_num_cp_gates=20, max_num_cp_gates=60,
                                      num_samples=num_samples,
                                      max_evals=max_evals, bucketed=True)
            results = s.adaptive(options, save_results=False, verbose=False)
            best_cz = min((d.cz_count for d in results.decompositions),
                          default=None)
            out.append({'file': os.path.basename(f), 'best_cz': best_cz})
    return {'config': 'qasm_sweep', 'wall_s': round(time.time() - t0, 1),
            'results': out}


ALL = {
    'readme_ccz': readme_ccz,
    'toffoli3_refine': toffoli3_refine,
    'ghz_state': ghz_state,
    'cccz_adaptive': cccz_adaptive,
    'qasm_sweep': qasm_sweep,
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'readme_ccz'
    names = list(ALL) if which == 'all' else [which]
    for name in names:
        result = ALL[name]()
        print(json.dumps(result), flush=True)


if __name__ == '__main__':
    main()
