"""Success-ratio experiments (reference paper Table 3 / peppar.ipynb
cells 53-54, 78-79): fraction of random restarts that converge below 1e-4
when learning a target unitary on a FIXED 'cz' architecture.

The architecture is the paper's: the ordered CZ placements OF A FOUND
DECOMPOSITION (peppar: `placements = {'free': get_placements(d.circuit)};
Ansatz(4, 'cz', placements, rotation_gates=...)`), i.e. the success ratio
measures how often direct gradient descent rediscovers a known-good
circuit structure — NOT a tiled fill_layers template (on which ratios are
~0; measured). Criterion loss < 1e-4, Adam lr=0.1, 5000 iterations, as in
the notebook.

Usage: python -m benchmarks.success_ratio [num_samples] [num_iterations]
Requires benchmarks/results/{toffoli4_connected,toffoli4_star} (run
`python -m benchmarks.configs toffoli4_connected toffoli4_star` first);
their best decompositions provide the architectures.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'results')


def cz_placements_of(label: str, results_dir: str = None):
    """Ordered CZ placements of the best stored decomposition (the paper's
    get_placements(d.circuit)). With CPFLOW_SR_SOURCE=reference, main()
    points results_dir at the REFERENCE's own stored experiments
    (/root/reference/paper/results, loaded through the migration fallback)
    so the measured architecture is EXACTLY the paper's — round-2's star
    rows were measured on OUR 16-CZ star decomposition, whose placements
    differ from the paper's and with them the basin statistics."""
    from cpflow_tpu.api import Results
    res = Results.load(os.path.join(results_dir or _RESULTS, label))
    best = min(res.decompositions, key=lambda d: (d.cz_count, d.loss))
    return [tuple(inst.qubits) for inst in best.circuit.instructions
            if inst.name == 'cz']


def success_ratio(free_placements, rotation_gates, u_target,
                  num_samples=500, num_iterations=5000, target_loss=1e-4,
                  seed=0):
    """Fraction of restarts reaching target_loss on the fixed architecture
    {'free': free_placements} of 'cz' blocks (peppar success-ratio cells)."""
    import jax
    import jax.numpy as jnp
    from cpflow_tpu import Ansatz, LossSpec
    from cpflow_tpu.optimize import candidates as cand
    from cpflow_tpu.optimize.engine import minimize_fused
    from cpflow_tpu.sim import batched as batched_sim

    n = max(max(p) for p in free_placements) + 1
    placements = {'free': [list(p) for p in free_placements],
                  'layers': ([], 0)}
    anz = Ansatz(n, 'cz', placements, rotation_gates)
    regloss_fn = batched_sim.make_batched_regloss(
        n, 'cz', rotation_gates, anz.placements,
        LossSpec('hst', target=np.asarray(u_target)), reversible=True)

    key = jax.random.PRNGKey(seed)
    mask = jnp.zeros(anz.num_angles, dtype=jnp.float32)
    inits = cand.generate_initial_angles_batch(key, anz.num_angles, mask,
                                               'uniform', num_samples)
    raw = minimize_fused(regloss_fn, inits, learning_rate=0.1,
                         num_iterations=num_iterations)
    best = np.asarray(raw.regloss[:, 1])
    return float((best < target_loss).mean()), best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from cpflow_tpu.ops.gates import u_toff4

    num_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    num_iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    # paper Table 3: toff4 architectures at the per-topology optimal counts
    source = os.environ.get('CPFLOW_SR_SOURCE', 'ours')
    if source == 'reference':
        results_dir = '/root/reference/paper/results'
        cases = [
            ('connected', 'toff4_conn_xyz', 'xyz', 0.6e-2),
            ('connected', 'toff4_conn_xyz', 'xz', 7.8e-2),
            ('star', 'toff4_star_xyz', 'xyz', 0.4e-2),
            ('star', 'toff4_star_xyz', 'xz', 0.2e-2),
        ]
    else:
        results_dir = None
        cases = [
            ('connected', 'toffoli4_connected', 'xyz', 0.6e-2),
            ('connected', 'toffoli4_connected', 'xz', 7.8e-2),
            ('star', 'toffoli4_star', 'xyz', 0.4e-2),
            ('star', 'toffoli4_star', 'xz', 0.2e-2),
        ]
    only = os.environ.get('CPFLOW_SR_ONLY')  # e.g. 'star'
    for name, label, rot, reference in cases:
        if only and name != only:
            continue
        try:
            placements = cz_placements_of(label, results_dir)
        except FileNotFoundError:
            print(json.dumps({'topology': name, 'rotation_gates': rot,
                              'skipped': f'no stored results for {label}'}),
                  flush=True)
            continue
        ratio, _ = success_ratio(placements, rot, u_toff4,
                                 num_samples=num_samples,
                                 num_iterations=num_iterations)
        print(json.dumps({'topology': name, 'num_cz': len(placements),
                          'rotation_gates': rot, 'success_ratio': ratio,
                          'reference_ratio': reference,
                          'num_samples': num_samples,
                          'architecture_source': source}), flush=True)


if __name__ == '__main__':
    main()
