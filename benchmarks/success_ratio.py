"""Success-ratio experiments (reference paper Table 3 / peppar.ipynb):
fraction of random restarts that converge below the target loss when learning
a target unitary with a FIXED 'cz' architecture.

Usage: python -m benchmarks.success_ratio [num_samples] [num_iterations]
Prints one JSON line per (topology, rotation_gates) combination for the
4q Toffoli, mirroring the paper's Table 3 (connected/star x XYZ/XZ).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def success_ratio(layer, num_cz_gates, rotation_gates, u_target,
                  num_samples=500, num_iterations=2000, target_loss=1e-6,
                  seed=0):
    import jax
    import jax.numpy as jnp
    from cpflow_tpu import Ansatz, LossSpec
    from cpflow_tpu.topology import fill_layers
    from cpflow_tpu.optimize import candidates as cand
    from cpflow_tpu.optimize.engine import minimize_fused
    from cpflow_tpu.sim import batched as batched_sim

    anz = Ansatz(max(max(p) for p in layer) + 1, 'cz',
                 fill_layers(layer, num_cz_gates), rotation_gates)
    regloss_fn = batched_sim.make_batched_regloss(
        anz.num_qubits, 'cz', rotation_gates, anz.placements,
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
    from cpflow_tpu.topology import connected_layer, star_layer

    num_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    num_iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    # paper Table 3: toff4 at the per-topology optimal CZ counts
    cases = [
        ('connected', connected_layer(4), 14, 'xyz', 0.6e-2),
        ('connected', connected_layer(4), 14, 'xz', 7.8e-2),
        ('star', star_layer(4), 16, 'xyz', 0.4e-2),
        ('star', star_layer(4), 16, 'xz', 0.2e-2),
    ]
    for name, layer, k, rot, reference in cases:
        ratio, _ = success_ratio(layer, k, rot, u_toff4,
                                 num_samples=num_samples,
                                 num_iterations=num_iterations)
        print(json.dumps({'topology': name, 'num_cz': k,
                          'rotation_gates': rot, 'success_ratio': ratio,
                          'reference_ratio': reference,
                          'num_samples': num_samples}), flush=True)


if __name__ == '__main__':
    main()
