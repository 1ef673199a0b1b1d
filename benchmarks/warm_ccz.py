"""README-CCZ wall-clock, in-process warm: run the workload three times in
one process so the 2nd/3rd runs reuse live compiled executables — isolating
the pipeline's own wall time from remote-compile/cache-load and tunnel
round-trip variance (the BASELINE north star is '8-CZ CCZ in <10 s on one
v5e chip'; through the axon tunnel every device dispatch costs ~1-2 s RTT).

Usage: python -u -m benchmarks.warm_ccz
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

    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.ops.gates import u_ccz3
    from cpflow_tpu.topology import chain_layer

    walls = []
    for i in range(3):
        t0 = time.time()
        s = Synthesize(chain_layer(3), target_unitary=u_ccz3,
                       label=f'warm_ccz_{i}')
        options = StaticOptions(num_cp_gates=12, num_samples=10,
                                accepted_num_cz_gates=8, random_seed=i)
        results = s.static(options, save_results=False, verbose=False)
        wall = time.time() - t0
        best = min((d.cz_count for d in results.decompositions), default=None)
        walls.append(round(wall, 1))
        print(json.dumps({'run': i, 'wall_s': round(wall, 1),
                          'best_cz': best}), flush=True)
    print(json.dumps({'config': 'warm_ccz', 'walls_s': walls,
                      'warm_best_s': min(walls[1:]),
                      'backend': jax.default_backend()}), flush=True)


if __name__ == '__main__':
    main()
