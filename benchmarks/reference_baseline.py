"""Measure the ACTUAL reference implementation's restart-iterations/sec on
this host's CPU (the BASELINE.json north star is ">=100x restarts/sec vs
reference CPU").

Runs /root/reference/cpflow's own hot path, `jit(vmap(mynimize_particular))`
(optimization.py:362), on the same workload shape bench.py measures: 5q
chain, k=20 CP blocks, xyz rotations, HST loss against the 5q
multi-controlled-X, CP penalty with r=0.00055, Adam(lr=0.1),
keep_history=False (the pipeline's configuration and the cheapest one for
the reference). The jit wrapper is hoisted out of the timed region and the
steady rate taken from a second call of the SAME compiled executable —
i.e. the reference is measured exactly as its pipeline amortizes one big
compile over 1000 samples x 2000 iterations, with compile excluded
entirely (generous to the reference).

qiskit/hyperopt are stubbed exactly as in tests/golden/make_goldens.py (the
measured surface is pure jax). jit is ENABLED — the reference gets its best
shot. The steady-state rate is taken from a second invocation with fresh
inputs of the same shape (no recompile), best of CPFLOW_REF_REPEATS runs.

Usage:  python -u -m benchmarks.reference_baseline
Env:    CPFLOW_REF_BATCH (64), CPFLOW_REF_ITERS (100), CPFLOW_REF_REPEATS (3)

Prints one JSON line with the measured rate; this number feeds bench.py's
`vs_reference_cpu` field (bench.py keeps the published-figure-derived 10k/s
GPU denominator as the primary, more conservative `vs_baseline`).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', 'tests', 'golden'))
sys.path.insert(0, '/root/reference')

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

from make_goldens import install_stubs  # noqa: E402  (the golden-era stubs)


def main():
    install_stubs()

    import jax.numpy as jnp

    from cpflow.main import build_unitary  # the reference package
    from cpflow.matrix_utils import cost_HST
    from cpflow.penalty import cp_penalty_linear
    from cpflow.optimization import mynimize
    from cpflow.topology import chain_layer, fill_layers

    num_qubits = 5
    num_cp_gates = 20
    rotation_gates = 'xyz'
    batch = int(os.environ.get('CPFLOW_REF_BATCH', 64))
    iters = int(os.environ.get('CPFLOW_REF_ITERS', 100))
    repeats = int(os.environ.get('CPFLOW_REF_REPEATS', 3))

    placements = fill_layers(chain_layer(num_qubits), num_cp_gates)
    nba = 2 * len(rotation_gates) + 1
    num_angles = 3 * num_qubits + nba * num_cp_gates

    # 5q multi-controlled X, big-endian (reference gates.py builds the same
    # matrix via qiskit mct + reverse_bits)
    d = 2 ** num_qubits
    u_target = np.eye(d, dtype=np.complex64)
    u_target[d - 2:, d - 2:] = np.array([[0, 1], [1, 0]])

    def loss_func(angles):
        u = build_unitary(num_qubits, 'cp', rotation_gates, placements,
                          angles).reshape(d, d)
        return cost_HST(u, u_target)

    cp_mask = np.zeros(num_angles, dtype=np.float32)
    cp_mask[3 * num_qubits + nba - 1::nba] = 1.0
    cp_mask = jnp.array(cp_mask)
    r = 0.00055

    def regularization_func(angles):
        # reference main.py:563-564: r * sum(vmap(penalty)(angles * cp_mask))
        return r * jax.vmap(
            lambda a: cp_penalty_linear(a, np.pi / 2, 2.0, 0.05, 0.05, 0.05)
        )(angles * cp_mask).sum()

    rng = np.random.default_rng(0)

    # mynimize_repeated's exact construction (optimization.py:334-362):
    # regloss = loss + reg, pre-wrapped in value_and_grad, then
    # jit(vmap(mynimize_particular)) — hoisted here so the compiled
    # executable is reused across timed calls.
    import optax
    regloss_vg = jax.value_and_grad(
        lambda p: loss_func(p) + regularization_func(p))
    opt = optax.adam(0.1)

    def mynimize_particular(initial_params):
        return mynimize(regloss_vg, num_angles, method='adam',
                        learning_rate=0.1, opt_instance=opt,
                        initial_params=initial_params,
                        loss_is_loss_and_grad=True,
                        keep_history=False, num_iterations=iters)

    compiled = jax.jit(jax.vmap(mynimize_particular))

    def run_once(seed):
        inits = rng.uniform(0, 2 * np.pi,
                            (batch, num_angles)).astype(np.float32)
        t0 = time.time()
        _, losses = compiled(jnp.array(inits))
        best = float(np.min(np.asarray(losses)))  # host readback = sync
        return time.time() - t0, best

    compile_s, _ = run_once(0)
    steady = [run_once(i + 1) for i in range(repeats)]
    best_s = min(s for s, _ in steady)
    rate = batch * iters / best_s

    print(json.dumps({
        'metric': f'reference restart-iterations/sec on host CPU '
                  f'({num_qubits}q chain, k={num_cp_gates}, batch={batch})',
        'value': round(rate, 1),
        'unit': 'restart-iter/s',
        'compile_plus_first_s': round(compile_s, 1),
        'steady_s_best_of': [round(s, 2) for s, _ in steady],
        'host': '1-core Xeon 2.70GHz (this VM)',
    }), flush=True)


if __name__ == '__main__':
    main()
