"""Throughput envelope: restart-iterations/sec/chip across the 3-6 qubit range.

BASELINE.json's headline metric is "restart-iterations/sec/chip at 3-6
qubits"; round 2 measured only the 5q point (BENCH_r02.json). This harness
measures the fused batch-last hot path (the exact objective bench.py times)
at every qubit count the library targets, plus a state-preparation row
(the 'state' loss kind builds only the |0..0> column -- 2^n-fold cheaper),
with a batch sweep per configuration to locate each plateau.

Workload per point: 5q-chain-style template (chain layer, k=20 CP blocks,
xyz rotations), reversible custom-VJP gradient, full Adam fori_loop sweep in
one jitted executable -- identical structure to bench.py, only (n, kind,
batch) vary.

Resumable: results accumulate in benchmarks/results/envelope.json keyed by
(n, kind, batch, iters); existing points are skipped, so a tunnel fault
costs one point, not the run.

Usage:  python -u -m benchmarks.envelope            # full sweep
        CPFLOW_ENVELOPE_POINTS='5:hst:2048' python -m benchmarks.envelope
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'results', 'envelope.json')

ITERS = 2000  # dispatch fully amortized by 2k iters (RESULTS_r2.md)
K = 20        # CP blocks; fixed across n so rows differ only by qubit count


def default_points():
    pts = []
    for n in (3, 4, 5, 6):
        # 6q @ 4096 is excluded: the full batched unitary tensor is
        # 4096 x 64 x 64 x c64 = 134 MB per intermediate and the sweep
        # crashed the TPU worker (measured r3); 6q peaks at batch 512 anyway
        batches = (1024, 2048, 4096) if n < 6 else (512, 1024, 2048)
        for b in batches:
            pts.append((n, 'hst', b))
    # state-prep kind: single-column build (api.py target_state path) —
    # tensors are 2^n-fold smaller, so the plateau sits at larger batch
    for b in (2048, 4096, 8192, 16384):
        pts.append((5, 'state', b))
    return pts


def load_results():
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            return json.load(f)
    return {}


def save_results(res):
    os.makedirs(os.path.dirname(RESULTS_PATH), exist_ok=True)
    with open(RESULTS_PATH, 'w') as f:
        json.dump(res, f, indent=1, sort_keys=True)


def measure_point(n, kind, batch, iters=ITERS):
    import jax
    import jax.numpy as jnp
    import optax

    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.ops.penalty import cp_penalty_linear
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.sim import batched as bt
    from cpflow_tpu.sim.ansatz_kernel import (cp_angle_indices,
                                              num_block_angles)
    from cpflow_tpu.topology import chain_layer, fill_layers
    from cpflow_tpu.utils.profiling import Throughput

    placements = fill_layers(chain_layer(n), K)
    nba = num_block_angles('cp', 'xyz')
    num_angles = 3 * n + nba * K
    cp_mask = np.zeros(num_angles, dtype=np.float32)
    cp_mask[cp_angle_indices(n, nba, K)] = 1.0

    target_u = multi_controlled_x(n)
    if kind == 'state':
        spec = LossSpec('state', target=np.asarray(target_u)[:, 0])
    else:
        spec = LossSpec('hst', target=target_u)
    penalty = lambda a: cp_penalty_linear(a, np.pi / 2, 2.0, 0.05, 0.05, 0.05)
    regloss_fn = bt.make_batched_regloss(
        n, 'cp', 'xyz', placements, spec,
        cp_mask=jnp.array(cp_mask), regularization_func=penalty, r=0.00055,
        reversible=True)

    opt = optax.adam(0.1)

    def objective(params_pb):
        regloss, _ = regloss_fn(params_pb)
        return regloss.sum(), regloss

    val_grad = jax.value_and_grad(objective, has_aux=True)

    def sweep(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), batch)
        inits = jax.vmap(lambda k: jax.random.uniform(
            k, (num_angles,), minval=0.0, maxval=2 * np.pi,
            dtype=jnp.float32))(keys)
        params0 = inits.T

        def body(i, carry):
            params, opt_state, best = carry
            (_, regloss), grads = val_grad(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.minimum(best, regloss)

        _, _, best = jax.lax.fori_loop(
            0, iters, body, (params0, opt.init(params0),
                             jnp.full((batch,), jnp.inf, dtype=jnp.float32)))
        return jnp.min(best)

    compiled = jax.jit(sweep)
    t0 = time.time()
    float(compiled(0))
    compile_s = time.time() - t0

    # best-of-2 steady-state timings (tunnel RTT jitter)
    rates = []
    for rep in (1, 2):
        meter = Throughput()
        with meter.section(batch, iters, label=f'steady{rep}'):
            float(compiled(rep))
        rates.append(meter.rate)
    return {
        'n': n, 'kind': kind, 'batch': batch, 'iters': iters, 'k': K,
        'rate': round(max(rates), 1),
        'rate_min': round(min(rates), 1),
        'compile_s': round(compile_s, 1),
    }


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    env = os.environ.get('CPFLOW_ENVELOPE_POINTS')
    if env:
        points = []
        for tok in env.split(','):
            n, kind, b = tok.split(':')
            points.append((int(n), kind, int(b)))
    else:
        points = default_points()

    results = load_results()
    for (n, kind, batch) in points:
        key = f'{n}:{kind}:b{batch}:i{ITERS}:k{K}'
        if key in results:
            print(f'# skip {key} (cached: {results[key]["rate"]:.0f}/s)',
                  flush=True)
            continue
        print(f'# measuring {key} ...', flush=True)
        try:
            row = measure_point(n, kind, batch)
        except Exception as e:  # noqa: BLE001 -- tunnel faults
            print(f'# FAILED {key}: {type(e).__name__}: {str(e)[:200]}',
                  file=sys.stderr, flush=True)
            continue
        results[key] = row
        save_results(results)
        print(f'# {key}: {row["rate"]:.0f} restart-iter/s '
              f'(compile {row["compile_s"]:.0f}s)', flush=True)

    # summary table
    print('\nn  kind   batch  restart-iter/s')
    for key in sorted(results):
        r = results[key]
        print(f'{r["n"]}  {r["kind"]:5s}  {r["batch"]:5d}  {r["rate"]:>10.0f}')


if __name__ == '__main__':
    main()
