"""Benchmark: restart-iterations/sec/chip on the flagship synthesis workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference does 1000 samples x 2000 Adam
iterations at 4-5q in "several minutes" on an RTX 5000 => order 5-15k
restart-iterations/sec; we use 10k as the published-baseline denominator.

The measured program is the library's fused batch-last hot path
(sim.batched + the same Adam loop the Synthesize pipeline runs): restarts in
the minor-most axis, gate applications as VPU broadcast-multiply-sums, the
whole sweep one jitted executable.

Axon-tunnel rules (see .claude/skills/verify/SKILL.md): persistent compile
cache, f32 scalar readout as the synchronization point, timing on a second
invocation so remote-compile time is excluded.
"""

import json
import os
import sys
import time

import numpy as np


def _backend_alive(timeout_s: int = 900) -> bool:
    """Bounded tunnel-health probe in a SUBPROCESS: a dead axon tunnel
    HANGS backend init indefinitely (observed for hours after a worker
    crash, CLAUDE.md) — an in-process try/except never returns. The probe
    compiles one tiny op; kill-on-timeout leaves this process clean.

    The probe MUST use the persistent compile cache and a generous bound:
    after a VM reset wipes .jax_cache, even the tiny probe op takes 4-8
    min of remote compile on a cold tunnel (r5: a healthy tunnel failed
    the old 240 s probe, and bench reported 'unreachable' spuriously)."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "jax.config.update('jax_compilation_cache_dir',"
            " '/root/repo/.jax_cache');"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    try:
        r = subprocess.run([sys.executable, '-c', code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    """Run the bench; on tunnel/compile failure retry once at reduced size
    so the driver always gets a JSON line from a real measurement. If the
    backend is unreachable (hung tunnel), say so in the JSON instead of
    hanging the driver."""
    if not _backend_alive():
        print(json.dumps({
            "metric": "restart_iters_per_sec", "value": 0.0,
            "unit": "restart-iterations/sec/chip", "vs_baseline": 0.0,
            "error": "tpu backend unreachable (tunnel down; probe timed "
                     "out) - no measurement taken",
            "last_measured": 743969.0,
            "last_measured_note": "same workload, round 3 re-check after "
                                  "queue cleanup (BENCH_r02: 745772; "
                                  "RESULTS_r3.md §18)"}))
        return
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — tunnel faults are non-deterministic
        print(f"# bench failed ({type(e).__name__}: {str(e)[:120]}); "
              f"retrying at reduced size", file=sys.stderr)
        os.environ['CPFLOW_BENCH_BATCH'] = '256'
        os.environ['CPFLOW_BENCH_ITERS'] = '300'
        _run()


def _run():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.ops.penalty import cp_penalty_linear
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.sim import batched as bt
    from cpflow_tpu.sim.ansatz_kernel import (cp_angle_indices,
                                              num_block_angles)
    from cpflow_tpu.topology import chain_layer, fill_layers

    num_qubits = 5
    num_cp_gates = 20
    rotation_gates = 'xyz'
    # measured best on v5e (RESULTS_r2.md): throughput is flat 1024-2048 and
    # degrades at 4096+; iters >= 2000 amortizes dispatch fully
    batch = int(os.environ.get('CPFLOW_BENCH_BATCH', 2048))
    iters = int(os.environ.get('CPFLOW_BENCH_ITERS', 2000))
    mode = os.environ.get('CPFLOW_BENCH_MODE', 'fused')  # fused | pallas

    placements = fill_layers(chain_layer(num_qubits), num_cp_gates)
    nba = num_block_angles('cp', rotation_gates)
    num_angles = 3 * num_qubits + nba * num_cp_gates
    cp_mask = np.zeros(num_angles, dtype=np.float32)
    cp_mask[cp_angle_indices(num_qubits, nba, num_cp_gates)] = 1.0

    spec = LossSpec('hst', target=multi_controlled_x(num_qubits))
    penalty = lambda a: cp_penalty_linear(a, np.pi / 2, 2.0, 0.05, 0.05, 0.05)
    reversible = bool(int(os.environ.get('CPFLOW_BENCH_REVERSIBLE', '1')))
    regloss_fn = bt.make_batched_regloss(
        num_qubits, 'cp', rotation_gates, placements, spec,
        cp_mask=jnp.array(cp_mask), regularization_func=penalty, r=0.00055,
        reversible=reversible)

    opt = optax.adam(0.1)

    def objective(params_pb):
        regloss, _ = regloss_fn(params_pb)
        return regloss.sum(), regloss

    val_grad = jax.value_and_grad(objective, has_aux=True)

    if mode == 'pallas':
        from cpflow_tpu.experimental import pallas_sweep as ps
        pallas_fn = ps.make_pallas_sweep(
            num_qubits, rotation_gates, placements,
            multi_controlled_x(num_qubits), cp_mask, 0.00055, iters)

        def sweep(seed):
            keys = jax.random.split(jax.random.PRNGKey(seed), batch)
            inits = jax.vmap(lambda k: jax.random.uniform(
                k, (num_angles,), minval=0.0, maxval=2 * np.pi,
                dtype=jnp.float32))(keys)
            _, summary = pallas_fn(inits)
            return jnp.min(summary[2])
    else:
        sweep = None  # defined below

    def sweep_fused(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), batch)
        inits = jax.vmap(lambda k: jax.random.uniform(
            k, (num_angles,), minval=0.0, maxval=2 * np.pi,
            dtype=jnp.float32))(keys)
        params0 = inits.T  # (P, B), batch minor-most

        def body(i, carry):
            params, opt_state, best = carry
            (_, regloss), grads = val_grad(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.minimum(best, regloss)

        _, _, best = jax.lax.fori_loop(
            0, iters, body, (params0, opt.init(params0),
                             jnp.full((batch,), jnp.inf, dtype=jnp.float32)))
        # scalar summary: the synchronization point for timing
        return jnp.min(best)

    from cpflow_tpu.utils.profiling import Throughput

    compiled = jax.jit(sweep if mode == 'pallas' else sweep_fused)
    meter = Throughput()

    with meter.section(batch, iters, label='compile+first'):
        best0 = float(compiled(0))  # float() readout = the sync point
    compile_and_run_s = meter.sections[-1]['seconds']

    meter = Throughput()
    with meter.section(batch, iters, label='steady'):
        best = float(compiled(1))
    steady_s = meter.seconds

    restart_iters_per_sec = meter.rate
    # conservative denominator: the published-figure-derived reference GPU
    # rate (BASELINE.md: 1000 samples x 2000 iters in "several minutes" on
    # an RTX 5000 => ~10k restart-iter/s)
    baseline = 10_000.0
    # the literal BASELINE.json north-star denominator ("vs reference CPU"):
    # the reference's own jitted hot path measured on a recorded host at its
    # saturating batch size. Provenance travels with the number via the
    # committed measurement file (re-run benchmarks.reference_baseline to
    # refresh it on a new host); env override for ad-hoc comparisons.
    ref_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'benchmarks', 'results', 'reference_cpu.json')
    try:
        with open(ref_file) as f:
            reference_cpu = float(json.load(f)['value'])
    except (OSError, ValueError, KeyError):
        reference_cpu = 1_885.0
    reference_cpu = float(os.environ.get('CPFLOW_REFERENCE_CPU_RATE',
                                         reference_cpu))

    # auditable roofline arithmetic (VERDICT r3 item 5): the analytic
    # flop/byte model of this exact workload, the implied Tflop/s / GB/s at
    # the measured rate, and the fractions of the v5e spec ceilings. The
    # flop model is exact for the op mix (a lower bound on time); the byte
    # model assumes no fusion between gate applications (an upper bound),
    # so hbm_fraction_upper > 1 measures how much XLA fuses. The measured
    # rate sitting between the two rooflines = bandwidth-bound with partial
    # fusion, which is the RESULTS_r2 conclusion in auditable form.
    from cpflow_tpu.utils.profiling import (roofline_model, V5E_HBM_GBPS,
                                            V5E_VPU_FMA_TFLOPS)
    model = roofline_model(num_qubits, num_cp_gates, rotation_gates,
                           kind='hst', reversible=reversible)
    tflops = restart_iters_per_sec * model['flops'] / 1e12
    gbps = restart_iters_per_sec * model['hbm_bytes'] / 1e9

    result = {
        "metric": f"restart-iterations/sec/chip ({num_qubits}q chain, "
                  f"k={num_cp_gates}, batch={batch})",
        "value": round(restart_iters_per_sec, 1),
        "unit": "restart-iter/s",
        "vs_baseline": round(restart_iters_per_sec / baseline, 2),
        "vs_reference_cpu": round(restart_iters_per_sec / reference_cpu, 1),
        "roofline": {
            "flops_per_restart_iter": model['flops'],
            "hbm_bytes_per_restart_iter_nofusion": model['hbm_bytes'],
            "model_tflops_f32": round(tflops, 3),
            "model_hbm_gbps_nofusion": round(gbps, 1),
            "vpu_fma_peak_tflops_f32": V5E_VPU_FMA_TFLOPS,
            "vpu_fraction": round(tflops / V5E_VPU_FMA_TFLOPS, 3),
            "hbm_peak_gbps": V5E_HBM_GBPS,
            "hbm_fraction_upper": round(gbps / V5E_HBM_GBPS, 2),
            "note": "flop model exact for the op mix; byte model is a "
                    "no-fusion upper bound -- hbm_fraction_upper > 1 means "
                    "XLA fuses that factor of round trips. Bandwidth is "
                    "the binding roofline (RESULTS_r2.md): forward-only "
                    "probe 2.1-2.5M it/s, adjoint floor ~3x forward."},
    }
    print(json.dumps(result))

    if os.environ.get('CPFLOW_BENCH_VERBOSE'):
        print(f"# compile+first run: {compile_and_run_s:.1f}s, "
              f"steady: {steady_s:.3f}s, best regloss: {best:.3e}",
              file=sys.stderr)


if __name__ == '__main__':
    main()
