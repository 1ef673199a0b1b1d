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


def ghz6_state():
    """Beyond-paper capability row: 6q GHZ state preparation (the paper
    stops at 5q; the simulator and state fast path handle 6q fine —
    state-kind losses build only the |0..0> column, 2^n-fold cheaper).
    GHZ_n needs n-1 CZ on a chain."""
    _setup_jax()
    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.topology import chain_layer

    n = 6
    ghz = np.zeros(2 ** n, dtype=np.complex64)
    ghz[0] = ghz[-1] = 1 / np.sqrt(2)

    t0 = time.time()
    s = Synthesize(chain_layer(n), target_state=ghz, label='ghz6')
    options = StaticOptions(num_cp_gates=10, num_samples=256,
                            accepted_num_cz_gates=5, r=0.001)
    results = s.static(options, save_results=False, verbose=False)
    wall = time.time() - t0
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    return {'config': 'ghz6_state', 'wall_s': round(wall, 1),
            'best_cz': best_cz, 'reference_cz': 5,
            'num_found': len(results.decompositions)}


def _ghz_state_n(n, max_k, num_samples=1024, max_evals=40):
    """GHZ_n preparation on the chain via the adaptive hunt: n-1 CZ is
    optimal. State-kind losses build only the |0..0> column (2^n-fold
    cheaper than the unitary tensor, api._check_working_set exempts
    'state'), so 7q/8q run large batches safely. CPU probes at 7q show
    the n-1 basin is a rare event (converged restarts floor at n CZ at
    256 samples, fixed k=16/r=0.001) — TPE over (k, r) with the big
    batch is the designed tool for exactly that."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.topology import chain_layer

    ghz = np.zeros(2 ** n, dtype=np.complex64)
    ghz[0] = ghz[-1] = 1 / np.sqrt(2)
    spec = LossSpec('state', target=ghz)
    return _adaptive_run(
        f'ghz{n}_adaptive', chain_layer(n), loss_spec=spec,
        min_k=n - 1, max_k=max_k, num_samples=num_samples,
        max_evals=max_evals, target_cz=n - 1, reference_cz=n - 1)


def ghz7_state():
    """Beyond-paper: 7q GHZ preparation (the paper stops at 5q; our GHZ
    ladder so far reaches 6q). Target: the optimal 6 CZ."""
    return _ghz_state_n(7, max_k=24)


def ghz8_state():
    """Beyond-paper: 8q GHZ preparation. Target: the optimal 7 CZ."""
    return _ghz_state_n(8, max_k=28)


def ghz9_state():
    """Beyond-paper: 9q GHZ preparation (state-kind losses build only the
    |0..0> column, so 9q stays 2^9-fold cheaper than a unitary hunt).
    Target: the optimal 8 CZ."""
    return _ghz_state_n(9, max_k=32)


def ghz10_state():
    """Beyond-paper GHZ ladder, 10q. The state-kind column tensor at
    batch 1024 is 2^10 x 1024 x 8 B = 8 MB — far inside the measured
    VMEM envelope; remote compile time is the real cost at this width.
    Target: the optimal 9 CZ."""
    return _ghz_state_n(10, max_k=36)


def ghz11_state():
    """Beyond-paper GHZ ladder, 11q. Target: the optimal 10 CZ."""
    return _ghz_state_n(11, max_k=40)


def ghz12_state():
    """Beyond-paper GHZ ladder, 12q. Target: the optimal 11 CZ."""
    return _ghz_state_n(12, max_k=44)


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


# --------------------------------------------------------------------------
# Paper capability table (CPFlow.tex tab toff4 / sec toff5 / tab bench III /
# app 5q): every published row as a resumable, early-stopping adaptive run.
# --------------------------------------------------------------------------

def clamp_parallel_trials(num_qubits: int, num_samples: int,
                          parallel_trials: int) -> int:
    """Keep the effective restart batch (num_samples x parallel_trials)
    inside the measured safe envelope: the 5q throughput plateau ends at
    batch 2048 and paper-scale k pushes effective 4096 into the
    tunnel-worker crash regime (observed on the 2048-sample group-III
    hunts at parallel_trials=2); 6q tensors hit the crash regime beyond
    512 (RESULTS_r3 §1, CLAUDE.md performance landscape)."""
    cap = {5: 2048, 6: 512}.get(num_qubits, 8192)
    while parallel_trials > 1 and num_samples * parallel_trials > cap:
        parallel_trials -= 1
    return parallel_trials


def _adaptive_run(label, layer, *, target_unitary=None, loss_spec=None,
                  min_k, max_k, num_samples, max_evals, target_cz,
                  reference_cz, rotation_gates='xyz'):
    """Resumable bucketed adaptive search that stops at the published count.

    Results persist under benchmarks/results/<label>; rerunning the config
    resumes the TPE trials instead of starting over (reference main.py's
    Results contract), so long paper-scale searches survive interruption.
    """
    _setup_jax()
    from cpflow_tpu import Synthesize, AdaptiveOptions

    save_to = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'results', label)
    max_evals = int(os.environ.get('CPFLOW_MAX_EVALS', max_evals))
    num_samples = int(os.environ.get('CPFLOW_NUM_SAMPLES', num_samples))
    # beat hunts: override the early-stop goal below the config's own
    # (reference_cz, the reported paper baseline, is never overridden)
    target_cz = int(os.environ.get('CPFLOW_TARGET_CZ', target_cz))
    # depth/window overrides for resumed hunts: 6q at the default 2000 GD
    # iterations under-converges (best raw batch loss ~1e-2 vs entry 1e-3
    # across 300 graded evals, RESULTS_r4 section 13) — deeper descent and
    # a posterior-informed k window are the measured levers
    num_iters = int(os.environ.get('CPFLOW_NUM_ITERS', 0))
    # chained-dispatch depth: effective iterations = segments x num_iters
    # while each DISPATCH stays at num_iters — the only safe way past the
    # measured 6q dispatch-depth wall (8000-iter single dispatches crash
    # the tunnel worker; 4000-iter ones pass, RESULTS_r4 section 15)
    num_segments = int(os.environ.get('CPFLOW_GD_SEGMENTS', 1))
    min_k = int(os.environ.get('CPFLOW_MIN_K', min_k))
    max_k = int(os.environ.get('CPFLOW_MAX_K', max_k))
    # entry filter relaxation for hard 6q targets: the raw stage floors
    # near 1e-2..1e-3 at safe depth while the verification stage (tiny
    # candidate batch, deep while_loop with target_loss exit) can finish
    # the descent — let verification decide instead of the entry filter
    # (default 1e-3) silently discarding every candidate (RESULTS_r4 s13)
    entry_loss = float(os.environ.get('CPFLOW_ENTRY_LOSS', 0)) or None
    verify_iters = int(os.environ.get('CPFLOW_VERIFY_ITERS', 0)) or None
    # N TPE suggestions per device dispatch (measured 1.68x evals/hour at
    # N=4 on the tab-toff4 workload, RESULTS_r3); default stays sequential
    parallel_trials = int(os.environ.get('CPFLOW_PARALLEL_TRIALS', 1))
    from cpflow_tpu.topology import num_qubits_from_layer
    _n = num_qubits_from_layer(layer)
    clamped = clamp_parallel_trials(_n, num_samples, parallel_trials)
    if clamped != parallel_trials:
        print(f'[configs] parallel_trials clamped {parallel_trials} -> '
              f'{clamped} ({_n}q x {num_samples} samples)', flush=True)
        parallel_trials = clamped
    t0 = time.time()
    s = Synthesize(layer, target_unitary=target_unitary,
                   unitary_loss_func=loss_spec, label=label)
    # cross-round resume: materialize the committed trial summary as the
    # Results pickle when the gitignored dill is gone (fresh checkout)
    from benchmarks.trials_store import export_summary, seed_results_file
    if seed_results_file(save_to, label, s.unitary_loss_func, s.layer):
        print(f'[trials_store] seeded {label} from committed summary',
              flush=True)
    options = AdaptiveOptions(
        min_num_cp_gates=min_k, max_num_cp_gates=max_k,
        num_samples=num_samples, max_evals=max_evals, bucketed=True,
        rotation_gates=rotation_gates, parallel_trials=parallel_trials,
        target_num_cz_gates=target_cz, stop_if_target_reached=True,
        **({'num_gd_iterations': num_iters} if num_iters else {}),
        **({'num_gd_segments': num_segments} if num_segments > 1 else {}),
        **({'entry_loss': entry_loss} if entry_loss else {}),
        **({'num_gd_iterations_at_verification': verify_iters}
           if verify_iters else {}))
    results = s.adaptive(options, save_results=True, save_to=save_to,
                         verbose=bool(os.environ.get('CPFLOW_VERBOSE')))
    export_summary(results, label)
    wall = time.time() - t0
    best_cz = min((d.cz_count for d in results.decompositions), default=None)
    best_loss = min((float(d.loss) for d in results.decompositions),
                    default=None)
    return {'config': label, 'wall_s': round(wall, 1), 'best_cz': best_cz,
            'reference_cz': reference_cz, 'best_loss': best_loss,
            'evals': len(results.trials.results)}


def _toff4(topology_name, layer, target_cz, max_evals=60, num_samples=1024):
    from cpflow_tpu.ops.gates import u_toff4
    return _adaptive_run(
        f'toffoli4_{topology_name}', layer, target_unitary=u_toff4,
        min_k=10, max_k=40, num_samples=num_samples, max_evals=max_evals,
        target_cz=target_cz, reference_cz=target_cz)


def toffoli4_connected():
    """tab toff4: fully connected, published 14 CZ (needed ~200 evals)."""
    from cpflow_tpu.topology import connected_layer
    return _toff4('connected', connected_layer(4), 14, max_evals=200)


def toffoli4_kite():
    """tab toff4: kite, published 14 CZ."""
    from cpflow_tpu.topology import kite_layer
    return _toff4('kite', kite_layer(), 14)


def toffoli4_square():
    """tab toff4: square (cycle), published 16 CZ."""
    from cpflow_tpu.topology import square_layer
    return _toff4('square', square_layer(4), 16)


def toffoli4_star():
    """tab toff4: star, published 16 CZ (CPFlow's improvement over 17)."""
    from cpflow_tpu.topology import star_layer
    return _toff4('star', star_layer(4), 16)


def toffoli4_chain():
    """tab toff4: chain, published 18 CZ."""
    from cpflow_tpu.topology import chain_layer
    return _toff4('chain', chain_layer(4), 18)


def toffoli3_chain():
    """Paper Table 1 row: toffoli-3 on the chain at the published best
    hyperparameters (k=14, r=0.88e-3). Published: 8 CZ optimal, ~19/100
    restarts reach it, and refinement of the best decomposition found a
    T-depth-3 Clifford+T circuit ('possibly a new result',
    CPFlow.tex:60,428)."""
    _setup_jax()
    from cpflow_tpu import Synthesize, StaticOptions
    from cpflow_tpu.ops.gates import u_toff3
    from cpflow_tpu.topology import chain_layer

    t0 = time.time()
    s = Synthesize(chain_layer(3), target_unitary=u_toff3,
                   label='toff3_chain')
    options = StaticOptions(num_cp_gates=14, r=0.88e-3, num_samples=100,
                            accepted_num_cz_gates=8)
    results = s.static(options, save_results=False, verbose=False)
    wall = time.time() - t0

    counts = sorted(d.cz_count for d in results.decompositions)
    optimal = [d for d in results.decompositions if d.cz_count == 8]
    refined = {}
    best_t_depth = None
    for d in optimal[:12]:  # paper refined 12 per topology
        try:
            d.refine()
        except Exception:  # noqa: BLE001 — refinement rollback is graceful
            continue
        if d.type == 'Clifford+T' and d.t_depth is not None:
            if best_t_depth is None or d.t_depth < best_t_depth:
                best_t_depth = d.t_depth
                refined = {'type': d.type, 't_count': d.t_count,
                           't_depth': d.t_depth, 'loss': float(d.loss)}
    return {'config': 'toffoli3_chain', 'wall_s': round(wall, 1),
            'best_cz': counts[0] if counts else None, 'reference_cz': 8,
            'optimal_rate': f'{len(optimal)}/100 (paper: 19/100)',
            'refined_best': refined, 'reference_t_depth': 3}


def toffoli5_connected():
    """sec toff5: direct synthesis of the 5q Toffoli, best published 36 CZ
    ('several hours' in the reference)."""
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli5_connected', connected_layer(5), target_unitary=u_toff5,
        min_k=25, max_k=50, num_samples=1024, max_evals=80,
        target_cz=36, reference_cz=36)


def toffoli5_connected_xz():
    """sec toff5 hunt variant: XZ rotation template — the paper's Table 3
    measures up to ~10x higher success ratios for xz vs xyz templates on
    4q Toffolis (CPFlow.tex:494-518); same 36-CZ target."""
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli5_connected_xz', connected_layer(5), target_unitary=u_toff5,
        min_k=25, max_k=50, num_samples=1024, max_evals=80,
        rotation_gates='xz', target_cz=36, reference_cz=36)


def toffoli6_connected_xz():
    """Stretch BEYOND the paper: direct adaptive synthesis of the 6q
    Toffoli (the paper stops at 5q, 'several hours'; our composite
    construction reaches 68 CZ, benchmarks/composite.py). XZ template
    first — the paper's Table 3 documents up to ~10x higher success
    ratios for xz at high k (CPFlow.tex:494-518) and the 36-CZ
    toffoli-5 landed on xz where xyz stalled at 37. num_samples=512
    keeps the 6q batched unitary tensor (4^6 x B x 8B = 16 MB) inside
    the measured <=32 MB VMEM plateau (RESULTS_r3 envelope)."""
    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli6_connected_xz', connected_layer(6),
        target_unitary=multi_controlled_x(6),
        min_k=55, max_k=80, num_samples=512, max_evals=60,
        rotation_gates='xz', target_cz=67, reference_cz=68)


def toffoli6_connected_direct():
    """Direct 6q Toffoli, xyz template (see toffoli6_connected_xz)."""
    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli6_connected_direct', connected_layer(6),
        target_unitary=multi_controlled_x(6),
        min_k=55, max_k=80, num_samples=512, max_evals=60,
        target_cz=67, reference_cz=68)


def toffoli5_connected_record():
    """Stretch hunt BEYOND the paper: the 30-CZ composite (benchmarks/
    composite.py) proves sub-36 connected toffoli-5 circuits exist; try to
    find one by direct synthesis. Any verified count <= 35 beats the
    published direct-synthesis record."""
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli5_connected_record', connected_layer(5),
        target_unitary=u_toff5, min_k=28, max_k=42, num_samples=2048,
        max_evals=120, rotation_gates='xz', target_cz=35, reference_cz=36)


def relphase_toff5_connected():
    """Beyond-paper 6q program, block 1: relative-phase toffoli-5 on full
    5q connectivity (modulo-diagonal loss). Together with C4-sqrt-X it
    assembles a connected toffoli-6 (benchmarks/composite.py; the identity
    is verified exactly in tests). No published count exists; the 4q
    analog (relphase toffoli-4 connected) costs 6 CZ."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=u_toff5, num_qubits=5,
                    wires=[0, 1, 2, 3, 4])
    return _adaptive_run(
        'relphase_toff5_connected', connected_layer(5), loss_spec=spec,
        min_k=6, max_k=28, num_samples=1024, max_evals=80,
        target_cz=8, reference_cz=None)


def c4sqrtx_connected():
    """Beyond-paper 6q program, block 2: C4-sqrt(X) on full 5q
    connectivity. By the paper's C3-sqrt-X == toffoli-4-count analogy
    (CPFlow.tex sec toff5), expect ~the toffoli-5 count (36)."""
    from cpflow_tpu.ops.gates import multi_controlled_sqrt_x
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'c4sqrtx_connected', connected_layer(5),
        target_unitary=multi_controlled_sqrt_x(5),
        min_k=22, max_k=45, num_samples=1024, max_evals=80,
        rotation_gates='xz', target_cz=36, reference_cz=None)


def c4xroot4_connected():
    """Beyond-paper 7q program, block A: C4(X^(1/4)) on full 5q
    connectivity — the inner block of the toffoli-7 V-recursion
    C6X = CsqrtX(5,6) W6^dag CsqrtX^dag W6 C5sqrtX, with
    C5sqrtX = CX^1/4(4,6) W5^dag CX^1/4dag W5 C4(X^1/4) (both identities
    verified exactly in tests/test_compat_shim.py). Same difficulty
    class as C4-sqrt-X (36 CZ, c4sqrtx_connected)."""
    from cpflow_tpu.ops.gates import multi_controlled_x_root
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'c4xroot4_connected', connected_layer(5),
        target_unitary=multi_controlled_x_root(5, 4),
        min_k=22, max_k=45, num_samples=1024, max_evals=80,
        rotation_gates='xz', target_cz=34, reference_cz=None)


def relphase_toff6_connected():
    """Beyond-paper 7q program, block B: relative-phase toffoli-6
    (modulo-diagonal loss) on full 6q connectivity — the W6 of the
    toffoli-7 recursion. The 5q analog costs 14 CZ
    (relphase_toff5_connected); no published count exists at 6q.
    num_samples=512 keeps the 6q batch inside the measured VMEM plateau."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=multi_controlled_x(6),
                    num_qubits=6, wires=[0, 1, 2, 3, 4, 5])
    return _adaptive_run(
        'relphase_toff6_connected', connected_layer(6), loss_spec=spec,
        min_k=10, max_k=40, num_samples=512, max_evals=80,
        target_cz=16, reference_cz=None)


def relphase_c4sqrtx_connected():
    """Block for the COMPOSITE W6 (relative-phase toffoli-6): C4-sqrt-X
    modulo a diagonal on all five wires. Verified exactly (64-dim, random
    gauges, tests/test_composite_w6.py): W6 = CsqrtX(4,5) W5^dag
    CsqrtX^dag(4,5) W5 RC4sqrtX(0123->5) equals C5X times a diagonal for
    ANY diagonal gauges on W5 and RC4sqrtX — so this block plus the
    existing 14-CZ relphase toffoli-5 assembles block B of toffoli-7 from
    5q hunts alone (5q converges reliably where 6q floors, RESULTS_r4
    s13). The exact C4-sqrt-X costs 36; the relphase discount at 4q was
    14 -> 6."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import multi_controlled_sqrt_x
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=multi_controlled_sqrt_x(5),
                    num_qubits=5, wires=[0, 1, 2, 3, 4])
    return _adaptive_run(
        'relphase_c4sqrtx_connected', connected_layer(5), loss_spec=spec,
        min_k=8, max_k=30, num_samples=1024, max_evals=80,
        rotation_gates='xz', target_cz=12, reference_cz=None)


def relphase_toff5_xz():
    """Sub-14 relative-phase toffoli-5 hunt (xz template, fresh label —
    the xyz hunt landed 14). Every CZ saved here counts TWICE in the
    toffoli-6 composite (68 = 4 + 2x14 + 36), twice in the composite W6
    and twice more in C5-sqrt-X — the highest-leverage 5q row in the
    6q/7q program."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=u_toff5, num_qubits=5,
                    wires=[0, 1, 2, 3, 4])
    return _adaptive_run(
        'relphase_toff5_xz', connected_layer(5), loss_spec=spec,
        min_k=6, max_k=22, num_samples=1024, max_evals=80,
        rotation_gates='xz', target_cz=11, reference_cz=None)


def relphase_toff6_xz():
    """Block B of the toffoli-7 program, second attempt (queue 22): the
    xyz hunt (relphase_toff6_connected) came back empty at 300 evals with
    its posterior pinned at the k-window ceiling (top trials k=39 of max
    40) and best raw batch loss 1.37 — under-parameterized AND
    under-converged (RESULTS_r4 sections 13/16). Fresh label with the xz
    template (Table-3 success-ratio lever), a k window that brackets the
    5q->6q relphase scaling (14 CZ at 5q), and depth via
    CPFLOW_NUM_ITERS/CPFLOW_GD_SEGMENTS chaining."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import multi_controlled_x
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=multi_controlled_x(6),
                    num_qubits=6, wires=[0, 1, 2, 3, 4, 5])
    return _adaptive_run(
        'relphase_toff6_xz', connected_layer(6), loss_spec=spec,
        min_k=18, max_k=56, num_samples=512, max_evals=60,
        rotation_gates='xz', target_cz=26, reference_cz=None)


def toffoli4_connected_record():
    """Stretch hunt: a sub-14 connected toffoli-4 (any verified count <=13
    would beat the published best-known 14)."""
    from cpflow_tpu.ops.gates import u_toff4
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'toffoli4_connected_record', connected_layer(4),
        target_unitary=u_toff4, min_k=10, max_k=30, num_samples=2048,
        max_evals=100, rotation_gates='xz', target_cz=13, reference_cz=14)


def c3sqrtx_chain():
    """app 5q: C3-sqrt(X) on the 4q chain, published 18 CZ — one of the two
    blocks of the 48-CZ chain toffoli-5 construction."""
    from cpflow_tpu.ops.gates import multi_controlled_sqrt_x
    from cpflow_tpu.topology import chain_layer
    return _adaptive_run(
        'c3sqrtx_chain', chain_layer(4),
        target_unitary=multi_controlled_sqrt_x(4),
        min_k=10, max_k=40, num_samples=1024, max_evals=60,
        target_cz=18, reference_cz=18)


def relphase_toff4_connected():
    """Maslov's relative-phase toffoli-4 needs 6 CZ on full connectivity —
    the block of the paper's 30-CZ connected toffoli-5 construction
    (CPFlow.tex sec toff5)."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import u_toff4
    from cpflow_tpu.topology import connected_layer
    spec = LossSpec('modulo_diagonal', target=u_toff4, num_qubits=4,
                    wires=[0, 1, 2, 3])
    return _adaptive_run(
        'relphase_toff4_connected', connected_layer(4), loss_spec=spec,
        min_k=4, max_k=20, num_samples=1024, max_evals=60,
        target_cz=6, reference_cz=6)


def c3sqrtx_connected():
    """C3-sqrt(X) on full 4q connectivity: 14 CZ (same as toffoli-4, being
    diagonal up to Hadamards — CPFlow.tex sec toff5)."""
    from cpflow_tpu.ops.gates import multi_controlled_sqrt_x
    from cpflow_tpu.topology import connected_layer
    return _adaptive_run(
        'c3sqrtx_connected', connected_layer(4),
        target_unitary=multi_controlled_sqrt_x(4),
        min_k=8, max_k=35, num_samples=1024, max_evals=60,
        target_cz=14, reference_cz=14)


def relphase_toff4_chain():
    """app 5q: relative-phase 4q Toffoli on the chain, published 11 CZ —
    synthesis modulo a diagonal transform (the modulo_diagonal loss)."""
    from cpflow_tpu import LossSpec
    from cpflow_tpu.ops.gates import u_toff4
    from cpflow_tpu.topology import chain_layer
    spec = LossSpec('modulo_diagonal', target=u_toff4, num_qubits=4,
                    wires=[0, 1, 2, 3])
    return _adaptive_run(
        'relphase_toff4_chain', chain_layer(4), loss_spec=spec,
        min_k=6, max_k=30, num_samples=1024, max_evals=60,
        target_cz=11, reference_cz=11)


def toffoli5_static_assault():
    """Combining adaptive + static (the tutorial's section 7 pattern) on the
    hardest direct-synthesis target: take the best (k, r) hyperparameters
    from the saved toffoli-5 adaptive trials and hammer them with large
    static batches across several seeds, hunting the published 36 CZ."""
    _setup_jax()
    from cpflow_tpu import Results, StaticOptions, Synthesize
    from cpflow_tpu.ops.gates import u_toff5
    from cpflow_tpu.topology import connected_layer

    save_to = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'results', 'toffoli5_connected')
    prior = Results.load(save_to)
    hypers = prior.best_hyperparameters()[:3]
    best_prior = min((d.cz_count for d in prior.decompositions), default=None)

    t0 = time.time()
    s = Synthesize(connected_layer(5), target_unitary=u_toff5,
                   label='toff5_assault')
    found = []
    num_samples = int(os.environ.get('CPFLOW_NUM_SAMPLES', 4096))
    seeds = int(os.environ.get('CPFLOW_ASSAULT_SEEDS', 4))
    for k, r in hypers:
        for seed in range(seeds):
            opts = StaticOptions(num_cp_gates=int(k), r=float(r),
                                 num_samples=num_samples,
                                 accepted_num_cz_gates=(best_prior or 37) - 1,
                                 random_seed=1000 + seed)
            res = s.static(opts, save_results=False, verbose=False)
            found += [d.cz_count for d in res.decompositions]
            if found and min(found) <= 36:
                break
        if found and min(found) <= 36:
            break
    return {'config': 'toffoli5_static_assault',
            'wall_s': round(time.time() - t0, 1),
            'best_cz': min(found) if found else None,
            'prior_best': best_prior, 'reference_cz': 36,
            'hyperparameters_tried': hypers}


_QX = '/root/reference/paper/benchmark_circuits'


def _qasm_adaptive(fname, published, *, target_cz=None, min_k=20, max_k=60,
                   num_samples=1024, max_evals=60, topology='connected'):
    """tab bench: one ibm_qx circuit on the connected or chain 5q topology.

    `published` is the paper's Table 4 count and is what the emitted row
    reports as reference_cz; `target_cz` (default: the published count) is
    the early-stop goal — pass a lower value to hunt a beat without
    misreporting the paper baseline.
    """
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.topology import chain_layer, connected_layer
    import glob
    matches = glob.glob(f'{_QX}/*/{fname}.qasm')
    qc = Circuit.from_qasm_file(matches[0])
    u_target = qc.unitary().astype(np.complex64)
    layer = connected_layer(5) if topology == 'connected' else chain_layer(5)
    suffix = '' if topology == 'connected' else f'_{topology}'
    return _adaptive_run(
        f'qx_{fname}{suffix}', layer, target_unitary=u_target,
        min_k=min_k, max_k=max_k, num_samples=num_samples,
        max_evals=max_evals,
        target_cz=published if target_cz is None else target_cz,
        reference_cz=published)


def qx_4gt13_92():
    """tab bench I: published 17 (r1 reproduced exactly)."""
    return _qasm_adaptive('4gt13_92', 17, min_k=10, max_k=45)


def qx_alu_v3_34():
    """tab bench I: published 14 (r1 reproduced exactly)."""
    return _qasm_adaptive('alu-v3_34', 14, min_k=10, max_k=40)


def qx_4gt5_76():
    """tab bench I: published 21 (r1 reproduced exactly)."""
    return _qasm_adaptive('4gt5_76', 21, min_k=12, max_k=45)


def qx_alu_v2_32():
    """tab bench III: published 30 (r1 reproduced exactly)."""
    return _qasm_adaptive('alu-v2_32', 30, min_k=20, max_k=55)


def qx_alu_v4_36():
    """tab bench I: published 30; r3 found 28 (beats published by 2;
    committed artifact at loss 5.6e-10)."""
    return _qasm_adaptive('alu-v4_36', 30, target_cz=28, min_k=18, max_k=50)


def qx_4gt13_91_chain():
    """tab bench II (chain): published 25; r1 found 24 (beats published)."""
    return _qasm_adaptive('4gt13_91', 25, target_cz=24, min_k=15, max_k=50,
                          topology='chain')


def qx_4gt10_v1_81():
    """tab bench III: published 37* (k in 40..60, 2000 samples); r3 found
    36 (beats published by 1; committed artifact polished to 3.7e-10)."""
    return _qasm_adaptive('4gt10-v1_81', 37, target_cz=36, min_k=35,
                          max_k=60, num_samples=2048, max_evals=100)


def qx_one_two_three_v1_99():
    """tab bench III: published 52* (k in 40..60, 2000 samples)."""
    return _qasm_adaptive('one-two-three-v1_99', 52, min_k=40, max_k=70,
                          num_samples=2048, max_evals=100)


def qx_one_two_three_v0_98():
    """tab bench III: published 47* (k in 40..60, 2000 samples)."""
    return _qasm_adaptive('one-two-three-v0_98', 47, min_k=40, max_k=65,
                          num_samples=2048, max_evals=100)


def qx_aj_e11_165():
    """tab bench III: published 24 (standard options)."""
    return _qasm_adaptive('aj-e11_165', 24, target_cz=23, min_k=15, max_k=50,
                          num_samples=1024, max_evals=60)


def qx_one_two_three_v2_100():
    """tab bench I: published 28; r3 found 25 (beats published by 3;
    queue-17 hit, committed artifact polished to 2.6e-11)."""
    return _qasm_adaptive('one-two-three-v2_100', 28, target_cz=25,
                          min_k=20, max_k=60, num_samples=2048,
                          max_evals=100)


def qx_4mod5_v1_24_chain():
    """tab bench II (chain): published 29; r3 found 26 in queue 17
    (beats published by 3; committed artifact polished to 1.5e-10)."""
    return _qasm_adaptive('4mod5-v1_24', 29, target_cz=26, min_k=20,
                          max_k=60, num_samples=2048, max_evals=100,
                          topology='chain')


def qx_alu_v3_35_chain():
    """tab bench II (chain): published 24 (r1: 27)."""
    return _qasm_adaptive('alu-v3_35', 24, min_k=20, max_k=60,
                          num_samples=2048, max_evals=100, topology='chain')


def qx_4gt5_76_chain():
    """tab bench II (chain): published 22 (r1: 23)."""
    return _qasm_adaptive('4gt5_76', 22, min_k=20, max_k=60,
                          num_samples=2048, max_evals=100, topology='chain')


def qx_alu_v0_26_chain():
    """tab bench II (chain): published 28; r3 found 25 (beats published
    by 3; committed artifact polished to 8.1e-11)."""
    return _qasm_adaptive('alu-v0_26', 28, target_cz=25, min_k=20, max_k=60,
                          num_samples=2048, max_evals=100, topology='chain')


PAPER_TABLE = {
    'toffoli3_chain': toffoli3_chain,
    'toffoli4_kite': toffoli4_kite,
    'toffoli4_square': toffoli4_square,
    'toffoli4_star': toffoli4_star,
    'toffoli4_chain': toffoli4_chain,
    'toffoli4_connected': toffoli4_connected,
    'relphase_toff4_chain': relphase_toff4_chain,
    'c3sqrtx_chain': c3sqrtx_chain,
    'relphase_toff4_connected': relphase_toff4_connected,
    'c3sqrtx_connected': c3sqrtx_connected,
    'qx_aj_e11_165': qx_aj_e11_165,
    'toffoli5_connected': toffoli5_connected,
    'toffoli5_connected_xz': toffoli5_connected_xz,
    'toffoli5_connected_record': toffoli5_connected_record,
    'toffoli6_connected_xz': toffoli6_connected_xz,
    'toffoli6_connected_direct': toffoli6_connected_direct,
    'relphase_toff5_connected': relphase_toff5_connected,
    'c4sqrtx_connected': c4sqrtx_connected,
    'c4xroot4_connected': c4xroot4_connected,
    'relphase_toff6_connected': relphase_toff6_connected,
    'relphase_toff6_xz': relphase_toff6_xz,
    'relphase_c4sqrtx_connected': relphase_c4sqrtx_connected,
    'relphase_toff5_xz': relphase_toff5_xz,
    'toffoli4_connected_record': toffoli4_connected_record,
    'toffoli5_static_assault': toffoli5_static_assault,
    'qx_4gt13_92': qx_4gt13_92,
    'qx_alu_v3_34': qx_alu_v3_34,
    'qx_4gt5_76': qx_4gt5_76,
    'qx_alu_v2_32': qx_alu_v2_32,
    'qx_alu_v4_36': qx_alu_v4_36,
    'qx_4gt13_91_chain': qx_4gt13_91_chain,
    'qx_4gt10_v1_81': qx_4gt10_v1_81,
    'qx_one_two_three_v0_98': qx_one_two_three_v0_98,
    'qx_one_two_three_v1_99': qx_one_two_three_v1_99,
    'qx_one_two_three_v2_100': qx_one_two_three_v2_100,
    'qx_4mod5_v1_24_chain': qx_4mod5_v1_24_chain,
    'qx_alu_v3_35_chain': qx_alu_v3_35_chain,
    'qx_4gt5_76_chain': qx_4gt5_76_chain,
    'qx_alu_v0_26_chain': qx_alu_v0_26_chain,
}

ALL = {
    'readme_ccz': readme_ccz,
    'toffoli3_refine': toffoli3_refine,
    'ghz_state': ghz_state,
    'ghz6_state': ghz6_state,
    'ghz7_state': ghz7_state,
    'ghz8_state': ghz8_state,
    'ghz9_state': ghz9_state,
    'ghz10_state': ghz10_state,
    'ghz11_state': ghz11_state,
    'ghz12_state': ghz12_state,
    'cccz_adaptive': cccz_adaptive,
    'qasm_sweep': qasm_sweep,
    **PAPER_TABLE,
}


# Tunnel-transient error markers: the axon TPU worker occasionally
# crash-restarts (observed: a ~10-min dead window killed three queued
# hunts in a row). Searches are resumable (per-trial Results persistence),
# so waiting out the window and re-entering loses nothing.
_TRANSIENT = ('TPU worker process crashed', 'UNAVAILABLE', 'socket closed')


def _run_with_retry(fn, name, retries=2, backoff_s=150):
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            msg = f'{type(e).__name__}: {e}'
            if attempt < retries and any(t in msg for t in _TRANSIENT):
                print(json.dumps({'config': name, 'transient_error': msg,
                                  'retry_in_s': backoff_s}), flush=True)
                time.sleep(backoff_s)
                continue
            return {'config': name, 'error': msg}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'readme_ccz'
    if which == 'all':
        names = list(ALL)
    elif which == 'paper_table':
        names = list(PAPER_TABLE)
    else:
        names = [which]
    failed = []
    for name in names:
        if name not in ALL:
            failed.append(name)
            print(json.dumps({'config': name, 'error': 'unknown config'}),
                  flush=True)
            continue
        result = _run_with_retry(ALL[name], name)
        print(json.dumps(result), flush=True)
        if isinstance(result, dict) and 'error' in result:
            failed.append(name)
    # VERDICT r4 weak-5: backend/config failures used to print an error
    # JSON and exit 0, so queue logs recorded dead-tunnel no-ops as
    # `done rc=0`. Propagate them (tests/test_configs_exit_code.py).
    if failed:
        sys.exit(1)


if __name__ == '__main__':
    main()
