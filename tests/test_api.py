"""End-to-end API tests: Synthesize static/adaptive, Decomposition, Results,
Ansatz — small workloads on the 8-device virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpflow_tpu import (Ansatz, AdaptiveOptions, Decomposition, LossSpec,
                        Results, StaticOptions, Synthesize)
from cpflow_tpu.ops import gates
from cpflow_tpu.topology import chain_layer


CZ_LAYER = [[0, 1]]


def make_static_options(**kw):
    defaults = dict(num_cp_gates=2, accepted_num_cz_gates=3, num_samples=8,
                    num_gd_iterations=400, rotation_gates='xz',
                    num_gd_iterations_at_verification=1500)
    defaults.update(kw)
    return StaticOptions(**defaults)


def test_static_options_validation():
    with pytest.raises(TypeError):
        StaticOptions()
    with pytest.raises(TypeError):
        StaticOptions(num_cp_gates=5)
    with pytest.raises(TypeError):
        AdaptiveOptions(min_num_cp_gates=2)


def test_synthesize_requires_loss():
    with pytest.raises(AssertionError):
        Synthesize(CZ_LAYER)
    with pytest.raises(AssertionError):
        Synthesize(CZ_LAYER, target_unitary=np.eye(8))  # wrong size


@pytest.mark.slow
def test_static_cz_end_to_end(tmp_path):
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_test')
    options = make_static_options()
    results = s.static(options, save_results=True,
                       save_to=str(tmp_path / 'cz_results'), verbose=False)
    assert len(results.decompositions) > 0
    d = results.decompositions[0]
    assert d.loss < 1e-5
    assert 1 <= d.cz_count <= 3
    # persistence round trip
    loaded = Results.load(str(tmp_path / 'cz_results'))
    assert len(loaded.decompositions) == len(results.decompositions)
    assert loaded.decompositions[0].cz_count == d.cz_count
    # loss function survives serialization
    assert float(loaded.loss_function.numpy(d.unitary)) < 1e-5


@pytest.mark.slow
def test_static_accepts_explicit_mesh():
    from cpflow_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.restart_mesh()
    assert mesh.devices.size == 8
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_mesh',
                   mesh=mesh)
    results = s.static(make_static_options(), save_results=False, verbose=False)
    assert len(results.decompositions) > 0


@pytest.mark.slow
def test_target_state_bell():
    """State preparation objective (advertised-but-missing in the reference)."""
    bell = np.zeros(4, dtype=np.complex64)
    bell[0] = bell[3] = 1 / np.sqrt(2)
    s = Synthesize(CZ_LAYER, target_state=bell, label='bell', mesh=None)
    results = s.static(make_static_options(num_cp_gates=1,
                                           accepted_num_cz_gates=1),
                       save_results=False, verbose=False)
    assert len(results.decompositions) > 0
    d = results.decompositions[0]
    produced = d.unitary[:, 0]
    fidelity = abs(np.vdot(bell, produced)) ** 2
    assert fidelity > 1 - 1e-5


@pytest.mark.slow
def test_decomposition_refine():
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_ref',
                   mesh=None)
    results = s.static(make_static_options(), save_results=False, verbose=False)
    d = results.decompositions[0]
    cz_before = d.cz_count
    msg = d.refine()
    assert 'Refined to' in msg
    assert d.loss < 1e-5
    assert d.cz_count <= cz_before
    if d.type == 'Clifford+T':
        assert d.t_count is not None


def test_ansatz_circuit_matches_unitary():
    from cpflow_tpu.topology import fill_layers
    anz = Ansatz(2, 'cp', fill_layers(CZ_LAYER, 2), rotation_gates='xz')
    rng = np.random.default_rng(0)
    angles = rng.uniform(0, 2 * np.pi, anz.num_angles)
    u_dev = np.asarray(anz.unitary(jnp.array(angles, dtype=jnp.float32)))
    u_host = anz.circuit(list(angles)).unitary()
    assert np.max(np.abs(u_dev - u_host)) < 1e-4


def test_ansatz_parametrized_circuit_draw():
    from cpflow_tpu.topology import fill_layers
    anz = Ansatz(2, 'cp', fill_layers(CZ_LAYER, 1), rotation_gates='x')
    qc = anz.circuit()
    s = qc.draw()
    assert 'a_0' in s


@pytest.mark.slow
def test_ansatz_learn():
    from cpflow_tpu.topology import fill_layers
    anz = Ansatz(2, 'cp', fill_layers(CZ_LAYER, 2), rotation_gates='xz')
    res = anz.learn(jnp.array(gates.cz_mat), num_repeats=4,
                    keep_history=False, num_iterations=400)
    best = min(float(r['loss'][1]) for r in res)
    assert best < 1e-5


@pytest.mark.slow
def test_adaptive_mini_run(tmp_path):
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                           max_evals=3, num_samples=8,
                           num_gd_iterations=300, rotation_gates='xz',
                           num_gd_iterations_at_verification=1000)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_adapt',
                   mesh=None)
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'adapt'), verbose=False)
    assert len(results.trials.results) == 3
    for rec in results.trials.results:
        assert 'loss' in rec and 'num_cp_gates' in rec and 'r' in rec
        # default keep_logs=False: no attachments, raw prospectives dropped
        assert 'attachments' not in rec
        assert 'prospective_decompositions' not in rec
    # resume: asking for 4 evals continues from the saved 3
    opts4 = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                            max_evals=4, num_samples=8,
                            num_gd_iterations=300, rotation_gates='xz',
                            num_gd_iterations_at_verification=1000)
    results2 = s.adaptive(opts4, save_results=True,
                          save_to=str(tmp_path / 'adapt'), verbose=False)
    assert len(results2.trials.results) == 4
    hp = results2.best_hyperparameters()
    assert len(hp) == 4 and len(hp[0]) == 2


def test_adaptive_graded_fallback_score(tmp_path):
    """Trials with ZERO prospectives must carry a finite, graded TPE score
    (1000 + 10*log10 of the best raw batch loss) instead of +inf, so hard
    targets (toffoli-6) still shape the posterior — RESULTS_r4 section 11.
    entry_loss=0 forces the empty-prospective path on a generic Haar
    target (whose loss is irrational, never exactly 0.0 in f32)."""
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                           max_evals=2, num_samples=8,
                           num_gd_iterations=200, entry_loss=0.0,
                           num_gd_iterations_at_verification=200)
    rng = np.random.default_rng(7)
    haar, _ = np.linalg.qr(rng.normal(size=(4, 4))
                           + 1j * rng.normal(size=(4, 4)))
    s = Synthesize(CZ_LAYER, target_unitary=haar, label='cz_hard',
                   mesh=None)
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'hard'), verbose=False)
    for rec in results.trials.results:
        assert rec['cz_counts'] == []
        assert np.isfinite(rec['loss'])
        assert rec['loss'] > 900.0  # strictly worse than any real score
        # graded: the score is the documented function of min_raw_loss
        expect = 1000.0 + 10.0 * np.log10(max(rec['min_raw_loss'], 1e-12))
        assert rec['loss'] == pytest.approx(expect, rel=1e-6)
    # summaries round-trip the new key
    from benchmarks.trials_store import export_summary, load_summary_trials
    export_summary(results, 'cz_hard_test')
    try:
        trials = load_summary_trials('cz_hard_test')
        assert all('min_raw_loss' in r for r in trials.results)
    finally:
        os.remove(os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), 'benchmarks',
            'trial_summaries', 'cz_hard_test.json'))


def test_adaptive_keep_logs_attachments(tmp_path):
    """keep_logs=True attaches dill payloads of the prospectives, the
    trial's realized static options and the loss spec to every trial
    (reference main.py:751-756 observable contract)."""
    import dill
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=2,
                           max_evals=1, num_samples=4,
                           num_gd_iterations=60, rotation_gates='x',
                           num_gd_iterations_at_verification=60,
                           entry_loss=2.0, keep_logs=True)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_logs',
                   mesh=None)
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'logs'), verbose=False)
    for rec in results.trials.results:
        att = rec['attachments']
        assert set(att) == {'prospective_decompositions', 'static_options',
                            'unitary_loss_func'}
        so = dill.loads(att['static_options'])
        assert so.num_cp_gates == rec['num_cp_gates']
        assert so.r == rec['r']
        pro = dill.loads(att['prospective_decompositions'])
        assert [cz for cz, _ in pro] == \
            [cz for cz, _ in rec['prospective_decompositions']]
        loss_fn = dill.loads(att['unitary_loss_func'])
        assert loss_fn.numpy(np.asarray(gates.cz_mat)) == \
            pytest.approx(0.0, abs=1e-10)
    # (the keep_logs=False default is pinned inside test_adaptive_mini_run)


def test_num_gd_segments_chains_descent():
    """num_gd_segments=S chains S dispatches of the ONE compiled
    num_gd_iterations sweep, each resuming from the previous best-so-far
    parameters — effective depth S x iters without lengthening the
    single-dispatch program (the measured 6q dispatch-depth wall,
    RESULTS_r4 section 15). At r=0 regloss == loss, so best-so-far
    tracking makes the chained per-restart losses elementwise <= the
    single-segment ones; segments=1 must be bit-identical to the
    pre-chaining stage (the benchmarks/reverify.py determinism contract)."""
    from cpflow_tpu.ops.gates import u_ccz3
    from cpflow_tpu.topology import chain_layer

    s = Synthesize(chain_layer(3), target_unitary=u_ccz3, label='segchain')
    base = dict(min_num_cp_gates=8, max_num_cp_gates=8, num_samples=8,
                num_gd_iterations=60, bucketed=True, rotation_gates='xz')
    run1, anz = s._staged_run(AdaptiveOptions(**base))
    run3, _ = s._staged_run(AdaptiveOptions(**base, num_gd_segments=3))
    active = jnp.ones(anz.num_angles, dtype=jnp.float32)
    seed, r = jnp.asarray(7, dtype=jnp.uint32), jnp.float32(0.0)

    cz1, loss1, ang1 = run1(seed, r, active)
    cz1b, loss1b, _ = run1(seed, r, active)
    np.testing.assert_array_equal(np.asarray(loss1), np.asarray(loss1b))
    cz3, loss3, ang3 = run3(seed, r, active)
    assert np.all(np.asarray(loss3) <= np.asarray(loss1) + 1e-7)
    assert float(np.min(loss3)) < float(np.min(loss1))  # 60 iters is far
    # from converged on ccz, so 3 segments must strictly improve the best
    assert np.asarray(ang3).shape == np.asarray(ang1).shape

    # vmapped (parallel_trials) variant: same chaining over a trial axis,
    # agreeing with the non-vmapped chain on the same seed
    run2, _ = s._staged_run(AdaptiveOptions(**base, num_gd_segments=2))
    _, loss2, _ = run2(seed, r, active)
    runv, _ = s._staged_run(
        AdaptiveOptions(**base, num_gd_segments=2), vmapped=True)
    czv, lossv, angv = runv(jnp.asarray([7, 8], dtype=jnp.uint32),
                            jnp.asarray([0.0, 0.0], dtype=jnp.float32),
                            jnp.stack([active, active]))
    assert np.asarray(lossv).shape == (2, 8)
    np.testing.assert_allclose(np.asarray(lossv)[0],
                               np.asarray(loss2), atol=2e-6)

    # verification chaining: same projected circuit (identical cz/frozen),
    # per-candidate losses elementwise no worse, strictly better where
    # under-converged
    from cpflow_tpu.optimize import candidates as cand_mod
    anz_v = s._ansatz(AdaptiveOptions(**base).get_static(8, 0.0005))
    batch = np.asarray(ang1)[:4]
    v1 = cand_mod.verify_candidates_batch(
        s.unitary_loss_func, anz_v.unitary, batch, anz_v.cp_mask,
        learning_rate=0.01, num_iterations=50, target_loss=1e-12,
        anz=anz_v, num_segments=1)
    v3 = cand_mod.verify_candidates_batch(
        s.unitary_loss_func, anz_v.unitary, batch, anz_v.cp_mask,
        learning_rate=0.01, num_iterations=50, target_loss=1e-12,
        anz=anz_v, num_segments=3)
    np.testing.assert_array_equal(v1.cz, v3.cz)
    np.testing.assert_array_equal(v1.frozen, v3.frozen)
    assert np.all(v3.best_loss <= v1.best_loss + 1e-7)
    assert float(v3.best_loss.min()) < float(v1.best_loss.min())
    # frozen coordinates never move across segments
    np.testing.assert_allclose(v3.best_angles[v3.frozen],
                               v1.best_angles[v1.frozen], atol=1e-6)


def test_losspec_kinds():
    u = np.asarray(gates.cz_mat, dtype=complex)
    spec = LossSpec('hst', target=u)
    assert float(spec(jnp.array(u))) == pytest.approx(0.0, abs=1e-6)
    assert spec.numpy(u) == pytest.approx(0.0, abs=1e-12)
    spec_d = LossSpec('disc', target=u)
    assert spec_d.numpy(u) == pytest.approx(0.0, abs=1e-12)


def test_losspec_custom_fn_runs_under_jit():
    """Custom unitary_loss_func must be evaluated COMPILED, never eagerly,
    and no complex array may cross the host<->device boundary: remote TPU
    backends (axon tunnel) implement neither eager complex primitives nor
    complex transfers, which crashed the full-budget tutorial cell 26
    twice (RESULTS_r4 section 6)."""
    seen = []

    def fn(u):
        seen.append((type(u).__name__, str(u.dtype)))
        return 1 - jnp.abs(u[0, 0]) ** 2

    spec = LossSpec('custom', fn=fn)
    # non-trivial imaginary part: the split re/im path must recombine
    u = np.diag(np.exp(1j * np.arange(4))).astype(np.complex64)
    assert spec.numpy(u) == pytest.approx(0.0, abs=1e-6)
    # the fn saw a COMPLEX tracer (jit, recombined on-device from the
    # float re/im inputs), not a concrete eager array
    assert seen and all('Tracer' in t for t, _ in seen)
    assert all(dt.startswith('complex') for _, dt in seen)
    # the jit wrapper itself takes only float inputs (transfer-safe)
    import jax
    for leaf in jax.tree_util.tree_leaves(
            spec._jit_fn.lower(u.real, u.imag).args_info):
        assert 'complex' not in str(leaf.dtype)
    # the jit wrapper is cached: a second call does not retrace
    spec.numpy(u)
    assert len(seen) == 1
    # dill roundtrip drops the wrapper and rebuilds it lazily
    import dill
    spec2 = dill.loads(dill.dumps(spec))
    assert spec2._jit_fn is None
    assert spec2.numpy(u) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_generate_raw_keep_history_and_plot(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='cz_hist',
                   mesh=None)
    options = make_static_options(num_samples=4, num_gd_iterations=50)
    raw = s._generate_raw(options, keep_history=True)
    r0 = raw[0]
    assert r0['regloss'].shape == (50,)
    assert r0['params'].shape[0] == 50
    np.testing.assert_allclose(np.asarray(r0['regloss']),
                               np.asarray(r0['loss'] + r0['reg']), atol=1e-5)
    s._plot_raw(r0)  # smoke


def test_throughput_counter():
    from cpflow_tpu.utils.profiling import Throughput
    th = Throughput()
    with th.section(10, 100, label='raw'):
        pass
    assert th.restart_iterations == 1000
    assert 'raw' in th.report()


@pytest.mark.slow
def test_plot_trials_smoke(tmp_path):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=2,
                           max_evals=2, num_samples=4,
                           num_gd_iterations=100, rotation_gates='x',
                           num_gd_iterations_at_verification=200)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='plot_smoke')
    results = s.adaptive(opts, save_results=False, verbose=False)
    results.plot_trials()
    plt.close('all')


def test_qiskit_interop_gated():
    from cpflow_tpu.circuits import interop
    from cpflow_tpu.circuits.ir import Circuit
    c = Circuit(2).h(0).cz(0, 1).rz(0.5, 1)
    if interop.QISKIT_AVAILABLE:
        qc = interop.to_qiskit(c)
        back = interop.from_qiskit(qc)
        np.testing.assert_allclose(back.unitary(), c.unitary(), atol=1e-12)
    else:
        with pytest.raises(ImportError):
            interop.to_qiskit(c)


@pytest.mark.slow
def test_adaptive_parallel_trials():
    """parallel_trials=N evaluates N TPE suggestions per dispatch through
    the vmapped bucketed stage (constant-liar batching); the trial stream
    (seed chain) matches the sequential mode and the search still finds
    decompositions. Runs over the 8-device virtual mesh."""
    from cpflow_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.restart_mesh()
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                           num_samples=16, num_gd_iterations=300,
                           rotation_gates='xz', random_seed=11, max_evals=4,
                           num_gd_iterations_at_verification=1200,
                           parallel_trials=2)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='par_trials',
                   mesh=mesh)
    res = s.adaptive(opts, save_results=False, verbose=False)
    assert len(res.trials.results) == 4
    assert len(res.decompositions) > 0

    # seed chain identical to the sequential mode's (resume compatibility)
    seq = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                          num_samples=16, num_gd_iterations=300,
                          rotation_gates='xz', random_seed=11, max_evals=4,
                          num_gd_iterations_at_verification=1200)
    s2 = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, label='seq_trials',
                    mesh=mesh)
    res2 = s2.adaptive(seq, save_results=False, verbose=False)
    assert [t['random_seed'] for t in res.trials.results] == \
        [t['random_seed'] for t in res2.trials.results]


def test_working_set_guard():
    """The measured VMEM-crash regime (RESULTS_r3 §1/§18) is a hard error
    by default, a warning only under unsafe_batch=True, and the state-prep
    kind (column-only build) is exempt. The k-scaled envelope catches the
    5q paper-scale crash point (effective batch 4096 at k~50) that the
    raw tensor size alone misses."""
    import warnings as w
    from cpflow_tpu.ops.gates import multi_controlled_x

    s = Synthesize([[i, i + 1] for i in range(5)],
                   target_unitary=multi_controlled_x(6), label='ws6',
                   mesh=None)
    # 6q @ 4096 = 134 MB tensors: the measured crash point -> hard error
    with pytest.raises(ValueError, match='crash'):
        s._check_working_set(4096)
    opts = StaticOptions(num_cp_gates=20, accepted_num_cz_gates=99,
                         num_samples=4096)
    with pytest.raises(ValueError, match='unsafe_batch'):
        s._check_working_set(4096, opts)
    # explicit opt-out restores the legacy warn-and-proceed behavior
    opts_unsafe = StaticOptions(num_cp_gates=20, accepted_num_cz_gates=99,
                                num_samples=4096, unsafe_batch=True)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        s._check_working_set(4096, opts_unsafe)
    assert any('crash' in str(r.message) for r in rec)

    # 5q paper-scale k: effective batch 4096 at k=50 crashed a worker
    # (RESULTS_r3 §18) while k=20 was fine -> only the former errors
    s5 = Synthesize([[i, i + 1] for i in range(4)],
                    target_unitary=multi_controlled_x(5), label='ws5',
                    mesh=None)
    ok_opts = StaticOptions(num_cp_gates=20, accepted_num_cz_gates=99,
                            num_samples=4096)
    s5._check_working_set(4096, ok_opts)  # 33.5 MB @ k=20: measured fine
    bad_opts = StaticOptions(num_cp_gates=50, accepted_num_cz_gates=99,
                             num_samples=4096)
    with pytest.raises(ValueError, match='crash'):
        s5._check_working_set(4096, bad_opts)

    state = np.zeros(64, dtype=np.complex64)
    state[0] = 1.0
    s2 = Synthesize([[i, i + 1] for i in range(5)], target_state=state,
                    label='ws6s', mesh=None)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        s2._check_working_set(4096)
    assert not rec


def test_roofline_model_pins_envelope_counts():
    """The analytic flop/byte model (utils/profiling.roofline_model) must
    stay in lockstep with the workload benchmarks/envelope.py actually
    measures (chain layer, K=20 blocks, xyz, reversible) and with the
    real template structure. Exact values are pinned so any change to the
    model or the hot path's gate inventory shows up as a diff here and in
    BENCH_r*.json together (VERDICT r3 item 5)."""
    from cpflow_tpu.utils.profiling import roofline_model
    from cpflow_tpu.sim.ansatz_kernel import num_block_angles
    from cpflow_tpu.topology import chain_layer, fill_layers
    from benchmarks import envelope

    assert envelope.K == 20

    for n in (3, 4, 5, 6):
        placements = fill_layers(chain_layer(n), envelope.K)
        layer, num_layers = placements['layers']
        num_blocks = len(layer) * num_layers + len(placements['free'])
        assert num_blocks == envelope.K  # the model's k IS the block count

        m = roofline_model(n, envelope.K, 'xyz', kind='hst', reversible=True)
        E = 4 ** n
        # forward: k 4x4 applies (30E) + per-letter block construction
        # + n surface applies (14E) + hst loss (8E)
        fwd = envelope.K * (30 * E + 576 * 3) + n * 14 * E + 8 * E
        assert m['forward_flops'] == fwd
        # reversible backward: 3 apply-sized passes per gate + contraction
        bwd = (envelope.K * (60 * E + 32 * E + 576 * 3)
               + n * (28 * E + 16 * E) + 6 * E)
        assert m['flops'] == fwd + bwd
        # HBM round trips: one 16E-byte trip per fusion-ending application
        assert m['applications'] == (envelope.K + n + 1) + \
            3 * (envelope.K + n) + 1
        assert m['hbm_bytes'] == m['applications'] * 16 * E

    # regression pins at the bench.py flagship workload (5q, k=20)
    m5 = roofline_model(5, 20, 'xyz', kind='hst', reversible=True)
    assert m5['flops'] == 2_878_976
    assert m5['hbm_bytes'] == 1_671_168
    # the state-prep kind builds one column: E = 2^n, 2^n-fold cheaper
    ms = roofline_model(5, 20, 'xyz', kind='state', reversible=True)
    assert ms['flops'] < m5['flops'] / 16
    nba = num_block_angles('cp', 'xyz')
    assert nba == 7  # 3 up + 3 down rotations + the CP angle
