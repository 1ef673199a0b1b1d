"""Coverage of secondary behavioral paths: adaptive early-stop/keep_logs,
relative-phase compilation, default-init multistart, success-ratio harness."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cpflow_tpu import (AdaptiveOptions, LossSpec, StaticOptions, Synthesize)
from cpflow_tpu.ops import gates
from cpflow_tpu.optimize import mynimize_repeated


CZ_LAYER = [[0, 1]]


@pytest.mark.slow
def test_adaptive_stop_if_target_reached(tmp_path):
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=2,
                           max_evals=10, num_samples=8,
                           num_gd_iterations=400, rotation_gates='xz',
                           num_gd_iterations_at_verification=1500,
                           stop_if_target_reached=True,
                           target_num_cz_gates=3)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='stop_early')
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'r'), verbose=False)
    # a CZ target on 2 qubits is found immediately -> loop stops well short
    assert len(results.trials.results) < 10
    assert len(results.decompositions) >= 1


@pytest.mark.slow
def test_adaptive_keep_logs(tmp_path):
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=2,
                           max_evals=2, num_samples=4,
                           num_gd_iterations=200, rotation_gates='x',
                           num_gd_iterations_at_verification=400,
                           keep_logs=True)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='keep_logs')
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'r'), verbose=False)
    # with keep_logs the raw prospective angle sets stay in the trial record
    assert all('prospective_decompositions' in rec
               for rec in results.trials.results)


@pytest.mark.slow
def test_modulo_diagonal_loss_through_synthesize():
    """Relative-phase compilation: CZ equals CP(pi); compiling CZ modulo a
    diagonal transformation is satisfiable with ZERO entangling gates
    (any diagonal circuit matches), so even an empty-ish template passes."""
    spec = LossSpec('modulo_diagonal', target=np.asarray(gates.cz_mat),
                    num_qubits=2, wires=[0, 1])
    s = Synthesize(CZ_LAYER, unitary_loss_func=spec, mesh=None,
                   label='relphase')
    options = StaticOptions(num_cp_gates=1, accepted_num_cz_gates=1,
                            num_samples=8, num_gd_iterations=500,
                            rotation_gates='xz',
                            num_gd_iterations_at_verification=1000)
    results = s.static(options, save_results=False, verbose=False)
    assert len(results.decompositions) >= 1
    d = results.decompositions[0]
    assert float(d.loss) < 1e-5


def test_mynimize_repeated_default_random_inits():
    f = lambda x: ((x - 1.0) ** 2).sum()
    res = mynimize_repeated(f, 3, num_repeats=4, keep_history=False,
                            num_iterations=200, learning_rate=0.2)
    assert len(res) == 4
    assert min(float(r['loss'][1]) for r in res) < 1e-3
    single = mynimize_repeated(f, 3, num_repeats=1, keep_history=False,
                               num_iterations=200, learning_rate=0.2)
    assert isinstance(single, dict)


@pytest.mark.slow
def test_success_ratio_harness():
    # paper protocol (peppar cells 53-54): fixed 'cz' architecture given as
    # ordered placements, criterion 1e-4
    from benchmarks.success_ratio import success_ratio
    ratio, best = success_ratio([(0, 1)], 'xz', jnp.array(gates.cz_mat),
                                num_samples=16, num_iterations=500)
    assert 0.0 <= ratio <= 1.0
    assert best.shape == (16,)
    # a single CZ block trivially implements CZ: most restarts converge
    assert ratio > 0.3


@pytest.mark.slow
def test_results_default_save_path(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='default_path')
    options = StaticOptions(num_cp_gates=1, accepted_num_cz_gates=2,
                            num_samples=4, num_gd_iterations=300,
                            rotation_gates='x',
                            num_gd_iterations_at_verification=500)
    s.static(options, save_results=True, verbose=False)
    assert os.path.exists(tmp_path / 'results' / 'default_path')


@pytest.mark.slow
def test_cli_synthesize_and_info(capsys):
    import json
    from cpflow_tpu.__main__ import main
    main(['info'])
    main(['synthesize', '--target', 'cz', '--layer', 'chain', '--static',
          '--num-cp-gates', '2', '--num-samples', '8', '--accepted-cz', '3',
          '--no-save', '--refine'])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith('{')]
    info = json.loads(lines[0])
    assert 'backend' in info
    result = json.loads(lines[1])
    assert len(result['decompositions']) >= 1
    assert result['decompositions'][0]['loss'] < 1e-5


def test_mesh_helpers():
    from cpflow_tpu.parallel import mesh as mesh_lib
    # no-op without coordinator
    mesh_lib.distributed_init(None)
    m = mesh_lib.restart_mesh()
    assert mesh_lib.padded_batch_size(100, m) == 104  # 8 devices
    assert mesh_lib.padded_batch_size(100, None) == 100
    assert mesh_lib.padded_batch_size(96, m) == 96


@pytest.mark.slow
def test_bucketed_adaptive_matches_semantics(tmp_path):
    """Bucketed mode (one executable for all template lengths) finds the
    same class of decompositions as the unbucketed search."""
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                           max_evals=3, num_samples=8,
                           num_gd_iterations=400, rotation_gates='xz',
                           num_gd_iterations_at_verification=1200,
                           bucketed=True)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='bucketed')
    results = s.adaptive(opts, save_results=False, verbose=False)
    assert len(results.trials.results) == 3
    assert len(results.decompositions) >= 1
    d = results.decompositions[0]
    assert float(d.loss) < 1e-5
    assert 1 <= d.cz_count <= 3
    # the stage executable is cached on the instance and reused
    assert len(s._stage_cache) == 1


def test_bucketed_frozen_tail_is_identity():
    """A k-template realized by masking a k_max-template produces the same
    evaluated losses as the direct k-template run (same restarts modulo the
    PRNG vector length)."""
    from cpflow_tpu.sim import batched as bt
    from cpflow_tpu.optimize import engine as eng
    from cpflow_tpu.sim.ansatz_kernel import num_block_angles
    from cpflow_tpu.topology import fill_layers

    n, k, k_max, rot = 2, 1, 3, 'xz'
    nba = num_block_angles('cp', rot)
    spec = LossSpec('hst', target=gates.cz_mat)

    anz_max_pl = fill_layers(CZ_LAYER, k_max)
    anz_k_pl = fill_layers(CZ_LAYER, k)
    P_max = 3 * n + nba * k_max
    P_k = 3 * n + nba * k

    rng = np.random.default_rng(0)
    angles_k = rng.uniform(0, 2 * np.pi, (4, P_k)).astype(np.float32)
    angles_max = np.zeros((4, P_max), dtype=np.float32)
    angles_max[:, :P_k] = angles_k

    f_max = bt.make_batched_regloss(n, 'cp', rot, anz_max_pl, spec)
    f_k = bt.make_batched_regloss(n, 'cp', rot, anz_k_pl, spec)
    loss_max = np.asarray(f_max(jnp.array(angles_max.T))[0])
    loss_k = np.asarray(f_k(jnp.array(angles_k.T))[0])
    np.testing.assert_allclose(loss_max, loss_k, atol=1e-5)


@pytest.mark.slow
def test_bucketed_results_pickle(tmp_path):
    """The compiled-stage cache must not leak into Results persistence."""
    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=2,
                           max_evals=1, num_samples=4,
                           num_gd_iterations=200, rotation_gates='x',
                           num_gd_iterations_at_verification=300,
                           bucketed=True)
    s = Synthesize(CZ_LAYER, target_unitary=gates.cz_mat, mesh=None,
                   label='bucketed_save')
    results = s.adaptive(opts, save_results=True,
                         save_to=str(tmp_path / 'r'), verbose=False)
    from cpflow_tpu import Results
    loaded = Results.load(str(tmp_path / 'r'))
    assert len(loaded.trials.results) == 1
