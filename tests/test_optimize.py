"""Optimizer engine: convergence, history semantics, batching, verification."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpflow_tpu.optimize import (
    mynimize, mynimize_repeated, unitary_learn, minimize_multistart)
from cpflow_tpu.optimize import candidates as cand
from cpflow_tpu.ops import gates
from cpflow_tpu.ops.losses import cost_HST
from cpflow_tpu.sim.ansatz_kernel import build_unitary, num_block_angles, cp_angle_indices
from cpflow_tpu.topology import chain_layer, fill_layers


def quadratic(x):
    return ((x - 2.0) ** 2).sum()


def test_adam_history_semantics():
    hist, losses = mynimize(quadratic, 3, method='adam', learning_rate=0.1,
                            num_iterations=50, keep_history=True,
                            initial_params=jnp.zeros(3))
    assert hist.shape == (50, 3)
    assert losses.shape == (50,)
    # entry 0 is the initial point, loss[i] evaluated at hist[i]
    np.testing.assert_allclose(np.asarray(hist[0]), np.zeros(3), atol=1e-7)
    assert float(losses[0]) == pytest.approx(12.0, abs=1e-5)
    for i in [1, 10, 49]:
        assert float(losses[i]) == pytest.approx(float(quadratic(hist[i])), abs=1e-5)


def test_adam_best_tracking():
    hist, losses = mynimize(quadratic, 3, method='adam', learning_rate=0.1,
                            num_iterations=500, keep_history=False,
                            initial_params=jnp.zeros(3))
    assert hist.shape == (2, 3)
    assert losses.shape == (2,)
    assert float(losses[0]) == pytest.approx(12.0, abs=1e-5)  # initial
    assert float(losses[1]) < 1e-3  # best
    np.testing.assert_allclose(np.asarray(hist[1]), 2 * np.ones(3), atol=0.1)


def test_multistart_batched():
    inits = jnp.stack([jnp.zeros(2), jnp.ones(2) * 5, -jnp.ones(2)])
    res = mynimize_repeated(quadratic, 2, learning_rate=0.2,
                            num_iterations=300, keep_history=False,
                            initial_params_batch=inits)
    assert len(res) == 3
    for r in res:
        assert float(r['loss'][1]) < 1e-3


def test_multistart_with_regularization_history_decomposition():
    reg = lambda p: 0.1 * jnp.abs(p).sum()
    inits = jnp.stack([jnp.ones(2), 2 * jnp.ones(2)])
    res = mynimize_repeated(quadratic, 2, learning_rate=0.1,
                            num_iterations=20, keep_history=True,
                            regularization_func=reg,
                            initial_params_batch=inits)
    r = res[0]
    # regloss = loss + reg at every history point
    np.testing.assert_allclose(np.asarray(r['regloss']),
                               np.asarray(r['loss'] + r['reg']), atol=1e-5)
    assert float(r['reg'][0]) == pytest.approx(0.2, abs=1e-5)


def test_single_start_returns_dict():
    res = mynimize_repeated(quadratic, 2, learning_rate=0.2,
                            num_iterations=100, keep_history=False,
                            initial_params_batch=jnp.zeros(2))
    assert isinstance(res, dict)
    assert float(res['loss'][1]) < 1e-2


def test_gradient_descent_and_hessian_methods():
    hist, losses = mynimize(quadratic, 2, method='hessian', learning_rate=1.0,
                            num_iterations=5, keep_history=True,
                            initial_params=jnp.zeros(2))
    # Newton on a quadratic converges in one step
    assert float(losses[1]) < 1e-6


def test_angle_by_angle_on_trig_loss():
    target = jnp.array(gates.cz_mat)
    placements = fill_layers(chain_layer(2), 1)
    u_func = lambda angs: build_unitary(2, 'cz', 'xz', placements, angs)
    nba = num_block_angles('cz', 'xz')
    num_angles = 3 * 2 + nba
    loss = lambda angs: cost_HST(u_func(angs), target)
    hist, losses = mynimize(loss, num_angles, method='angle by angle',
                            num_iterations=20,
                            initial_params=jnp.linspace(0.3, 4.0, num_angles))
    assert float(losses[-1]) < 1e-4


def test_unitary_learn_cz():
    placements = fill_layers(chain_layer(2), 2)
    u_func = lambda angs: build_unitary(2, 'cp', 'xz', placements, angs)
    nba = num_block_angles('cp', 'xz')
    num_angles = 3 * 2 + nba * 2
    res = unitary_learn(u_func, jnp.array(gates.cz_mat), num_angles,
                        num_repeats=8, keep_history=False,
                        num_iterations=400)
    best = min(float(r['loss'][1]) for r in res)
    assert best < 1e-5


def test_natural_adam_runs():
    placements = fill_layers(chain_layer(2), 1)
    u_func = lambda angs: build_unitary(2, 'cp', 'xz', placements, angs)
    nba = num_block_angles('cp', 'xz')
    num_angles = 3 * 2 + nba
    loss = lambda angs: cost_HST(u_func(angs), jnp.array(gates.cz_mat))
    hist, losses = mynimize(loss, num_angles, method='natural adam',
                            learning_rate=0.1, num_iterations=30,
                            u_func=u_func, keep_history=True,
                            initial_params=jnp.linspace(0.2, 3.0, num_angles))
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])


# --------------------------------------------------------------------------
# Candidate pipeline
# --------------------------------------------------------------------------

def test_cz_value_and_count():
    a = jnp.array([0.0, np.pi, 2 * np.pi - 0.001, 1.5, np.pi + 0.1])
    v = np.asarray(cand.cz_value(a, threshold=0.01))
    np.testing.assert_array_equal(v, [0, 1, 0, 2, 2])
    assert int(cand.count_cz(a, threshold=0.2)) == 0 + 1 + 0 + 2 + 1


def test_project_cp_angles():
    a = jnp.array([0.1, np.pi - 0.1, 2.0, 2 * np.pi - 0.05, -0.1])
    p = np.asarray(cand.project_cp_angles(a, threshold=0.2))
    assert p[0] == 0.0
    assert p[1] == pytest.approx(np.pi)
    assert p[2] == pytest.approx(2.0)
    assert p[3] == 0.0
    assert p[4] == 0.0  # -0.1 mod 2pi is near 2pi -> 0


def test_random_cp_angles_dists():
    key = jax.random.PRNGKey(3)
    mask = jnp.array([0, 0, 1, 0, 1], dtype=jnp.float32)
    u = cand.random_cp_angles(5, mask, 'uniform', key=key)
    z = cand.random_cp_angles(5, mask, '0', key=key)
    nrm = cand.random_cp_angles(5, mask, 'normal', key=key)
    assert np.asarray(z)[2] == 0.0 and np.asarray(z)[4] == 0.0
    np.testing.assert_allclose(np.asarray(z)[[0, 1, 3]],
                               np.asarray(u)[[0, 1, 3]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nrm)[[0, 1, 3]],
                               np.asarray(u)[[0, 1, 3]], atol=1e-6)


def test_generate_initial_angles_matches_sequential():
    """Vmapped batch generation must produce the same bits as the reference's
    per-subkey list comprehension (main.py:541-548)."""
    key = jax.random.PRNGKey(7)
    mask = jnp.array([0, 1, 0], dtype=jnp.float32)
    batch = cand.generate_initial_angles_batch(key, 3, mask, 'uniform', batch_size=4)
    key2, *subkeys = jax.random.split(jax.random.PRNGKey(7), num=5)
    seq = np.stack([np.asarray(cand.random_cp_angles(3, mask, 'uniform', key=k))
                    for k in subkeys])
    np.testing.assert_allclose(np.asarray(batch), seq, atol=1e-7)


@pytest.mark.slow
def test_evaluate_and_filter_and_verify_end_to_end():
    """Mini static pipeline: learn CZ with a 2-block CP template, evaluate,
    filter, verify — all batched."""
    n, k = 2, 2
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', 'xz')
    P = 3 * n + nba * k
    cp_idx = cp_angle_indices(n, nba, k)
    cp_mask = np.zeros(P, dtype=np.float32)
    cp_mask[cp_idx] = 1
    cp_mask = jnp.array(cp_mask)

    target = jnp.array(gates.cz_mat)
    u_func = lambda angs: build_unitary(n, 'cp', 'xz', placements, angs)
    loss_func = lambda angs: cost_HST(u_func(angs), target)

    from cpflow_tpu.ops.penalty import cp_penalty_linear
    reg = lambda angs: 0.002 * cp_penalty_linear(
        angs * cp_mask, np.pi / 2, 2.0, 0.05, 0.05, 0.05).sum()

    key = jax.random.PRNGKey(0)
    inits = cand.generate_initial_angles_batch(key, P, cp_mask, 'uniform', 16)
    raw = minimize_multistart(loss_func, inits, learning_rate=0.1,
                              num_iterations=600, keep_history=False,
                              regularization_func=reg)

    ev = cand.evaluate_raw_batch(raw, cp_mask, threshold=0.2)
    assert ev.cz.shape == (16,)
    idx = cand.filter_prospective(ev, threshold_cz_count=3, threshold_loss=1e-3)
    assert len(idx) > 0, f"no prospective candidates; losses {ev.loss}, cz {ev.cz}"

    ver = cand.verify_candidates_batch(
        lambda u: cost_HST(u, target), u_func, ev.angles[idx], cp_mask,
        threshold_cp=0.2, learning_rate=0.01, num_iterations=1500,
        target_loss=1e-6)
    assert ver.success.any(), f"verification failed: {ver.best_loss}"
    # the successful candidate implements CZ with at least one real CZ gate
    assert (ver.cz[ver.success] >= 1).all()


def test_batch_axis_trailing_matches_leading():
    """batch_axis=-1 (TPU-tile-friendly layout) must give identical results."""
    from cpflow_tpu.optimize.engine import minimize_multistart
    inits = jnp.stack([jnp.zeros(3), jnp.ones(3) * 4, -2 * jnp.ones(3)])
    reg = lambda p: 0.05 * jnp.abs(p).sum()
    a = minimize_multistart(quadratic, inits, learning_rate=0.2,
                            num_iterations=100, keep_history=False,
                            regularization_func=reg, batch_axis=0)
    b = minimize_multistart(quadratic, inits, learning_rate=0.2,
                            num_iterations=100, keep_history=False,
                            regularization_func=reg, batch_axis=-1)
    np.testing.assert_allclose(np.asarray(a.params), np.asarray(b.params),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.regloss), np.asarray(b.regloss),
                               atol=1e-5)


@pytest.mark.slow
def test_reference_shaped_single_candidate_wrappers():
    """convert_cp_to_cz / evaluate_cp_result / filter_cp_results /
    verify_cp_result with the reference's contracts (cp_utils.py:111-247)."""
    from cpflow_tpu.api import Ansatz, StaticOptions, LossSpec

    n, k = 2, 2
    anz = Ansatz(n, 'cp', fill_layers(chain_layer(n), k), rotation_gates='xz')
    spec = LossSpec('hst', target=gates.cz_mat)
    loss_func = lambda angs: spec(anz.unitary(angs))

    from cpflow_tpu.optimize import mynimize_repeated
    from cpflow_tpu.ops.penalty import cp_penalty_linear
    reg = lambda angs: 0.002 * cp_penalty_linear(
        angs * anz.cp_mask, np.pi / 2, 2.0, .05, .05, .05).sum()
    inits = cand.generate_initial_angles_batch(
        jax.random.PRNGKey(0), anz.num_angles, anz.cp_mask, 'uniform', 8)
    res_list = mynimize_repeated(loss_func, anz.num_angles,
                                 initial_params_batch=inits,
                                 regularization_func=reg,
                                 keep_history=False, num_iterations=500)

    selected = cand.filter_cp_results(res_list, anz.cp_mask,
                                      threshold_cz_count=3,
                                      threshold_loss=1e-3)
    assert len(selected) > 0
    assert selected == sorted(selected, key=lambda x: x[0])

    cz0, res0 = selected[0]
    options = StaticOptions(num_cp_gates=k, accepted_num_cz_gates=3,
                            num_gd_iterations_at_verification=1500)
    out = cand.verify_cp_result(res0, anz, spec, options)
    success, num_cz, circ_func, u_func, best_angs = out
    assert success
    assert num_cz == cz0
    # circ/u functions evaluate consistently at the learned angles
    qc = circ_func(np.asarray(best_angs))
    u = np.asarray(u_func(best_angs))
    from cpflow_tpu.circuits.passes import hst_distance
    assert hst_distance(qc.unitary().astype(np.complex64), u) < 1e-4


def test_fused_sweep_target_loss_early_exit():
    """With target_loss set, the sweep stops once every restart is under it
    and still reports converged best values (quadratic bowl: converges fast)."""
    from cpflow_tpu.optimize.engine import fused_adam_sweep

    def regloss_fn(p):  # (P, B) -> per-restart quadratic
        v = (p ** 2).sum(axis=0)
        return v, v

    p0 = jnp.array(np.random.default_rng(0).normal(size=(3, 4)),
                   dtype=jnp.float32)
    _, full_reg, _ = jax.jit(lambda q: fused_adam_sweep(
        regloss_fn, q, learning_rate=0.2, num_iterations=500))(p0)
    _, early_reg, early_loss = jax.jit(lambda q: fused_adam_sweep(
        regloss_fn, q, learning_rate=0.2, num_iterations=500,
        target_loss=1e-3))(p0)
    assert np.all(np.asarray(early_loss) <= 1e-3)
    # early-exit bests are exactly as converged as required
    assert np.all(np.asarray(early_reg) <= 1e-3)
    assert np.all(np.asarray(full_reg) <= np.asarray(early_reg) + 1e-6)


def test_fused_sweep_init_vals_match():
    """Passing precomputed (regloss0, loss0) must not change results."""
    from cpflow_tpu.optimize.engine import fused_adam_sweep

    def regloss_fn(p):
        v = ((p - 1.0) ** 2).sum(axis=0)
        return v, v

    p0 = jnp.array(np.random.default_rng(1).normal(size=(2, 3)),
                   dtype=jnp.float32)
    bp_a, br_a, bl_a = jax.jit(lambda q: fused_adam_sweep(
        regloss_fn, q, num_iterations=50))(p0)
    bp_b, br_b, bl_b = jax.jit(lambda q: fused_adam_sweep(
        regloss_fn, q, num_iterations=50, init_vals=regloss_fn(q)))(p0)
    np.testing.assert_allclose(np.asarray(bp_a), np.asarray(bp_b))
    np.testing.assert_allclose(np.asarray(br_a), np.asarray(br_b))
