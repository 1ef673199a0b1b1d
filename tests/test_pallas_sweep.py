"""Pallas whole-sweep kernel vs the fused engine (interpreter mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpflow_tpu.api import LossSpec
from cpflow_tpu.ops.gates import cz_mat
from cpflow_tpu.ops.penalty import cp_penalty_linear
from cpflow_tpu.optimize import engine
from cpflow_tpu.experimental import pallas_sweep as ps
from cpflow_tpu.sim import batched as bt
from cpflow_tpu.sim.ansatz_kernel import num_block_angles, cp_angle_indices
from cpflow_tpu.topology import chain_layer, fill_layers


@pytest.mark.slow
def test_pallas_sweep_matches_fused_interpret():
    n, k, rot = 2, 2, 'xz'
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    cp_mask = np.zeros(P, dtype=np.float32)
    cp_mask[cp_angle_indices(n, nba, k)] = 1
    r, T = 0.002, 60

    rng = np.random.default_rng(0)
    inits = jnp.array(rng.uniform(0, 2 * np.pi, (ps.LANES, P)).astype(np.float32))

    raw_p = ps.pallas_minimize_fused(n, rot, placements, np.asarray(cz_mat),
                                     cp_mask, r, T, inits, interpret=True)

    spec = LossSpec('hst', target=cz_mat)
    penalty = lambda a: cp_penalty_linear(a, np.pi / 2, 2.0, .05, .05, .05)
    regloss_fn = bt.make_batched_regloss(n, 'cp', rot, placements, spec,
                                         cp_mask=jnp.array(cp_mask),
                                         regularization_func=penalty, r=r,
                                         reversible=True)
    raw_f = engine.minimize_fused(regloss_fn, inits, learning_rate=0.1,
                                  num_iterations=T, keep_history=False)

    np.testing.assert_allclose(np.asarray(raw_p.regloss[:, 0]),
                               np.asarray(raw_f.regloss[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(raw_p.regloss[:, 1]),
                               np.asarray(raw_f.regloss[:, 1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(raw_p.loss),
                               np.asarray(raw_f.loss), atol=1e-4)


def test_pallas_penalty_val_grad():
    xs = jnp.linspace(0.01, 2 * np.pi - 0.01, 301)
    val, grad = ps._penalty_val_grad(xs, np.pi / 2, 2.0, .05, .05, .05)
    ref = cp_penalty_linear(xs, np.pi / 2, 2.0, .05, .05, .05)
    np.testing.assert_allclose(np.asarray(val), np.asarray(ref), atol=1e-5)
    # gradient: finite differences away from kinks
    eps = 1e-4
    vp, _ = ps._penalty_val_grad(xs + eps, np.pi / 2, 2.0, .05, .05, .05)
    vm, _ = ps._penalty_val_grad(xs - eps, np.pi / 2, 2.0, .05, .05, .05)
    fd = (np.asarray(vp) - np.asarray(vm)) / (2 * eps)
    # f32 rounding of x +- eps itself injects ~x*eps_f32/eps ~ 2e-3 slope noise
    smooth = np.abs(fd - np.asarray(grad)) < 6e-3
    assert smooth.mean() > 0.9  # kinks excluded
