"""Hand-derived adjoint math vs jax autodiff (the Pallas kernel's math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpflow_tpu.ops import gates
from cpflow_tpu.sim import adjoint, batched as bt
from cpflow_tpu.sim.ansatz_kernel import num_block_angles
from cpflow_tpu.topology import chain_layer, connected_layer, fill_layers


def test_block_matrix_and_grads_vs_jacfwd():
    rot = 'xz'
    nba = num_block_angles('cp', rot)
    a = jnp.array(np.random.default_rng(0).uniform(0, 6.28, (nba, 3)),
                  dtype=jnp.float32)
    g, grads = adjoint.block_matrix_and_grads('cp', rot, a)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(bt.block_matrix_batched('cp', rot, a)),
                               atol=1e-6)
    jac = jax.jacfwd(lambda aa: bt.block_matrix_batched('cp', rot, aa),
                     holomorphic=False)(a)
    # jac shape: (4,4,B, nba,B); diagonal in batch
    for j in range(nba):
        expected = np.stack([np.asarray(jac)[:, :, b, j, b] for b in range(3)],
                            axis=-1)
        np.testing.assert_allclose(np.asarray(grads[j]), expected, atol=1e-5)


def test_surface_matrix_and_grads_vs_jacfwd():
    a = jnp.array(np.random.default_rng(1).uniform(0, 6.28, (3, 2)),
                  dtype=jnp.float32)
    g, grads = adjoint.surface_matrix_and_grads(a)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(bt.surface_gate_batched(a)), atol=1e-6)
    jac = jax.jacfwd(bt.surface_gate_batched)(a)
    for j in range(3):
        expected = np.stack([np.asarray(jac)[:, :, b, j, b] for b in range(2)],
                            axis=-1)
        np.testing.assert_allclose(np.asarray(grads[j]), expected, atol=1e-5)


@pytest.mark.parametrize("n,k,rot,layer_fn,target", [
    (2, 2, 'xz', chain_layer, gates.cz_mat),
    (3, 4, 'xyz', chain_layer, gates.u_ccz3),
    (3, 5, 'xz', connected_layer, gates.u_toff3),
])
@pytest.mark.slow
def test_manual_grad_matches_autodiff(n, k, rot, layer_fn, target):
    placements = fill_layers(layer_fn(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    B = 4
    angles = jnp.array(np.random.default_rng(2).uniform(0, 6.28, (P, B)),
                       dtype=jnp.float32)

    manual = adjoint.manual_value_and_grad(n, 'cp', rot, placements, target)
    loss_m, grad_m = manual(angles)

    def loss_sum(a):
        u = bt.build_unitary_batched(n, 'cp', rot, placements, a)
        return bt.batched_cost_hst(u, target).sum()

    loss_a, grad_a = jax.value_and_grad(loss_sum)(angles)

    assert float(jnp.sum(loss_m)) == pytest.approx(float(loss_a), abs=1e-5)
    np.testing.assert_allclose(np.asarray(grad_m), np.asarray(grad_a),
                               atol=5e-4, rtol=1e-3)
