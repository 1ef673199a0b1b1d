"""Repo-vs-REFERENCE golden tests.

tests/golden/reference_goldens.npz holds outputs recorded by actually
running the reference implementation (/root/reference/cpflow, pure-jax
surfaces only) — see tests/golden/make_goldens.py. These tests pin our
simulator, PRNG tree, losses and Adam engine to the reference's recorded
behavior, so a silent semantics drift from cpflow fails loudly (round-1
golden tests only checked run-vs-rerun self-consistency)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpflow_tpu.ops import losses
from cpflow_tpu.optimize import engine
from cpflow_tpu.optimize.candidates import random_cp_angles
from cpflow_tpu.sim.ansatz_kernel import build_unitary, cp_angle_indices, \
    num_block_angles
from cpflow_tpu.sim import batched as batched_sim
from cpflow_tpu.topology import chain_layer, connected_layer, fill_layers

_PATH = os.path.join(os.path.dirname(__file__), 'golden',
                     'reference_goldens.npz')
G = np.load(_PATH)

CONFIGS = [
    ('3q_chain_cp_xyz_k4', 3, chain_layer(3), 'cp', 'xyz', 4, 7),
    ('3q_conn_cp_xz_k5', 3, connected_layer(3), 'cp', 'xz', 5, 11),
    ('4q_chain_cz_xyz_k6', 4, chain_layer(4), 'cz', 'xyz', 6, 3),
    ('5q_chain_cp_xyz_k8', 5, chain_layer(5), 'cp', 'xyz', 8, 42),
]


@pytest.mark.parametrize('tag,n,layer,ent,rot,k,seed', CONFIGS)
def test_prng_tree_matches_reference(tag, n, layer, ent, rot, k, seed):
    """Same seed -> identical initial angles (split-tree parity)."""
    num_angles = len(G[f'{tag}/angles'])
    nba = num_block_angles(ent, rot)
    cpm = np.zeros(num_angles, dtype=np.float32)
    if ent == 'cp':
        cpm[cp_angle_indices(n, nba, k)] = 1
    ours = random_cp_angles(num_angles, jnp.array(cpm), cp_dist='uniform',
                            key=jax.random.PRNGKey(seed))
    np.testing.assert_allclose(np.asarray(ours), G[f'{tag}/angles'],
                               atol=1e-6)


@pytest.mark.parametrize('tag,n,layer,ent,rot,k,seed', CONFIGS)
def test_unitary_matches_reference(tag, n, layer, ent, rot, k, seed):
    """build_unitary at the recorded angles reproduces the recorded matrix
    — both the per-restart kernel and the fused batch-last path."""
    angles = G[f'{tag}/angles']
    ref_u = G[f'{tag}/unitary']
    placements = fill_layers(layer, k)

    ours = np.asarray(build_unitary(n, ent, rot, placements,
                                    jnp.asarray(angles)))
    np.testing.assert_allclose(ours.reshape(ref_u.shape), ref_u, atol=2e-5)

    ub = batched_sim.build_unitary_batched(n, ent, rot, placements,
                                           jnp.asarray(angles)[:, None])
    ub = np.asarray(ub)[..., 0].reshape(ref_u.shape)
    np.testing.assert_allclose(ub, ref_u, atol=2e-5)


@pytest.mark.parametrize('tag,n,layer,ent,rot,k,seed', CONFIGS)
def test_losses_match_reference(tag, n, layer, ent, rot, k, seed):
    u = jnp.asarray(G[f'{tag}/unitary'])
    d = u.shape[0]
    tgt = jnp.asarray(np.diag(np.exp(1j * np.linspace(0, 1, d)))
                      .astype(np.complex64))
    assert float(losses.cost_HST(u, tgt)) == pytest.approx(
        float(G[f'{tag}/cost_hst']), abs=1e-5)
    assert float(losses.disc(u, tgt)) == pytest.approx(
        float(G[f'{tag}/disc']), abs=1e-5)


def test_adam_trajectory_matches_reference():
    """60 reference Adam iterations from a recorded init: our adam_chain
    reproduces the loss trajectory and final parameters."""
    tag, n, layer, ent, rot, k, _ = CONFIGS[0]
    placements = fill_layers(layer, k)
    d = 2 ** n
    tgt = np.eye(d, dtype=np.complex64)
    tgt[d - 2, d - 2] = tgt[d - 1, d - 1] = 0
    tgt[d - 2, d - 1] = tgt[d - 1, d - 2] = 1

    def loss(a):
        u = build_unitary(n, ent, rot, placements, a).reshape(d, d)
        return losses.cost_HST(u, jnp.asarray(tgt))

    init = jnp.asarray(G['adam/initial'], dtype=jnp.float32)
    params_hist, loss_hist = jax.jit(lambda a: engine.adam_chain(
        jax.value_and_grad(loss), a, learning_rate=0.1, num_iterations=60,
        keep_history=True))(init)

    np.testing.assert_allclose(np.asarray(loss_hist),
                               G['adam/loss_history'], atol=5e-4)
    np.testing.assert_allclose(np.asarray(params_hist)[-1],
                               G['adam/final_params'], atol=5e-3)
