"""Batch-last fused kernel vs the vmapped reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpflow_tpu import LossSpec
from cpflow_tpu.ops import gates
from cpflow_tpu.ops.losses import cost_HST, state_prep_loss
from cpflow_tpu.ops.penalty import cp_penalty_linear
from cpflow_tpu.optimize import engine
from cpflow_tpu.sim import batched as bt
from cpflow_tpu.sim.ansatz_kernel import build_unitary, num_block_angles, cp_angle_indices
from cpflow_tpu.topology import chain_layer, connected_layer, fill_layers


def _setup(n=3, k=4, rot='xz', B=6, seed=0, layer_fn=chain_layer):
    placements = fill_layers(layer_fn(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    rng = np.random.default_rng(seed)
    angles = rng.uniform(0, 2 * np.pi, (B, P)).astype(np.float32)
    return placements, P, angles


@pytest.mark.parametrize("n,k,rot,layer_fn", [
    (2, 2, 'xz', chain_layer),
    (3, 4, 'xyz', chain_layer),
    (3, 5, 'xz', connected_layer),  # free blocks
])
def test_batched_builder_matches_vmapped(n, k, rot, layer_fn):
    placements, P, angles = _setup(n, k, rot, B=5, layer_fn=layer_fn)
    u_b = bt.build_unitary_batched(n, 'cp', rot, placements, jnp.array(angles.T))
    u_b = np.asarray(u_b).reshape(2 ** n, 2 ** n, -1)
    u_v = np.asarray(jax.vmap(
        lambda a: build_unitary(n, 'cp', rot, placements, a))(jnp.array(angles)))
    for b in range(angles.shape[0]):
        np.testing.assert_allclose(u_b[:, :, b], u_v[b], atol=2e-5)


def test_batched_gate_matrices():
    a = jnp.array([0.3, 1.7, -0.4])
    for letter, ref in [('x', gates.rx_mat), ('y', gates.ry_mat),
                        ('z', gates.rz_mat)]:
        got = np.asarray(bt._rot_batched(letter, a))
        for i, ai in enumerate(np.asarray(a)):
            np.testing.assert_allclose(got[:, :, i], np.asarray(ref(ai)),
                                       atol=1e-6)
    got = np.asarray(bt._cp_batched(a))
    for i, ai in enumerate(np.asarray(a)):
        np.testing.assert_allclose(got[:, :, i], np.asarray(gates.cp_mat(ai)),
                                   atol=1e-6)


def test_batched_losses_match():
    n, k, rot = 3, 4, 'xz'
    placements, P, angles = _setup(n, k, rot, B=4)
    target = gates.u_ccz3
    u_b = bt.build_unitary_batched(n, 'cp', rot, placements, jnp.array(angles.T))
    hst_b = np.asarray(bt.batched_cost_hst(u_b, target))
    state = np.zeros(8, dtype=np.complex64)
    state[0] = state[-1] = 2 ** -0.5
    st_b = np.asarray(bt.batched_state_prep(u_b, state))

    for b in range(4):
        u = build_unitary(n, 'cp', rot, placements, jnp.array(angles[b]))
        assert hst_b[b] == pytest.approx(float(cost_HST(u, target)), abs=2e-5)
        assert st_b[b] == pytest.approx(float(state_prep_loss(u, jnp.array(state))),
                                        abs=2e-5)


def test_batched_unitary_loss_custom_fallback():
    n, k, rot = 2, 2, 'xz'
    placements, P, angles = _setup(n, k, rot, B=3)
    u_b = bt.build_unitary_batched(n, 'cp', rot, placements, jnp.array(angles.T))
    custom = lambda u: cost_HST(u, jnp.array(gates.cz_mat))
    got = np.asarray(bt.batched_unitary_loss(custom, u_b))
    spec = LossSpec('hst', target=gates.cz_mat)
    fast = np.asarray(bt.batched_unitary_loss(spec, u_b))
    np.testing.assert_allclose(got, fast, atol=2e-5)


@pytest.mark.slow
def test_minimize_fused_matches_vmapped_engine():
    """Fused batch-last Adam must track the vmapped engine: same initial
    entries exactly, same converged losses."""
    n, k, rot = 2, 2, 'xz'
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    cp_mask = np.zeros(P, dtype=np.float32)
    cp_mask[cp_angle_indices(n, nba, k)] = 1
    cp_mask_j = jnp.array(cp_mask)
    spec = LossSpec('hst', target=gates.cz_mat)
    r = 0.002
    penalty = lambda a: cp_penalty_linear(a, np.pi / 2, 2.0, .05, .05, .05)

    rng = np.random.default_rng(1)
    inits = jnp.array(rng.uniform(0, 2 * np.pi, (8, P)).astype(np.float32))

    regloss_fn = bt.make_batched_regloss(
        n, 'cp', rot, placements, spec, cp_mask=cp_mask_j,
        regularization_func=penalty, r=r)
    fused = engine.minimize_fused(regloss_fn, inits, learning_rate=0.1,
                                  num_iterations=400, keep_history=False)

    from cpflow_tpu.sim.ansatz_kernel import build_unitary as bu
    loss_fn = lambda a: spec(bu(n, 'cp', rot, placements, a))
    reg_fn = lambda a: r * penalty(a * cp_mask_j).sum()
    vmapped = engine.minimize_multistart(loss_fn, inits, learning_rate=0.1,
                                         num_iterations=400,
                                         keep_history=False,
                                         regularization_func=reg_fn)

    np.testing.assert_allclose(np.asarray(fused.regloss[:, 0]),
                               np.asarray(vmapped.regloss[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.params[:, 0]),
                               np.asarray(vmapped.params[:, 0]), atol=1e-6)
    # converged best reglosses agree (trajectories may differ in float assoc)
    np.testing.assert_allclose(np.asarray(fused.regloss[:, 1]),
                               np.asarray(vmapped.regloss[:, 1]), atol=1e-3)


def test_minimize_fused_history_mode():
    regloss_fn = lambda p: ((((p - 2.0) ** 2).sum(axis=0)),) * 2
    inits = jnp.array([[0.0, 0.0], [4.0, 4.0]])
    raw = engine.minimize_fused(regloss_fn, inits, learning_rate=0.2,
                                num_iterations=50, keep_history=True)
    assert raw.params.shape == (2, 50, 2)
    assert raw.regloss.shape == (2, 50)
    np.testing.assert_allclose(np.asarray(raw.params[:, 0]),
                               np.asarray(inits), atol=1e-7)
    assert float(raw.regloss[0, -1]) < float(raw.regloss[0, 0])


def test_minimize_fused_grad_mask():
    regloss_fn = lambda p: ((((p - 2.0) ** 2).sum(axis=0)),) * 2
    inits = jnp.zeros((3, 4))
    mask = np.ones((3, 4), dtype=np.float32)
    mask[:, 0] = 0  # freeze coordinate 0 for every restart
    raw = engine.minimize_fused(regloss_fn, inits, learning_rate=0.3,
                                num_iterations=200, keep_history=False,
                                grad_mask=mask)
    best = np.asarray(raw.params[:, 1])
    np.testing.assert_allclose(best[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(best[:, 1:], 2.0, atol=1e-2)


@pytest.mark.slow
def test_minimize_fused_sharded_matches_unsharded():
    """Sharding the restart batch over the 8-device CPU mesh must not change
    results (restarts are independent; no cross-restart reductions)."""
    from cpflow_tpu.parallel import mesh as mesh_lib

    n, k, rot = 2, 2, 'xz'
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    spec = LossSpec('hst', target=gates.cz_mat)
    regloss_fn = bt.make_batched_regloss(n, 'cp', rot, placements, spec)

    rng = np.random.default_rng(5)
    inits = jnp.array(rng.uniform(0, 2 * np.pi, (16, P)).astype(np.float32))

    plain = engine.minimize_fused(regloss_fn, inits, learning_rate=0.1,
                                  num_iterations=150, keep_history=False)
    mesh = mesh_lib.restart_mesh()
    sharded = engine.minimize_fused(regloss_fn, inits, learning_rate=0.1,
                                    num_iterations=150, keep_history=False,
                                    sharding=mesh_lib.restart_sharding(mesh))
    np.testing.assert_allclose(np.asarray(plain.regloss),
                               np.asarray(sharded.regloss), atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain.params),
                               np.asarray(sharded.params), atol=1e-4)


@pytest.mark.slow
def test_reversible_builder_gradients_match_autodiff():
    """Storage-free custom VJP must agree with autodiff gradients."""
    for n, k, rot, layer_fn in [(2, 2, 'xz', chain_layer),
                                (3, 5, 'xyz', chain_layer)]:
        placements = fill_layers(layer_fn(n), k)
        nba = num_block_angles('cp', rot)
        P = 3 * n + nba * k
        spec = LossSpec('hst', target=(gates.cz_mat if n == 2 else gates.u_ccz3))

        plain = bt.make_batched_regloss(n, 'cp', rot, placements, spec)
        rev = bt.make_batched_regloss(n, 'cp', rot, placements, spec,
                                      reversible=True)

        rng = np.random.default_rng(2)
        angles = jnp.array(rng.uniform(0, 2 * np.pi, (P, 4)).astype(np.float32))

        f_plain = lambda a: plain(a)[0].sum()
        f_rev = lambda a: rev(a)[0].sum()
        v1, g1 = jax.value_and_grad(f_plain)(angles)
        v2, g2 = jax.value_and_grad(f_rev)(angles)
        assert float(v1) == pytest.approx(float(v2), abs=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_reversible_fused_minimization_converges():
    n, k, rot = 2, 2, 'xz'
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    spec = LossSpec('hst', target=gates.cz_mat)
    regloss_fn = bt.make_batched_regloss(n, 'cp', rot, placements, spec,
                                         reversible=True)
    rng = np.random.default_rng(3)
    inits = jnp.array(rng.uniform(0, 2 * np.pi, (8, P)).astype(np.float32))
    raw = engine.minimize_fused(regloss_fn, inits, learning_rate=0.1,
                                num_iterations=400, keep_history=False)
    assert float(np.asarray(raw.regloss[:, 1]).min()) < 1e-5


def test_apply_gate_slices_variant_matches():
    n, B = 3, 4
    rng = np.random.default_rng(0)
    u = jnp.array((rng.normal(size=(2,)*3 + (8, B)) +
                   1j * rng.normal(size=(2,)*3 + (8, B))).astype(np.complex64))
    for placement in ([0], [2], [0, 2], [2, 0], [1, 2]):
        dim = 2 ** len(placement)
        g = jnp.array((rng.normal(size=(dim, dim, B)) +
                       1j * rng.normal(size=(dim, dim, B))).astype(np.complex64))
        a = np.asarray(bt._apply_gate_batched(g, u, placement, n))
        b = np.asarray(bt._apply_gate_batched_slices(g, u, placement, n))
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_six_qubit_capability():
    """6q works end-to-end (the reference's experiments cap at 5q;
    SURVEY §5 notes the dense-unitary representation supports ~6-7q)."""
    n, k, rot = 6, 6, 'xz'
    placements = fill_layers(chain_layer(n), k)
    nba = num_block_angles('cp', rot)
    P = 3 * n + nba * k
    rng = np.random.default_rng(0)
    angles = jnp.array(rng.uniform(0, 6.28, (P, 2)).astype(np.float32))
    u = bt.build_unitary_batched(n, 'cp', rot, placements, angles)
    um = np.asarray(u).reshape(64, 64, 2)
    for b in range(2):
        np.testing.assert_allclose(um[:, :, b] @ um[:, :, b].conj().T,
                                   np.eye(64), atol=2e-4)
    # gradient flows at 6q through the reversible path
    spec = LossSpec('hst', target=np.eye(64, dtype=np.complex64))
    fn = bt.make_batched_regloss(n, 'cp', rot, placements, spec,
                                 reversible=True)
    g = jax.grad(lambda a: fn(a)[0].sum())(angles)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_state_column_fast_path_matches_full():
    """State-prep losses build only the |0...0> column; gradients and loss
    values must match the full-unitary path exactly (columns evolve
    independently under row-leg gate application)."""
    import jax
    from cpflow_tpu.api import LossSpec
    from cpflow_tpu.sim import batched as bt
    from cpflow_tpu.topology import chain_layer, fill_layers

    n, k, B = 3, 4, 6
    placements = fill_layers(chain_layer(n), k)
    ghz = np.zeros(2 ** n, dtype=np.complex64)
    ghz[0] = ghz[-1] = 1 / np.sqrt(2)
    spec = LossSpec('state', target=ghz)
    num_angles = 3 * n + 7 * k

    # fast path (kind='state' -> single column) vs a full-columns clone
    fast = bt.make_batched_regloss(n, 'cp', 'xyz', placements, spec,
                                   reversible=True)

    class FullSpec(LossSpec):
        kind_override = True
    full_spec = LossSpec('custom', fn=lambda u: (
        1 - jnp.abs((jnp.asarray(ghz).conj() * u[:, 0]).sum()) ** 2))
    full = bt.make_batched_regloss(n, 'cp', 'xyz', placements, full_spec)

    key = jax.random.PRNGKey(5)
    angles = jax.random.uniform(key, (num_angles, B), minval=0.0,
                                maxval=2 * np.pi, dtype=jnp.float32)

    lf, _ = jax.jit(fast)(angles)
    lg, _ = jax.jit(full)(angles)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lg), atol=1e-5)

    gf = jax.jit(jax.grad(lambda a: fast(a)[0].sum()))(angles)
    gg = jax.jit(jax.grad(lambda a: full(a)[0].sum()))(angles)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg), atol=2e-4)
