"""CP-template candidate pipeline: init, evaluation, projection, verification.

Parity target: reference cpflow/cp_utils.py. Three deliberate TPU-side
redesigns, all behavior-preserving:

  1. Initial-angle generation is vmapped over per-restart PRNG subkeys with
     the same ``random.split`` tree as the reference (cp_utils.py:13-42,
     main.py:541-548), so fixed seeds reproduce identical batches.
  2. Candidate evaluation (best-iterate selection + CZ counting) is one
     jitted pass over the whole batch with a single f32/int32 device->host
     transfer, instead of a per-sample Python loop with ``int()`` syncs
     (cp_utils.py:59-67,144-202).
  3. Verification re-optimizes *all* prospective candidates at once: instead
     of rebuilding a constrained function per candidate (cp_utils.py:80-141),
     projected CP angles are frozen in place with a gradient mask — every
     candidate keeps the full parameter vector, CP(0)=Id and CP(pi)=CZ make
     the frozen unitary exactly the projected circuit's, and the whole set
     vmaps into one executable (cp_utils.py:205-247 runs them sequentially).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cpflow_tpu import config
from cpflow_tpu.optimize import engine
from cpflow_tpu.ops.trig import random_angles


# --------------------------------------------------------------------------
# Initial angles
# --------------------------------------------------------------------------

def random_cp_angles(num_angles, cp_mask, cp_dist='uniform', key=None):
    """Random initial angles; CP angles optionally zeroed or normal-peaked
    (reference cp_utils.py:13-42; split structure preserved)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    key, subkey = jax.random.split(key)
    rnd = random_angles(num_angles, key=subkey)

    if cp_dist == 'uniform':
        return rnd
    elif cp_dist == '0':
        return rnd * (1 - cp_mask)
    elif cp_dist == 'normal':
        key, subkey = jax.random.split(key)
        normal = jax.random.normal(subkey, shape=(num_angles,),
                                   dtype=config.real_dtype)
        return rnd * (1 - cp_mask) + 1.5 * normal * cp_mask
    raise ValueError(f"cp_dist {cp_dist!r} not supported")


def generate_initial_angles_batch(key, num_angles, cp_mask, cp_dist='uniform',
                                  batch_size=1):
    """Batch of initial angle vectors, one subkey per restart — identical
    split tree to the reference (main.py:541-548) but vmapped."""
    key, *subkeys = jax.random.split(key, num=batch_size + 1)
    subkeys = jnp.stack(subkeys)
    return jax.vmap(
        lambda k: random_cp_angles(num_angles, cp_mask, cp_dist=cp_dist, key=k)
    )(subkeys)


# --------------------------------------------------------------------------
# Parameter-freezing helpers (reference cp_utils.py:80-108)
# --------------------------------------------------------------------------

def insert_params(params, insertion_params, insertion_indices, jax_numpy=True):
    """Merge `insertion_params` into `params` at `insertion_indices`
    (reference insert_params, cp_utils.py:80-97). Example:
    params=[0,1,2,3], insertion=[-1,-2,-4], indices=[0,2,4]
    -> [-1, 0, -2, 1, -4, 2, 3]."""
    total = len(params) + len(insertion_params)
    param_indices = [i for i in range(total) if i not in insertion_indices]
    if jax_numpy:
        res = jnp.zeros(total, dtype=config.real_dtype)
        res = res.at[jnp.array(param_indices)].set(jnp.asarray(params))
        res = res.at[jnp.array(list(insertion_indices))].set(
            jnp.asarray(insertion_params))
        return res
    res = np.zeros(total)
    res[param_indices] = np.asarray(params)
    res[list(insertion_indices)] = np.asarray(insertion_params)
    return res


def constrained_function(f, fixed_params, indices, jax_numpy=True):
    """f with the parameters at `indices` fixed (reference
    constrained_function, cp_utils.py:100-108). The batched verification path
    uses gradient masks instead, but this form remains useful for ad-hoc
    constrained optimization."""
    def cf(free_params):
        return f(insert_params(free_params, fixed_params, indices,
                               jax_numpy=jax_numpy))
    return cf


# --------------------------------------------------------------------------
# CZ counting / projection (vectorized)
# --------------------------------------------------------------------------

def cz_value(a, threshold=1e-2):
    """0 if CP angle ~ 0 or 2pi, 1 if ~ pi, else 2 (a CP gate costs 2 CZ);
    reference cp_utils.py:45-56, vectorized."""
    a = jnp.asarray(a) % (2 * jnp.pi)
    near_zero = (a < threshold) | (jnp.abs(a - 2 * jnp.pi) < threshold)
    near_pi = jnp.abs(a - jnp.pi) < threshold
    return jnp.where(near_zero, 0, jnp.where(near_pi, 1, 2))


def count_cz(angles, threshold=0.2):
    """Total CZ count of a circuit given its CP angles (cp_utils.py:59-67).

    Accepts a vector of CP angles; returns a traced int32 scalar (callers
    convert to Python int after batching, not per sample).
    """
    return cz_value(angles, threshold=threshold).sum()


def project_cp_angles(a, threshold=0.2):
    """Snap CP angles near pi to pi and near 0/2pi to 0; others unchanged
    (reference project_cp_angle, cp_utils.py:70-77, vectorized)."""
    a = jnp.asarray(a) % (2 * jnp.pi)
    near_pi = jnp.abs(a - jnp.pi) < threshold
    near_zero = (jnp.abs(a) < threshold) | (jnp.abs(a - 2 * jnp.pi) < threshold)
    return jnp.where(near_pi, jnp.pi, jnp.where(near_zero, 0.0, a))


# --------------------------------------------------------------------------
# Batched evaluation of raw results
# --------------------------------------------------------------------------

class EvaluatedBatch(NamedTuple):
    """Host-side summary of a raw multi-start run (all-real, one transfer)."""
    cz: np.ndarray       # (B,) int32 — CZ count of projected circuit at best iterate
    loss: np.ndarray     # (B,) f32  — unregularized loss at best regloss iterate
    angles: np.ndarray   # (B, P) f32 — angles at best regloss iterate


def _evaluate_kernel(params_hist, regloss_hist, loss_hist, cp_mask, threshold):
    best_i = jnp.argmin(regloss_hist)
    loss = loss_hist[best_i]
    angles = params_hist[best_i]
    cz = count_cz(angles * cp_mask, threshold=threshold).astype(jnp.int32)
    return cz, loss, angles


def evaluate_raw_batch(raw: engine.RawResult, cp_mask, threshold=0.2) -> EvaluatedBatch:
    """Best-iterate selection + CZ count for every restart in one jitted pass
    (replaces the reference's per-sample evaluate_cp_result loop,
    cp_utils.py:144-202)."""
    cp_mask = jnp.asarray(cp_mask, dtype=config.real_dtype)
    fn = jax.jit(jax.vmap(
        lambda p, r, l: _evaluate_kernel(p, r, l, cp_mask, threshold)))
    cz, loss, angles = fn(raw.params, raw.regloss, raw.loss)
    return EvaluatedBatch(cz=np.asarray(cz), loss=np.asarray(loss),
                          angles=np.asarray(angles))


def run_raw_stage_fused(regloss_and_loss_batch, seed: int, batch_size: int,
                        num_angles: int, cp_mask, cp_dist: str = 'uniform',
                        threshold: float = 0.2, learning_rate: float = 0.1,
                        num_iterations: int = 2000,
                        sharding=None,
                        active_mask=None) -> EvaluatedBatch:
    """The whole raw sampling + evaluation stage as ONE executable: PRNG
    init, the fused Adam sweep, best-iterate selection and CZ counting, one
    all-real device->host transfer. Dispatch latency through a remote-device
    tunnel is seconds per call, so collapsing the reference's
    generate->optimize->evaluate stages (main.py:558-603) into a single
    dispatch matters as much as the compute itself.

    active_mask: optional (P,)-vector, passed as a RUNTIME argument — entries
    with 0 are initialized to 0 and frozen. With a template padded to a
    maximum length, trailing blocks frozen at angle 0 are exactly identity
    (CP(0)=Id, R(0)=Id), so ONE compiled executable serves every template
    length (the adaptive search's k axis) — see Synthesize.adaptive's
    bucketed mode."""
    cp_mask_j = jnp.asarray(cp_mask, dtype=config.real_dtype)

    def full(seed_arr, active):
        key = jax.random.PRNGKey(seed_arr)
        inits = generate_initial_angles_batch(key, num_angles, cp_mask_j,
                                              cp_dist=cp_dist,
                                              batch_size=batch_size)
        grad_mask_pb = None
        if active is not None:
            inits = inits * active[None, :]
            grad_mask_pb = jnp.broadcast_to(active[:, None],
                                            (num_angles, batch_size))
        if sharding is not None:
            inits = jax.lax.with_sharding_constraint(inits, sharding)
        best_params, best_reg, best_loss = engine.fused_adam_sweep(
            regloss_and_loss_batch, inits.T, learning_rate=learning_rate,
            num_iterations=num_iterations, grad_mask_pb=grad_mask_pb)
        # the best entry never exceeds the initial one, so the reference's
        # argmin over [initial, best] (cp_utils.py:158) always lands here
        cz_sel = cp_mask_j if active is None else cp_mask_j * active
        cz = cz_value(best_params * cz_sel[:, None],
                      threshold=threshold).sum(axis=0).astype(jnp.int32)
        return cz, best_loss, best_params.T

    seed_arr = jnp.asarray(seed, dtype=jnp.uint32)
    if active_mask is None:
        cz, loss, angles = jax.jit(
            lambda s: full(s, None))(seed_arr)
    else:
        cz, loss, angles = jax.jit(full)(
            seed_arr, jnp.asarray(active_mask, dtype=config.real_dtype))
    return EvaluatedBatch(cz=np.asarray(cz), loss=np.asarray(loss),
                          angles=np.asarray(angles))


def filter_prospective(ev: EvaluatedBatch, threshold_cz_count, threshold_loss):
    """Indices of candidates below both thresholds, sorted by CZ count
    (reference filter_cp_results, cp_utils.py:167-202; host-side numpy)."""
    ok = (ev.cz <= threshold_cz_count) & (ev.loss <= threshold_loss)
    idx = np.nonzero(ok)[0]
    order = np.argsort(ev.cz[idx], kind='stable')
    return idx[order]


# --------------------------------------------------------------------------
# Reference-shaped single-candidate wrappers (cp_utils.py:111-247 contracts)
# --------------------------------------------------------------------------

def convert_cp_to_cz(anz, angles, threshold=0.2):
    """Project near-0/pi CP angles and return (circ_func, u_func,
    free_angles) with the projected angles fixed (reference convert_cp_to_cz,
    cp_utils.py:111-141). circ_func maps free angles to an IR Circuit;
    u_func maps free angles to the unitary."""
    angles = jnp.asarray(angles, dtype=config.real_dtype)
    mask = np.asarray(anz.cp_mask)
    cp_indices = np.nonzero(mask == 1)[0]

    projected_all = project_cp_angles(angles[jnp.array(cp_indices)],
                                      threshold=threshold)
    projected_all = np.asarray(projected_all)
    snapped = (projected_all == 0.0) | (projected_all == np.pi)
    projected_values = jnp.asarray(projected_all[snapped],
                                   dtype=config.real_dtype)
    projected_indices = [int(i) for i in cp_indices[snapped]]

    free_angles = jnp.asarray(
        [a for i, a in enumerate(np.asarray(angles))
         if i not in projected_indices], dtype=config.real_dtype)

    circ_func = constrained_function(
        lambda angs: anz.circuit(list(np.asarray(angs))),
        np.asarray(projected_values), projected_indices, jax_numpy=False)
    u_func = constrained_function(anz.unitary, projected_values,
                                  projected_indices)
    return circ_func, u_func, free_angles


def evaluate_cp_result(res, cp_mask, threshold=0.2):
    """(cz, loss, angles) at the best regloss iterate of one learning history
    (reference evaluate_cp_result, cp_utils.py:144-164). Prefer
    evaluate_raw_batch for whole batches."""
    best_i = int(jnp.argmin(jnp.asarray(res['regloss'])))
    loss = res['loss'][best_i]
    angles = res['params'][best_i]
    cz = int(count_cz(jnp.asarray(angles) * jnp.asarray(cp_mask),
                      threshold=threshold))
    return cz, loss, angles


def filter_cp_results(res_list, cp_mask, threshold_cz_count, threshold_loss,
                      threshold_cp=0.2, disable_tqdm=False):
    """[[cz, res], ...] for histories passing both thresholds, sorted by CZ
    count (reference filter_cp_results, cp_utils.py:167-202)."""
    selected = []
    for res in res_list:
        cz, loss, _ = evaluate_cp_result(res, cp_mask, threshold=threshold_cp)
        if cz <= threshold_cz_count and float(loss) <= threshold_loss:
            selected.append([cz, res])
    selected.sort(key=lambda x: x[0])
    return selected


def verify_cp_result(res, anz, unitary_loss_func, options, keep_history=False):
    """Project one candidate and re-optimize its free angles (reference
    verify_cp_result, cp_utils.py:205-247). Returns
    (success, num_cz_gates, circ_func, u_func, best_angles[, histories])."""
    from cpflow_tpu.optimize import engine

    num_cz_gates, _, angles = evaluate_cp_result(
        res, anz.cp_mask, threshold=options.threshold_cp)
    circ_func, u_func, free_angles = convert_cp_to_cz(
        anz, angles, threshold=options.threshold_cp)

    loss_fn = lambda angs: unitary_loss_func(u_func(angs))
    hist, losses = jax.jit(lambda init: engine.minimize_chain(
        loss_fn, init, method=options.method,
        learning_rate=options.learning_rate_at_verification,
        num_iterations=options.num_gd_iterations_at_verification,
        keep_history=keep_history))(free_angles)

    best_i = int(jnp.argmin(losses))
    best_angs = hist[best_i]
    best_loss = float(losses[best_i])

    if not keep_history:
        return (best_loss <= options.target_loss, num_cz_gates, circ_func,
                u_func, best_angs)
    return (best_loss <= options.target_loss, num_cz_gates, circ_func,
            u_func, best_angs, hist, losses)


# --------------------------------------------------------------------------
# Batched verification
# --------------------------------------------------------------------------

class VerifiedBatch(NamedTuple):
    success: np.ndarray      # (C,) bool — best loss under target
    best_loss: np.ndarray    # (C,) f32
    best_angles: np.ndarray  # (C, P) f32 — full vector, projected entries frozen
    cz: np.ndarray           # (C,) int32 — CZ count of the projected circuit
    frozen: np.ndarray       # (C, P) bool — which entries were projected+frozen


def verify_candidates_batch(unitary_loss_func,
                            u_func,
                            candidate_angles: np.ndarray,
                            cp_mask,
                            threshold_cp: float = 0.2,
                            method: str = 'adam',
                            learning_rate: float = 0.01,
                            num_iterations: int = 5000,
                            target_loss: float = 1e-6,
                            anz=None,
                            num_segments: int = 1) -> VerifiedBatch:
    """Project CP angles and re-optimize the remaining free angles for all
    candidates at once (reference verify_cp_result, cp_utils.py:205-247).

    candidate_angles: (C, P) — best angles of each prospective candidate.
    Frozen coordinates (projected CP angles) are embedded in the parameter
    vector and masked out of the gradient; CP(0)/CP(pi) evaluate exactly to
    Id/CZ so the optimized unitary equals the projected circuit's.

    num_segments > 1 (fused path only) chains that many dispatches of the
    one compiled num_iterations sweep, each resuming from the previous
    best-so-far parameters — deep verification without lengthening the
    single-dispatch program (the measured 6q dispatch-depth wall,
    RESULTS_r4 s15/s18). The target_loss early exit makes extra segments
    nearly free once every candidate has converged.
    """
    cand = jnp.asarray(candidate_angles, dtype=config.real_dtype)
    if cand.ndim == 1:
        cand = cand[None]
    cp_mask_j = jnp.asarray(cp_mask, dtype=config.real_dtype)

    def prepare(angles):
        projected = project_cp_angles(angles, threshold=threshold_cp)
        is_cp = cp_mask_j == 1
        snapped = (projected == 0.0) | (projected == jnp.pi)
        frozen = is_cp & snapped
        init = jnp.where(frozen, projected, angles)
        return init, frozen

    if method == 'adam' and anz is not None:
        # fused batch-last path (restarts minor-most, no tiny dot_generals),
        # the whole stage — sweep with frozen coordinates + CZ counting — as
        # ONE dispatch (tunnel round-trips cost seconds each)
        from cpflow_tpu.sim import batched as batched_sim
        regloss_fn = batched_sim.make_batched_regloss(
            anz.num_qubits, anz.entangling_gate_name, anz.rotation_gates,
            anz.placements, unitary_loss_func, reversible=True)

        def stage(cand_cp, params_in, resume):
            proj_cp, frozen_cp = jax.vmap(prepare)(cand_cp)
            # resume > 0: continue descent from a previous segment's best
            # parameters; the frozen mask and the reported CZ count always
            # derive from the ORIGINAL candidate's projection, so the
            # projected circuit is unchanged across segments
            inits_cp = jnp.where(resume > 0, params_in, proj_cp)
            mask_pb = (1.0 - frozen_cp.astype(config.real_dtype)).T
            # target_loss early exit: verification usually converges well
            # before the full budget, so the sweep stops as soon as every
            # candidate is under the acceptance threshold
            best_params, best_reg, _ = engine.fused_adam_sweep(
                regloss_fn, inits_cp.T, learning_rate=learning_rate,
                num_iterations=num_iterations, grad_mask_pb=mask_pb,
                target_loss=target_loss)
            cz = cz_value(proj_cp * cp_mask_j[None, :],
                          threshold=threshold_cp).sum(axis=1).astype(jnp.int32)
            return best_params.T, best_reg, cz, frozen_cp

        fn = jax.jit(stage)
        out = fn(cand, jnp.zeros_like(cand), jnp.float32(0.0))
        for _ in range(max(1, int(num_segments)) - 1):
            out = fn(cand, out[0], jnp.float32(1.0))
        best_angles, best_losses, cz_counts, frozen = out
        best_losses_np = np.asarray(best_losses)
        return VerifiedBatch(
            success=best_losses_np <= target_loss,
            best_loss=best_losses_np,
            best_angles=np.asarray(best_angles),
            cz=np.asarray(cz_counts),
            frozen=np.asarray(frozen))
    else:
        inits, frozen = jax.vmap(prepare)(cand)
        loss_fn = lambda angs: unitary_loss_func(u_func(angs))

        def chain(init, frz):
            mask = 1.0 - frz.astype(config.real_dtype)
            hist, losses = engine.minimize_chain(
                loss_fn, init, method=method, learning_rate=learning_rate,
                num_iterations=num_iterations, keep_history=False,
                grad_mask=mask)
            best_i = jnp.argmin(losses)
            return hist[best_i], losses[best_i]

        best_angles, best_losses = jax.jit(jax.vmap(chain))(inits, frozen)

    cz = jax.jit(jax.vmap(
        lambda a: count_cz(a * cp_mask_j, threshold=threshold_cp).astype(jnp.int32)
    ))(inits)

    best_losses_np = np.asarray(best_losses)
    return VerifiedBatch(
        success=best_losses_np <= target_loss,
        best_loss=best_losses_np,
        best_angles=np.asarray(best_angles),
        cz=np.asarray(cz),
        frozen=np.asarray(frozen))
