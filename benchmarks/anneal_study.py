"""Annealed CP-penalty schedules: measured and REJECTED (round 3).

Hypothesis: ramping the penalty weight r from 0 to full during the Adam
sweep (letting restarts first fit the unitary, then discretize) raises
the per-eval yield of optimal-count candidates at fixed budget — the one
per-restart-work lever ROADMAP.md left open after the throughput roofline
closed.

Protocol: 4 schedules (constant / ramp-to-half / 20%-warmup-step /
cosine-to-half) x 4 seeds at 3q (CCZ chain k=12, optimal 8 CZ) + 2 seeds
at 4q (toffoli-4 connected k=20, optimal 14 CZ); B=256 restarts, T=2000
iterations, entry loss 1e-3; best-iterate selection always scores with
the FULL weight (loss + r*penalty) so selection semantics match the
constant-r baseline. CPU host run (single-chip-equivalent statistics).

Measured (seeds 1-4, 3q, candidates at cz<=8 of 256): constant 62.8,
ramp_half 60.5, warmup20 64.0, cosine_half 62.5 — statistical noise
(seed-0 pilot's +25% did not replicate). A descending ramp is clearly
WORSE (21 vs 45 at seed 0). At 4q no schedule produced any 14-CZ
candidate at this budget. The one robust effect: annealed schedules
converge ~+7% more restarts below entry loss (10/10 runs), but the
extra converged restarts all land at higher CZ counts — more penalty-free
iterations means less discretization pressure, not better minima.

Conclusion: constant r (the reference's semantics, TPE-tuned) stays the
only penalty mode; no penalty_schedule option is warranted. Kept as the
reproduction script for that decision."""
import sys, time, json
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from cpflow_tpu import Ansatz, LossSpec
from cpflow_tpu.ops.gates import u_ccz3, u_toff4
from cpflow_tpu.ops.penalty import make_regularization_function
from cpflow_tpu.api import RegularizationOptions
from cpflow_tpu.topology import chain_layer, connected_layer, fill_layers
from cpflow_tpu.optimize import candidates as cand
from cpflow_tpu.optimize import engine
from cpflow_tpu.sim import batched as batched_sim

LR = 0.1
reg_func = make_regularization_function(RegularizationOptions())


def make_sweep(lp_fn, R):
    def sweep(params0, wts):
        opt = optax.adam(LR)
        def obj(p, w):
            loss, pen = lp_fn(p)
            return (loss + (w * R) * pen).sum(), (loss, pen)
        val_grad = jax.value_and_grad(obj, has_aux=True)
        loss0, pen0 = lp_fn(params0)
        score0 = loss0 + R * pen0
        def step(carry, w):
            params, best_p, best_s, best_l, opt_state = carry
            (_, (loss, pen)), grads = val_grad(params, w)
            updates, opt_state = opt.update(grads, opt_state)
            new_params = optax.apply_updates(params, updates)
            score = loss + R * pen
            improved = score < best_s
            best_s = jnp.where(improved, score, best_s)
            best_l = jnp.where(improved, loss, best_l)
            best_p = jnp.where(improved[None, :], params, best_p)
            return (new_params, best_p, best_s, best_l, opt_state), None
        (_, best_p, best_s, best_l, _), _ = lax.scan(
            step, (params0, params0, score0, loss0, opt.init(params0)), wts)
        return best_p, best_s, best_l
    return jax.jit(sweep)


def schedules(T):
    t = np.arange(T) / (T - 1)
    return {
        'constant':    np.ones(T),
        'ramp_half':   np.minimum(1.0, 2 * t),
        'warmup20':    (t >= 0.2).astype(float),
        'cosine_half': np.where(t < 0.5, 0.5 - 0.5 * np.cos(2 * np.pi * t), 1.0),
    }


def run_case(tag, n, layer, k, u_target, R, opt_cz, B, T, seeds):
    anz = Ansatz(n, 'cp', fill_layers(layer, k), 'xyz')
    lp_fn = batched_sim.make_batched_loss_and_penalty(
        n, 'cp', 'xyz', anz.placements, LossSpec('hst', target=u_target),
        anz.cp_mask, reg_func, reversible=True)
    sweep_j = make_sweep(lp_fn, R)
    tally = {}
    for seed in seeds:
        key = jax.random.PRNGKey(seed)
        inits = jnp.asarray(cand.generate_initial_angles_batch(
            key, anz.num_angles, anz.cp_mask, 'uniform', B).T)
        loss0, pen0 = lp_fn(inits)
        for name, wts in schedules(T).items():
            t0 = time.time()
            best_p, best_s, best_l = sweep_j(inits, jnp.asarray(wts, jnp.float32))
            raw = engine.RawResult(
                params=jnp.stack([inits.T, best_p.T], axis=1),
                regloss=jnp.stack([loss0 + R * pen0, best_s], axis=1),
                loss=jnp.stack([loss0, best_l], axis=1),
                reg=jnp.stack([R * pen0, best_s - best_l], axis=1),
                batched=True)
            ev = cand.evaluate_raw_batch(raw, anz.cp_mask)
            ok = ev.loss < 1e-3
            czs = ev.cz[ok]
            nopt = int((czs <= opt_cz).sum())
            tally.setdefault(name, []).append(nopt)
            print(json.dumps({'case': tag, 'seed': seed, 'schedule': name,
                              'pass': int(ok.sum()), 'B': B,
                              f'cz<={opt_cz}': nopt,
                              'wall_s': round(time.time() - t0, 1)}),
                  flush=True)
    print(json.dumps({'case': tag, 'summary': {
        k2: {'mean': float(np.mean(v)), 'per_seed': v}
        for k2, v in tally.items()}}), flush=True)


run_case('ccz3_chain_k12', 3, chain_layer(3), 12, u_ccz3,
         0.00055, 8, 256, 2000, seeds=(1, 2, 3, 4))
run_case('toff4_conn_k20', 4, connected_layer(4), 20, u_toff4,
         0.0005, 14, 256, 2000, seeds=(0, 1))
print('STUDY_DONE')
