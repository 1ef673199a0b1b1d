"""Optimization engine: batched multi-start minimization on TPU.

Reference-compatible entry points (``mynimize``, ``mynimize_repeated``,
``unitary_learn`` — cpflow/optimization.py:209-419) are provided as thin
wrappers over the scanned/vmapped core in ``engine``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpflow_tpu import config
from cpflow_tpu.ops.losses import cost_HST, disc2_swap
from cpflow_tpu.ops.penalty import cp_penalty_linear, cp_penalty_L1
from cpflow_tpu.optimize.engine import (  # noqa: F401
    RawResult,
    adam_chain,
    angle_by_angle_chain,
    angle_by_angle_update,
    gradient_descent_chain,
    minimize_chain,
    minimize_multistart,
    plain_hessian_preconditioner,
    plain_natural_preconditioner,
    sparse_hessian_preconditioner,
)
from cpflow_tpu.ops.trig import random_angles


def mynimize(loss_func, num_params, method='adam', learning_rate=0.1,
             u_func=None, target_loss=1e-7, keep_history=True,
             initial_params=None, num_iterations=5000, **kwargs):
    """Single-chain minimization, reference signature
    (optimization.py:209-266). Returns (params_history, loss_history)."""
    if initial_params is None:
        initial_params = random_angles(num_params)
    params_hist, loss_hist = jax.jit(
        lambda init: minimize_chain(
            loss_func, init, method=method, learning_rate=learning_rate,
            num_iterations=num_iterations, keep_history=keep_history,
            u_func=u_func)
    )(jnp.asarray(initial_params, dtype=config.real_dtype))
    return params_hist, loss_hist


def mynimize_repeated(loss_func, num_params, method='adam', learning_rate=0.1,
                      target_loss=1e-7, u_func=None, initial_params_batch=None,
                      num_repeats=1, regularization_func=None,
                      keep_history=True, compute_losses=True,
                      num_iterations=5000, sharding=None, **kwargs):
    """Batched multi-start minimization, reference signature and return
    structure (optimization.py:269-382): a list of per-restart dicts with
    'params'/'loss' (+'reg'/'regloss' when regularized), or a single dict
    when the input was a single vector."""
    if initial_params_batch is None:
        key = jax.random.PRNGKey(0)
        batch = []
        for _ in range(num_repeats):
            key, subkey = jax.random.split(key)
            batch.append(random_angles(num_params, key=subkey))
        initial_params_batch = jnp.stack(batch)
        input_is_vector = num_repeats != 1
        if not input_is_vector:
            initial_params_batch = initial_params_batch[0]
    else:
        initial_params_batch = jnp.asarray(initial_params_batch,
                                           dtype=config.real_dtype)
        input_is_vector = initial_params_batch.ndim == 2

    raw = minimize_multistart(
        loss_func, initial_params_batch, method=method,
        learning_rate=learning_rate, num_iterations=num_iterations,
        keep_history=keep_history, regularization_func=regularization_func,
        u_func=u_func, compute_losses=compute_losses, sharding=sharding)

    if input_is_vector:
        if compute_losses and regularization_func is not None:
            return [{'params': p['params'], 'loss': p['loss'],
                     'reg': p['reg'], 'regloss': p['regloss']} for p in raw]
        return [{'params': p['params'], 'loss': p['regloss']} for p in raw]
    else:
        d = raw.as_single()
        if compute_losses and regularization_func is not None:
            return {'params': d['params'], 'loss': d['loss'],
                    'reg': d['reg'], 'regloss': d['regloss']}
        return {'params': d['params'], 'loss': d['regloss']}


def unitary_learn(u_func, u_target, num_params, method='adam',
                  learning_rate=0.1, target_loss=1e-7, disc_func=None,
                  regularization_options=None, initial_angles=None,
                  num_repeats=1, keep_history=True, **kwargs):
    """Learn a target unitary with optional CP regularization, reference
    signature (optimization.py:385-419)."""
    if disc_func == 'swap':
        import numpy as np
        num_qubits = int(np.log2(u_target.shape[0]))
        loss_func = lambda angs: disc2_swap(u_func(angs), u_target, num_qubits)
    else:
        loss_func = lambda angs: cost_HST(u_func(angs), u_target)

    regularization_func = None
    if regularization_options is not None:
        ropts = dict(regularization_options)
        cp_mask = jnp.asarray(ropts['cp_mask'], dtype=config.real_dtype)
        r = ropts['r']
        if ropts['function'] == 'linear':
            pf = lambda a: cp_penalty_linear(a, ropts['xmax'], ropts['ymax'],
                                             ropts.get('plato', 0.05),
                                             ropts.get('plato', 0.05),
                                             ropts.get('plato', 0.05))
        elif ropts['function'] == 'L1':
            pf = cp_penalty_L1
        else:
            raise ValueError(f"penalty function {ropts['function']!r} not supported")
        regularization_func = lambda angs: r * pf(angs * cp_mask).sum()

    return mynimize_repeated(loss_func, num_params, method=method,
                             learning_rate=learning_rate, u_func=u_func,
                             num_repeats=num_repeats,
                             initial_params_batch=initial_angles,
                             regularization_func=regularization_func,
                             target_loss=target_loss,
                             keep_history=keep_history, **kwargs)
