"""CZ-count penalty on CP angles.

Parity target: reference cpflow/penalty.py:44-97. The reference builds the
piecewise-linear penalty out of a 10-way ``jnp.piecewise`` (which lowers to a
chain of selects and needed a vmap workaround segment). The function is just a
continuous piecewise-linear curve, so we evaluate it with ``jnp.interp`` over
its breakpoints instead — a single vectorized gather+FMA that vmaps/shards
cleanly on TPU and is algebraically identical (verified to ~1e-7 by tests).

Shape of the curve on [0, 2pi] (reference defaults xmax=pi/2, ymax=2,
plato_* = 0.05): zero plateaus around 0 and 2pi, peaks of height ymax at
xmax and 2pi-xmax, a plateau of height 1 around pi. It drives CP angles
toward {0, 2pi} (gate removed) or pi (gate becomes a CZ).
"""

from __future__ import annotations

import jax.numpy as jnp

from cpflow_tpu import config


def _breakpoints(xmax, ymax, plato_0, plato_1, plato_2):
    pi = jnp.pi
    xs = jnp.array([
        0.0,
        plato_0,
        xmax - plato_2,
        xmax + plato_2,
        pi - plato_1,
        pi + plato_1,
        pi + xmax - plato_2,
        pi + xmax + plato_2,
        2 * pi - plato_0,
        2 * pi,
    ], dtype=config.real_dtype)
    ys = jnp.array([0.0, 0.0, ymax, ymax, 1.0, 1.0, ymax, ymax, 0.0, 0.0],
                   dtype=config.real_dtype)
    return xs, ys


def cp_penalty_linear(a, xmax, ymax, plato_0, plato_1, plato_2):
    """Piecewise-linear CP penalty (reference penalty.py:44-71). Elementwise."""
    a = jnp.asarray(a, dtype=config.real_dtype) % (2 * jnp.pi)
    xs, ys = _breakpoints(xmax, ymax, plato_0, plato_1, plato_2)
    return jnp.interp(a, xs, ys)


def cp_penalty_L1(a):
    """L1 penalty (reference penalty.py:74-76)."""
    return jnp.abs(a)


def make_regularization_function(options):
    """Build the per-angle penalty from RegularizationOptions (penalty.py:79-97).

    Accepts either an options instance or the options dataclass itself (the
    reference passes the bare class, relying on class-level defaults).
    """
    if options.function == 'linear':
        xmax, ymax = options.xmax, options.ymax
        p0, p1, p2 = options.plato_0, options.plato_1, options.plato_2
        return lambda a: cp_penalty_linear(a, xmax, ymax, p0, p1, p2)
    elif options.function == 'L1':
        return cp_penalty_L1
    raise ValueError(f"penalty function {options.function!r} not supported")
