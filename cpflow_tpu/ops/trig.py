"""Exact one-parameter trigonometric line search and angle utilities.

Parity target: reference cpflow/trigonometric_utils.py. Any loss of a circuit
is, as a function of a single rotation angle, of the form
F(x) = F0 cos x + F1 sin x + c; its argmin follows in closed form from three
evaluations F(0), F(pi/2), F(pi) (trigonometric_utils.py:7-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cpflow_tpu import config


def min_angle(F):
    """Argmin of F(x) = F0 cos x + F1 sin x + const (trigonometric_utils.py:7-25)."""
    F_0 = F(0.0)
    F_1 = F(jnp.pi / 2)
    F_2 = F(jnp.pi)

    F_const = (F_0 + F_2) / 2
    a = F_0 - F_const
    b = F_1 - F_const

    return lax.cond(
        a == 0,
        lambda _: -jnp.pi / 2 * jnp.sign(b),
        lambda _: jnp.arctan(b / a) + jnp.pi * jnp.heaviside(a, 0.5),
        operand=None)


def min_angles(F, angles, s0, s1):
    """Closed-form optimal values for angles[s0:s1], each with the others held
    fixed (trigonometric_utils.py:28-32)."""
    def one_min_angle(i):
        return min_angle(lambda a: F(angles.at[i].set(a)))

    return jax.vmap(one_min_angle)(jnp.arange(s0, s1))


def random_angles(num_angles, key=None):
    """Uniform angles in (0, 2pi) (trigonometric_utils.py:35-38)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (num_angles,), minval=0.0, maxval=2 * jnp.pi,
                              dtype=config.real_dtype)


def bracket_angle(a):
    """Map angle to the equivalent one in (-pi, pi] (trigonometric_utils.py:41-44)."""
    return ((a + jnp.pi) % (2 * jnp.pi)) - jnp.pi
