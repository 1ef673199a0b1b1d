"""Exact one-parameter trigonometric line search and angle utilities.

Parity target: reference cpflow/trigonometric_utils.py. Any loss of a circuit
is, as a function of a single rotation angle, of the form
F(x) = F0 cos x + F1 sin x + c; its argmin follows in closed form from three
evaluations F(0), F(pi/2), F(pi) (trigonometric_utils.py:7-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cpflow_tpu import config


def min_angle(F):
    """Argmin of F(x) = A cos x + B sin x + const (trigonometric_utils.py:7-25).

    Three probes pin the wave: const = (F(0) + F(pi)) / 2, A = F(0) - const,
    B = F(pi/2) - const. The wave is R cos(x - phi) with phi = atan2(B, A),
    so its minimum sits at phi + pi. The atan2 form is branch-free and exact
    at A ~= 0 (an arctan(B/A) formulation is singular there — the weakness
    the reference's own comment flags); results agree with the reference's
    modulo 2*pi, which is all a rotation angle is defined up to.
    """
    f0 = F(0.0)
    f1 = F(jnp.pi / 2)
    f2 = F(jnp.pi)
    c = (f0 + f2) / 2
    return jnp.arctan2(f1 - c, f0 - c) + jnp.pi


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
