"""Penalty curve vs an independently-derived piecewise-linear oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpflow_tpu.ops import penalty

XMAX = np.pi / 2
YMAX = 2.0
P0 = P1 = P2 = 0.05


def oracle(a):
    """Direct NumPy evaluation of the curve from its segment definitions
    (reference penalty.py:44-71 behavior)."""
    a = np.asarray(a) % (2 * np.pi)
    xs = [0.0, P0, XMAX - P2, XMAX + P2, np.pi - P1, np.pi + P1,
          np.pi + XMAX - P2, np.pi + XMAX + P2, 2 * np.pi - P0, 2 * np.pi]
    ys = [0.0, 0.0, YMAX, YMAX, 1.0, 1.0, YMAX, YMAX, 0.0, 0.0]
    return np.interp(a, xs, ys)


def test_key_values():
    f = lambda a: float(penalty.cp_penalty_linear(a, XMAX, YMAX, P0, P1, P2))
    assert f(0.0) == pytest.approx(0.0, abs=1e-7)
    assert f(2 * np.pi - 1e-4) == pytest.approx(0.0, abs=1e-3)
    assert f(np.pi) == pytest.approx(1.0, abs=1e-6)
    assert f(XMAX) == pytest.approx(YMAX, abs=1e-6)
    assert f(np.pi + XMAX) == pytest.approx(YMAX, abs=1e-6)
    assert f(P0 / 2) == pytest.approx(0.0, abs=1e-7)  # plateau at 0
    assert f(np.pi - P1 / 2) == pytest.approx(1.0, abs=1e-6)  # plateau at pi


def test_matches_oracle_dense():
    a = np.linspace(-4 * np.pi, 4 * np.pi, 4001)
    mine = np.asarray(penalty.cp_penalty_linear(jnp.array(a, dtype=jnp.float32),
                                                XMAX, YMAX, P0, P1, P2))
    np.testing.assert_allclose(mine, oracle(a), atol=2e-5)


def test_vmap_and_grad():
    f = lambda a: penalty.cp_penalty_linear(a, XMAX, YMAX, P0, P1, P2)
    a = jnp.linspace(0.1, 6.0, 64)
    v = jax.vmap(f)(a)
    assert v.shape == (64,)
    g = jax.grad(lambda x: f(x).sum())(jnp.float32(1.0))
    # slope between plato_0 and xmax - plato_2 is ymax / (xmax - p2 - p0)
    expected_slope = YMAX / (XMAX - P2 - P0)
    assert float(g) == pytest.approx(expected_slope, rel=1e-4)


def test_L1():
    np.testing.assert_allclose(
        np.asarray(penalty.cp_penalty_L1(jnp.array([-2.0, 3.0]))), [2.0, 3.0])


def test_make_regularization_function_from_class_and_instance():
    @dataclasses.dataclass
    class RegOpts:
        function: str = 'linear'
        ymax: float = YMAX
        xmax: float = XMAX
        plato_0: float = P0
        plato_1: float = P1
        plato_2: float = P2

    for opts in (RegOpts, RegOpts()):  # reference passes the bare class (main.py:539)
        f = penalty.make_regularization_function(opts)
        assert float(f(np.pi)) == pytest.approx(1.0, abs=1e-6)

    f = penalty.make_regularization_function(
        dataclasses.make_dataclass('O', [('function', str)])('L1'))
    assert float(f(-3.0)) == pytest.approx(3.0)
