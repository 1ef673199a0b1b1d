"""Global numeric configuration.

The reference (idnm/cpflow) implicitly uses complex64 everywhere (JAX default
x32 mode). TPU v5e has no native f64, so complex64 is also our default; an
optional complex128 mode exists for host-side verification (runs emulated on
TPU / native on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Default dtypes for the compute path.
real_dtype = jnp.float32
complex_dtype = jnp.complex64

# TPU matmul units default to bfloat16 passes, which floors the achievable
# Hilbert-Schmidt loss at ~1e-2 — far above the 1e-6/1e-7 convergence targets
# this library must certify (reference target_loss defaults, main.py:349).
# Every contraction in the compute path therefore requests full-f32 precision
# explicitly; the small 4 x 4^n contractions make the extra passes cheap.
PRECISION = jax.lax.Precision.HIGHEST


def set_precision(double: bool = False) -> None:
    """Switch between single (default, TPU-native) and double precision.

    Double precision requires jax.config.update('jax_enable_x64', True),
    which the caller is responsible for.
    """
    global real_dtype, complex_dtype
    if double:
        real_dtype = jnp.float64
        complex_dtype = jnp.complex128
    else:
        real_dtype = jnp.float32
        complex_dtype = jnp.complex64
