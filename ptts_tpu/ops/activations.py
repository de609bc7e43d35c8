"""Activations with the reference's exact formulas.

FlowLM uses erf-GELU (/root/reference/ptts_flowlm.c:207-210); Mimi uses
tanh-GELU (/root/reference/ptts_mimi.c:208-211). Keeping both distinct is
numerically load-bearing for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865475
_SQRT_2_OVER_PI = 0.7978845608


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + jax.lax.erf(x * _INV_SQRT2))


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    # tanh(z) = 2*sigmoid(2z) - 1: ~100x more accurate than XLA's f32 tanh
    # approximation in the |z|~3 region (measured 5.9e-7 vs 5.3e-5 max abs
    # error against f64), keeping parity with the reference's libm tanhf.
    z = _SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)
    tanh_z = 2.0 * jax.nn.sigmoid(2.0 * z) - 1.0
    return 0.5 * x * (1.0 + tanh_z)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)
