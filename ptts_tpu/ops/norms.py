"""Normalization layers.

Numerics match the reference C exactly:
  * layernorm: biased variance (/d), eps inside sqrt
    (/root/reference/ptts_flowlm.c:159-181)
  * kyutai_rmsnorm: the model's nonstandard RMSNorm — variance of the
    mean-subtracted vector with Bessel correction (/(d-1)), but the OUTPUT is
    the *un-centered* x scaled by alpha/sqrt(var+eps)
    (/root/reference/ptts_flowlm.c:183-197).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def layernorm(x: jnp.ndarray, weight: Optional[jnp.ndarray],
              bias: Optional[jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; weight/bias may be None (final flow layer)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    y = centered * jax_rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def kyutai_rmsnorm(x: jnp.ndarray, alpha: Optional[jnp.ndarray],
                   eps: float = 1e-5) -> jnp.ndarray:
    """Nonstandard RMSNorm: centered sample variance (d-1), uncentered output."""
    xf = x.astype(jnp.float32)
    d = x.shape[-1]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    denom = max(d - 1, 1)
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / denom
    inv = jax_rsqrt(var + eps)
    y = xf * inv
    if alpha is not None:
        y = y * alpha
    return y.astype(x.dtype)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    # 1/sqrt matching the C `1.0f / sqrtf(...)` (not the fast-approx rsqrt).
    return 1.0 / jnp.sqrt(x)
