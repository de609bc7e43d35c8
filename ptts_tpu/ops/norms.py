"""Normalization layers.

Numerics match the reference C to f32 rounding:
  * layernorm: biased variance (/d), eps inside sqrt
    (/root/reference/ptts_flowlm.c:159-181)
  * kyutai_rmsnorm: the model's nonstandard RMSNorm — variance of the
    mean-subtracted vector with Bessel correction (/(d-1)), but the OUTPUT is
    the *un-centered* x scaled by alpha/sqrt(var+eps)
    (/root/reference/ptts_flowlm.c:183-197).

Variance uses the ONE-PASS form E[x^2] - E[x]^2 (clamped at 0) instead of the
reference's two-pass centered sum: the two reduces become independent, so XLA
fuses them into a single read of x — the centered form's sequential
mean -> centered -> reduce chain cost 3 HBM passes (measured 4.7 vs 2.5 ms
for one LN over [256, 800, 512] bf16 on v5e; ~2 ms/call off the Mimi
transformer and more off FlowLM prefill). The f32 deviation is
~1e-7 * (1 + mean^2/var) relative on var — orders below the 1e-3 executed
C-binary parity gates (tools/ref_parity.py) and the 1e-5 oracle tests; the
difference only grows when |mean| >> std, which the parity gate would
surface.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def layernorm(x: jnp.ndarray, weight: Optional[jnp.ndarray],
              bias: Optional[jnp.ndarray], eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; weight/bias may be None (final flow layer)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    meansq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(meansq - mean * mean, 0.0)
    y = (xf - mean) * jax_rsqrt(var + eps)
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
    meansq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    denom = max(d - 1, 1)
    var = jnp.maximum(meansq - mean * mean, 0.0) * (d / denom)
    inv = jax_rsqrt(var + eps)
    y = xf * inv
    if alpha is not None:
        y = y * alpha
    return y.astype(x.dtype)


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    # 1/sqrt matching the C `1.0f / sqrtf(...)` (not the fast-approx rsqrt).
    return 1.0 / jnp.sqrt(x)
