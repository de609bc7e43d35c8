"""Rotary position embeddings, interleaved-pair convention.

Matches /root/reference/ptts_flowlm.c:229-261: for each head-dim pair
(2i, 2i+1), rotate by angle = freq_i * position with
freq_i = exp(-log(max_period) * (2i / D)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_freqs(head_dim: int, max_period: float = 10000.0) -> np.ndarray:
    """Per-pair frequencies [head_dim // 2] in float32 (host constant)."""
    half = head_dim // 2
    i = np.arange(half, dtype=np.float32)
    return np.exp(-np.log(np.float32(max_period)) * (2.0 * i / np.float32(head_dim))).astype(
        np.float32
    )


def rope_cos_sin(positions: jnp.ndarray, head_dim: int,
                 max_period: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions; shapes [..., head_dim // 2]."""
    freqs = jnp.asarray(rope_freqs(head_dim, max_period))
    angle = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(angle), jnp.sin(angle)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the last axis.

    x: [..., D]; cos/sin broadcastable to [..., D//2].
    (x0, x1) -> (x0*c - x1*s, x0*s + x1*c) for each pair.
    """
    shape = x.shape
    xp = x.reshape(shape[:-1] + (shape[-1] // 2, 2))
    x0 = xp[..., 0]
    x1 = xp[..., 1]
    # rotate in f32 (cos/sin are f32), return in the input compute dtype so
    # bf16 runs don't silently promote the whole residual stream
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(shape).astype(x.dtype)


def rope_rotate(q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray,
                max_period: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply RoPE to q and k.

    q, k: [..., T, H, D]; positions: broadcastable to [..., T] int positions.
    """
    head_dim = q.shape[-1]
    cos, sin = rope_cos_sin(positions, head_dim, max_period)
    # positions [..., T] -> [..., T, 1(head), D//2]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
