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
    """Apply RoPE to q and k (interleaved-pair convention).

    q, k: [..., T, H, D]; positions: broadcastable to [..., T] int positions.

    Oracle cross-check variant (with apply_rope): production permutes the
    Q/K projection rows at load (permute_qk_rows_for_rope) and rotates
    contiguous halves via rope_rotate_halves; the interleaved-pair form is
    kept as the reference-layout formulation exercised by tests/test_ops.py.
    """
    head_dim = q.shape[-1]
    cos, sin = rope_cos_sin(positions, head_dim, max_period)
    # positions [..., T] -> [..., T, 1(head), D//2]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)


def rope_head_permutation(head_dim: int) -> np.ndarray:
    """Within-head index order that moves interleaved pairs to contiguous
    halves: [0, 2, ..., D-2, 1, 3, ..., D-1]."""
    return np.concatenate([np.arange(0, head_dim, 2), np.arange(1, head_dim, 2)])


def permute_qk_rows_for_rope(in_proj: np.ndarray, num_heads: int,
                             head_dim: int) -> np.ndarray:
    """Reorder the Q and K output rows of a fused [..., 3d, d] in_proj so that
    each head's even pair-components land in the first D/2 positions and the
    odd ones in the last D/2.

    Attention is invariant to any fixed permutation applied identically to q
    and k (the q.k dot just reorders its sum), so this changes NOTHING
    numerically -- but it lets RoPE rotate contiguous 32-lane halves instead
    of an interleaved lane-stride-2 layout, which the TPU VPU handles ~2x
    faster (and the pair stack/reshape relayout disappears).
    """
    d = num_heads * head_dim
    perm = rope_head_permutation(head_dim)
    idx = np.arange(3 * d)
    for blk in (0, 1):  # q rows, k rows; v untouched
        for h in range(num_heads):
            base = blk * d + h * head_dim
            idx[base : base + head_dim] = base + perm
    return np.asarray(in_proj)[..., idx, :]


def apply_rope_halves(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """RoPE in halves layout (requires permute_qk_rows_for_rope'd weights)."""
    half = x.shape[-1] // 2
    lo = x[..., :half]
    hi = x[..., half:]
    return jnp.concatenate([lo * cos - hi * sin, lo * sin + hi * cos],
                           axis=-1).astype(x.dtype)


def rope_rotate_halves(q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray,
                       max_period: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rope_rotate for halves-layout q/k (see permute_qk_rows_for_rope)."""
    head_dim = q.shape[-1]
    cos, sin = rope_cos_sin(positions, head_dim, max_period)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return apply_rope_halves(q, cos, sin), apply_rope_halves(k, cos, sin)
