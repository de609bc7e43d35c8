"""Attention ops: full causal, sliding-window causal, and single-query decode.

Numerics: scale = 1/sqrt(D); masked logits are set to -1e30 before softmax
(matching /root/reference/ptts_mimi.c:278-281); softmax subtracts the row max
(ptts_flowlm.c:216-227), which is what jax.nn.softmax does.

Layouts are batch-first, time-second, heads-third: [B, T, H, D]. The batch
axis is the parallel/sharding axis for serving (SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.where(mask, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    context: int = 0,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full causal attention.

    q, k, v: [B, T, H, D]. ``context`` > 0 adds the Mimi sliding window:
    key tk is masked for query tq when (tq - tk) >= context
    (ptts_mimi.c:264-299). ``lengths`` ([B] int) masks padded key positions
    t >= length (for batched prefill with ragged prompts).
    Returns [B, T, H, D].
    """
    B, T, H, D = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale

    tq = jnp.arange(T)[:, None]
    tk = jnp.arange(T)[None, :]
    mask = tk <= tq  # causal
    if context > 0:
        mask &= (tq - tk) < context
    mask = mask[None, None, :, :]
    if lengths is not None:
        valid = tk[None, :, :] < lengths[:, None, None]  # [B, 1, T]
        mask = mask & valid[:, None, :, :]

    probs = _masked_softmax(scores, mask)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def decode_attention_masked(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Single-query attention over a KV cache with an explicit validity mask.

    q: [B, H, D]; k_cache/v_cache: [B, Tmax, H, D]; mask: [B, Tmax] bool.
    Returns [B, H, D].

    TPU analogue of the reference CUDA attn_step kernel
    (/root/reference/ptts_cuda.c:1755-1799) — but batched over B streams so
    the MXU sees real matmul shapes instead of one query.
    """
    scores = jnp.einsum("bhd,bthd->bht", q, k_cache,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(q.shape[-1])))
    probs = _masked_softmax(scores, mask[:, None, :])
    out = jnp.einsum("bht,bthd->bhd", probs.astype(v_cache.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    context: int = 0,
) -> jnp.ndarray:
    """decode_attention_masked with a per-stream-length (+ window) mask."""
    Tmax = k_cache.shape[1]
    t = jnp.arange(Tmax)[None, :]          # [1, T]
    mask = t < lengths[:, None]            # [B, T]
    if context > 0:
        mask &= (lengths[:, None] - 1 - t) < context
    return decode_attention_masked(q, k_cache, v_cache, mask)
