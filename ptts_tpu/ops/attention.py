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


def windowed_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    context: int,
    block: int = 256,
) -> jnp.ndarray:
    """Sliding-window causal attention in block-local form.

    Equivalent to causal_attention(..., context=context) but only
    materializes [B, nb, H, S, 2S] scores (current + previous key block)
    instead of [B, H, T, T] -- the window (250 for Mimi,
    /root/reference/ptts_mimi.c:17) never reaches past the previous block
    when block >= context - 1. For Mimi at T=1024 this cuts score traffic 2x,
    and linearly more for longer sequences.

    q, k, v: [B, T, H, D]. Requires block >= context - 1.
    """
    B, T, H, D = q.shape
    S = block
    assert S >= context - 1, (S, context)
    nb = -(-T // S)
    pad = nb * S - T
    if pad:
        zpad = jnp.zeros((B, pad, H, D), q.dtype)
        q = jnp.concatenate([q, zpad], axis=1)
        k = jnp.concatenate([k, zpad], axis=1)
        v = jnp.concatenate([v, zpad], axis=1)

    qb = q.reshape(B, nb, S, H, D)
    kb = k.reshape(B, nb, S, H, D)
    vb = v.reshape(B, nb, S, H, D)
    # previous block (zeros before block 0)
    kprev = jnp.concatenate([jnp.zeros_like(kb[:, :1]), kb[:, :-1]], axis=1)
    vprev = jnp.concatenate([jnp.zeros_like(vb[:, :1]), vb[:, :-1]], axis=1)
    k2 = jnp.concatenate([kprev, kb], axis=2)  # [B, nb, 2S, H, D]
    v2 = jnp.concatenate([vprev, vb], axis=2)

    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bnqhd,bnkhd->bnhqk", qb, k2,
                        preferred_element_type=jnp.float32) * scale

    qi = jnp.arange(S)[:, None]           # position within query block
    kj = jnp.arange(2 * S)[None, :] - S   # key offset relative to block start
    rel = qi - kj                         # q_pos - k_pos
    bidx = jnp.arange(nb)[:, None, None]
    k_abs = bidx * S + kj[None]           # [nb, S, 2S] absolute key position
    mask = (rel[None] >= 0) & (rel[None] < context) & (k_abs >= 0)
    # padded tail keys: k_abs < T
    mask = mask & (k_abs < T)
    probs = _masked_softmax(scores, mask[None, :, None, :, :])
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs.astype(v2.dtype), v2,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, nb * S, H, D)[:, :T]
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
    """decode_attention_masked with a per-stream-length (+ window) mask.

    Oracle cross-check variant: superseded in production by the
    cursor-aligned mask built inside flowlm.decode_step; kept (and
    exercised) only by tests/test_ops.py as an independent formulation.
    """
    Tmax = k_cache.shape[1]
    t = jnp.arange(Tmax)[None, :]          # [1, T]
    mask = t < lengths[:, None]            # [B, T]
    if context > 0:
        mask &= (lengths[:, None] - 1 - t) < context
    return decode_attention_masked(q, k_cache, v_cache, mask)


def decode_attention_blocked(
    q: jnp.ndarray,          # [B, H, D]
    k_cache: jnp.ndarray,    # [B, Tmax, H, D]
    v_cache: jnp.ndarray,
    prefix_len: jnp.ndarray, # [B] int32
    start: jnp.ndarray,      # [B] int32
    cursor: jnp.ndarray,     # scalar int32 (last valid decode column)
    *,
    block_t: int = 128,
) -> jnp.ndarray:
    """Online-softmax decode attention that only READS cache blocks up to the
    cursor -- the block-skipping role of the reference's device-resident
    attn_step path (ptts_cuda.c:1755-1799), done at the XLA level: a
    `fori_loop` with a DATA-DEPENDENT trip count `ceil((cursor+1)/block_t)`
    streams `dynamic_slice` blocks through an online softmax.

    STATUS: opt-in only (flags.decode_impl='blocked'). As a standalone op it
    beats the full-read masked einsum ~10x at Tmax=512 (2.0-2.5 ms vs 21-24
    per call), but INSIDE the jitted AR while_loop it measured 2.6x SLOWER
    (5491 vs 2130 us/frame at B=256/Tmax=128): the dynamic-trip-count loop's
    unpipelined dynamic_slice DMAs cost more than the dead-column reads they
    skip once XLA has fused the einsum into the loop body. Kept for
    long-cache experiments and as the validity-semantics reference
    (tests/test_decode_attention.py). A round-1 Pallas flash-decode kernel
    with the same role measured 9x slower than the einsum and was removed.

    Validity matches models/flowlm.KVCache: column t of stream b is live iff
    t < prefix_len[b] or start[b] <= t <= cursor.
    """
    B, Tmax, H, D = k_cache.shape
    # block_t must divide Tmax: a clamped dynamic_slice in the ragged tail
    # block would silently shift its window and mislabel positions
    block_t = min(block_t, Tmax)
    while Tmax % block_t:
        block_t -= 1
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    nb = (cursor + 1 + block_t - 1) // block_t

    def body(j, carry):
        m, l, acc = carry
        k_blk = jax.lax.dynamic_slice(
            k_cache, (0, j * block_t, 0, 0), (B, block_t, H, D))
        v_blk = jax.lax.dynamic_slice(
            v_cache, (0, j * block_t, 0, 0), (B, block_t, H, D))
        t = j * block_t + jnp.arange(block_t)[None, :]
        valid = (t < prefix_len[:, None]) | (
            (t >= start[:, None]) & (t <= cursor))
        s = jnp.einsum("bhd,bthd->bht", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(valid[:, None, :], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l2 = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc2 = acc * corr + jnp.einsum(
            "bht,bthd->bhd", p.astype(v_cache.dtype), v_blk,
            preferred_element_type=jnp.float32)
        return m_new, l2, acc2

    init = (jnp.full((B, H, 1), NEG_INF, jnp.float32),
            jnp.zeros((B, H, 1), jnp.float32),
            jnp.zeros((B, H, D), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nb, body, init)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
