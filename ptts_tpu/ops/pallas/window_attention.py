"""Pallas block-local windowed attention for the Mimi depth transformer.

The XLA block-local path (ops/attention.windowed_attention_local) still
materializes [B, nb, H, S, 2S] f32 scores in HBM -- measured as the dominant
cost of the vocoder transformer at serving shapes. This kernel keeps each
(batch, query-block) tile's scores in VMEM: per head, one MXU dot for scores,
an in-register softmax, and one MXU dot for the value apply.

Window semantics match the reference (ptts_mimi.c:264-299): key tk visible to
query tq iff 0 <= tq - tk < context, with block size S >= context - 1 so the
window never reaches past the previous key block.

Grid is static (B, T_pad / S); the previous key block arrives via a second
BlockSpec whose index map points at block i-1 (block 0's "previous" is a
duplicate of block 0 and is fully masked by the k_abs >= 0 term).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _window_attn_kernel(
    q_ref,      # [1, S, H, D] VMEM
    kp_ref,     # [1, S, H, D] previous key block
    kc_ref,     # [1, S, H, D] current key block
    vp_ref,     # [1, S, H, D]
    vc_ref,     # [1, S, H, D]
    o_ref,      # [1, S, H*D] (flat lanes: per-head stores are lane slices)
    *,
    block_s: int,
    context: int,
    t_real: int,
):
    i = pl.program_id(1)
    S = block_s
    H, D = q_ref.shape[2], q_ref.shape[3]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    # absolute positions: queries i*S + r; keys (i-1)*S + c over [prev, cur]
    q_pos = i * S + jax.lax.broadcasted_iota(jnp.int32, (S, 2 * S), 0)
    k_abs = (i - 1) * S + jax.lax.broadcasted_iota(jnp.int32, (S, 2 * S), 1)
    rel = q_pos - k_abs
    valid = (rel >= 0) & (rel < context) & (k_abs >= 0) & (k_abs < t_real)
    vf = valid.astype(jnp.float32)

    for h in range(H):
        q = q_ref[0, :, h, :].astype(jnp.float32)        # [S, D]
        k = jnp.concatenate(
            [kp_ref[0, :, h, :], kc_ref[0, :, h, :]], axis=0
        ).astype(jnp.float32)                             # [2S, D]
        v = jnp.concatenate(
            [vp_ref[0, :, h, :], vc_ref[0, :, h, :]], axis=0
        ).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                         # [S, 2S]
        s = s * vf + (1.0 - vf) * NEG_INF
        m = jnp.max(s, axis=-1, keepdims=True)            # [S, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)            # [S, 1]
        out = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)
        o_ref[0, :, h * D : (h + 1) * D] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("context", "block"))
def windowed_attention_pallas(
    q: jnp.ndarray,   # [B, T, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    context: int,
    block: int = 256,
) -> jnp.ndarray:
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

    def cur(b, i):
        return (b, i, 0, 0)

    def prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0, 0)

    def cur3(b, i):
        return (b, i, 0)

    spec_cur = pl.BlockSpec((1, S, H, D), cur, memory_space=pltpu.VMEM)
    spec_prev = pl.BlockSpec((1, S, H, D), prev, memory_space=pltpu.VMEM)
    kernel = functools.partial(_window_attn_kernel, block_s=S,
                               context=context, t_real=T)
    out = pl.pallas_call(
        kernel,
        grid=(B, nb),
        in_specs=[spec_cur, spec_prev, spec_cur, spec_prev, spec_cur],
        out_specs=pl.BlockSpec((1, S, H * D), cur3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb * S, H * D), q.dtype),
    )(q, k, k, v, v)
    return out[:, :T].reshape(B, T, H, D)
