"""Pallas flash-decode attention over a cursor-aligned batched KV cache.

TPU-native analogue of the reference's CUDA attn_step kernel
(/root/reference/ptts_cuda.c:448-487, 1755-1799). Two wins over the plain-XLA
einsum path (ops/attention.py:decode_attention_masked):

  * only cache blocks up to the write cursor are read (the XLA path streams
    the full Tmax and masks) -- decode is HBM-bandwidth-bound, so skipped
    blocks are directly saved wall time for long caches;
  * scores/softmax/weighted-sum fuse into one VMEM-resident online-softmax
    pass, no [B, H, T] materialization.

Validity follows models/flowlm.KVCache: column t of stream b is a live key iff
t < prefix_len[b] or start[b] <= t <= cursor. The three scalars arrive via
scalar prefetch so the block loop bound is known before the body runs.

Score/apply math uses VPU broadcast-multiply-reduce (Mosaic on this toolchain
rejects batched dot_general inside kernels); decode attention is
bandwidth-bound, so MXU shapes don't matter here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_attn_kernel(
    prefix_ref,    # scalar prefetch: [B] int32
    start_ref,     # scalar prefetch: [B] int32
    cursor_ref,    # scalar prefetch: [1] int32
    q_ref,         # [BB, H, D] VMEM
    k_ref,         # [B, Tmax, H, D] ANY/HBM (full; sliced in-kernel)
    v_ref,         # [B, Tmax, H, D]
    o_ref,         # [BB, H, D] VMEM
    k_vmem,        # scratch [BB, BT, H, D]
    v_vmem,        # scratch [BB, BT, H, D]
    sem,           # DMA semaphores (2,)
    *,
    block_t: int,
    bb: int,
):
    b0 = pl.program_id(0) * bb
    H, D = q_ref.shape[1], q_ref.shape[2]
    cursor = cursor_ref[0]
    num_blocks = pl.cdiv(cursor + 1, block_t)

    q = q_ref[...].astype(jnp.float32)  # [BB, H, D]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    prefix = jnp.stack([prefix_ref[b0 + j] for j in range(bb)]).reshape(bb, 1, 1)
    start = jnp.stack([start_ref[b0 + j] for j in range(bb)]).reshape(bb, 1, 1)

    def body(carry):
        i, m, l, acc = carry
        cp_k = pltpu.make_async_copy(
            k_ref.at[pl.ds(b0, bb), pl.ds(i * block_t, block_t)], k_vmem, sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            v_ref.at[pl.ds(b0, bb), pl.ds(i * block_t, block_t)], v_vmem, sem.at[1]
        )
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()

        k = k_vmem[...].astype(jnp.float32)  # [BB, BT, H, D]
        v = v_vmem[...].astype(jnp.float32)
        # [BB, BT, H]: broadcast multiply + lane reduction (VPU)
        s = jnp.sum(k * q[:, None, :, :], axis=-1) * scale

        t_idx = i * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (bb, block_t, 1), 1
        )
        valid = (t_idx < prefix) | ((t_idx >= start) & (t_idx <= cursor))
        s = jnp.where(valid, s, NEG_INF)
        # zero invalid V too: p is 0 there, but 0 * garbage(NaN/Inf) != 0
        v = jnp.where(valid[..., None], v, 0.0)

        m_new = jnp.maximum(m, jnp.max(s, axis=1))              # [BB, H]
        p = jnp.exp(s - m_new[:, None, :])                       # [BB, BT, H]
        alpha = jnp.exp(m - m_new)                               # [BB, H]
        l_new = l * alpha + jnp.sum(p, axis=1)
        acc_new = acc * alpha[:, :, None] + jnp.sum(
            v * p[..., None], axis=1
        )                                                        # [BB, H, D]
        return i + 1, m_new, l_new, acc_new

    def cond(carry):
        return carry[0] < num_blocks

    m0 = jnp.full((bb, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bb, H), jnp.float32)
    acc0 = jnp.zeros((bb, H, D), jnp.float32)
    _, m, l, acc = jax.lax.while_loop(cond, body, (0, m0, l0, acc0))

    o_ref[...] = (acc / jnp.maximum(l, 1e-30)[..., None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_b"))
def decode_attention_pallas(
    q: jnp.ndarray,           # [B, H, D]
    k_cache: jnp.ndarray,     # [B, Tmax, H, D]
    v_cache: jnp.ndarray,     # [B, Tmax, H, D]
    prefix_len: jnp.ndarray,  # [B] int32
    start: jnp.ndarray,       # [B] int32
    cursor: jnp.ndarray,      # scalar int32 (current write column, inclusive)
    *,
    block_t: int = 128,
    block_b: int = 8,
) -> jnp.ndarray:
    B, Tmax, H, D = k_cache.shape
    assert B % block_b == 0, (B, block_b)
    assert Tmax % block_t == 0, (Tmax, block_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, H, D), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full K cache, sliced in-kernel
            pl.BlockSpec(memory_space=pl.ANY),  # full V cache
        ],
        out_specs=pl.BlockSpec((block_b, H, D), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, block_t, H, D), k_cache.dtype),
            pltpu.VMEM((block_b, block_t, H, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_decode_attn_kernel, block_t=block_t, bb=block_b)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
    )(
        prefix_len.astype(jnp.int32),
        start.astype(jnp.int32),
        jnp.asarray(cursor, jnp.int32).reshape(1),
        q, k_cache, v_cache,
    )
