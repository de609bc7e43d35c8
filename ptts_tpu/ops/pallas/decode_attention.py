"""Pallas flash-decode attention over a batched KV cache.

TPU-native analogue of the reference's CUDA attn_step kernel
(/root/reference/ptts_cuda.c:448-487, 1755-1799): one query per stream
attends over that stream's cache prefix. Two wins over the plain-XLA einsum
path (ops/attention.py:decode_attention):

  * only cache blocks below the stream's length are read (the XLA path
    streams the full Tmax and masks) -- decode is HBM-bandwidth-bound, so
    skipped blocks are directly saved wall time for long caches;
  * scores/softmax/weighted-sum fuse into one VMEM-resident pass (online
    softmax accumulation), no [B, H, T] materialization.

Grid: one program per stream block; lengths arrive via scalar prefetch so the
per-stream block loop bound is known before the body runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_attn_kernel(
    lengths_ref,   # scalar prefetch: [B] int32
    q_ref,         # [BB, H, D] VMEM
    k_ref,         # [BB, Tmax, H, D] ANY/HBM
    v_ref,         # [BB, Tmax, H, D]
    o_ref,         # [BB, H, D] VMEM
    k_vmem,        # scratch [BB, BT, H, D]
    v_vmem,        # scratch [BB, BT, H, D]
    sem,           # DMA semaphores (2,)
    *,
    block_t: int,
    bb: int,
):
    b0 = pl.program_id(0) * bb
    Tmax = k_ref.shape[1]
    H, D = q_ref.shape[1], q_ref.shape[2]

    # max length within this stream block decides how many T blocks to visit
    max_len = 0
    for j in range(bb):
        max_len = jnp.maximum(max_len, lengths_ref[b0 + j])
    num_blocks = pl.cdiv(max_len, block_t)

    q = q_ref[...].astype(jnp.float32)  # [BB, H, D]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    def body(carry):
        i, m, l, acc = carry
        # DMA the i-th T block of K and V for this program's BB streams.
        # (k_ref/v_ref live in ANY/HBM and are NOT grid-blocked: slice by b0.)
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
        s = jnp.einsum("bhd,bthd->bht", q, k) * scale  # [BB, H, BT]

        t_idx = i * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (bb, 1, block_t), 2
        )
        lens = jnp.stack([lengths_ref[b0 + j] for j in range(bb)]).reshape(bb, 1, 1)
        s = jnp.where(t_idx < lens, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))        # [BB, H]
        p = jnp.exp(s - m_new[..., None])                   # [BB, H, BT]
        alpha = jnp.exp(m - m_new)                          # [BB, H]
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum("bht,bthd->bhd", p, v)
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
    q: jnp.ndarray,        # [B, H, D]
    k_cache: jnp.ndarray,  # [B, Tmax, H, D]
    v_cache: jnp.ndarray,  # [B, Tmax, H, D]
    lengths: jnp.ndarray,  # [B] int32 (valid entries incl. current position)
    *,
    block_t: int = 128,
    block_b: int = 8,
) -> jnp.ndarray:
    B, Tmax, H, D = k_cache.shape
    assert B % block_b == 0, (B, block_b)
    # Tmax must cover whole blocks; caller allocates bucketed caches.
    assert Tmax % block_t == 0, (Tmax, block_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, H, D), lambda i, L: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full K cache, sliced in-kernel
            pl.BlockSpec(memory_space=pl.ANY),  # full V cache
        ],
        out_specs=pl.BlockSpec((block_b, H, D), lambda i, L: (i, 0, 0),
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
    )(lengths.astype(jnp.int32), q, k_cache, v_cache)
