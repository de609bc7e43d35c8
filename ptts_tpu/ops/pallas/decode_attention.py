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

Mosaic shape discipline (this toolchain rejects several vector-layout
patterns): caches are DMA'd with heads flattened into the 128-aligned lane
dim; per-head dots use lane-masked broadcasts; all reductions run over the
lane dim; the softmax denominator rides as an extra all-ones sublane row of
the transposed V block; no tensor exceeds 3-D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _decode_attn_kernel(
    prefix_ref,    # scalar prefetch: [B] int32
    start_ref,     # scalar prefetch: [B] int32
    cursor_ref,    # scalar prefetch: [1] int32
    q_ref,         # [BB, H*D] VMEM
    k_ref,         # [B, Tmax, H*D] ANY/HBM (full; sliced in-kernel)
    v_ref,         # [B, Tmax, H*D]
    o_ref,         # [BB, H*D] VMEM
    k_vmem,        # scratch [BB, BT, H*D]
    v_vmem,        # scratch [BB, BT, H*D]
    sem,           # DMA semaphores (2,)
    *,
    block_t: int,
    bb: int,
    num_heads: int,
    head_dim: int,
):
    b0 = pl.program_id(0) * bb
    H, D = num_heads, head_dim
    HPG = LANES // D           # heads per 128-lane group
    G = H // HPG               # lane groups
    cursor = cursor_ref[0]
    num_blocks = pl.cdiv(cursor + 1, block_t)
    scale = 1.0 / jnp.sqrt(jnp.float32(D))

    # per-stream scalars as [bb, 1], built at 2-D
    prefix = jnp.concatenate(
        [jnp.full((1, 1), prefix_ref[b0 + j], jnp.int32) for j in range(bb)], axis=0
    )
    start = jnp.concatenate(
        [jnp.full((1, 1), start_ref[b0 + j], jnp.int32) for j in range(bb)], axis=0
    )

    # lane masks selecting one head's D lanes within a 128-lane group
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    head_lane_masks = [
        ((lane >= hh * D) & (lane < (hh + 1) * D)).astype(jnp.float32)
        for hh in range(HPG)
    ]

    def body(carry):
        i, ms, ls, accs = carry  # per head: m,l [bb,1]; acc [bb, D]
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

        t_idx = i * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (bb, block_t), 1
        )
        valid = (t_idx < prefix) | ((t_idx >= start) & (t_idx <= cursor))
        vf = valid.astype(jnp.float32)                    # [bb, BT]

        new_ms = list(ms)
        new_ls = list(ls)
        new_accs = list(accs)
        ones_row = jnp.ones((bb, 1, block_t), jnp.float32)
        for g in range(G):
            k2 = k_vmem[:, :, g * LANES : (g + 1) * LANES].astype(jnp.float32)
            v2 = v_vmem[:, :, g * LANES : (g + 1) * LANES].astype(jnp.float32)
            # mask stale/invalid columns (finite garbage from retired streams)
            v2 = v2 * vf[:, :, None]
            v2_t = jnp.swapaxes(v2, 1, 2)                 # [bb, 128, BT]
            v2_ext = jnp.concatenate([v2_t, ones_row], axis=1)  # [bb, 129, BT]
            q2 = q_ref[:, g * LANES : (g + 1) * LANES].astype(jnp.float32)

            for hh in range(HPG):
                h = g * HPG + hh
                # per-head dot via lane-masked q (lane slicing at D=64 is not
                # 128-aligned; masking is)
                qh = (q2 * head_lane_masks[hh])[:, None, :]   # [bb, 1, 128]
                s = jnp.sum(k2 * qh, axis=-1) * scale          # [bb, BT]
                s = s * vf + (1.0 - vf) * NEG_INF

                m_h, l_h, acc_h = new_ms[h], new_ls[h], new_accs[h]
                m_new = jnp.maximum(m_h, jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m_new)                         # [bb, BT]
                alpha = jnp.exp(m_h - m_new)                   # [bb, 1]
                red = jnp.sum(v2_ext * p[:, None, :], axis=-1)  # [bb, 129]
                new_ms[h] = m_new
                new_ls[h] = l_h * alpha + red[:, LANES : LANES + 1]
                new_accs[h] = acc_h * alpha + red[:, hh * D : (hh + 1) * D]
        return i + 1, tuple(new_ms), tuple(new_ls), tuple(new_accs)

    def cond(carry):
        return carry[0] < num_blocks

    ms0 = tuple(jnp.full((bb, 1), NEG_INF, jnp.float32) for _ in range(H))
    ls0 = tuple(jnp.zeros((bb, 1), jnp.float32) for _ in range(H))
    accs0 = tuple(jnp.zeros((bb, D), jnp.float32) for _ in range(H))
    _, ms, ls, accs = jax.lax.while_loop(cond, body, (0, ms0, ls0, accs0))

    for h in range(H):
        out_h = accs[h] / jnp.maximum(ls[h], 1e-30)       # [bb, D]
        o_ref[:, h * D : (h + 1) * D] = out_h.astype(o_ref.dtype)


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
    assert (H * D) % LANES == 0 and D <= LANES, (H, D)

    HD = H * D
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, HD), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full K cache, sliced in-kernel
            pl.BlockSpec(memory_space=pl.ANY),  # full V cache
        ],
        out_specs=pl.BlockSpec((block_b, HD), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, block_t, HD), k_cache.dtype),
            pltpu.VMEM((block_b, block_t, HD), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_decode_attn_kernel, block_t=block_t,
                               bb=block_b, num_heads=H, head_dim=D)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, HD), q.dtype),
    )(
        prefix_len.astype(jnp.int32),
        start.astype(jnp.int32),
        jnp.asarray(cursor, jnp.int32).reshape(1),
        q.reshape(B, HD),
        k_cache.reshape(B, Tmax, HD),
        v_cache.reshape(B, Tmax, HD),
    )
    return out.reshape(B, H, D)
