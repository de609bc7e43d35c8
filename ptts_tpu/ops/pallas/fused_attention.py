"""Fused RoPE + attention Pallas kernels operating on the raw QKV projection.

Motivation (v5e traces, tools/profile_stages.py): the XLA-side RoPE rotation,
q/k/v splits, f32 converts, and kernel-boundary pads around the round-1
window_attention kernel cost ~35 ms/call at serving shapes (B=256, T=800) --
more than the attention math itself. These kernels take the fused [B, T, 3*d]
QKV tensor directly (bitcast-viewed as [B, T, 3*H, D]), rotate q/k in VMEM,
and batch BB streams per grid program so DMA pipelines across a much smaller
grid (the round-1 kernel ran 1024 ~20 us programs; this runs B/BB).

RoPE-in-kernel trick: with the halves weight layout
(ops/rope.permute_qk_rows_for_rope), the rotation is
    rot(x) = x * cos64 + swap_halves(x) * sin64n
where cos64 = [cos|cos], sin64n = [-sin|sin] ([T, D] tables built on host) and
swap_halves is x @ P for the constant permutation P[i, (i+D/2)%D] = 1 -- an
MXU dot instead of a 32-lane-offset slice (which Mosaic's lane tiling
rejects). The tables are f32 and tiny.

Two kernel bodies:
  * window:  current + previous key block, sliding context (Mimi depth
    transformer, ptts_mimi.c:264-299 semantics)
  * causal:  single block covering the whole (padded) sequence, with a
    per-stream length mask (FlowLM prefill, ptts_flowlm.c:1159-1185 role)

Numerics match ops/attention.* to MXU-rounding (masked softmax, -1e30 fill,
f32 score accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rope import rope_freqs

NEG_INF = -1e30


def rope_tables64(t_pad: int, head_dim: int, max_period: float,
                  frame0: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Host-side [T, D] f32 cos64/sin64n tables for halves-layout RoPE."""
    freqs = rope_freqs(head_dim, max_period)                 # [D/2]
    pos = np.arange(frame0, frame0 + t_pad, dtype=np.float32)
    angle = pos[:, None] * freqs[None, :]                    # [T, D/2]
    cos = np.cos(angle)
    sin = np.sin(angle)
    cos64 = np.concatenate([cos, cos], axis=1)
    sin64n = np.concatenate([-sin, sin], axis=1)
    return cos64.astype(np.float32), sin64n.astype(np.float32)


def _swap_pair_matrix(D: int, w: int):
    """[w, w] f32 block-diagonal halves-swap: each D-lane head group of a
    w-lane head-pair tile gets its own independent halves swap."""
    r = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    same_head = (r // D) == (c // D)
    return (same_head & ((r % D + D // 2) % D == c % D)).astype(jnp.float32)


def _window_attn_qkv_kernel(
    qkv_c_ref,   # [BB, S, 3*H*D] current block (FLAT lanes: q|k|v, heads
    qkv_p_ref,   # [BB, S, 3*H*D] previous block   contiguous inside each)
    cs_c_ref,    # [S, 2D] f32 cos64 current, tiled across the head pair
    sn_c_ref,    # [S, 2D] f32 sin64n current
    cs_p_ref,    # [S, 2D] previous
    sn_p_ref,    # [S, 2D]
    o_ref,       # [BB, S, H*D]
    *,
    block_s: int,
    context: int,
    t_real: int,
    bb: int,
    num_heads: int,
    head_dim: int,
):
    # FLAT-LANE FORM (round 3): the earlier kernel took [B, T, 3H, D] -- the
    # reshape off the [B, T, 3HD] QKV matmul output forced XLA to relayout
    # the whole 630 MB tensor into 64-lane-minor tiles, plus a second copy to
    # the custom-call operand layout (~16 ms/call of pure layout churn at
    # B=256, T=800 in the device trace). This form consumes the matmul
    # output AS-IS and slices per HEAD PAIR: two D=64 heads = one aligned
    # 128-lane group (q pair at lane 128g, k at HD+128g, v at 2HD+128g --
    # all 128-multiples, which Mosaic slices cleanly). Per-head score dots
    # contract over the full 128 lanes with the other head's lanes zeroed
    # (exact: + 0.0 terms); per-head context dots produce both heads' lanes
    # and the wrong half is masked off before the pair is recombined.
    i = pl.program_id(1)
    S = block_s
    H = num_heads
    D = head_dim
    HD = H * D
    dt = qkv_c_ref.dtype
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    cs_c = cs_c_ref[...]
    sn_c = sn_c_ref[...]
    cs_p = cs_p_ref[...]
    sn_p = sn_p_ref[...]

    q_pos = i * S + jax.lax.broadcasted_iota(jnp.int32, (S, 2 * S), 0)
    k_abs = (i - 1) * S + jax.lax.broadcasted_iota(jnp.int32, (S, 2 * S), 1)
    rel = q_pos - k_abs
    valid = (rel >= 0) & (rel < context) & (k_abs >= 0) & (k_abs < t_real)
    # rows of the (prev|cur) key stack that exist in the unpadded input; with
    # non-divisible T the tail block's out-of-bounds rows are UNDEFINED (may
    # be NaN) and 0 * NaN = NaN would poison the context dot, so V must be
    # zeroed (scores are safe: `valid` uses where, not multiply)
    k_row = (i - 1) * S + jax.lax.broadcasted_iota(jnp.int32, (2 * S, 1), 0)
    k_row_ok = (k_row >= 0) & (k_row < t_real)

    groups = []  # (lane offset, width, per-head lane masks)
    g = 0
    while g * 2 < H:
        off = g * 2 * D
        w = min(2 * D, HD - off)
        groups.append((off, w))
        g += 1

    def pairmask(w, lo):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        return ((lane < D) if lo else (lane >= D)).astype(dt)

    def rot(x, cs, sn, P):
        xs = jax.lax.dot_general(
            x, P, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (x.astype(jnp.float32) * cs + xs * sn).astype(dt)

    # fori_loop over streams bounds live kernel temporaries to one iteration
    # (a fully-unrolled bb*H loop blows the scoped-VMEM stack at bb >= 2)
    def stream(b, _):
        for off, w in groups:
            # block-diag swap: rotates each head's halves independently
            P = _swap_pair_matrix(D, w).astype(dt)
            q = rot(qkv_c_ref[b, :, off : off + w], cs_c[:, :w], sn_c[:, :w],
                    P)
            kc = rot(qkv_c_ref[b, :, HD + off : HD + off + w],
                     cs_c[:, :w], sn_c[:, :w], P)
            kp = rot(qkv_p_ref[b, :, HD + off : HD + off + w],
                     cs_p[:, :w], sn_p[:, :w], P)
            k2 = jnp.concatenate([kp, kc], axis=0)                  # [2S, w]
            v2 = jnp.concatenate(
                [qkv_p_ref[b, :, 2 * HD + off : 2 * HD + off + w],
                 qkv_c_ref[b, :, 2 * HD + off : 2 * HD + off + w]],
                axis=0,
            )
            v2 = jnp.where(k_row_ok, v2, jnp.zeros_like(v2))
            acc = None
            for hmask in ([pairmask(w, True), pairmask(w, False)]
                          if w == 2 * D else [jnp.ones((1, w), dt)]):
                # dots run in the INPUT dtype (bf16 serving: full MXU rate;
                # f32 parity: 3-pass) with f32 accumulation -- identical
                # numerics treatment to the XLA path (probs.astype(v.dtype)).
                s = jax.lax.dot_general(
                    q * hmask, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                           # [S, 2S]
                s = jnp.where(valid, s, NEG_INF)  # where (not mul): kills NaN
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                out = jax.lax.dot_general(
                    p.astype(dt), v2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) / jnp.maximum(l, 1e-30)                           # [S, w]
                out = out * hmask.astype(jnp.float32)  # drop other head's v
                acc = out if acc is None else acc + out
            o_ref[b, :, off : off + w] = acc.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, stream, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "context", "block", "block_b",
                     "max_period", "interpret"),
)
def window_attention_qkv(
    qkv: jnp.ndarray,   # [B, T, 3*H*D] fused projection (halves RoPE layout)
    *,
    num_heads: int,
    head_dim: int,
    context: int,
    block: int = 256,
    block_b: int = 8,
    max_period: float = 10000.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sliding-window causal attention with in-kernel RoPE.

    Equals rope_rotate_halves + windowed_attention_local on the split q/k/v
    (positions = arange(T)). Returns [B, T, H*D].

    Consumes the FLAT [B, T, 3HD] projection with no host-side pad or
    reshape: T that doesn't divide the block relies on Pallas' masked tail
    blocks, and heads are sliced in-kernel as aligned 128-lane pairs -- both
    relayout copies the 4-D form forced (~16 ms/call at B=256, T=800) are
    gone from the HLO.
    """
    B, T, qkv_dim = qkv.shape
    H, D = num_heads, head_dim
    assert qkv_dim == 3 * H * D
    S = block
    assert S >= context - 1, (S, context)
    nb = -(-T // S)
    bb = block_b
    while B % bb:
        bb //= 2

    cos64, sin64n = rope_tables64(nb * S, D, max_period)
    # tile across the head pair: both heads of a 128-lane group share tables
    cos2 = jnp.asarray(np.concatenate([cos64, cos64], axis=1))
    sin2 = jnp.asarray(np.concatenate([sin64n, sin64n], axis=1))

    def cur(b, i):
        return (b, i, 0)

    def prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def tcur(b, i):
        return (i, 0)

    def tprev(b, i):
        return (jnp.maximum(i - 1, 0), 0)

    spec_c = pl.BlockSpec((bb, S, 3 * H * D), cur, memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((bb, S, 3 * H * D), prev, memory_space=pltpu.VMEM)
    tspec_c = pl.BlockSpec((S, 2 * D), tcur, memory_space=pltpu.VMEM)
    tspec_p = pl.BlockSpec((S, 2 * D), tprev, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _window_attn_qkv_kernel, block_s=S, context=context, t_real=T,
        bb=bb, num_heads=H, head_dim=D,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B // bb, nb),
        in_specs=[spec_c, spec_p, tspec_c, tspec_c, tspec_p, tspec_p],
        out_specs=pl.BlockSpec((bb, S, H * D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H * D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, qkv, cos2, sin2, cos2, sin2)
    return out


def _causal_attn_qkv_kernel(
    len_ref,     # scalar prefetch [B] int32
    qkv_ref,     # [BB, T, 3*H*D] FLAT projection (q|k|v, heads contiguous)
    cs_ref,      # [T, 2D] f32 (pair-tiled)
    sn_ref,      # [T, 2D] f32
    o_ref,       # [BB, T, H*D]
    ok_ref,      # [BB, T, H*D] rotated K (for the KV cache)
    *,
    seq_t: int,
    bb: int,
    num_heads: int,
    head_dim: int,
):
    # FLAT-LANE + BATCHED PAIR GROUPS: two compile/runtime lessons meet
    # here. (1) An early form unrolled a Python loop over the 16 heads (16
    # tiny [T,T] dots per stream body) and cost 220-340 s of Mosaic compile
    # -- heads must be a leading BATCH dim of a few dot_generals. (2) The
    # head-major [B, 3H, T, D] operand layout forced XLA to relayout the
    # whole projection at the kernel boundary (same ~copies story as the
    # window kernel). So: consume the flat [B, T, 3HD] matmul output,
    # gather the aligned 128-lane head PAIRS into a [G, T, 2D] stack in
    # VMEM, and run batched masked dots over the pair dim (other head's
    # lanes zeroed -- exact +0.0 terms; wrong context half masked off).
    bidx = pl.program_id(0)
    T = seq_t
    H = num_heads
    D = head_dim
    HD = H * D
    dt = qkv_ref.dtype
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    cs = cs_ref[...]
    sn = sn_ref[...]

    tq = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tk = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    causal = tk <= tq

    # uniform-width lane groups: pairs of heads (width 2D), or a single
    # width-D group when H == 1 (tests); odd H > 1 is unsupported upstream
    if H % 2 == 0:
        G, W = H // 2, 2 * D
    else:
        assert H == 1, "odd num_heads > 1 not supported"
        G, W = 1, D
    P = _swap_pair_matrix(D, W).astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    masks = ([(lane < D).astype(dt), (lane >= D).astype(dt)]
             if W == 2 * D else [jnp.ones((1, 1, W), dt)])

    def softmax_ctx(s, valid, vp):
        s = jnp.where(valid[None], s, NEG_INF)      # where (not mul): NaNs
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(dt), vp, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / jnp.maximum(l, 1e-30)                   # [G, T, W]
        return out

    def stream(b, _):
        length = len_ref[bidx * bb + b]
        valid = causal & (tk < length)                          # [T, T]
        qp = jnp.stack([qkv_ref[b, :, g * W : (g + 1) * W]
                        for g in range(G)])                     # [G, T, W]
        kp = jnp.stack([qkv_ref[b, :, HD + g * W : HD + (g + 1) * W]
                        for g in range(G)])
        vp = jnp.stack([qkv_ref[b, :, 2 * HD + g * W : 2 * HD + (g + 1) * W]
                        for g in range(G)])

        def rot(x):
            xs = jax.lax.dot_general(
                x, P, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (x.astype(jnp.float32) * cs[None, :, :W]
                    + xs * sn[None, :, :W]).astype(dt)

        qr = rot(qp)
        kr = rot(kp)
        acc = None
        for hmask in masks:
            s = jax.lax.dot_general(
                qr * hmask, kr,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale                                           # [G, T, T]
            out = softmax_ctx(s, valid, vp) * hmask.astype(jnp.float32)
            acc = out if acc is None else acc + out
        for g in range(G):
            o_ref[b, :, g * W : (g + 1) * W] = acc[g].astype(o_ref.dtype)
            ok_ref[b, :, g * W : (g + 1) * W] = kr[g].astype(ok_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, stream, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "head_dim", "block_b", "max_period",
                     "interpret"),
)
def causal_attention_qkv(
    qkv: jnp.ndarray,      # [B, T, 3*H*D] fused projection (halves layout)
    lengths: jnp.ndarray,  # [B] int32
    *,
    num_heads: int,
    head_dim: int,
    block_b: int = 8,
    max_period: float = 10000.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full-causal + lengths-masked attention with in-kernel RoPE (FlowLM
    prefill). Whole sequence is one key block.

    Returns (attn [B, T, H*D], k_rot [B, T, H*D]) -- the rotated keys are a
    free second output the prefill stores into the KV cache (the XLA path
    pays a separate RoPE fusion for them)."""
    B, T, qkv_dim = qkv.shape
    H, D = num_heads, head_dim
    assert qkv_dim == 3 * H * D
    bb = block_b
    while B % bb:
        bb //= 2
    cos64, sin64n = rope_tables64(T, D, max_period)
    cos2 = jnp.asarray(np.concatenate([cos64, cos64], axis=1))
    sin2 = jnp.asarray(np.concatenate([sin64n, sin64n], axis=1))

    out_spec = pl.BlockSpec((bb, T, H * D), lambda b, *_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, T, 3 * H * D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * D), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * D), lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
    )
    kernel = functools.partial(_causal_attn_qkv_kernel, seq_t=T, bb=bb,
                               num_heads=H, head_dim=D)
    out, k_rot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, T, H * D), qkv.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qkv, cos2, sin2)
    return out, k_rot
