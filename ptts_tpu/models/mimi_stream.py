"""Streaming Mimi decoder: one 80 ms PCM chunk per FlowLM frame.

The reference decodes whole latent sequences only (ptts_mimi_decode,
/root/reference/ptts_mimi.c:570-738); the BASELINE.json north star requires a
streaming path (time-to-first-chunk < 150 ms). This module decodes
frame-by-frame with exact equality to the full-sequence decoder:

  * causal conv1d: carry the last (k - stride) input samples per stream
  * transposed conv: emit T*stride outputs per chunk and carry the (k - s)
    trailing partial sums (bias is applied only on emission)
  * windowed transformer (context 250): ring-buffer KV cache of size RING
    with absolute-position masking -- bounded memory for unbounded audio

All state lives in a pytree of [B, ...] arrays: B concurrent streams advance
in lockstep inside one jitted step, and the state shards over the batch mesh
like the FlowLM KV cache.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import MimiConfig
from ..ops.activations import gelu_tanh
from ..ops.attention import NEG_INF
from ..ops.conv import conv1d_causal, elu
from ..ops.norms import layernorm
from ..ops.rope import rope_rotate_halves

RING = 384  # >= context (250) + per-frame positions (16); multiple of 128

State = Dict[str, Any]


# ---------------------------------------------------------------------------
# Streaming conv primitives
# ---------------------------------------------------------------------------


def conv_carry_init(batch: int, k: int, stride: int, in_ch: int, dtype) -> jnp.ndarray:
    """Zero left-context: matches the full decoder's zero left_pad."""
    return jnp.zeros((batch, k - stride, in_ch), dtype)


def conv1d_stream(
    x: jnp.ndarray,        # [B, Tc, Cin] chunk input
    carry: jnp.ndarray,    # [B, k - stride, Cin]
    kernel: jnp.ndarray,   # WIO [k, in/g, out]
    bias,
    *,
    stride: int = 1,
    groups: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming causal conv: returns (y [B, Tc//stride, Cout], new_carry)."""
    k = kernel.shape[0]
    ctx = k - stride
    full = jnp.concatenate([carry, x], axis=1)
    y = jax.lax.conv_general_dilated(
        full,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(0, 0)],  # context is explicit
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias
    new_carry = full[:, full.shape[1] - ctx :, :] if ctx > 0 else carry
    return y.astype(x.dtype), new_carry


def convtr_carry_init(batch: int, in_ch: int, dtype) -> jnp.ndarray:
    """k == 2*stride transposed conv needs only the previous input frame."""
    return jnp.zeros((batch, 1, in_ch), dtype)


def convtr1d_2s_stream(
    x: jnp.ndarray,        # [B, Tc, Cin]
    carry: jnp.ndarray,    # [B, 1, Cin] previous chunk's last input frame
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    bias,
    *,
    stride: int,
    depthwise: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming k == 2*stride transposed conv (ops/conv.convtr1d_2s form):
    y[t*s + j] = x[t] . W1[:, j] + x[t-1] . W2[:, j]; carrying the previous
    input frame across chunks makes streaming exact."""
    from ..ops.conv import convtr1d_2s

    full = jnp.concatenate([carry.astype(x.dtype), x], axis=1)  # [B, Tc+1, C]
    y = convtr1d_2s(full, w1, w2, bias, stride=stride, depthwise=depthwise)
    # drop the first s outputs (they belong to the carried frame's slot,
    # already emitted by the previous chunk)
    y = y[:, stride:, :]
    new_carry = x[:, -1:, :].astype(carry.dtype)
    return y, new_carry


# ---------------------------------------------------------------------------
# Streaming windowed transformer (ring-buffer KV)
# ---------------------------------------------------------------------------


def ring_init(cfg: MimiConfig, batch: int, dtype) -> State:
    shape = (cfg.num_layers, batch, RING, cfg.num_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        # per-stream positions processed so far (streams may be admitted at
        # different times under continuous batching)
        "pos": jnp.zeros((batch,), jnp.int32),
        # per-(stream, slot) absolute position of the stored key; -1 = empty.
        # Storing validity explicitly (393 KB at B=256) lets the K/V write be
        # ONE dynamic_update_slice at a GLOBAL cursor shared by all streams
        # instead of a per-stream scatter at pos % RING -- the scatter
        # measured 14.0 ms/chunk at serving shapes vs ~0 for the slice
        # (PERF.md round 3); admission simply stamps a row to -1 and no
        # longer zeroes the ring K/V at all.
        "kpos": jnp.full((batch, RING), -1, jnp.int32),
        # global write cursor: next free slot column (shared by all streams,
        # which advance in lockstep Tc per call)
        "wc": jnp.zeros((), jnp.int32),
    }


def _ring_attention(
    q: jnp.ndarray,        # [B, Tc, H, D] (already rope'd)
    k_ring: jnp.ndarray,   # [B, RING, H, D]
    v_ring: jnp.ndarray,
    kpos: jnp.ndarray,     # [B, RING]: absolute position per slot, -1 empty
    pos0: jnp.ndarray,     # [B]: absolute position of q[:, 0]
    Tc: int,
    context: int,
) -> jnp.ndarray:
    """Attention over ring slots with stored-position window masking."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(D))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_ring,
                        preferred_element_type=jnp.float32) * scale

    q_pos = pos0[:, None] + jnp.arange(Tc)[None, :]           # [B, Tc]
    key_abs = kpos[:, None, :]                                # [B, 1, R]
    valid = (key_abs >= 0) & (key_abs <= q_pos[:, :, None])
    valid &= (q_pos[:, :, None] - key_abs) < context
    scores = jnp.where(valid[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v_ring.dtype), v_ring,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def transformer_stream(
    w: State, ring: State, x: jnp.ndarray, cfg: MimiConfig
) -> Tuple[State, jnp.ndarray]:
    """Process a chunk of Tc 200 Hz positions through the depth transformer.

    All streams advance in lockstep, so the chunk's K/V land at the same
    ring columns [s, s+Tc) for every stream: one dynamic_update_slice per
    layer (in-place under donation). ``s`` wraps to 0 when the chunk would
    run past the ring end; with a chunk size that divides RING (every
    production chunk: 16 Tc per FlowLM frame, RING=384) the cursor cycles
    with no slack, and in the general case the stored ``kpos`` keeps the
    mask exact while at most the oldest Tc-1 in-window slots are recycled
    early."""
    B, Tc, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    R = ring["k"].shape[2]
    pos0 = ring["pos"]                                   # [B]
    positions = pos0[:, None] + jnp.arange(Tc)[None, :]  # [B, Tc]
    s = ring["wc"]
    s = jnp.where(s + Tc <= R, s, 0)                     # wrap whole chunks
    kpos = jax.lax.dynamic_update_slice(ring["kpos"], positions, (0, s))

    k_rings, v_rings = ring["k"], ring["v"]
    for l in range(cfg.num_layers):
        xn = layernorm(x, w["norm1_w"][l], w["norm1_b"][l], cfg.ln_eps)
        qkv = jnp.einsum("btd,od->bto", xn, w["in_proj"][l],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q = qkv[..., :d].reshape(B, Tc, H, D)
        k = qkv[..., d : 2 * d].reshape(B, Tc, H, D)
        v = qkv[..., 2 * d :].reshape(B, Tc, H, D)
        q, k = rope_rotate_halves(q, k, positions, cfg.max_period)

        k_rings = jax.lax.dynamic_update_slice(
            k_rings, k[None].astype(k_rings.dtype), (l, 0, s, 0, 0))
        v_rings = jax.lax.dynamic_update_slice(
            v_rings, v[None].astype(v_rings.dtype), (l, 0, s, 0, 0))

        attn = _ring_attention(q, k_rings[l], v_rings[l], kpos, pos0, Tc,
                               cfg.context)
        add = jnp.einsum("bthd,ohd->bto", attn.reshape(B, Tc, H, D),
                         w["out_proj"][l].reshape(d, H, D),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if w["ls1"] is not None:
            add = add * w["ls1"][l]
        x = x + add
        xn = layernorm(x, w["norm2_w"][l], w["norm2_b"][l], cfg.ln_eps)
        ff = gelu_tanh(
            jnp.einsum("btd,od->bto", xn, w["linear1"][l],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        )
        add = jnp.einsum("bto,do->btd", ff, w["linear2"][l],
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if w["ls2"] is not None:
            add = add * w["ls2"][l]
        x = x + add

    new_ring = {"k": k_rings, "v": v_rings, "pos": pos0 + Tc,
                "kpos": kpos, "wc": (s + Tc) % R}
    return new_ring, x


# ---------------------------------------------------------------------------
# Full streaming state
# ---------------------------------------------------------------------------


def init_state(w: State, cfg: MimiConfig, batch: int, dtype=jnp.float32) -> State:
    mult = 2 ** len(cfg.ratios)
    stages = []
    ch = mult * cfg.n_filters
    for ratio in cfg.ratios:
        out_ch = ch // 2
        stages.append(
            {
                "up": convtr_carry_init(batch, ch, dtype),
                "res1": conv_carry_init(batch, cfg.residual_kernel, 1, out_ch, dtype),
                # res conv2 has k=1: no carry needed
            }
        )
        ch = out_ch
    return {
        "up": convtr_carry_init(batch, cfg.d_model, dtype),
        "ring": ring_init(cfg, batch, dtype),
        "dec_in": conv_carry_init(batch, cfg.kernel_size, 1,
                                  cfg.d_model, dtype),
        "stages": stages,
        "dec_out": conv_carry_init(batch, cfg.last_kernel_size, 1,
                                   cfg.n_filters, dtype),
    }


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def decode_stream(
    w: State, state: State, latents: jnp.ndarray, cfg: MimiConfig
) -> Tuple[State, jnp.ndarray]:
    """Decode a chunk of F frames: [B, F, latent] -> [B, F * frame_samples].

    Chunked output is exactly equal to the same frames' slice of the
    full-sequence mimi.decode (validated in tests/test_mimi_stream.py).
    """
    x = jnp.einsum("bfi,oi->bfo", latents, w["quant_w"],
                   preferred_element_type=jnp.float32).astype(latents.dtype)
    x, up_carry = convtr1d_2s_stream(
        x, state["up"], w["upsample_w1"], w["upsample_w2"], None,
        stride=cfg.upsample_stride, depthwise=True,
    )
    ring, x = transformer_stream(w["transformer"], state["ring"], x, cfg)

    x, dec_in_carry = conv1d_stream(x, state["dec_in"], w["dec_in_kernel"],
                                    w["dec_in_bias"])
    new_stages = []
    for st, stw, ratio in zip(state["stages"], w["stages"], cfg.ratios):
        x = elu(x)
        x, up_c = convtr1d_2s_stream(x, st["up"], stw["up_w1"], stw["up_w2"],
                                     stw["up_bias"], stride=ratio)
        h = elu(x)
        h, r1_c = conv1d_stream(h, st["res1"], stw["res1_kernel"], stw["res1_bias"])
        h = elu(h)
        h = conv1d_causal(h, stw["res2_kernel"], stw["res2_bias"])  # k=1: stateless
        x = x + h
        new_stages.append({"up": up_c, "res1": r1_c})
    x = elu(x)
    x, dec_out_carry = conv1d_stream(x, state["dec_out"], w["dec_out_kernel"],
                                     w["dec_out_bias"])

    new_state = {
        "up": up_carry,
        "ring": ring,
        "dec_in": dec_in_carry,
        "stages": new_stages,
        "dec_out": dec_out_carry,
    }
    return new_state, x[..., 0]
