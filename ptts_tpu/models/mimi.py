"""Mimi decoder: acoustic latents -> 24 kHz waveform.

TPU-native rebuild of /root/reference/ptts_mimi.c. The pipeline
(quantizer out-proj -> depthwise transposed upsample -> windowed-attention
depth transformer -> SEANet transposed-conv stack) runs as one jitted,
batch-first graph in channels-last layout [B, T, C] -- the reference's
channel-major buffers and chw<->thw transposes (ptts_mimi.c:134-150) disappear
into XLA layout assignment, and the whole stack stays on device like the
reference's fused CUDA path (ptts_cuda_mimi_convstack, ptts_cuda.c:1112-1548).

Numerics: LayerNorm eps 1e-5, tanh-GELU, sliding-window causal attention with
context=250 masked at (tq - tk) >= context, per-branch LayerScale, ELU
vocoder activations, causal conv padding left_pad = k - stride. See ops/*.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MimiConfig
from ..ops.activations import gelu_tanh
from ..ops.attention import causal_attention, windowed_attention_local
from ..ops.conv import (
    conv1d_causal,
    convtr1d_2s,
    elu,
    prepare_conv_kernel,
    prepare_convtr_halves,
)
from ..ops.norms import layernorm
from ..ops.rope import permute_qk_rows_for_rope, rope_rotate_halves

Weights = Dict[str, Any]

# query-block size for block-local windowed attention (>= context - 1)
LOCAL_ATTN_BLOCK = 256


def resolve_window_impl(choice: str = "auto") -> str:
    """Resolve the windowed-attention implementation: 'pallas' (fused
    RoPE+attention QKV kernel, ops/pallas/fused_attention.py; measured 1.6x
    the XLA block-local path at B=256, T=800 bf16 on v5e) or 'local' (XLA
    block-local). 'auto' consults PTTS_PALLAS_WINDOW then the backend
    (Pallas on TPU). Must be called OUTSIDE traced code -- the result is
    passed to decode()/transformer() as a static argument, so the choice is
    explicit per call instead of baked silently into the first trace."""
    import os

    if choice in ("pallas", "local"):
        return choice
    v = os.environ.get("PTTS_PALLAS_WINDOW", "auto")
    if v == "0":
        return "local"
    if v == "1":
        return "pallas"
    return "pallas" if jax.default_backend() == "tpu" else "local"


# ---------------------------------------------------------------------------
# Weight loading (names per ptts_mimi_load, ptts_mimi.c:378-517)
# ---------------------------------------------------------------------------


def _find(st, name: str):
    """exact -> 'mimi.' -> 'model.' -> suffix (ptts_mimi.c:77-95)."""
    for cand in (name, "mimi." + name, "model." + name):
        t = st.find(cand)
        if t is not None:
            return t
    for cand in st.tensors:
        if cand.name.endswith(name):
            return cand
    return None


def _get(st, name: str, optional: bool = False) -> Optional[np.ndarray]:
    t = _find(st, name)
    if t is None:
        if optional:
            return None
        raise KeyError(f"Missing tensor: {name}")
    return st.get_f32(t)


def _stage_geometry(cfg: MimiConfig) -> List[dict]:
    """SEANet decoder stage shapes (ptts_mimi.c:406-478)."""
    mult = 2 ** len(cfg.ratios)
    stages = []
    for ratio in cfg.ratios:
        in_ch = mult * cfg.n_filters
        out_ch = in_ch // 2
        stages.append(
            {
                "in_ch": in_ch,
                "out_ch": out_ch,
                "k": ratio * 2,
                "stride": ratio,
                "res_hidden": out_ch // cfg.compress,
            }
        )
        mult //= 2
    return stages


def load_weights(st, cfg: MimiConfig = MimiConfig()) -> Weights:
    L = cfg.num_layers

    def stack(fmt: str):
        return np.stack([_get(st, fmt.format(i)) for i in range(L)])

    def stack_opt(fmt: str):
        vals = [_get(st, fmt.format(i), optional=True) for i in range(L)]
        return None if any(v is None for v in vals) else np.stack(vals)

    quant = _get(st, "quantizer.output_proj.weight")
    quant = quant.reshape(cfg.d_model, cfg.latent_dim)  # stored [512, 32, 1]

    up_w = _get(st, "upsample.convtr.weight", optional=True)
    if up_w is None:
        up_w = _get(st, "upsample.convtr.convtr.weight")
    # depthwise k=2s: matmul-form halves (see ops/conv.prepare_convtr_halves)
    up_w1, up_w2 = prepare_convtr_halves(up_w, groups=cfg.d_model)

    stages = []
    # decoder.model indices: 0 conv, then per stage (ELU, convtr, resblock):
    # 2/3, 5/6, 8/9, final ELU + conv at 11 (ptts_mimi.c:397-487).
    idx = 2
    for geo in _stage_geometry(cfg):
        up = _get(st, f"decoder.model.{idx}.convtr.weight")
        up_b = _get(st, f"decoder.model.{idx}.convtr.bias")
        r1 = _get(st, f"decoder.model.{idx + 1}.block.1.conv.weight")
        r1_b = _get(st, f"decoder.model.{idx + 1}.block.1.conv.bias")
        r2 = _get(st, f"decoder.model.{idx + 1}.block.3.conv.weight")
        r2_b = _get(st, f"decoder.model.{idx + 1}.block.3.conv.bias")
        s_w1, s_w2 = prepare_convtr_halves(up, groups=1)
        stages.append(
            {
                "up_w1": s_w1,
                "up_w2": s_w2,
                "up_bias": up_b,
                "res1_kernel": prepare_conv_kernel(r1),
                "res1_bias": r1_b,
                "res2_kernel": prepare_conv_kernel(r2),
                "res2_bias": r2_b,
                "stride": geo["stride"],
            }
        )
        idx += 3

    w: Weights = {
        "quant_w": quant,
        "upsample_w1": up_w1,
        "upsample_w2": up_w2,
        "dec_in_kernel": prepare_conv_kernel(_get(st, "decoder.model.0.conv.weight")),
        "dec_in_bias": _get(st, "decoder.model.0.conv.bias"),
        "stages": stages,
        "dec_out_kernel": prepare_conv_kernel(_get(st, f"decoder.model.{idx}.conv.weight")),
        "dec_out_bias": _get(st, f"decoder.model.{idx}.conv.bias"),
        "transformer": {
            "in_proj": stack("decoder_transformer.transformer.layers.{}.self_attn.in_proj.weight"),
            "out_proj": stack("decoder_transformer.transformer.layers.{}.self_attn.out_proj.weight"),
            "norm1_w": stack("decoder_transformer.transformer.layers.{}.norm1.weight"),
            "norm1_b": stack("decoder_transformer.transformer.layers.{}.norm1.bias"),
            "norm2_w": stack("decoder_transformer.transformer.layers.{}.norm2.weight"),
            "norm2_b": stack("decoder_transformer.transformer.layers.{}.norm2.bias"),
            "linear1": stack("decoder_transformer.transformer.layers.{}.linear1.weight"),
            "linear2": stack("decoder_transformer.transformer.layers.{}.linear2.weight"),
            "ls1": stack_opt("decoder_transformer.transformer.layers.{}.layer_scale_1.scale"),
            "ls2": stack_opt("decoder_transformer.transformer.layers.{}.layer_scale_2.scale"),
        },
    }
    return w


def random_weights(cfg: MimiConfig, seed: int = 0, scale: float = 0.05) -> Weights:
    """Random checkpoint in both torch layout (for the numpy oracle) and
    prepared-kernel layout (for the JAX path). Returns the prepared pytree;
    the torch-layout views live under key "_torch" for tests."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    d, L, h = cfg.d_model, cfg.num_layers, cfg.hidden
    up_w = r(d, 1, cfg.upsample_kernel)
    dec_in_w = r(2 ** len(cfg.ratios) * cfg.n_filters, d, cfg.kernel_size)
    dec_in_b = r(dec_in_w.shape[0])

    stages = []
    torch_stages = []
    for geo in _stage_geometry(cfg):
        upw = r(geo["in_ch"], geo["out_ch"], geo["k"])
        upb = r(geo["out_ch"])
        r1w = r(geo["res_hidden"], geo["out_ch"], cfg.residual_kernel)
        r1b = r(geo["res_hidden"])
        r2w = r(geo["out_ch"], geo["res_hidden"], 1)
        r2b = r(geo["out_ch"])
        s_w1, s_w2 = prepare_convtr_halves(upw, groups=1)
        stages.append(
            {
                "up_w1": s_w1,
                "up_w2": s_w2,
                "up_bias": upb,
                "res1_kernel": prepare_conv_kernel(r1w),
                "res1_bias": r1b,
                "res2_kernel": prepare_conv_kernel(r2w),
                "res2_bias": r2b,
                "stride": geo["stride"],
            }
        )
        torch_stages.append(
            {"up_w": upw, "up_b": upb, "res1_w": r1w, "res1_b": r1b,
             "res2_w": r2w, "res2_b": r2b, "stride": geo["stride"]}
        )

    dec_out_w = r(1, cfg.n_filters, cfg.last_kernel_size)
    dec_out_b = r(1)
    transformer = {
        "in_proj": r(L, 3 * d, d),
        "out_proj": r(L, d, d),
        "norm1_w": 1.0 + r(L, d),
        "norm1_b": r(L, d),
        "norm2_w": 1.0 + r(L, d),
        "norm2_b": r(L, d),
        "linear1": r(L, h, d),
        "linear2": r(L, d, h),
        "ls1": 0.5 + r(L, d),
        "ls2": 0.5 + r(L, d),
    }
    quant_w = r(d, cfg.latent_dim)

    up_w1, up_w2 = prepare_convtr_halves(up_w, groups=d)
    w: Weights = {
        "quant_w": quant_w,
        "upsample_w1": up_w1,
        "upsample_w2": up_w2,
        "dec_in_kernel": prepare_conv_kernel(dec_in_w),
        "dec_in_bias": dec_in_b,
        "stages": stages,
        "dec_out_kernel": prepare_conv_kernel(dec_out_w),
        "dec_out_bias": dec_out_b,
        "transformer": transformer,
        "_torch": {
            "quant_w": quant_w,
            "upsample_w": up_w,
            "dec_in_w": dec_in_w,
            "dec_in_b": dec_in_b,
            "stages": torch_stages,
            "dec_out_w": dec_out_w,
            "dec_out_b": dec_out_b,
            "transformer": transformer,
        },
    }
    return w


def to_device(w: Weights, dtype=jnp.float32,
              cfg: MimiConfig = MimiConfig()) -> Weights:
    """Device weights in the compute dtype, with the transformer's Q/K rows
    permuted to the RoPE-halves layout (ops/rope.permute_qk_rows_for_rope);
    the forward below uses rope_rotate_halves."""
    w = {k: v for k, v in w.items() if k != "_torch"}
    tr = dict(w["transformer"])
    assert tr["in_proj"].shape[-2] == 3 * cfg.num_heads * cfg.head_dim, (
        "to_device needs the matching MimiConfig for the RoPE permutation"
    )
    tr["in_proj"] = permute_qk_rows_for_rope(
        np.asarray(tr["in_proj"]), cfg.num_heads, cfg.head_dim
    )
    w["transformer"] = tr

    # one packed transfer (stage strides pass through as static Python
    # ints); see utils/packing.py + PERF.md round 4 for the per-leaf RPC
    # measurement this replaces
    from ..utils.packing import tree_to_device

    return tree_to_device(w, dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _linear(w, b, x):
    y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def transformer(w: Weights, x: jnp.ndarray, cfg: MimiConfig,
                positions: Optional[jnp.ndarray] = None,
                window_impl: str = "local") -> jnp.ndarray:
    """Windowed-causal depth transformer with LayerScale.

    x: [B, T, d_model]. Mirrors ptts_mimi.c:301-376. ``window_impl`` is a
    pre-resolved static choice (see resolve_window_impl) -- never an env read
    inside the trace.
    """
    B, T, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    # the fused QKV kernel bakes positions = arange(T) into its RoPE tables,
    # so it only serves the default-positions (offline decode) path
    use_fused = window_impl == "pallas" and positions is None
    if positions is None:
        positions = jnp.arange(T)[None, :]
    for l in range(cfg.num_layers):
        xn = layernorm(x, w["norm1_w"][l], w["norm1_b"][l], cfg.ln_eps)
        qkv = _linear(w["in_proj"][l], None, xn)
        block = max(LOCAL_ATTN_BLOCK, cfg.context - 1)
        if use_fused:
            # fused RoPE + windowed attention straight off the QKV projection
            # (ops/pallas/fused_attention.py) -- skips the q/k/v split, the
            # XLA-side rotation, and their layout copies (~35 ms/call at
            # B=256, T=800 on v5e). The key-block size adapts to T so grid
            # padding stays small (a fixed 256 pads T=800 by 28%): largest
            # block count with block >= context-1, rows rounded to sublanes.
            from ..ops.pallas.fused_attention import window_attention_qkv

            nb = max(1, T // max(cfg.context - 1, 1))
            fblock = max(-(-T // nb), cfg.context - 1)
            fblock = ((fblock + 7) // 8) * 8
            attn = window_attention_qkv(
                qkv, num_heads=H, head_dim=D, context=cfg.context,
                block=fblock, max_period=cfg.max_period,
            )
        else:
            q = qkv[..., :d].reshape(B, T, H, D)
            k = qkv[..., d : 2 * d].reshape(B, T, H, D)
            v = qkv[..., 2 * d :].reshape(B, T, H, D)
            q, k = rope_rotate_halves(q, k, positions, cfg.max_period)
            # block-local windowed attention avoids the [B, H, T, T] score
            # tensor for long sequences; exact-equal to the naive masked form
            if T > block:
                attn = windowed_attention_local(q, k, v, context=cfg.context,
                                                block=block).reshape(B, T, d)
            else:
                attn = causal_attention(q, k, v, context=cfg.context).reshape(B, T, d)
        add = _linear(w["out_proj"][l], None, attn)
        if w["ls1"] is not None:
            add = add * w["ls1"][l]
        x = x + add
        xn = layernorm(x, w["norm2_w"][l], w["norm2_b"][l], cfg.ln_eps)
        ff = gelu_tanh(_linear(w["linear1"][l], None, xn))
        add = _linear(w["linear2"][l], None, ff)
        if w["ls2"] is not None:
            add = add * w["ls2"][l]
        x = x + add
    return x


# NOTE on the deleted fused-SEANet Pallas experiment (rounds 2-3): the XLA
# conv stack measured 47.75 ms at B=256/50 frames on v5e, which is within
# ~5% of its minimal-dataflow HBM bound (~30 GB of once-written/once-read
# intermediates at the chip's measured ~650 GB/s effective rate;
# tools/bench_seanet_split.py + PERF.md). A VMEM-fused kernel must pay
# either the blocked-layout phase expansion or 128-lane padding of the
# 32/64-channel stage tensors -- both ~2x MXU inflation that cancels the
# traffic win before Mosaic's structural overheads (the round-2 kernel
# measured 75-90 ms). Final disposition: XLA path is speed-of-light for
# this dataflow; the kernel was removed.


def conv_stack(w: Weights, x: jnp.ndarray, cfg: MimiConfig) -> jnp.ndarray:
    """SEANet decoder stack: [B, T, 512] -> [B, T * prod(ratios), 1].

    Mirrors ptts_mimi.c:676-737 / the fused CUDA path ptts_cuda.c:1112-1548.
    """
    x = conv1d_causal(x, w["dec_in_kernel"], w["dec_in_bias"])
    for st, ratio in zip(w["stages"], cfg.ratios):
        x = elu(x)
        # stride comes from the static config (cfg.ratios), never the pytree.
        x = convtr1d_2s(x, st["up_w1"], st["up_w2"], st["up_bias"], stride=ratio)
        h = elu(x)
        h = conv1d_causal(h, st["res1_kernel"], st["res1_bias"])
        h = elu(h)
        h = conv1d_causal(h, st["res2_kernel"], st["res2_bias"])
        x = x + h
    x = elu(x)
    return conv1d_causal(x, w["dec_out_kernel"], w["dec_out_bias"])


@functools.partial(jax.jit, static_argnames=("cfg", "window_impl"))
def _decode_jit(w: Weights, latents: jnp.ndarray, cfg: MimiConfig,
                window_impl: str) -> jnp.ndarray:
    # quantizer output proj (1x1 conv, no bias)
    x = _linear(w["quant_w"], None, latents)  # [B, F, 512]
    # depthwise transposed upsample 12.5 Hz -> 200 Hz (k=2s matmul form)
    x = convtr1d_2s(x, w["upsample_w1"], w["upsample_w2"], None,
                    stride=cfg.upsample_stride, depthwise=True)
    x = transformer(w["transformer"], x, cfg, window_impl=window_impl)
    return conv_stack(w, x, cfg)[..., 0]


def decode(w: Weights, latents: jnp.ndarray, cfg: MimiConfig,
           window_impl: Optional[str] = None) -> jnp.ndarray:
    """Latents [B, F, latent_dim] -> PCM [B, F * frame_samples].

    Full pipeline of ptts_mimi_decode (ptts_mimi.c:570-738). The windowed-
    attention implementation is resolved here, outside the trace
    (None -> resolve_window_impl()); each choice gets its own compiled
    executable, so flipping the flag between calls actually takes effect."""
    if window_impl is None:
        window_impl = resolve_window_impl()
    return _decode_jit(w, latents, cfg, window_impl)


decode.clear_cache = _decode_jit.clear_cache  # tests poke the jit cache
