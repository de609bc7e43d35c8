"""FlowLM: the text -> acoustic-latent autoregressive flow-matching model.

TPU-native redesign of /root/reference/ptts_flowlm.c. Key departures from the
reference (which is single-stream, host-looped, one GEMV per op):

  * Everything is batch-first: hidden states [B, d], KV cache [L, B, T, H, D],
    per-stream positions/EOS state as int32/bool vectors. One chip serves
    hundreds of streams; multi-chip shards the B axis (parallel/mesh.py).
  * The whole generation loop (prefill + per-frame decode + flow-matching
    Euler sampler + EOS bookkeeping) is a single jitted function built from
    lax.scan -- zero host<->device round trips per frame, unlike the
    reference's per-op H2D/D2H (ptts_cuda.c:646-774).
  * Prefill runs all prompt positions at once with causal attention instead of
    the reference's one-position-at-a-time loop (ptts_flowlm.c:1159-1185).
  * Timestep embeddings depend only on the static LSD step grid, so they are
    hoisted out of the per-frame loop entirely (the reference recomputes them
    per frame per step, ptts_flowlm.c:711-712).

Numerics (norm variants, erf-GELU, RoPE convention, adaLN combine) match the
reference exactly; see ops/*.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowLMConfig, KernelFlags
from ..ops.activations import gelu_erf, silu
from ..ops.attention import causal_attention
from ..ops.norms import kyutai_rmsnorm, layernorm
from ..ops.rope import permute_qk_rows_for_rope, rope_rotate_halves

DEFAULT_FLAGS = KernelFlags()


def _decode_attention_dispatch(q, k_cache, v_cache, mask, scalars,
                               flags: KernelFlags):
    """Decode-attention implementation choice, with optional validate mode
    that runs both and prints the maxdiff (the reference's
    PTTS_CUDA_VALIDATE pattern, ptts_flowlm.c:527-552). ``scalars`` =
    (prefix_len [B], start [B], cursor) for the blocked path's cursor-bounded
    reads; the blocked path assumes a NON-WRAPPING cache (true for every
    offline path, which sizes the cache prefix + max_frames -- the
    continuous batcher's ring cache wraps and uses the masked einsum). 'auto' == 'einsum': inside the jitted AR while_loop the masked einsum
    measured 2130 us/frame at B=256/Tmax=128 vs 5491 for the blocked
    online-softmax path (the dynamic-trip-count fori_loop's unpipelined
    dynamic_slice DMAs cost more than the dead-column reads they skip), and
    a round-1 Pallas flash-decode kernel measured 9x slower still at
    Tmax=512 and was removed (round 2, VERDICT #4). 'blocked' stays opt-in
    for long-cache experiments."""
    from ..ops.attention import (decode_attention_blocked,
                                 decode_attention_masked)

    impl = flags.decode_impl
    if impl == "auto":
        impl = "einsum"
    if flags.validate and impl == "blocked":
        a = decode_attention_masked(q, k_cache, v_cache, mask)
        b = decode_attention_blocked(q, k_cache, v_cache, *scalars)
        jax.debug.print(
            "[ptts] validate decode_attention maxdiff={d}",
            d=jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))),
        )
        return a
    if impl == "blocked":
        return decode_attention_blocked(q, k_cache, v_cache, *scalars)
    return decode_attention_masked(q, k_cache, v_cache, mask)

Weights = Dict[str, Any]

_LAYER_KEYS = ("in_proj", "out_proj", "norm1_w", "norm1_b",
               "norm2_w", "norm2_b", "linear1", "linear2")


def _layer_weights(w: Weights) -> Dict[str, jnp.ndarray]:
    """The per-layer weight pytree, every leaf stacked [L, ...]."""
    return {k: w[k] for k in _LAYER_KEYS}


def _resolve_layer_impl(flags: KernelFlags) -> str:
    """'auto' == 'scan': the layer loops compile as one lax.scan body
    instead of L inlined copies. Identical math and op order per layer;
    the 'unroll' path is kept as the cross-check
    (tests/test_layer_scan.py)."""
    return "scan" if flags.layer_impl == "auto" else flags.layer_impl


# ---------------------------------------------------------------------------
# Weight loading
# ---------------------------------------------------------------------------


def _find(st, name: str):
    """exact -> 'flow_lm.' prefix -> suffix fallback (ptts_flowlm.c:107-122)."""
    t = st.find(name)
    if t is not None:
        return t
    t = st.find("flow_lm." + name)
    if t is not None:
        return t
    for cand in st.tensors:
        if cand.name.endswith(name):
            return cand
    return None


def _get(st, name: str, optional: bool = False,
         dtype=np.float32) -> Optional[np.ndarray]:
    t = _find(st, name)
    if t is None:
        if optional:
            return None
        raise KeyError(f"Missing tensor: {name}")
    if dtype == np.float32:
        return st.get_f32(t)
    return st.get_bf16(t)


def load_weights(st, cfg: FlowLMConfig = FlowLMConfig(),
                 dtype=np.float32) -> Weights:
    """Load the FlowLM weight pytree from a SafetensorsFile.

    Tensor names and shapes follow ptts_flowlm_load
    (/root/reference/ptts_flowlm.c:866-957).

    ``dtype=ml_dtypes.bfloat16`` is the bf16-serving cold-start path:
    BF16-stored tensors come out as ZERO-COPY views of the checkpoint mmap
    (no host f32 round trip, half the upload bytes), other storage dtypes
    round-to-nearest-even -- bit-identical to converting the f32 load
    (safetensors.get_bf16).
    """
    L = cfg.num_layers

    def stack(fmt: str) -> np.ndarray:
        return np.stack([_get(st, fmt.format(i), dtype=dtype)
                         for i in range(L)])

    def get(name: str, optional: bool = False):
        return _get(st, name, optional=optional, dtype=dtype)

    w: Weights = {
        "embed": get("conditioner.embed.weight"),
        "speaker_proj": get("speaker_proj_weight", optional=True),
        "emb_std": get("emb_std"),
        "emb_mean": get("emb_mean"),
        "bos_emb": get("bos_emb"),
        "input_linear": get("input_linear.weight"),
        "out_norm_w": get("out_norm.weight"),
        "out_norm_b": get("out_norm.bias"),
        "out_eos_w": get("out_eos.weight").reshape(-1),
        "out_eos_b": get("out_eos.bias").reshape(()),
        "in_proj": stack("transformer.layers.{}.self_attn.in_proj.weight"),
        "out_proj": stack("transformer.layers.{}.self_attn.out_proj.weight"),
        "norm1_w": stack("transformer.layers.{}.norm1.weight"),
        "norm1_b": stack("transformer.layers.{}.norm1.bias"),
        "norm2_w": stack("transformer.layers.{}.norm2.weight"),
        "norm2_b": stack("transformer.layers.{}.norm2.bias"),
        "linear1": stack("transformer.layers.{}.linear1.weight"),
        "linear2": stack("transformer.layers.{}.linear2.weight"),
    }

    def tstack(fmt: str, n: int, optional: bool = False):
        vals = [_get(st, fmt.format(i), optional=optional, dtype=dtype) for i in range(n)]
        if any(v is None for v in vals):
            return None
        return np.stack(vals)

    D = cfg.flow_depth
    w["flow"] = {
        "cond_w": get("flow_net.cond_embed.weight"),
        "cond_b": get("flow_net.cond_embed.bias"),
        "input_w": get("flow_net.input_proj.weight"),
        "input_b": get("flow_net.input_proj.bias"),
        "time": {
            "lin0_w": tstack("flow_net.time_embed.{}.mlp.0.weight", 2),
            "lin0_b": tstack("flow_net.time_embed.{}.mlp.0.bias", 2),
            "lin2_w": tstack("flow_net.time_embed.{}.mlp.2.weight", 2),
            "lin2_b": tstack("flow_net.time_embed.{}.mlp.2.bias", 2),
            "rms_alpha": tstack("flow_net.time_embed.{}.mlp.3.alpha", 2),
            "freqs": tstack("flow_net.time_embed.{}.freqs", 2, optional=True),
        },
        "res": {
            "in_ln_w": tstack("flow_net.res_blocks.{}.in_ln.weight", D),
            "in_ln_b": tstack("flow_net.res_blocks.{}.in_ln.bias", D),
            "mlp0_w": tstack("flow_net.res_blocks.{}.mlp.0.weight", D),
            "mlp0_b": tstack("flow_net.res_blocks.{}.mlp.0.bias", D),
            "mlp2_w": tstack("flow_net.res_blocks.{}.mlp.2.weight", D),
            "mlp2_b": tstack("flow_net.res_blocks.{}.mlp.2.bias", D),
            "ada_w": tstack("flow_net.res_blocks.{}.adaLN_modulation.1.weight", D),
            "ada_b": tstack("flow_net.res_blocks.{}.adaLN_modulation.1.bias", D),
        },
        "final_linear_w": get("flow_net.final_layer.linear.weight"),
        "final_linear_b": get("flow_net.final_layer.linear.bias"),
        "final_ada_w": get("flow_net.final_layer.adaLN_modulation.1.weight"),
        "final_ada_b": get("flow_net.final_layer.adaLN_modulation.1.bias"),
    }
    return w


def random_weights(cfg: FlowLMConfig, seed: int = 0, scale: float = 0.02) -> Weights:
    """Random checkpoint with the production pytree layout (tests, bench)."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    L, d, h, fd, dep = cfg.num_layers, cfg.d_model, cfg.hidden, cfg.flow_dim, cfg.flow_depth
    lat, tf = cfg.latent_dim, cfg.time_freqs
    i = np.arange(tf, dtype=np.float32)
    freqs = np.exp(-np.log(np.float32(cfg.max_period)) * (i / np.float32(tf))).astype(np.float32)
    return {
        "embed": r(cfg.vocab + 1, cfg.text_dim),
        "speaker_proj": r(cfg.text_dim, 512),
        "emb_std": np.abs(r(lat)) + 1.0,
        "emb_mean": r(lat),
        "bos_emb": r(lat),
        "input_linear": r(d, lat),
        "out_norm_w": 1.0 + r(d),
        "out_norm_b": r(d),
        "out_eos_w": r(d),
        "out_eos_b": np.float32(rng.standard_normal() * scale),
        "in_proj": r(L, 3 * d, d),
        "out_proj": r(L, d, d),
        "norm1_w": 1.0 + r(L, d),
        "norm1_b": r(L, d),
        "norm2_w": 1.0 + r(L, d),
        "norm2_b": r(L, d),
        "linear1": r(L, h, d),
        "linear2": r(L, d, h),
        "flow": {
            "cond_w": r(fd, d),
            "cond_b": r(fd),
            "input_w": r(fd, lat),
            "input_b": r(fd),
            "time": {
                "lin0_w": r(2, fd, 2 * tf),
                "lin0_b": r(2, fd),
                "lin2_w": r(2, fd, fd),
                "lin2_b": r(2, fd),
                "rms_alpha": 1.0 + r(2, fd),
                "freqs": np.stack([freqs, freqs * 0.5]),
            },
            "res": {
                "in_ln_w": 1.0 + r(dep, fd),
                "in_ln_b": r(dep, fd),
                "mlp0_w": r(dep, fd, fd),
                "mlp0_b": r(dep, fd),
                "mlp2_w": r(dep, fd, fd),
                "mlp2_b": r(dep, fd),
                "ada_w": r(dep, 3 * fd, fd),
                "ada_b": r(dep, 3 * fd),
            },
            "final_linear_w": r(lat, fd),
            "final_linear_b": r(lat),
            "final_ada_w": r(2 * fd, fd),
            "final_ada_b": r(2 * fd),
        },
    }


def to_device(w: Weights, dtype=jnp.float32,
              cfg: FlowLMConfig = FlowLMConfig()) -> Weights:
    """Move the weight pytree to device arrays in the compute dtype.

    Also permutes the Q/K rows of in_proj to the RoPE-halves layout (see
    ops/rope.permute_qk_rows_for_rope) -- numerically identical attention,
    contiguous-lane rotations. The model code below uses rope_rotate_halves,
    so device weights MUST come through here.
    """
    assert w["in_proj"].shape[-2] == 3 * cfg.d_model, (
        "to_device needs the matching FlowLMConfig for the RoPE permutation"
    )
    w = dict(w)
    w["in_proj"] = permute_qk_rows_for_rope(
        np.asarray(w["in_proj"]), cfg.num_heads, cfg.head_dim
    )
    # one packed transfer instead of ~60 per-leaf uploads: the per-leaf RPCs
    # measured ~0.4 MB/s effective through a remote tunnel vs 67 MB/s for a
    # single buffer (utils/packing.py, PERF.md round 4)
    from ..utils.packing import tree_to_device

    return tree_to_device(w, dtype)


# ---------------------------------------------------------------------------
# Model math
# ---------------------------------------------------------------------------


def _linear(w: jnp.ndarray, b, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


class KVCache(NamedTuple):
    """Batched per-layer KV cache: the device-resident analogue of the
    reference's ptts_flowlm_kv_cache / CUDA ensure_kv_cache
    (ptts_flowlm.c:390-438, ptts_cuda.c:582-605).

    Layout is cursor-aligned: every stream's step-i key lands in the SAME
    column (``cursor``), so the per-step write is one dynamic_update_slice
    (in-place under donation) instead of a per-stream scatter -- measured
    1.8x faster at Tmax=128 and 24x at Tmax=512 on v5e. Per-stream validity
    needs only two scalars:

        valid(t) = t < prefix_len[b]            (the prompt columns)
                 | start[b] <= t < cursor       (the decode columns)

    ``start`` is the cursor value when the stream was (re)admitted; the gap
    [prefix_len, start) is masked, which is exactly what continuous batching
    needs when a freed slot is reused mid-flight (runtime/batching.py).
    The next token's RoPE position is prefix_len + (cursor - start).

    Decode columns are a RING: ``cursor`` counts decode writes monotonically
    (it never resets) and write ``cursor`` lands at column
    ``t0 + (cursor - t0) % R`` with ``R = Tmax - t0`` (``t0`` = first decode
    column, i.e. the prefix-region width). The validity mask recovers each
    column's absolute index from the shared cursor -- exact because ALL
    streams advance in lockstep, one column per frame. While
    ``cursor - t0 <= R`` (every offline path: the cache is sized
    prefix + max_frames) this is bit-identical to a linear cache; under
    continuous batching the cursor wraps and a stream admitted at
    ``start = cursor`` reuses columns whose owner stream is necessarily
    finished (a live span can't exceed R: per-request frames <= the pool's
    noise budget <= R). This caps decode-attention cache traffic at R
    columns per frame FOREVER and removes the old compaction pass entirely.
    """

    k: jnp.ndarray           # [L, B, Tmax, H, D]
    v: jnp.ndarray           # [L, B, Tmax, H, D]
    prefix_len: jnp.ndarray  # [B] int32
    start: jnp.ndarray       # [B] int32
    cursor: jnp.ndarray      # scalar int32 -- next decode write (monotonic)
    t0: jnp.ndarray          # scalar int32 -- first decode column

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def pos(self) -> jnp.ndarray:
        """[B] per-stream token position of the next write."""
        return self.prefix_len + (self.cursor - self.start)

    @property
    def write_col(self) -> jnp.ndarray:
        """Scalar ring column of the next decode write."""
        R = jnp.maximum(self.max_len - self.t0, 1)
        return self.t0 + jnp.mod(self.cursor - self.t0, R)

    def valid_mask(self, through_cursor: bool = True) -> jnp.ndarray:
        """[B, Tmax] bool key-validity mask (incl. the write at ``cursor``
        when ``through_cursor``). Ring column j holds the LATEST decode
        write m < (hi - t0) with m % R == j; with no wrap this reduces to
        m == j and the linear mask (t >= start) & (t < hi)."""
        t = jnp.arange(self.max_len)[None, :]                  # [1, Tmax]
        hi = self.cursor + 1 if through_cursor else self.cursor
        R = jnp.maximum(self.max_len - self.t0, 1)
        M = hi - self.t0                                       # decode writes
        j = t - self.t0
        m_star = M - 1 - jnp.mod(M - 1 - j, R)                 # latest write
        abs_idx = self.t0 + m_star                             # abs decode pos
        dec_valid = (
            (j >= 0) & (j < jnp.minimum(M, R))
            & (abs_idx >= self.start[:, None]) & (abs_idx < hi)
        )
        return (t < self.prefix_len[:, None]) | dec_valid


def make_cache(cfg: FlowLMConfig, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        prefix_len=jnp.zeros(batch, dtype=jnp.int32),
        start=jnp.zeros(batch, dtype=jnp.int32),
        cursor=jnp.zeros((), dtype=jnp.int32),
        t0=jnp.zeros((), dtype=jnp.int32),
    )


def _split_qkv(qkv: jnp.ndarray, H: int, D: int):
    """[..., 3d] -> (q, k, v) each [..., H, D]."""
    d = H * D
    q = qkv[..., :d]
    k = qkv[..., d : 2 * d]
    v = qkv[..., 2 * d :]
    newshape = qkv.shape[:-1] + (H, D)
    return q.reshape(newshape), k.reshape(newshape), v.reshape(newshape)


def resolve_prefill_impl(choice: str = "auto") -> str:
    """Resolve the prefill-attention implementation: 'pallas' (fused
    RoPE+attention QKV kernel, ops/pallas/fused_attention.py; measured 2.5x
    the XLA prefill at B=256, T0=64 bf16 on v5e) or 'xla'. 'auto' consults
    PTTS_PALLAS_PREFILL then the backend (Pallas on TPU). Call OUTSIDE traced
    code; the result is a static argument."""
    import os

    if choice in ("pallas", "xla"):
        return choice
    v = os.environ.get("PTTS_PALLAS_PREFILL", "auto")
    if v == "0":
        return "xla"
    if v == "1":
        return "pallas"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def prefill_kv(
    w: Weights,
    x: jnp.ndarray,        # [B, T, d_model] prompt embeddings (padded)
    lengths: jnp.ndarray,  # [B] int32 valid positions
    cfg: FlowLMConfig,
    attn_impl: str = "xla",
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched causal prompt pass. Returns (k [L,B,T,H,D], v, last [B,d]).

    The layer loop is a lax.scan over the stacked [L, ...] weight pytree
    (one compiled layer body; flags.layer_impl='unroll' restores the
    inlined Python loop for cross-checks)."""
    B, T, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    positions = jnp.arange(T)

    def layer(x, wl):
        xn = layernorm(x, wl["norm1_w"], wl["norm1_b"], cfg.ln_eps)
        qkv = _linear(wl["in_proj"], None, xn)
        if attn_impl == "pallas":
            # fused RoPE + causal attention off the raw QKV projection
            # (ops/pallas/fused_attention.py); rotated K comes back as a
            # free second output for the cache
            from ..ops.pallas.fused_attention import causal_attention_qkv

            attn2, k_rot = causal_attention_qkv(
                qkv, lengths, num_heads=H, head_dim=D,
                max_period=cfg.max_period,
            )
            k = k_rot.reshape(B, T, H, D)
            v = qkv[..., 2 * d :].reshape(B, T, H, D)
            attn = attn2.reshape(B, T, H, D)
        else:
            q, k, v = _split_qkv(qkv, H, D)
            q, k = rope_rotate_halves(q, k, positions[None, :], cfg.max_period)
            attn = causal_attention(q, k, v, lengths=lengths)
        x = x + _linear(wl["out_proj"], None, attn.reshape(B, T, d))
        xn = layernorm(x, wl["norm2_w"], wl["norm2_b"], cfg.ln_eps)
        ff = gelu_erf(_linear(wl["linear1"], None, xn))
        x = x + _linear(wl["linear2"], None, ff)
        return x, (k, v)

    lw = _layer_weights(w)
    if _resolve_layer_impl(flags) == "unroll":
        k_layers, v_layers = [], []
        for l in range(cfg.num_layers):
            x, (k, v) = layer(x, jax.tree.map(lambda a: a[l], lw))
            k_layers.append(k)
            v_layers.append(v)
        k_new = jnp.stack(k_layers)  # [L, B, T, H, D]
        v_new = jnp.stack(v_layers)
    else:
        x, (k_new, v_new) = jax.lax.scan(layer, x, lw)
    last = jnp.take_along_axis(x, (lengths - 1)[:, None, None], axis=1)[:, 0, :]
    return k_new, v_new, last


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_len", "attn_impl", "flags")
)
def prefill_init(
    w: Weights,
    x: jnp.ndarray,        # [B, T, d_model] prompt embeddings (padded)
    lengths: jnp.ndarray,  # [B] int32 valid positions
    cfg: FlowLMConfig,
    max_len: int,
    attn_impl: str = "xla",
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[KVCache, jnp.ndarray]:
    """Batched causal prompt pass that BUILDS the cache in one pass.

    Equivalent to make_cache + prefill but the cache columns [T, max_len) are
    written by a single pad fused with the prompt K/V produce -- no eager
    zeros allocation and no donated full-cache dynamic_update_slice (measured
    ~12 ms/call at B=256, Tmax=128 on v5e; see PERF.md prefill notes).
    """
    B, T, d = x.shape
    k_new, v_new, last = prefill_kv(w, x, lengths, cfg, attn_impl, flags)
    pad = [(0, 0), (0, 0), (0, max_len - T), (0, 0), (0, 0)]
    cache = KVCache(
        k=jnp.pad(k_new, pad),
        v=jnp.pad(v_new, pad),
        prefix_len=lengths.astype(jnp.int32),
        start=jnp.full((B,), T, jnp.int32),
        cursor=jnp.asarray(T, jnp.int32),
        t0=jnp.asarray(T, jnp.int32),
    )
    return cache, last


@functools.partial(jax.jit, static_argnames=("cfg", "flags"),
                   donate_argnames=("cache",))
def prefill(
    w: Weights,
    cache: KVCache,
    x: jnp.ndarray,        # [B, T, d_model] prompt embeddings (padded)
    lengths: jnp.ndarray,  # [B] int32 valid positions
    cfg: FlowLMConfig,
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[KVCache, jnp.ndarray]:
    """Process the whole prompt in one causal pass, fill the cache, and return
    the transformer output at each stream's last valid position [B, d_model].

    Replaces the reference's sequential one-position prefill
    (ptts_flowlm.c:1159-1185) with a single batched pass -- identical math,
    MXU-shaped work.
    """
    B, T, d = x.shape
    k_new, v_new, last = prefill_kv(w, x, lengths, cfg, flags=flags)
    k_cache = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype), (0, 0, 0, 0, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype), (0, 0, 0, 0, 0)
    )
    new_cache = KVCache(
        k=k_cache,
        v=v_cache,
        prefix_len=lengths.astype(jnp.int32),
        start=jnp.full((B,), T, jnp.int32),
        cursor=jnp.asarray(T, jnp.int32),
        t0=jnp.asarray(T, jnp.int32),
    )
    return new_cache, last


def decode_step(
    w: Weights,
    cache: KVCache,
    x: jnp.ndarray,  # [B, d_model]
    cfg: FlowLMConfig,
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[KVCache, jnp.ndarray]:
    """One KV-cached transformer step for B streams at their own positions.

    Mirrors transformer_forward_step_cached (ptts_flowlm.c:440-566) but
    batched, and the per-step KV write is a single dynamic_update_slice at
    the shared cursor column (see KVCache docstring).
    """
    B, d = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    pos = cache.pos          # [B] per-stream RoPE position
    cursor = cache.write_col  # scalar ring write column (== cache.cursor
    #                           until the decode region wraps; see KVCache)
    mask = cache.valid_mask(through_cursor=True)  # [B, Tmax]

    def layer(x, k_cache, v_cache, l, wl, select):
        """One KV-cached layer. ``select(cache)`` reads layer l's cache slice
        (post-write); l may be a traced index in the scan path."""
        xn = layernorm(x, wl["norm1_w"], wl["norm1_b"], cfg.ln_eps)
        qkv = _linear(wl["in_proj"], None, xn)
        q, k, v = _split_qkv(qkv, H, D)  # [B, H, D]
        q, k = rope_rotate_halves(q[:, None], k[:, None], pos[:, None], cfg.max_period)
        q, k = q[:, 0], k[:, 0]

        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype)[None, :, None], (l, 0, cursor, 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype)[None, :, None], (l, 0, cursor, 0, 0)
        )

        attn = _decode_attention_dispatch(
            q, select(k_cache), select(v_cache), mask,
            (cache.prefix_len, cache.start, cursor), flags,
        )
        x = x + _linear(wl["out_proj"], None, attn.reshape(B, d))
        xn = layernorm(x, wl["norm2_w"], wl["norm2_b"], cfg.ln_eps)
        ff = gelu_erf(_linear(wl["linear1"], None, xn))
        x = x + _linear(wl["linear2"], None, ff)
        return x, k_cache, v_cache

    lw = _layer_weights(w)
    if _resolve_layer_impl(flags) == "unroll":
        k_cache, v_cache = cache.k, cache.v
        for l in range(cfg.num_layers):
            x, k_cache, v_cache = layer(
                x, k_cache, v_cache, l,
                jax.tree.map(lambda a: a[l], lw),
                lambda c, l=l: c[l],
            )
    else:
        def body(carry, inputs):
            x, k_cache, v_cache = carry
            l, wl = inputs
            sel = lambda c: jax.lax.dynamic_index_in_dim(c, l, 0, keepdims=False)
            return layer(x, k_cache, v_cache, l, wl, sel), None

        (x, k_cache, v_cache), _ = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (jnp.arange(cfg.num_layers), lw),
        )

    new_cache = cache._replace(k=k_cache, v=v_cache, cursor=cache.cursor + 1)
    return new_cache, x


# ---------------------------------------------------------------------------
# Flow net + LSD sampler
# ---------------------------------------------------------------------------


def timestep_embed(w: Weights, idx: int, t: jnp.ndarray, cfg: FlowLMConfig) -> jnp.ndarray:
    """Sinusoidal timestep embedding + MLP + kyutai RMSNorm
    (ptts_flowlm.c:572-586). t may be a scalar or [S] vector."""
    tw = w["flow"]["time"]
    if tw["freqs"] is not None:
        freqs = tw["freqs"][idx]
    else:
        i = jnp.arange(cfg.time_freqs, dtype=jnp.float32)
        freqs = jnp.exp(-jnp.log(cfg.max_period) * (i / cfg.time_freqs))
    t = jnp.asarray(t, dtype=jnp.float32)
    angle = t[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(angle), jnp.sin(angle)], axis=-1)
    h = silu(_linear(tw["lin0_w"][idx], tw["lin0_b"][idx], emb))
    out = _linear(tw["lin2_w"][idx], tw["lin2_b"][idx], h)
    return kyutai_rmsnorm(out, tw["rms_alpha"][idx], cfg.rms_eps)


def lsd_time_embeds(w: Weights, num_steps: int, cfg: FlowLMConfig) -> jnp.ndarray:
    """Hoisted (ts + tt)/2 per Euler step: [num_steps, flow_dim].

    The step grid s=i/n, t=(i+1)/n is static, so these never change across
    frames or streams -- the reference recomputes them every call
    (ptts_flowlm.c:711-712)."""
    i = jnp.arange(num_steps, dtype=jnp.float32)
    s = i / num_steps
    t = (i + 1) / num_steps
    ts = timestep_embed(w, 0, s, cfg)  # [S, fd]
    tt = timestep_embed(w, 1, t, cfg)
    return (ts + tt) * 0.5


def flow_net(
    w: Weights,
    cond_emb: jnp.ndarray,   # [B, flow_dim] precomputed cond_embed(cond)
    time_emb: jnp.ndarray,   # [flow_dim] hoisted (ts+tt)/2 for this step
    x_in: jnp.ndarray,       # [B, latent_dim]
    cfg: FlowLMConfig,
    flags: KernelFlags = DEFAULT_FLAGS,
) -> jnp.ndarray:
    """adaLN-modulated residual MLP stack (ptts_flowlm.c:655-762).

    The resblock loop scans over the stacked [depth, ...] weights (same
    HLO-size rationale as prefill_kv/decode_step)."""
    fw = w["flow"]
    fd = cfg.flow_dim
    x = _linear(fw["input_w"], fw["input_b"], x_in)
    # time embeds are computed in f32 (parity); drop to the compute dtype here
    tmp2 = time_emb.astype(cond_emb.dtype) + cond_emb  # [B, fd]
    mod = silu(tmp2)

    def block(x, rl):
        h = layernorm(x, rl["in_ln_w"], rl["in_ln_b"], cfg.flow_ln_eps)
        ada = _linear(rl["ada_w"], rl["ada_b"], mod)
        shift, scale, gate = ada[..., :fd], ada[..., fd : 2 * fd], ada[..., 2 * fd :]
        h = h * (1.0 + scale) + shift
        h = _linear(rl["mlp2_w"], rl["mlp2_b"],
                    silu(_linear(rl["mlp0_w"], rl["mlp0_b"], h)))
        return x + gate * h

    res = fw["res"]
    if _resolve_layer_impl(flags) == "unroll":
        for b in range(cfg.flow_depth):
            x = block(x, jax.tree.map(lambda a: a[b], res))
    else:
        x, _ = jax.lax.scan(lambda c, rl: (block(c, rl), None), x, res)

    h = layernorm(x, None, None, cfg.flow_ln_eps)
    ada2 = _linear(fw["final_ada_w"], fw["final_ada_b"], mod)
    h = h * (1.0 + ada2[..., fd:]) + ada2[..., :fd]
    return _linear(fw["final_linear_w"], fw["final_linear_b"], h)


def lsd_decode(
    w: Weights,
    cond: jnp.ndarray,        # [B, d_model] out_norm'd hidden
    time_embs: jnp.ndarray,   # [num_steps, flow_dim] from lsd_time_embeds
    x: jnp.ndarray,           # [B, latent_dim] initial noise
    cfg: FlowLMConfig,
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Euler sampler (ptts_flowlm.c:764-779). Returns (latent, first_flow)."""
    fw = w["flow"]
    cond_emb = _linear(fw["cond_w"], fw["cond_b"], cond)
    num_steps = time_embs.shape[0]

    def step(carry, inputs):
        xc, first = carry
        step_i, te = inputs
        flow = flow_net(w, cond_emb, te, xc, cfg, flags)
        first = jnp.where(step_i == 0, flow, first)
        return (xc + flow / num_steps, first), None

    (x_final, first_flow), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x)), (jnp.arange(num_steps), time_embs)
    )
    return x_final, first_flow


def lsd_decode_ragged(
    w: Weights,
    cond: jnp.ndarray,        # [B, d_model] out_norm'd hidden
    time_embs: jnp.ndarray,   # [B, S_max, flow_dim] per-stream tables
    num_steps: jnp.ndarray,   # [B] int32 per-stream Euler step counts
    x: jnp.ndarray,           # [B, latent_dim] initial noise
    cfg: FlowLMConfig,
    flags: KernelFlags = DEFAULT_FLAGS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Euler sampler with PER-STREAM step counts (heterogeneous
    Params.num_steps in the continuous batcher -- the reference honors params
    per call, ptts.h:27-40). Stream b integrates its own n_b-step grid
    (rows >= n_b of its time-embed table are ignored); every stream pays
    S_max flow_net evaluations, extra steps are masked no-ops.

    Matches lsd_decode for a stream whose table row equals
    lsd_time_embeds(n_b) padded to S_max: same flow evaluations in the same
    order; equality is to 1 ulp (bitwise for power-of-two n_b -- XLA folds
    the /n_b by-constant differently than by-array for other n). Pinned by
    tests/test_flowlm.py::test_lsd_decode_ragged_matches_lsd_decode."""
    fw = w["flow"]
    cond_emb = _linear(fw["cond_w"], fw["cond_b"], cond)
    S = time_embs.shape[1]
    n_b = jnp.maximum(num_steps, 1).astype(jnp.float32)[:, None]  # [B, 1]

    def step(carry, inputs):
        xc, first = carry
        step_i, te = inputs          # te: [B, flow_dim]
        flow = flow_net(w, cond_emb, te, xc, cfg, flags)
        first = jnp.where(step_i == 0, flow, first)
        active = (step_i < num_steps)[:, None]
        xc = xc + jnp.where(active, flow / n_b.astype(flow.dtype), 0.0)
        return (xc, first), None

    (x_final, first_flow), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x)),
        (jnp.arange(S), jnp.transpose(time_embs, (1, 0, 2)))
    )
    return x_final, first_flow


# ---------------------------------------------------------------------------
# Generation (fully on-device)
# ---------------------------------------------------------------------------


class GenResult(NamedTuple):
    latents: jnp.ndarray       # [B, F, latent_dim]
    frames_used: jnp.ndarray   # [B] int32 (cumulative across resumed chunks)
    eos_logits: jnp.ndarray    # [B, F]
    first_cond: jnp.ndarray    # [B, d_model] parity tap (--cond-out)
    first_flow: jnp.ndarray    # [B, latent_dim] parity tap (--flow-out)
    # resumable state (chunked generation with host-side early exit):
    cache: "KVCache" = None
    x: jnp.ndarray = None            # [B, d_model] transformer output
    eos_step: jnp.ndarray = None     # [B]
    done: jnp.ndarray = None         # [B]


def eos_logit(w: Weights, normed: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...d,d->...", normed, w["out_eos_w"]) + w["out_eos_b"]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_frames", "num_steps", "eos_enabled", "flags"),
    donate_argnames=("cache",),
)
def generate_latents(
    w: Weights,
    cache: KVCache,            # prefilled (see prefill)
    x0: jnp.ndarray,           # [B, d_model] transformer output at BOS
    noise: jnp.ndarray,        # [B, max_frames, latent_dim]
    cfg: FlowLMConfig,
    max_frames: int,
    num_steps: int,
    eos_enabled: bool = True,
    eos_threshold: float = -4.0,
    eos_min_frames: int = 1,
    eos_after: jnp.ndarray | int = 0,
    flags: KernelFlags = DEFAULT_FLAGS,
    frame0: jnp.ndarray | int = 0,
    eos_step0: Optional[jnp.ndarray] = None,
    done0: Optional[jnp.ndarray] = None,
    used0: Optional[jnp.ndarray] = None,
) -> GenResult:
    """Per-frame loop as one lax.scan: out_norm -> EOS -> LSD -> input_linear
    -> KV decode step. Mirrors ptts_flowlm_generate_latents
    (ptts_flowlm.c:1138-1251) with per-stream EOS state carried on device.

    Resumable: pass frame0/eos_step0/done0/used0 (and the returned
    cache/x as the next call's cache/x0) to generate in chunks, letting the
    host stop early once every stream is done -- the reference's break-at-EOS
    (ptts_flowlm.c:1238) at chunk granularity.
    """
    B = x0.shape[0]
    time_embs = lsd_time_embeds(w, num_steps, cfg)
    eos_after = jnp.broadcast_to(jnp.asarray(eos_after, jnp.int32), (B,))
    frame0 = jnp.asarray(frame0, jnp.int32)

    def frame(carry, inputs):
        cache, x, eos_step, done, used, first_cond, first_flow0 = carry
        i, frame_noise = inputs  # i: scalar, frame_noise: [B, latent]

        normed = layernorm(x, w["out_norm_w"], w["out_norm_b"], cfg.ln_eps)
        eos = eos_logit(w, normed)  # [B]

        hit = eos_enabled & ((i + 1) >= eos_min_frames) & (eos >= eos_threshold)
        eos_step = jnp.where((eos_step < 0) & hit, i, eos_step)

        latent, first_flow = lsd_decode(w, normed, time_embs, frame_noise, cfg, flags)

        # Parity taps: frame-0 cond vector and flow vector (main.c --cond-out /
        # --flow-out, /root/reference/main.c:354-392).
        first_cond = jnp.where(i == 0, normed, first_cond)
        first_flow0 = jnp.where(i == 0, first_flow, first_flow0)

        # Frame i is emitted, then the stream stops if i >= eos_step+eos_after.
        newly_done = (eos_step >= 0) & (i >= eos_step + eos_after)
        used = jnp.where(done, used, i + 1)
        done = done | newly_done

        nxt = _linear(w["input_linear"], None, latent)
        cache, x = decode_step(w, cache, nxt, cfg, flags)

        carry = (cache, x, eos_step, done, used, first_cond, first_flow0)
        return carry, (latent, eos)

    init = (
        cache,
        x0,
        eos_step0 if eos_step0 is not None else jnp.full((B,), -1, jnp.int32),
        done0 if done0 is not None else jnp.zeros((B,), jnp.bool_),
        used0 if used0 is not None else jnp.zeros((B,), jnp.int32),
        jnp.zeros_like(x0),
        jnp.zeros((B, cfg.latent_dim), x0.dtype),
    )
    idx = frame0 + jnp.arange(max_frames)
    carry, (lat, eos) = jax.lax.scan(frame, init, (idx, jnp.swapaxes(noise, 0, 1)))
    (cache, x, eos_step, done, used, first_cond, first_flow) = carry

    latents = jnp.swapaxes(lat, 0, 1)       # [B, F, latent]
    eos_logits = jnp.swapaxes(eos, 0, 1)    # [B, F]
    frames_used = jnp.where(done, used, frame0 + max_frames)
    return GenResult(
        latents=latents,
        frames_used=frames_used,
        eos_logits=eos_logits,
        first_cond=first_cond,
        first_flow=first_flow,
        cache=cache,
        x=x,
        eos_step=eos_step,
        done=done,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_frames", "num_steps", "flags"),
    donate_argnames=("cache",),
)
def generate_latents_while(
    w: Weights,
    cache: KVCache,            # prefilled (see prefill)
    x0: jnp.ndarray,           # [B, d_model] transformer output at BOS
    noise: jnp.ndarray,        # [B, max_frames, latent_dim]
    cfg: FlowLMConfig,
    max_frames: int,
    num_steps: int,
    eos_threshold: float = -4.0,
    eos_min_frames: int = 1,
    eos_after: jnp.ndarray | int = 0,
    max_frames_per_stream: Optional[jnp.ndarray] = None,  # [B] optional
    flags: KernelFlags = DEFAULT_FLAGS,
) -> GenResult:
    """EOS-enabled generation as one on-device lax.while_loop: the loop stops
    the moment every stream is done -- the reference's per-frame break at EOS
    (ptts_flowlm.c:1238), with zero host round trips (the chunked host-exit
    path paid up to frame_bucket-1 wasted frames per utterance).

    Emits the same latents/eos/taps as generate_latents for all frames up to
    max(frames_used); later frames stay zero in the output buffers.
    """
    B = x0.shape[0]
    time_embs = lsd_time_embeds(w, num_steps, cfg)
    eos_after = jnp.broadcast_to(jnp.asarray(eos_after, jnp.int32), (B,))
    noise_t = jnp.swapaxes(noise, 0, 1)  # [F, B, latent]

    def cond_fn(state):
        i, _, _, _, done, *_ = state
        return (i < max_frames) & ~jnp.all(done)

    def body_fn(state):
        (i, cache, x, eos_step, done, used, latents, eos_logits,
         first_cond, first_flow0) = state

        normed = layernorm(x, w["out_norm_w"], w["out_norm_b"], cfg.ln_eps)
        eos = eos_logit(w, normed)  # [B]
        hit = ((i + 1) >= eos_min_frames) & (eos >= eos_threshold)
        eos_step = jnp.where((eos_step < 0) & hit, i, eos_step)

        frame_noise = jax.lax.dynamic_index_in_dim(noise_t, i, axis=0,
                                                   keepdims=False)
        latent, first_flow = lsd_decode(w, normed, time_embs, frame_noise, cfg, flags)

        first_cond = jnp.where(i == 0, normed, first_cond)
        first_flow0 = jnp.where(i == 0, first_flow, first_flow0)

        newly_done = (eos_step >= 0) & (i >= eos_step + eos_after)
        if max_frames_per_stream is not None:
            newly_done = newly_done | (i + 1 >= max_frames_per_stream)
        used = jnp.where(done, used, i + 1)
        done = done | newly_done

        latents = jax.lax.dynamic_update_index_in_dim(
            latents, latent.astype(latents.dtype), i, axis=1)
        eos_logits = jax.lax.dynamic_update_index_in_dim(
            eos_logits, eos.astype(eos_logits.dtype), i, axis=1)

        nxt = _linear(w["input_linear"], None, latent)
        cache, x = decode_step(w, cache, nxt, cfg, flags)
        return (i + 1, cache, x, eos_step, done, used, latents, eos_logits,
                first_cond, first_flow0)

    init = (
        jnp.asarray(0, jnp.int32),
        cache,
        x0,
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, max_frames, cfg.latent_dim), x0.dtype),
        jnp.zeros((B, max_frames), jnp.float32),
        jnp.zeros_like(x0),
        jnp.zeros((B, cfg.latent_dim), x0.dtype),
    )
    (i, cache, x, eos_step, done, used, latents, eos_logits,
     first_cond, first_flow) = jax.lax.while_loop(cond_fn, body_fn, init)

    frames_used = jnp.where(done, used, max_frames)
    return GenResult(
        latents=latents,
        frames_used=frames_used,
        eos_logits=eos_logits,
        first_cond=first_cond,
        first_flow=first_flow,
        cache=cache,
        x=x,
        eos_step=eos_step,
        done=done,
    )


def scale_latents(w: Weights, latents: jnp.ndarray) -> jnp.ndarray:
    """x * emb_std + emb_mean (ptts_flowlm.c:1253-1263)."""
    return latents * w["emb_std"] + w["emb_mean"]


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
def forward_next(
    w: Weights,
    seq: jnp.ndarray,      # [B, T, d_model] full sequence incl. BOS/prev latents
    lengths: jnp.ndarray,  # [B]
    noise: jnp.ndarray,    # [B, latent_dim]
    cfg: FlowLMConfig,
    num_steps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-cached full-sequence forward producing the next latent + EOS logit.

    Mirror of ptts_flowlm_forward_next (ptts_flowlm.c:1027-1136): rebuilds the
    whole sequence and runs batch causal attention -- O(T^2) per frame, kept
    as the cross-check path for the KV-cached decode (the reference keeps it
    for the same reason, SURVEY.md §3.4).
    """
    _, _, last = prefill_kv(w, seq, lengths, cfg)
    normed = layernorm(last, w["out_norm_w"], w["out_norm_b"], cfg.ln_eps)
    eos = eos_logit(w, normed)
    time_embs = lsd_time_embeds(w, num_steps, cfg)
    latent, _ = lsd_decode(w, normed, time_embs, noise, cfg)
    return latent, eos


def embed_tokens(w: Weights, token_ids: jnp.ndarray, cfg: FlowLMConfig) -> jnp.ndarray:
    """Token ids -> embeddings; out-of-range ids clamp to row 0
    (ptts_flowlm.c:1168-1171)."""
    ids = jnp.where((token_ids < 0) | (token_ids >= cfg.vocab + 1), 0, token_ids)
    return jnp.take(w["embed"], ids, axis=0)
