"""NumPy oracle mirroring the reference C algorithms.

This is the test-side ground truth: a direct, loop-structured NumPy
transcription of the algorithms in /root/reference/*.c (channel-major convs,
per-position attention, sequential KV decode). The production JAX path is
validated against it the same way the reference validates CUDA against CPU
(PTTS_CUDA_VALIDATE, Makefile:152-157).

Weight dicts use the same pytree layout as ptts_tpu.models.* so a single
random checkpoint feeds both implementations.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


# ---------------------------------------------------------------------------
# Primitives (ptts_kernels.c / ptts_flowlm.c helpers)
# ---------------------------------------------------------------------------


def linear(w: np.ndarray, b, x: np.ndarray) -> np.ndarray:
    """y = x @ w.T + b, w: [out, in]."""
    y = x.astype(F32) @ w.astype(F32).T
    if b is not None:
        y = y + b
    return y.astype(F32)


def layernorm(x: np.ndarray, w, b, eps: float) -> np.ndarray:
    mean = x.mean(axis=-1, keepdims=True, dtype=F32)
    c = x - mean
    var = (c * c).mean(axis=-1, keepdims=True, dtype=F32)
    y = c / np.sqrt(var + F32(eps))
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y.astype(F32)


def kyutai_rmsnorm(x: np.ndarray, alpha, eps: float) -> np.ndarray:
    """ptts_flowlm.c:183-197: centered (d-1) variance, uncentered output."""
    d = x.shape[-1]
    mean = x.mean(axis=-1, keepdims=True, dtype=F32)
    c = x - mean
    var = (c * c).sum(axis=-1, keepdims=True, dtype=F32)
    if d > 1:
        var = var / F32(d - 1)
    y = x / np.sqrt(var + F32(eps))
    if alpha is not None:
        y = y * alpha
    return y.astype(F32)


def silu(x: np.ndarray) -> np.ndarray:
    return (x / (1.0 + np.exp(-x.astype(F32)))).astype(F32)


def _erf(x: np.ndarray) -> np.ndarray:
    # Vectorized erf via math.erf (float64 internally, rounded to f32 --
    # indistinguishable from C erff at test tolerances).
    import math

    return np.vectorize(math.erf)(x.astype(np.float64)).astype(F32)


def gelu_flowlm(x: np.ndarray) -> np.ndarray:
    return (F32(0.5) * x * (1.0 + _erf(x * F32(0.7071067811865475)))).astype(F32)


def gelu_mimi(x: np.ndarray) -> np.ndarray:
    k = F32(0.7978845608)
    return (F32(0.5) * x * (1.0 + np.tanh(k * (x + F32(0.044715) * x * x * x)))).astype(F32)


def elu(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x, np.exp(x.astype(F32)) - 1.0).astype(F32)


def softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp((x - m).astype(F32))
    return (e / e.sum(axis=-1, keepdims=True, dtype=F32)).astype(F32)


def rope_apply(q: np.ndarray, k: np.ndarray, positions: np.ndarray,
               max_period: float = 10000.0):
    """q,k: [T, H, D]; positions: [T] ints. Interleaved-pair rotation."""
    T, H, D = q.shape
    half = D // 2
    i = np.arange(half, dtype=F32)
    freqs = np.exp(-np.log(F32(max_period)) * (2.0 * i / F32(D))).astype(F32)
    angle = positions.astype(F32)[:, None] * freqs  # [T, half]
    c = np.cos(angle).astype(F32)[:, None, :]
    s = np.sin(angle).astype(F32)[:, None, :]
    q2 = q.reshape(T, H, half, 2)
    k2 = k.reshape(T, H, half, 2)

    def rot(x2):
        r0 = x2[..., 0] * c - x2[..., 1] * s
        r1 = x2[..., 0] * s + x2[..., 1] * c
        return np.stack([r0, r1], axis=-1).reshape(T, H, D).astype(F32)

    return rot(q2), rot(k2)


def attention_causal(q, k, v, context: int = 0):
    """q,k,v: [T, H, D]; per-head causal softmax attention, optional window."""
    T, H, D = q.shape
    out = np.zeros_like(q)
    scale = F32(1.0 / np.sqrt(D))
    for h in range(H):
        for tq in range(T):
            n_keys = tq + 1
            scores = np.empty(n_keys, dtype=F32)
            for tk in range(n_keys):
                if context > 0 and (tq - tk) >= context:
                    scores[tk] = F32(-1e30)
                else:
                    scores[tk] = F32(np.dot(q[tq, h], k[tk, h])) * scale
            w = softmax(scores)
            out[tq, h] = (w[:, None] * v[:n_keys, h]).sum(axis=0, dtype=F32)
    return out


# ---------------------------------------------------------------------------
# Convolutions (ptts_kernels.c:114-207), channel-major [C, T]
# ---------------------------------------------------------------------------


def conv1d(x: np.ndarray, w: np.ndarray, b, stride: int, groups: int) -> np.ndarray:
    """x: [Cin, T]; w: [Cout, Cin/g, k] (torch layout). Returns [Cout, T//stride]."""
    in_ch, T = x.shape
    out_ch, in_per_group, k = w.shape
    out_per_group = out_ch // groups
    out_len = T // stride
    left_pad = k - stride
    y = np.zeros((out_ch, out_len), dtype=F32)
    for oc in range(out_ch):
        g = oc // out_per_group
        in_base = g * in_per_group
        bias = F32(b[oc]) if b is not None else F32(0.0)
        for t in range(out_len):
            acc = bias
            in_start = t * stride - left_pad
            for ic in range(in_per_group):
                xch = x[in_base + ic]
                wrow = w[oc, ic]
                for kk in range(k):
                    idx = in_start + kk
                    if 0 <= idx < T:
                        acc = F32(acc + wrow[kk] * xch[idx])
            y[oc, t] = acc
    return y


def convtr1d(x: np.ndarray, w: np.ndarray, b, stride: int, groups: int) -> np.ndarray:
    """x: [Cin, T]; w: [Cin, Cout/g, k] (torch layout). Returns [Cout, T*stride]."""
    in_ch, T = x.shape
    _, out_per_group, k = w.shape
    out_ch = out_per_group * groups
    in_per_group = in_ch // groups
    full_len = (T - 1) * stride + k
    out_len = full_len - (k - stride)
    y = np.zeros((out_ch, out_len), dtype=F32)
    for oc in range(out_ch):
        g = oc // out_per_group
        ocg = oc % out_per_group
        if b is not None:
            y[oc, :] = F32(b[oc])
        for ic_off in range(in_per_group):
            ic = g * in_per_group + ic_off
            wrow = w[ic, ocg]
            for t in range(T):
                xval = x[ic, t]
                base = t * stride
                for kk in range(k):
                    idx = base + kk
                    if idx < out_len:
                        y[oc, idx] = F32(y[oc, idx] + wrow[kk] * xval)
    return y


# ---------------------------------------------------------------------------
# FlowLM (ptts_flowlm.c)
# ---------------------------------------------------------------------------


def flowlm_transformer(w: dict, x: np.ndarray, cfg) -> np.ndarray:
    """Full batch forward, x: [T, d_model] (mutated copy returned)."""
    x = x.astype(F32).copy()
    T = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    pos = np.arange(T)
    L = w["in_proj"].shape[0]
    for l in range(L):
        xn = layernorm(x, w["norm1_w"][l], w["norm1_b"][l], cfg.ln_eps)
        qkv = linear(w["in_proj"][l], None, xn)  # [T, 3d]
        d = cfg.d_model
        q = qkv[:, :d].reshape(T, H, D)
        k = qkv[:, d : 2 * d].reshape(T, H, D)
        v = qkv[:, 2 * d :].reshape(T, H, D)
        q, k = rope_apply(q, k, pos, cfg.max_period)
        attn = attention_causal(q, k, v)
        attn_flat = attn.reshape(T, d)
        x = x + linear(w["out_proj"][l], None, attn_flat)
        xn = layernorm(x, w["norm2_w"][l], w["norm2_b"][l], cfg.ln_eps)
        ff = gelu_flowlm(linear(w["linear1"][l], None, xn))
        x = x + linear(w["linear2"][l], None, ff)
    return x


def timestep_embed(tw: dict, idx: int, t: float, cfg) -> np.ndarray:
    nf = cfg.time_freqs
    freqs = tw["freqs"][idx]
    if freqs is None:
        i = np.arange(nf, dtype=F32)
        freqs = np.exp(-np.log(F32(cfg.max_period)) * (i / F32(nf))).astype(F32)
    angle = freqs * F32(t)
    emb = np.concatenate([np.cos(angle), np.sin(angle)]).astype(F32)
    h = silu(linear(tw["lin0_w"][idx], tw["lin0_b"][idx], emb))
    out = linear(tw["lin2_w"][idx], tw["lin2_b"][idx], h)
    return kyutai_rmsnorm(out, tw["rms_alpha"][idx], cfg.rms_eps)


def flow_net(w: dict, cond: np.ndarray, s: float, t: float, x_in: np.ndarray, cfg) -> np.ndarray:
    """cond: [d_model], x_in: [latent_dim] -> flow [latent_dim]."""
    fw = w["flow"]
    x = linear(fw["input_w"], fw["input_b"], x_in)
    ts = timestep_embed(fw["time"], 0, s, cfg)
    tt = timestep_embed(fw["time"], 1, t, cfg)
    cond_emb = linear(fw["cond_w"], fw["cond_b"], cond)
    tmp2 = ((ts + tt) * F32(0.5) + cond_emb).astype(F32)

    depth = fw["res"]["mlp0_w"].shape[0]
    for bidx in range(depth):
        rb = {k: fw["res"][k][bidx] for k in fw["res"]}
        h = layernorm(x, rb["in_ln_w"], rb["in_ln_b"], cfg.flow_ln_eps)
        ada = linear(rb["ada_w"], rb["ada_b"], silu(tmp2))
        fd = cfg.flow_dim
        shift, scale, gate = ada[:fd], ada[fd : 2 * fd], ada[2 * fd :]
        h = h * (1.0 + scale) + shift
        h = linear(rb["mlp2_w"], rb["mlp2_b"], silu(linear(rb["mlp0_w"], rb["mlp0_b"], h)))
        x = (x + gate * h).astype(F32)

    h = layernorm(x, None, None, cfg.flow_ln_eps)
    ada2 = linear(fw["final_ada_w"], fw["final_ada_b"], silu(tmp2))
    fd = cfg.flow_dim
    h = h * (1.0 + ada2[fd:]) + ada2[:fd]
    return linear(fw["final_linear_w"], fw["final_linear_b"], h)


def lsd_decode(w: dict, cond: np.ndarray, num_steps: int, x: np.ndarray, cfg) -> np.ndarray:
    x = x.astype(F32).copy()
    for i in range(num_steps):
        s = F32(i) / F32(num_steps)
        t = F32(i + 1) / F32(num_steps)
        flow = flow_net(w, cond, float(s), float(t), x, cfg)
        x = (x + flow / F32(num_steps)).astype(F32)
    return x


def flowlm_generate_latents(
    w: dict,
    tokens: np.ndarray,
    cond_prefix,  # [cond_len, d_model] or None
    max_frames: int,
    lsd_steps: int,
    noise: np.ndarray,  # [max_frames, latent_dim] precomputed
    cfg,
    eos_enabled: bool = True,
    eos_threshold: float = -4.0,
    eos_min_frames: int = 1,
    eos_after: int = 0,
):
    """Sequential KV-free reference generation (rebuilds prefix each frame is
    avoided: uses full-forward per frame like ptts_flowlm_forward_next chained,
    which matches transformer_forward_step_cached results mathematically)."""
    d = cfg.d_model
    cond_len = 0 if cond_prefix is None else len(cond_prefix)
    prefix = []
    if cond_len:
        prefix.append(cond_prefix.astype(F32))
    embeds = []
    for tid in tokens:
        tid = int(tid)
        if tid < 0 or tid >= cfg.vocab + 1:
            tid = 0
        embeds.append(w["embed"][tid])
    if embeds:
        prefix.append(np.stack(embeds).astype(F32))
    bos = linear(w["input_linear"], None, w["bos_emb"])
    prefix.append(bos[None, :])
    seq = np.concatenate(prefix, axis=0)  # [T0, d]

    latents = np.zeros((max_frames, cfg.latent_dim), dtype=F32)
    eos_logits = []
    first_cond = None
    first_flow = None
    eos_step = -1
    used = 0
    for i in range(max_frames):
        hidden = flowlm_transformer(w, seq, cfg)
        x_last = hidden[-1]
        normed = layernorm(x_last, w["out_norm_w"], w["out_norm_b"], cfg.ln_eps)
        if i == 0:
            first_cond = normed.copy()
        eos = F32(np.dot(w["out_eos_w"], normed) + w["out_eos_b"])
        eos_logits.append(float(eos))
        if eos_enabled and i + 1 >= eos_min_frames and eos >= eos_threshold:
            if eos_step < 0:
                eos_step = i

        lat = noise[i].astype(F32).copy()
        if i == 0 and lsd_steps > 0:
            first_flow = flow_net(w, normed, 0.0, 1.0 / lsd_steps, lat, cfg)
        lat = lsd_decode(w, normed, lsd_steps, lat, cfg)
        latents[i] = lat
        used = i + 1
        if eos_step >= 0 and i >= eos_step + eos_after:
            break
        nxt = linear(w["input_linear"], None, lat)
        seq = np.concatenate([seq, nxt[None, :]], axis=0)

    return {
        "latents": latents[:used],
        "frames_used": used,
        "eos_logits": np.array(eos_logits, dtype=F32),
        "first_cond": first_cond,
        "first_flow": first_flow,
    }


def scale_latents(w: dict, latents: np.ndarray) -> np.ndarray:
    return (latents * w["emb_std"] + w["emb_mean"]).astype(F32)


# ---------------------------------------------------------------------------
# Mimi (ptts_mimi.c)
# ---------------------------------------------------------------------------


def mimi_transformer(w: dict, x: np.ndarray, cfg) -> np.ndarray:
    """x: [T, d_model] time-major; windowed attention + LayerScale."""
    x = x.astype(F32).copy()
    T = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    pos = np.arange(T)
    L = w["in_proj"].shape[0]
    d = cfg.d_model
    for l in range(L):
        xn = layernorm(x, w["norm1_w"][l], w["norm1_b"][l], cfg.ln_eps)
        qkv = linear(w["in_proj"][l], None, xn)
        q = qkv[:, :d].reshape(T, H, D)
        k = qkv[:, d : 2 * d].reshape(T, H, D)
        v = qkv[:, 2 * d :].reshape(T, H, D)
        q, k = rope_apply(q, k, pos, cfg.max_period)
        attn = attention_causal(q, k, v, context=cfg.context).reshape(T, d)
        add = linear(w["out_proj"][l], None, attn)
        if w["ls1"] is not None:
            add = add * w["ls1"][l]
        x = x + add
        xn = layernorm(x, w["norm2_w"][l], w["norm2_b"][l], cfg.ln_eps)
        ff = gelu_mimi(linear(w["linear1"][l], None, xn))
        add = linear(w["linear2"][l], None, ff)
        if w["ls2"] is not None:
            add = add * w["ls2"][l]
        x = x + add
    return x


def mimi_decode(w: dict, latents: np.ndarray, cfg) -> np.ndarray:
    """latents: [frames, latent_dim] -> audio [frames * frame_samples]."""
    frames = latents.shape[0]
    # quantizer out proj -> [512, frames] channel-major
    q = (latents.astype(F32) @ w["quant_w"].astype(F32).T).T.astype(F32)
    up = convtr1d(q, w["upsample_w"], None, cfg.upsample_stride, groups=cfg.d_model)
    x_t = up.T  # time-major for transformer
    x_t = mimi_transformer(w["transformer"], x_t, cfg)
    x = x_t.T.astype(F32)  # back to channel-major

    x = conv1d(x, w["dec_in_w"], w["dec_in_b"], 1, 1)
    for st in w["stages"]:
        x = elu(x)
        x = convtr1d(x, st["up_w"], st["up_b"], st["stride"], 1)
        # resblock: ELU -> conv k3 -> ELU -> conv k1, residual add
        h = elu(x)
        h = conv1d(h, st["res1_w"], st["res1_b"], 1, 1)
        h = elu(h)
        h = conv1d(h, st["res2_w"], st["res2_b"], 1, 1)
        x = (x + h).astype(F32)
    x = elu(x)
    out = conv1d(x, w["dec_out_w"], w["dec_out_b"], 1, 1)
    return out[0]
