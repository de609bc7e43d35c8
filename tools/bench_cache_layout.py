"""KV-cache layout experiment for the AR decode loop (round-3 VERDICT #5).

The AR frame loop runs ~1.5 ms/frame at B=256/Tmax=128 vs a ~1.2 ms/frame
cache-read bandwidth floor (PERF.md). The flash-decode post-mortem concluded
further wins need a cache-LAYOUT change, not a kernel. This tool measures the
decode-transformer step (6 KV-cached layers, the frame loop's dominant cost)
under candidate layouts, inside a jitted `lax.fori_loop` with donated buffers
-- the production while_loop's exact execution regime:

  bthd      [L, B, T, H, D]   production baseline (models/flowlm.KVCache)
  bt_flat   [L, B, T, H*D]    flat head dim: write [1,B,1,HD], attention
                              reshapes at use (ROADMAP's "flat [L,B,T,H*D]")
  tb_flat   [L, T, B, H*D]    time-major: the per-step write at the cursor
                              column is one fully CONTIGUOUS [B, HD] slab
                              (bthd writes B blocks strided by T*H*D)
  unroll    [B, T, H, D] x L  python-unrolled layers over per-layer arrays:
                              no lax.scan dynamic_index_in_dim on the cache
                              (tests whether the scan's per-layer gather of a
                              [B,T,H,D] slice from the carried [L,...] buffer
                              costs a copy)

All variants compute identical math (same weights, same RoPE, same masked
einsum); equality is asserted at f32 to ~1e-2 (bf16 accumulation order).
Methodology per PERF.md: host-readback fences + chained-run slopes (through
the axon tunnel, block_until_ready is not a fence).

Usage: python tools/bench_cache_layout.py [B] [Tmax] [frames]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from ptts_tpu.config import FlowLMConfig  # noqa: E402
from ptts_tpu.models import flowlm  # noqa: E402
from ptts_tpu.ops.activations import gelu_erf  # noqa: E402
from ptts_tpu.ops.norms import layernorm  # noqa: E402
from ptts_tpu.ops.rope import rope_rotate_halves  # noqa: E402

NEG_INF = -1e30


def _linear(w, x):
    y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _attn(q, k_cache, v_cache, mask):
    """q [B,H,D]; k/v [B,T,H,D]; mask [B,T] -> [B,H,D]."""
    scores = jnp.einsum("bhd,bthd->bht", q, k_cache,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(q.shape[-1])))
    scores = jnp.where(mask[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", probs.astype(v_cache.dtype), v_cache,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _qkv_rot(wl, x, pos, cfg):
    H, D = cfg.num_heads, cfg.head_dim
    d = H * D
    xn = layernorm(x, wl["norm1_w"], wl["norm1_b"], cfg.ln_eps)
    qkv = _linear(wl["in_proj"], xn)
    B = x.shape[0]
    q = qkv[..., :d].reshape(B, H, D)
    k = qkv[..., d:2 * d].reshape(B, H, D)
    v = qkv[..., 2 * d:].reshape(B, H, D)
    q, k = rope_rotate_halves(q[:, None], k[:, None], pos[:, None],
                              cfg.max_period)
    return q[:, 0], k[:, 0], v


def _mlp(wl, x, attn_out, cfg):
    B = x.shape[0]
    d = cfg.num_heads * cfg.head_dim
    x = x + _linear(wl["out_proj"], attn_out.reshape(B, d))
    xn = layernorm(x, wl["norm2_w"], wl["norm2_b"], cfg.ln_eps)
    return x + _linear(wl["linear2"], gelu_erf(_linear(wl["linear1"], xn)))


# --------------------------------------------------------------------------
# layout-specific step bodies: (x, k, v, cursor) -> (x, k, v)
# --------------------------------------------------------------------------

def step_bthd(lw, x, k5, v5, cursor, cfg, mask, pos):
    """Production layout: [L, B, T, H, D], lax.scan over layers."""
    def body(carry, inputs):
        x, kc, vc = carry
        l, wl = inputs
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        kc = jax.lax.dynamic_update_slice(
            kc, k.astype(kc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.astype(vc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        sel = lambda c: jax.lax.dynamic_index_in_dim(c, l, 0, keepdims=False)
        attn = _attn(q, sel(kc), sel(vc), mask)
        return (_mlp(wl, x, attn, cfg), kc, vc), None

    (x, k5, v5), _ = jax.lax.scan(
        body, (x, k5, v5), (jnp.arange(cfg.num_layers), lw))
    return x, k5, v5


def step_bt_flat(lw, x, kf, vf, cursor, cfg, mask, pos):
    """Flat head dim: [L, B, T, H*D]; reshape to [B,T,H,D] at the einsum."""
    H, D = cfg.num_heads, cfg.head_dim

    def body(carry, inputs):
        x, kc, vc = carry
        l, wl = inputs
        B = x.shape[0]
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        kc = jax.lax.dynamic_update_slice(
            kc, k.reshape(B, H * D).astype(kc.dtype)[None, :, None],
            (l, 0, cursor, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.reshape(B, H * D).astype(vc.dtype)[None, :, None],
            (l, 0, cursor, 0))
        T = kc.shape[2]
        sel = lambda c: jax.lax.dynamic_index_in_dim(
            c, l, 0, keepdims=False).reshape(B, T, H, D)
        attn = _attn(q, sel(kc), sel(vc), mask)
        return (_mlp(wl, x, attn, cfg), kc, vc), None

    (x, kf, vf), _ = jax.lax.scan(
        body, (x, kf, vf), (jnp.arange(cfg.num_layers), lw))
    return x, kf, vf


def step_tb_flat(lw, x, kf, vf, cursor, cfg, mask, pos):
    """Time-major: [L, T, B, H*D]; the cursor-column write is contiguous."""
    H, D = cfg.num_heads, cfg.head_dim

    def body(carry, inputs):
        x, kc, vc = carry
        l, wl = inputs
        B = x.shape[0]
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        kc = jax.lax.dynamic_update_slice(
            kc, k.reshape(B, H * D).astype(kc.dtype)[None, None],
            (l, cursor, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.reshape(B, H * D).astype(vc.dtype)[None, None],
            (l, cursor, 0, 0))
        T = kc.shape[1]

        def sel(c):
            s = jax.lax.dynamic_index_in_dim(c, l, 0, keepdims=False)
            return s.reshape(T, B, H, D)

        ks, vs = sel(kc), sel(vc)
        scores = jnp.einsum("bhd,tbhd->bht", q, ks,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / jnp.sqrt(jnp.float32(D)))
        scores = jnp.where(mask[:, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bht,tbhd->bhd", probs.astype(vs.dtype), vs,
                          preferred_element_type=jnp.float32).astype(q.dtype)
        return (_mlp(wl, x, attn, cfg), kc, vc), None

    (x, kf, vf), _ = jax.lax.scan(
        body, (x, kf, vf), (jnp.arange(cfg.num_layers), lw))
    return x, kf, vf


def step_unroll(lw, x, ks, vs, cursor, cfg, mask, pos):
    """Per-layer [B, T, H, D] arrays, python-unrolled layers (no scan, no
    dynamic_index on a carried [L, ...] buffer)."""
    ks, vs = list(ks), list(vs)
    for l in range(cfg.num_layers):
        wl = jax.tree.map(lambda a: a[l], lw)
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        ks[l] = jax.lax.dynamic_update_slice(
            ks[l], k.astype(ks[l].dtype)[:, None], (0, cursor, 0, 0))
        vs[l] = jax.lax.dynamic_update_slice(
            vs[l], v.astype(vs[l].dtype)[:, None], (0, cursor, 0, 0))
        attn = _attn(q, ks[l], vs[l], mask)
        x = _mlp(wl, x, attn, cfg)
    return x, tuple(ks), tuple(vs)


def step_bthd_cond(lw, x, k5, v5, cursor, cfg, mask, pos):
    """Production layout + lax.cond-truncated cache read: while the cursor
    is below 3/4*Tmax the attention einsum only reads the first 3/4 of the
    cache columns (a STATIC slice per cond branch), skipping the dead-column
    read traffic the masked einsum otherwise pays every frame. Tests whether
    the branch + smaller DMA beats the straight-line full read (the blocked
    decode op lost this trade at round 2 via unpipelined dynamic slices --
    this variant uses static slices the scheduler can pipeline).

    MEASURED AND REJECTED (round 3): 19.0 ms/frame vs bthd's 1.6 at
    B=256/Tmax=128 -- a lax.cond inside the while_loop body serializes the
    step far worse than the ~25% dead-column read it skips. Third
    confirmation (after flash-decode and decode_attention_blocked) that the
    straight-line masked einsum is the right decode read."""
    Tmax = k5.shape[2]
    tcut = ((Tmax * 3 // 4) // 8) * 8

    def body(carry, inputs):
        x, kc, vc = carry
        l, wl = inputs
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        kc = jax.lax.dynamic_update_slice(
            kc, k.astype(kc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v.astype(vc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        sel = lambda c: jax.lax.dynamic_index_in_dim(c, l, 0, keepdims=False)
        kl, vl = sel(kc), sel(vc)
        attn = jax.lax.cond(
            cursor < tcut,
            lambda: _attn(q, kl[:, :tcut], vl[:, :tcut], mask[:, :tcut]),
            lambda: _attn(q, kl, vl, mask),
        )
        return (_mlp(wl, x, attn, cfg), kc, vc), None

    (x, k5, v5), _ = jax.lax.scan(
        body, (x, k5, v5), (jnp.arange(cfg.num_layers), lw))
    return x, k5, v5


def step_pair(lw, x, k5, v5, cursor, cfg, mask, pos):
    """Paired-head 128-lane cache: [L, B, T, H//2, 2*D].

    Tests whether the decode einsum reads a 128-lane-minor cache faster
    than the production 64-lane-minor one (a compiled-memory probe shows
    bf16 [..,H,64] has NO physical tile padding -- ratio 1.00 -- so any
    win here is read-efficiency, not footprint). MEASURED AND REJECTED
    (round 3): 1.853 ms/frame vs bthd's 1.601 at B=256/Tmax=128 -- the
    64-lane-minor einsum read is already efficient, and the pair form pays
    2x score/context MXU work plus the q_ext/diagonal shuffles for
    nothing. Per-head score dots
    contract over the full 128 lanes with the other head's query lanes
    zeroed (exact +0.0 terms); the context dot computes both halves and a
    static diagonal slice keeps each head's own lanes -- the flat-lane
    kernel trick (PERF.md round 3) applied at the XLA level.
    """
    H, D = cfg.num_heads, cfg.head_dim
    G = H // 2
    # eye2[x] keeps half x of the 2D lanes (exact 1.0/0.0 multipliers)
    eye2 = jnp.repeat(jnp.eye(2, dtype=jnp.float32), D, axis=1)  # [2, 2D]

    def body(carry, inputs):
        x, kc, vc = carry
        l, wl = inputs
        B = x.shape[0]
        q, k, v = _qkv_rot(wl, x, pos, cfg)
        kp = k.reshape(B, G, 2 * D)
        vp = v.reshape(B, G, 2 * D)
        kc = jax.lax.dynamic_update_slice(
            kc, kp.astype(kc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, vp.astype(vc.dtype)[None, :, None], (l, 0, cursor, 0, 0))
        sel = lambda c: jax.lax.dynamic_index_in_dim(c, l, 0, keepdims=False)
        kl, vl = sel(kc), sel(vc)          # [B, T, G, 2D]
        qp = q.reshape(B, G, 2 * D)
        q_ext = (qp[:, :, None, :].astype(jnp.float32)
                 * eye2[None, None]).astype(q.dtype)   # [B, G, 2, 2D]
        scores = jnp.einsum("bgxd,btgd->bgxt", q_ext, kl,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / jnp.sqrt(jnp.float32(D)))
        scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bgxt,btgd->bgxd", probs.astype(vl.dtype), vl,
                         preferred_element_type=jnp.float32)  # [B,G,2,2D]
        c = ctx.reshape(B, G, 2, 2, D)
        attn = jnp.stack([c[:, :, 0, 0], c[:, :, 1, 1]],
                         axis=2).reshape(B, H, D).astype(q.dtype)
        return (_mlp(wl, x, attn, cfg), kc, vc), None

    (x, k5, v5), _ = jax.lax.scan(
        body, (x, k5, v5), (jnp.arange(cfg.num_layers), lw))
    return x, k5, v5


STEPS = {
    "bthd": step_bthd,
    "bthd_cond": step_bthd_cond,
    "bt_flat": step_bt_flat,
    "tb_flat": step_tb_flat,
    "unroll": step_unroll,
    "pair": step_pair,
}


def make_runner(layout, cfg, B, Tmax, T0):
    step = STEPS[layout]

    # NB: weights are a jit ARGUMENT (PERF.md lesson #8 -- closing over them
    # inlines the arrays as HLO constants and explodes compile time) and the
    # trip count is a TRACED scalar: with a static bound the TPU backend can
    # fully unroll the loop (50 x 6-layer bodies) and the compile runs tens
    # of minutes -- the production regime is generate_latents_while's
    # dynamic-condition while_loop.
    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def run(lw, x, k, v, cursor0, n):
        t = jnp.arange(Tmax)[None, :]

        def cond(carry):
            x, k, v, cursor = carry
            return cursor < cursor0 + n

        def body(carry):
            x, k, v, cursor = carry
            mask = t <= cursor  # valid through the current write column
            pos = jnp.full((B,), 0, jnp.int32) + cursor
            x, k, v = step(lw, x, k, v, cursor, cfg, mask, pos)
            return x, k, v, cursor + 1

        x, k, v, _ = jax.lax.while_loop(cond, body, (x, k, v, cursor0))
        return x, k, v

    return run


_BASE: dict = {}


def make_state(layout, cfg, B, Tmax, T0, dtype, seed=0):
    """Fresh donatable device state for one timed run.

    The random base is generated ONCE (f32 host RNG of the full-size cache is
    minutes of single-core work -- regenerating it per timed call was the
    tool's original bottleneck, not compile); per-layout device copies are
    cached and each call returns device-side clones the runner may donate.
    """
    L, H, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    if "np" not in _BASE:
        rng = np.random.default_rng(seed)
        shape = (L, B, Tmax, H, D)
        k = (rng.standard_normal(shape, dtype=np.float32) * 0.05)
        v = (rng.standard_normal(shape, dtype=np.float32) * 0.05)
        k[:, :, T0:] = 0.0
        v[:, :, T0:] = 0.0
        x = (rng.standard_normal((B, cfg.d_model), dtype=np.float32) * 0.05)
        _BASE["np"] = (x, k, v)
    if layout not in _BASE:
        x, k, v = _BASE["np"]
        if layout in ("bthd", "bthd_cond"):
            kk, vv = jnp.asarray(k, dtype), jnp.asarray(v, dtype)
        elif layout == "pair":
            G2 = (H // 2, 2 * D)
            kk = jnp.asarray(k.reshape(L, B, Tmax, *G2), dtype)
            vv = jnp.asarray(v.reshape(L, B, Tmax, *G2), dtype)
        elif layout == "bt_flat":
            kk = jnp.asarray(k.reshape(L, B, Tmax, H * D), dtype)
            vv = jnp.asarray(v.reshape(L, B, Tmax, H * D), dtype)
        elif layout == "tb_flat":
            kk = jnp.asarray(
                k.transpose(0, 2, 1, 3, 4).reshape(L, Tmax, B, H * D), dtype)
            vv = jnp.asarray(
                v.transpose(0, 2, 1, 3, 4).reshape(L, Tmax, B, H * D), dtype)
        elif layout == "unroll":
            kk = tuple(jnp.asarray(k[l], dtype) for l in range(L))
            vv = tuple(jnp.asarray(v[l], dtype) for l in range(L))
        else:
            raise ValueError(layout)
        _BASE[layout] = (jnp.asarray(x, dtype), kk, vv)
    xd, kd, vd = _BASE[layout]
    clone = lambda t: t + jnp.zeros((), t.dtype)  # noqa: E731
    return (clone(xd), jax.tree.map(clone, kd), jax.tree.map(clone, vd),
            jnp.asarray(T0, jnp.int32))


def drop_layout_state(layout) -> None:
    """Free a finished layout's cached device arrays."""
    _BASE.pop(layout, None)


def main():
    import os

    cache_dir = os.environ.get("PTTS_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/ptts_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    Tmax = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    # optional 4th arg: comma-separated layout subset (baseline bthd is
    # always included as the equality reference)
    if len(sys.argv) > 4:
        want = set(sys.argv[4].split(",")) | {"bthd"}
        unknown = want - set(STEPS)
        assert not unknown, f"unknown layouts: {unknown}"
        selected = {n: s for n, s in STEPS.items() if n in want}
    else:
        selected = dict(STEPS)
    dtype = jnp.bfloat16
    cfg = FlowLMConfig()
    T0 = 64

    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    lw = flowlm._layer_weights(fw)

    print(f"[layout] B={B} Tmax={Tmax} frames={frames} L={cfg.num_layers} "
          f"H={cfg.num_heads} D={cfg.head_dim} bf16", file=sys.stderr)

    # correctness: every layout's final x must match the baseline. Checked at
    # a SHORT horizon (4 frames): the random-weight transformer amplifies
    # activations ~5x/frame, so after 50 frames bf16 rounding-order noise
    # diverges chaotically across layouts even though the math is identical.
    # ONE compile per layout (n is traced, so the check reuses the timing
    # program); the chained-run slope comes from calling the SAME program 1x
    # vs 3x back-to-back (data-dependent through x/k/v; cursor resets each
    # call so the write pattern is identical).
    n_check = 4
    ref_x = None
    results = {}
    for layout in selected:
        run = make_runner(layout, cfg, B, Tmax, T0)
        x, k, v, c0 = make_state(layout, cfg, B, Tmax, T0, dtype)
        t0 = time.perf_counter()
        x1, k, v = run(lw, x, k, v, c0, jnp.asarray(n_check, jnp.int32))
        xv = np.asarray(x1, dtype=np.float32)
        print(f"[layout] {layout:8s} compiled+ran in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        if ref_x is None:
            ref_x = xv
        else:
            md = float(np.max(np.abs(xv - ref_x)))
            scale = float(np.max(np.abs(ref_x))) or 1.0
            assert md / scale < 2e-2, (layout, md, scale)

        def timed(calls):
            x, k, v, c0 = make_state(layout, cfg, B, Tmax, T0, dtype)
            n = jnp.asarray(frames, jnp.int32)
            t0 = time.perf_counter()
            for _ in range(calls):
                x, k, v = run(lw, x, k, v, c0, n)
            float(jnp.sum(x.astype(jnp.float32)))  # host readback fence
            return time.perf_counter() - t0

        timed(1)  # warm dispatch path
        best = min(
            (timed(3) - timed(1)) / (2 * frames)
            for _ in range(3)
        )
        results[layout] = best * 1000.0
        print(f"[layout] {layout:8s}: {best * 1e3:.3f} ms/frame",
              file=sys.stderr)
        drop_layout_state(layout)

    base = results["bthd"]
    for layout, ms in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{layout:8s} {ms:7.3f} ms/frame   {base / ms:5.2f}x vs bthd")


if __name__ == "__main__":
    main()
