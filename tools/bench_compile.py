"""Cold-start compile breakdown of the serving path (VERDICT r2 #1).

Times the FIRST call of each separately-jitted serving stage (prefill,
AR while_loop, scan generator, vocoder, fused streaming step, batcher
admission) with the persistent compile cache DISABLED, so each number is
that stage's true cold XLA/Mosaic compile + one execution. Execution is
milliseconds at these shapes; compile dominates every number > ~1 s.

Usage: python tools/bench_compile.py [B] [frames]
Env:   PTTS_COMPILE_BREAKDOWN_CACHE=1 keeps the persistent cache on
       (measures the warm path instead).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("PTTS_COMPILE_BREAKDOWN_CACHE") == "1":
    cache_dir = os.path.expanduser("~/.cache/ptts_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

from ptts_tpu.config import FlowLMConfig, KernelFlags, MimiConfig  # noqa: E402
from ptts_tpu.models import flowlm, mimi, mimi_stream  # noqa: E402
from ptts_tpu.runtime.streaming import fused_stream_step  # noqa: E402


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dtype = jnp.bfloat16
    cfg, mcfg = FlowLMConfig(), MimiConfig()
    flags = KernelFlags()
    T0 = 64
    frame_bucket = ((frames + 63) // 64) * 64
    max_len = T0 + frame_bucket

    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)
    pimpl = flowlm.resolve_prefill_impl()

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)) * 0.02,
                         dtype)
    lengths = jnp.full((B,), T0, jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((B, frame_bucket, cfg.latent_dim)) * 0.8, dtype)

    def fence(x):
        float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"[compile] {label:28s} {dt:8.1f} s", file=sys.stderr)
        return out

    # 0. the bare Pallas prefill kernel (attributes Mosaic compile time
    # separately from the surrounding 6-layer prefill program)
    if pimpl == "pallas":
        from ptts_tpu.ops.pallas.fused_attention import causal_attention_qkv

        qkv = jnp.asarray(
            rng.standard_normal((B, T0, 3 * cfg.d_model)) * 0.02, dtype)

        def run_kernel():
            out, k_rot = causal_attention_qkv(
                qkv, lengths, num_heads=cfg.num_heads, head_dim=cfg.head_dim,
                max_period=cfg.max_period)
            fence(out[:1, :1, :8])

        timed("causal_attention_qkv alone", run_kernel)

    # 1. prefill (Pallas fused QKV kernel on TPU)
    def run_prefill():
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len,
                                        pimpl)
        fence(x0)
        return cache, x0

    cache, x0 = timed(f"prefill_init[{pimpl}]", run_prefill)

    # 1b. the XLA-path prefill for comparison
    def run_prefill_xla():
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len,
                                        "xla")
        fence(x0)

    timed("prefill_init[xla]", run_prefill_xla)

    # 2. AR while_loop with full EOS bookkeeping (the serving generator)
    def run_while():
        res = flowlm.generate_latents_while(
            fw, cache, x0, noise, cfg, max_frames=frame_bucket, num_steps=1,
            eos_threshold=1e9, eos_min_frames=1, eos_after=0,
            max_frames_per_stream=jnp.full((B,), frames, jnp.int32),
        )
        fence(res.latents[:1, :1])
        return res

    res = timed("generate_latents_while", run_while)

    # 3. fixed-length scan generator (eos=off path)
    def run_scan():
        cache2, x2 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len,
                                         pimpl)
        r = flowlm.generate_latents(fw, cache2, x2, noise, cfg,
                                    max_frames=frame_bucket, num_steps=1,
                                    eos_enabled=False)
        fence(r.latents[:1, :1])
        return r

    timed("generate_latents (scan)", run_scan)

    # 4. vocoder (scale + whole-sequence Mimi decode)
    import functools

    @functools.partial(jax.jit)
    def scale_and_decode(fw_, mw_, lat):
        return mimi.decode(mw_, flowlm.scale_latents(fw_, lat[:, :frames]),
                           mcfg)

    timed("scale+mimi.decode", lambda: fence(
        scale_and_decode(fw, mw, res.latents)[:1, :8]))

    # 5. fused streaming step (batcher/streaming serving frame).
    # Fresh cache: stages 2's donation consumed the prefill one.
    cache5, x5 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len, pimpl)
    st = mimi_stream.init_state(mw, mcfg, B, dtype)
    te = flowlm.lsd_time_embeds(fw, 1, cfg)
    te_b = jnp.broadcast_to(te[None], (B,) + te.shape)

    def run_fused():
        out = fused_stream_step(
            fw, mw, cache5, st, x5, noise, te_b,
            jnp.zeros((B,), jnp.int32),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.bool_),
            cfg, mcfg, True,
            jnp.full((B,), 1e30, jnp.float32), jnp.ones((B,), jnp.int32),
            jnp.zeros((B,), jnp.int32), jnp.full((B,), frames, jnp.int32),
            jnp.ones((B,), jnp.int32), flags=flags, emit_i16=True,
        )
        fence(out[3][:1, :8])

    timed("fused_stream_step", run_fused)


if __name__ == "__main__":
    main()
