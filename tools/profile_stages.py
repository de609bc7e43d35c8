"""Per-stage DEVICE profiling of the serving pipeline on real TPU.

For each pipeline stage (prefill, AR frame loop, latent scale, Mimi upsample,
Mimi transformer, SEANet conv stack) this runs the stage under
jax.profiler.trace and prints the aggregated device-op table
(ptts_tpu/utils/profiling.py). This replaces slope-only attribution with real
device measurements -- the reference's PTTS_FLOWNET_PROFILE analogue
(ptts_cuda.c:1581-1673).

Usage:  python tools/profile_stages.py [stage ...]
        stages: prefill ar scale upsample transformer convstack all (default)
Env:    PTTS_BENCH_BATCH (256), PTTS_BENCH_FRAMES (50), PTTS_BENCH_DTYPE (bf16)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi
    from ptts_tpu.utils import profiling

    batch = int(os.environ.get("PTTS_BENCH_BATCH", "256"))
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "50"))
    dtype_name = os.environ.get("PTTS_BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    stages = sys.argv[1:] or ["all"]
    want = lambda s: "all" in stages or s in stages

    cfg = FlowLMConfig()
    mcfg = MimiConfig()
    T0 = 64
    frame_bucket = ((frames + 63) // 64) * 64
    max_len = T0 + frame_bucket

    pimpl = flowlm.resolve_prefill_impl()
    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((batch, T0, cfg.d_model)) * 0.02, dtype)
    lengths = jnp.full((batch,), T0, jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((batch, frame_bucket, cfg.latent_dim)) * 0.8, dtype
    )

    def fence(x):
        float(jnp.sum(x.astype(jnp.float32)))

    def profiled(label, fn, *args, warmup=2, iters=3):
        if not want(label):
            return None
        out = None
        for _ in range(warmup):
            out = fn(*args)
        fence(jax.tree.leaves(out)[0])
        with profiling.device_trace(label, force=True) as d:
            for _ in range(iters):
                out = fn(*args)
            fence(jax.tree.leaves(out)[0])
        print(f"\n=== {label} (x{iters}, divide totals by {iters}) ===")
        print(profiling.format_summary(d, n=18))
        return out

    # --- FlowLM ---
    def run_prefill():
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len, pimpl)
        return x0

    profiled("prefill", run_prefill)

    def run_ar():
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len, pimpl)
        res = flowlm.generate_latents_while(
            fw, cache, x0, noise, cfg, max_frames=frame_bucket, num_steps=1,
            eos_threshold=1e9, eos_min_frames=1, eos_after=0,
        )
        return res.latents

    lat = profiled("ar", run_ar)
    if lat is None:
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len, pimpl)
        lat = flowlm.generate_latents_while(
            fw, cache, x0, noise, cfg, max_frames=frame_bucket, num_steps=1,
            eos_threshold=1e9, eos_min_frames=1, eos_after=0,
        ).latents
    lat = lat[:, :frames]

    scaled = profiled(
        "scale", jax.jit(lambda w, l: flowlm.scale_latents(w, l)), fw, lat
    )
    if scaled is None:
        scaled = flowlm.scale_latents(fw, lat)

    # --- Mimi split ---
    win = mimi.resolve_window_impl()

    @jax.jit
    def up(w, l):
        x = jnp.einsum("...i,oi->...o", l, w["quant_w"],
                       preferred_element_type=jnp.float32).astype(l.dtype)
        from ptts_tpu.ops.conv import convtr1d_2s
        return convtr1d_2s(x, w["upsample_w1"], w["upsample_w2"], None,
                           stride=mcfg.upsample_stride, depthwise=True)

    x200 = profiled("upsample", up, mw, scaled)
    if x200 is None:
        x200 = up(mw, scaled)

    from functools import partial

    tr = jax.jit(partial(mimi.transformer, cfg=mcfg, window_impl=win))
    xt = profiled("transformer", lambda w, x: tr(w["transformer"], x), mw, x200)
    if xt is None:
        xt = tr(mw["transformer"], x200)

    cs = jax.jit(partial(mimi.conv_stack, cfg=mcfg))
    profiled("convstack", cs, mw, xt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
