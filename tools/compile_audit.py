"""Per-stage XLA/Mosaic compile-time audit for the serving pipeline.

Round-2 BENCH recorded a 920 s cold-start compile on the serving path
(BENCH_r02.json detail.compile_s) while the ragged-mode recompile of the
same while_loop took 4.8 s -- so the bulk is NOT the while_loop. This tool
lowers + compiles each pipeline stage separately (no persistent cache) and
prints wall seconds per stage, so the fix targets the real culprit.

Usage: python tools/compile_audit.py [--batch 256] [--frames 50] [--stage X]
Stages: prefill_pallas prefill_xla while_scalar while_vector scan mimi_pallas
        mimi_xla
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--stage", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = FlowLMConfig()
    mcfg = MimiConfig()
    B, frames = args.batch, args.frames
    T0 = 64
    frame_bucket = ((frames + 63) // 64) * 64
    max_len = T0 + frame_bucket

    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)) * 0.02, dtype)
    lengths = jnp.full((B,), T0, jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((B, frame_bucket, cfg.latent_dim)) * 0.8, dtype)

    def timeit(name, fn, *a, **kw):
        t0 = time.perf_counter()
        lowered = fn.lower(*a, **kw)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        print(f"[compile_audit] {name:16s} trace+lower={t1-t0:7.1f}s "
              f"compile={t2-t1:7.1f}s", flush=True)

    want = lambda s: args.stage in ("all", s)

    if want("prefill_pallas"):
        timeit("prefill_pallas", flowlm.prefill_init, fw, prefix, lengths,
               cfg, max_len, "pallas")
    if want("prefill_xla"):
        timeit("prefill_xla", flowlm.prefill_init, fw, prefix, lengths,
               cfg, max_len, "xla")

    cache = flowlm.make_cache(cfg, B, max_len, dtype)
    cache = cache._replace(prefix_len=lengths, start=jnp.full((B,), T0, jnp.int32),
                           cursor=jnp.asarray(T0, jnp.int32))
    x0 = jnp.zeros((B, cfg.d_model), dtype)
    budgets = jnp.full((B,), frames, jnp.int32)

    if want("while_scalar"):
        timeit("while_scalar", flowlm.generate_latents_while, fw, cache, x0,
               noise, cfg, max_frames=frame_bucket, num_steps=1,
               eos_threshold=1e9, eos_min_frames=1, eos_after=0,
               max_frames_per_stream=budgets)
    if want("while_vector"):
        cache2 = flowlm.make_cache(cfg, B, max_len, dtype)
        timeit("while_vector", flowlm.generate_latents_while, fw, cache2, x0,
               noise, cfg, max_frames=frame_bucket, num_steps=1,
               eos_threshold=-1e9, eos_min_frames=1,
               eos_after=jnp.zeros((B,), jnp.int32),
               max_frames_per_stream=budgets)
    if want("scan"):
        cache3 = flowlm.make_cache(cfg, B, max_len, dtype)
        timeit("scan", flowlm.generate_latents, fw, cache3, x0, noise, cfg,
               max_frames=frame_bucket, num_steps=1, eos_enabled=False)

    lat = jnp.zeros((B, frames, cfg.latent_dim), dtype)
    if want("mimi_pallas"):
        timeit("mimi_pallas", mimi._decode_jit, mw, lat, mcfg, "pallas")
    if want("mimi_xla"):
        timeit("mimi_xla", mimi._decode_jit, mw, lat, mcfg, "local")
    return 0


if __name__ == "__main__":
    sys.exit(main())
