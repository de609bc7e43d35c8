#!/usr/bin/env python3
"""Streaming latency benchmark: time-to-first-80ms-chunk and per-frame cost.

North-star target (BASELINE.json): p50 first-chunk < 150 ms on TPU v5e.

Measures the real serving path: batched prefill + first jitted FlowLM frame +
first streaming-Mimi chunk, to the first PCM chunk LANDED ON THE HOST (the
point audio could be shipped to a client). Steady-state per-frame cost is a
slope between two chained frame counts with a host-readback fence -- through
the axon tunnel block_until_ready() is not a true execution fence, so all
timings here sync via readback and difference out the fixed readback latency.

    python tools/bench_streaming.py [--batch 256] [--frames 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--prefix", type=int, default=64)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi, mimi_stream
    from ptts_tpu.runtime.streaming import fused_stream_step

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = FlowLMConfig()
    mcfg = MimiConfig()
    B, T0, F = args.batch, args.prefix, args.frames

    fw = flowlm.to_device(flowlm.random_weights(cfg, 0), dt, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, 1), dt, mcfg)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)) * 0.02, dt)
    lengths = jnp.full((B,), T0, jnp.int32)
    noise_all = jnp.asarray(rng.standard_normal((F, B, cfg.latent_dim)) * 0.8, dt)
    time_embs = flowlm.lsd_time_embeds(fw, 1, cfg)
    eos_after = jnp.zeros((B,), jnp.int32)

    def run(n_frames: int, readback_first: bool) -> tuple:
        """Returns (time_to_first_chunk_s or None, total_s) with a final
        host-readback fence."""
        t_start = time.perf_counter()
        cache = flowlm.make_cache(cfg, B, T0 + F, dt)
        cache, x = flowlm.prefill(fw, cache, prefix, lengths, cfg)
        eos_step = jnp.full((B,), -1, jnp.int32)
        done = jnp.zeros((B,), jnp.bool_)
        state = mimi_stream.init_state(mw, mcfg, B, dt)
        first = None
        pcm = None
        for i in range(n_frames):
            (cache, state, x, pcm, eos, eos_step, done) = fused_stream_step(
                fw, mw, cache, state, x, noise_all[i], time_embs, jnp.int32(i),
                eos_step, done, cfg, mcfg, False, -4.0, 1, eos_after,
            )
            if i == 0 and readback_first:
                np.asarray(pcm)  # first chunk on the host
                first = time.perf_counter() - t_start
        float(jnp.sum(pcm[:1, :8].astype(jnp.float32)))  # fence
        return first, time.perf_counter() - t_start

    def run_readback(n_frames: int, pipelined: bool) -> float:
        """Per-frame HOST READBACK of every PCM chunk (the client-facing
        serving loop). pipelined=True double-buffers: dispatch frame i,
        start its async copy, then read frame i-1 -- the device computes
        frame i while chunk i-1 crosses to the host (VERDICT r1 #9)."""
        cache = flowlm.make_cache(cfg, B, T0 + F, dt)
        cache, x = flowlm.prefill(fw, cache, prefix, lengths, cfg)
        eos_step = jnp.full((B,), -1, jnp.int32)
        done = jnp.zeros((B,), jnp.bool_)
        state = mimi_stream.init_state(mw, mcfg, B, dt)
        pend = None
        t_start = time.perf_counter()
        for i in range(n_frames):
            (cache, state, x, pcm, eos, eos_step, done) = fused_stream_step(
                fw, mw, cache, state, x, noise_all[i], time_embs, jnp.int32(i),
                eos_step, done, cfg, mcfg, False, -4.0, 1, eos_after,
            )
            if pipelined:
                try:
                    pcm.copy_to_host_async()
                except Exception:
                    pass
                if pend is not None:
                    np.asarray(pend)
                pend = pcm
            else:
                np.asarray(pcm)
        if pend is not None:
            np.asarray(pend)
        return time.perf_counter() - t_start

    run(F, readback_first=False)  # compile

    firsts = []
    slopes = []
    rb_serial = []
    rb_piped = []
    half = max(F // 2, 1)
    for _ in range(args.repeats):
        first, _ = run(1, readback_first=True)
        firsts.append(first * 1000)
        _, t_half = run(half, readback_first=False)
        _, t_full = run(F, readback_first=False)
        slopes.append((t_full - t_half) / (F - half) * 1000)
        rb_serial.append(
            (run_readback(F, False) - run_readback(half, False))
            / (F - half) * 1000)
        rb_piped.append(
            (run_readback(F, True) - run_readback(half, True))
            / (F - half) * 1000)

    firsts = np.array(firsts)
    steady = np.array(slopes)
    p50_first = float(np.percentile(firsts, 50))
    result = {
        "metric": "p50_time_to_first_chunk_ms",
        "value": round(p50_first, 2),
        "unit": "ms",
        "vs_baseline": round(150.0 / p50_first, 3),
        "detail": {
            "batch": B,
            "p90_first_ms": round(float(np.percentile(firsts, 90)), 2),
            "steady_frame_ms": round(float(np.median(steady)), 3),
            "readback_frame_serial_ms": round(float(np.median(rb_serial)), 3),
            "readback_frame_pipelined_ms": round(float(np.median(rb_piped)), 3),
            "streaming_streams_per_chip": round(B * 80.0 / float(np.median(steady)), 0),
            "realtime_budget_ms_per_frame": 80.0,
            "dtype": args.dtype,
            "platform": jax.default_backend(),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
