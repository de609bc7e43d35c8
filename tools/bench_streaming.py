#!/usr/bin/env python3
"""Streaming latency benchmark: time-to-first-80ms-chunk and per-frame jitter.

North-star target (BASELINE.json): p50 first-chunk < 150 ms on TPU v5e.

Uses random full-size weights (no checkpoint needed); measures the real
serving path: batched prefill + first jitted FlowLM frame + first streaming
Mimi chunk, then steady-state per-frame latency over N frames.

    python tools/bench_streaming.py [--batch 64] [--frames 50]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--prefix", type=int, default=64)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi_stream
    from ptts_tpu.runtime.streaming import flow_frame_step

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = FlowLMConfig()
    mcfg = MimiConfig()
    B, T0, F = args.batch, args.prefix, args.frames

    fw = flowlm.to_device(flowlm.random_weights(cfg, 0), dt)
    mw = __import__("ptts_tpu.models.mimi", fromlist=["x"]).to_device(
        __import__("ptts_tpu.models.mimi", fromlist=["x"]).random_weights(mcfg, 1), dt
    )
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)) * 0.02, dt)
    lengths = jnp.full((B,), T0, jnp.int32)
    noise_all = jnp.asarray(
        rng.standard_normal((F, B, cfg.latent_dim)) * 0.8, dt
    )
    time_embs = flowlm.lsd_time_embeds(fw, 1, cfg)
    eos_after = jnp.zeros((B,), jnp.int32)

    def run_stream(measure_first: bool):
        first_chunk_ms = None
        frame_ms = []
        t_start = time.perf_counter()
        cache = flowlm.make_cache(cfg, B, T0 + F, dt)
        cache, x = flowlm.prefill(fw, cache, prefix, lengths, cfg)
        eos_step = jnp.full((B,), -1, jnp.int32)
        done = jnp.zeros((B,), jnp.bool_)
        state = mimi_stream.init_state(mw, mcfg, B, dt)
        for i in range(F):
            t0 = time.perf_counter()
            cache, x, scaled, eos, eos_step, done = flow_frame_step(
                fw, cache, x, noise_all[i], time_embs, jnp.int32(i),
                eos_step, done, cfg, False, -4.0, 1, eos_after,
            )
            state, pcm = mimi_stream.decode_stream(mw, state, scaled[:, None, :], mcfg)
            pcm.block_until_ready()
            now = time.perf_counter()
            if i == 0:
                first_chunk_ms = (now - t_start) * 1000
            else:
                frame_ms.append((now - t0) * 1000)
        return first_chunk_ms, frame_ms

    # compile everything once
    run_stream(measure_first=False)

    firsts, steady = [], []
    for _ in range(args.repeats):
        f, frames = run_stream(measure_first=True)
        firsts.append(f)
        steady.extend(frames)

    firsts = np.array(firsts)
    steady = np.array(steady)
    result = {
        "metric": "p50_time_to_first_chunk_ms",
        "value": round(float(np.percentile(firsts, 50)), 2),
        "unit": "ms",
        "vs_baseline": round(150.0 / float(np.percentile(firsts, 50)), 3),
        "detail": {
            "batch": B,
            "p90_first_ms": round(float(np.percentile(firsts, 90)), 2),
            "steady_frame_p50_ms": round(float(np.percentile(steady, 50)), 2),
            "steady_frame_p99_ms": round(float(np.percentile(steady, 99)), 2),
            "realtime_budget_ms_per_frame": 80.0,
            "dtype": args.dtype,
            "platform": jax.default_backend(),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
