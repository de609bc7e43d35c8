"""Per-stage slope-fenced timing of the XLA SEANet conv stack on real TPU.

Answers: how much of the ~47 ms conv_stack call is the LAST stage + dec_out
(the narrow-channel, highest-sample-rate tail)? That tail is the candidate
for a blocked-layout fused Pallas kernel (ops/pallas/seanet_tail.py): in the
blocked [rows, s*C] form every tensor keeps >=128 lanes, which sidesteps the
masked-store/narrow-lane overheads that sank the full-fusion kernel
(PERF.md "fused SEANet experiment").

Usage: python tools/bench_seanet_split.py
Env:   PTTS_BENCH_BATCH (256), PTTS_BENCH_FRAMES (50), PTTS_BENCH_DTYPE (bf16)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import MimiConfig
    from ptts_tpu.models import mimi
    from ptts_tpu.ops.conv import conv1d_causal, convtr1d_2s, elu

    batch = int(os.environ.get("PTTS_BENCH_BATCH", "256"))
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "50"))
    dtype_name = os.environ.get("PTTS_BENCH_DTYPE", "bf16")
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    mcfg = MimiConfig()
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)
    T = frames * mcfg.upsample_stride  # 200 Hz frames entering the stack
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, T, mcfg.d_model)) * 0.1, dtype)

    def stack_prefix(w, x, n_stages: int, with_out: bool):
        x = conv1d_causal(x, w["dec_in_kernel"], w["dec_in_bias"])
        for st, ratio in zip(w["stages"][:n_stages], mcfg.ratios[:n_stages]):
            x = elu(x)
            x = convtr1d_2s(x, st["up_w1"], st["up_w2"], st["up_bias"],
                            stride=ratio)
            h = elu(x)
            h = conv1d_causal(h, st["res1_kernel"], st["res1_bias"])
            h = elu(h)
            h = conv1d_causal(h, st["res2_kernel"], st["res2_bias"])
            x = x + h
        if with_out:
            x = elu(x)
            x = conv1d_causal(x, w["dec_out_kernel"], w["dec_out_bias"])
        return x

    variants = {
        "dec_in only": (0, False),
        "through stage 1": (1, False),
        "through stage 2": (2, False),
        "through stage 3": (3, False),
        "full (+dec_out)": (3, True),
    }

    def fence(y):
        float(jnp.sum(y[:1, :8].astype(jnp.float32)))

    results = {}
    for name, (n, wo) in variants.items():
        fn = jax.jit(functools.partial(stack_prefix, n_stages=n, with_out=wo))
        y = fn(mw, x)
        fence(y)

        def chained(k):
            t0 = time.perf_counter()
            tap = jnp.zeros((), dtype)
            for _ in range(k):
                y = fn(mw, x + tap * 0)
                tap = y[0, 0, 0] * 0
            fence(y)
            return time.perf_counter() - t0

        chained(2)  # extra warmup: dispatch path + caches
        walls = []
        for _ in range(5):
            t1, t5 = chained(1), chained(5)
            walls.append((t5 - t1) / 4)
        results[name] = float(np.median(walls))
        print(f"{name:22s}: {results[name] * 1e3:8.2f} ms "
              f"(spread {min(walls)*1e3:.1f}..{max(walls)*1e3:.1f})",
              flush=True)

    full = results["full (+dec_out)"]
    s2 = results["through stage 2"]
    print(f"\nstage3+dec_out share: {(full - s2) * 1e3:.2f} ms "
          f"of {full * 1e3:.2f} ms total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
