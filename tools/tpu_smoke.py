"""Real-TPU smoke gates: accelerated paths vs their XLA references on chip.

The hermetic suite runs on CPU (Pallas in interpret mode); this tool is the
TPU analogue of the reference's MPS-vs-CPU unit test (SURVEY.md §2 #16,
/root/reference/tests/test_mps.c role): it runs the ACCELERATED serving
paths on the real chip at full model size and gates them against the plain
XLA formulations.

Gates (full-size random weights, bf16 unless noted):
  1. prefill: Pallas fused causal QKV kernel == XLA composition
     (ragged lengths; bf16 rel tolerance)
  2. mimi transformer: Pallas flat-lane window kernel == XLA block-local
  3. EOS while_loop: per-stream frame budgets honored, latents finite,
     matches the eos-disabled scan on the common frames
  4. full pipeline: PCM finite; device-side int16 quantization equals the
     host quantizer (io/wav.quantize_i16) bit-for-bit

Prints one JSON line {"gates": {...}, "ok": bool}. Exit 0 iff all pass.
Runs in ~2-4 min cold through the tunnel (compile dominated).

Usage: python tools/tpu_smoke.py [--batch 8] [--frames 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = float(np.max(np.abs(b))) or 1.0
    return float(np.max(np.abs(a - b))) / scale


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--tol", type=float, default=0.05,
                    help="bf16 rel tolerance for pallas-vs-xla gates")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.io import wav
    from ptts_tpu.runtime.streaming import quantize_i16_device
    from ptts_tpu.models import flowlm, mimi

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False, "error": "no TPU backend"}))
        return 77  # skip convention (golden harness style)

    dtype = jnp.bfloat16
    cfg, mcfg = FlowLMConfig(), MimiConfig()
    B, frames, T0 = args.batch, args.frames, 64
    frame_bucket = ((frames + 63) // 64) * 64
    max_len = T0 + frame_bucket

    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)
    rng = np.random.default_rng(0)
    prefix = jnp.asarray(
        rng.standard_normal((B, T0, cfg.d_model)) * 0.02, dtype)
    lengths = jnp.asarray(rng.integers(8, T0 + 1, size=B), jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((B, frame_bucket, cfg.latent_dim)) * 0.8, dtype)

    gates = {}

    # 1. prefill kernel vs XLA
    cache_p, x0_p = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len,
                                        "pallas")
    cache_x, x0_x = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len,
                                        "xla")
    gates["prefill_k_rel"] = rel_err(cache_p.k, cache_x.k)
    gates["prefill_x0_rel"] = rel_err(x0_p, x0_x)

    # 2. window kernel vs XLA block-local (T spans several key blocks)
    Tm = 800
    xm = jnp.asarray(rng.standard_normal((B, Tm, mcfg.d_model)) * 0.1, dtype)
    yp = mimi.transformer(mw["transformer"], xm, mcfg, window_impl="pallas")
    yl = mimi.transformer(mw["transformer"], xm, mcfg, window_impl="local")
    gates["window_rel"] = rel_err(yp, yl)

    # 3. EOS while_loop vs scan on per-stream budgets
    budgets = jnp.asarray(
        1 + (np.arange(B) * (frames - 1) // max(B - 1, 1)), jnp.int32)
    res_w = flowlm.generate_latents_while(
        fw, cache_p, x0_p, noise, cfg, max_frames=frame_bucket, num_steps=1,
        eos_threshold=1e9, eos_min_frames=1, eos_after=0,
        max_frames_per_stream=budgets)
    used = np.asarray(res_w.frames_used)
    lat = np.asarray(res_w.latents, np.float32)
    gates["while_budgets_ok"] = bool((np.minimum(used, np.asarray(budgets))
                                      == np.asarray(budgets)).all())
    gates["while_finite"] = bool(np.isfinite(
        lat[np.arange(B)[:, None], np.minimum(used - 1, frames - 1)[:, None]]
    ).all())

    # 4. full pipeline + device i16 quantization == host quantizer
    scaled = flowlm.scale_latents(fw, res_w.latents[:, :frames])
    pcm = np.asarray(mimi.decode(mw, scaled, mcfg), np.float32)
    gates["pcm_finite"] = bool(np.isfinite(pcm).all())
    dev_i16 = np.asarray(
        jax.jit(quantize_i16_device)(jnp.asarray(pcm)))
    host_i16 = wav.quantize_i16(pcm)
    gates["i16_bitexact"] = bool((dev_i16 == host_i16).all())

    ok = (gates["prefill_k_rel"] < args.tol
          and gates["prefill_x0_rel"] < args.tol
          and gates["window_rel"] < args.tol
          and gates["while_budgets_ok"] and gates["while_finite"]
          and gates["pcm_finite"] and gates["i16_bitexact"])
    print(json.dumps({"ok": bool(ok), "gates": gates}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
