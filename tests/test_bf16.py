"""bf16 compute-path quality gate.

The serving configuration runs bf16 on the MXU (bench.py); this test bounds
its drift against the f32 parity path so the perf dtype can't silently rot.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import TINY_FLOWLM, TINY_MIMI
from ptts_tpu.models import flowlm, mimi

CFG = TINY_FLOWLM
MCFG = TINY_MIMI


@pytest.mark.slow
def test_flowlm_bf16_close_to_f32():
    w = flowlm.random_weights(CFG, seed=1, scale=0.3)
    rng = np.random.default_rng(0)
    B, T0, FRAMES = 2, 4, 3
    prefix = (rng.standard_normal((B, T0, CFG.d_model)) * 0.3).astype(np.float32)
    noise = (rng.standard_normal((B, FRAMES, CFG.latent_dim)) * 0.5).astype(np.float32)
    lengths = np.full((B,), T0, np.int32)

    results = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        dw = flowlm.to_device(w, dt, CFG)
        cache = flowlm.make_cache(CFG, B, T0 + FRAMES, dt)
        cache, x0 = flowlm.prefill(dw, cache, jnp.asarray(prefix, dt),
                                   jnp.asarray(lengths), CFG)
        res = flowlm.generate_latents(
            dw, cache, x0, jnp.asarray(noise, dt), CFG,
            max_frames=FRAMES, num_steps=1, eos_enabled=False,
        )
        results[name] = np.asarray(res.latents, np.float32)

    diff = np.abs(results["bf16"] - results["f32"])
    scale = np.abs(results["f32"]).max() + 1e-6
    # bf16 has ~3 decimal digits; with 2 transformer layers the relative
    # drift should stay in the low-percent range
    assert diff.max() / scale < 0.08, f"bf16 drift too large: {diff.max() / scale}"


def test_mimi_bf16_close_to_f32():
    w = mimi.random_weights(MCFG, seed=2, scale=0.3)
    rng = np.random.default_rng(1)
    lat = (rng.standard_normal((2, 3, MCFG.latent_dim)) * 0.5).astype(np.float32)

    out = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        dw = mimi.to_device(w, dt, MCFG)
        out[name] = np.asarray(mimi.decode(dw, jnp.asarray(lat, dt), MCFG), np.float32)

    diff = np.abs(out["bf16"] - out["f32"])
    scale = np.abs(out["f32"]).max() + 1e-6
    assert diff.max() / scale < 0.08, f"bf16 drift too large: {diff.max() / scale}"
