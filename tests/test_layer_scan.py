"""Layer-loop implementation equality: lax.scan over stacked weights vs the
unrolled Python loop.

The scan path exists to shrink the serving while_loop's HLO (~6x smaller
body -> the XLA compile drops from ~920 s to well under the 120 s budget,
VERDICT round-2 item 1). It must be numerically identical to the unrolled
path: same per-layer op sequence and order. XLA fuses the two program
forms differently (FMA/contraction choices), so equality is to ~1 ulp in
f32 (atol 1e-5 here, vs the 1e-3 executed parity gate), not bitwise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import TINY_FLOWLM, assert_close
from ptts_tpu.config import KernelFlags
from ptts_tpu.models import flowlm

SCAN = KernelFlags(layer_impl="scan")
UNROLL = KernelFlags(layer_impl="unroll")


@pytest.fixture(scope="module")
def weights():
    return flowlm.to_device(
        flowlm.random_weights(TINY_FLOWLM, seed=7, scale=0.3),
        jnp.float32, TINY_FLOWLM,
    )


def test_prefill_kv_scan_matches_unroll(weights):
    cfg = TINY_FLOWLM
    rng = np.random.default_rng(0)
    B, T = 3, 6
    x = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), jnp.float32)
    lengths = jnp.asarray([6, 4, 2], jnp.int32)

    k_s, v_s, last_s = flowlm.prefill_kv(weights, x, lengths, cfg, flags=SCAN)
    k_u, v_u, last_u = flowlm.prefill_kv(weights, x, lengths, cfg, flags=UNROLL)
    assert_close(k_s, k_u, atol=1e-5, rtol=1e-4, msg="prefill K scan!=unroll")
    assert_close(v_s, v_u, atol=1e-5, rtol=1e-4, msg="prefill V scan!=unroll")
    assert_close(last_s, last_u, atol=1e-5, rtol=1e-4, msg="prefill last scan!=unroll")


def test_decode_step_scan_matches_unroll(weights):
    cfg = TINY_FLOWLM
    rng = np.random.default_rng(1)
    B, T0, Tmax = 3, 4, 10
    x0 = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)), jnp.float32)
    lengths = jnp.asarray([4, 3, 2], jnp.int32)

    def roll(flags):
        cache, x = flowlm.prefill_init(weights, x0, lengths, cfg, Tmax,
                                       flags=flags)
        outs = []
        for i in range(3):
            nxt = jnp.asarray(
                np.random.default_rng(10 + i).standard_normal((B, cfg.d_model)),
                jnp.float32,
            )
            cache, x = flowlm.decode_step(weights, cache, nxt, cfg, flags)
            outs.append(x)
        return cache, jnp.stack(outs)

    cache_s, xs_s = roll(SCAN)
    cache_u, xs_u = roll(UNROLL)
    assert_close(xs_s, xs_u, atol=1e-5, rtol=1e-4, msg="decode x scan!=unroll")
    assert_close(cache_s.k, cache_u.k, atol=1e-5, rtol=1e-4, msg="decode K scan!=unroll")
    assert_close(cache_s.v, cache_u.v, atol=1e-5, rtol=1e-4, msg="decode V scan!=unroll")


def test_flow_net_scan_matches_unroll(weights):
    cfg = TINY_FLOWLM
    rng = np.random.default_rng(2)
    B = 4
    cond = jnp.asarray(rng.standard_normal((B, cfg.d_model)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((B, cfg.latent_dim)), jnp.float32)
    te = flowlm.lsd_time_embeds(weights, 3, cfg)

    lat_s, ff_s = flowlm.lsd_decode(weights, cond, te, noise, cfg, SCAN)
    lat_u, ff_u = flowlm.lsd_decode(weights, cond, te, noise, cfg, UNROLL)
    assert_close(lat_s, lat_u, atol=1e-5, rtol=1e-4, msg="lsd scan!=unroll")
    assert_close(ff_s, ff_u, atol=1e-5, rtol=1e-4, msg="first flow scan!=unroll")


def test_generate_latents_while_scan_matches_unroll(weights):
    """End-to-end: the serving while_loop path matches across impls."""
    cfg = TINY_FLOWLM
    rng = np.random.default_rng(3)
    B, T0, F = 2, 5, 8
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)), jnp.float32)
    lengths = jnp.asarray([5, 3], jnp.int32)
    noise = jnp.asarray(rng.standard_normal((B, F, cfg.latent_dim)), jnp.float32)

    def run(flags):
        cache, x0 = flowlm.prefill_init(weights, prefix, lengths, cfg,
                                        T0 + F, flags=flags)
        return flowlm.generate_latents_while(
            weights, cache, x0, noise, cfg, max_frames=F, num_steps=2,
            eos_threshold=1e9, flags=flags,
        )

    r_s = run(SCAN)
    r_u = run(UNROLL)
    assert_close(r_s.latents, r_u.latents, atol=1e-5, rtol=1e-4,
                 msg="while_loop latents scan!=unroll")
    assert_close(r_s.eos_logits, r_u.eos_logits, atol=1e-5, rtol=1e-4)
    assert_close(r_s.first_cond, r_u.first_cond, atol=1e-5, rtol=1e-4)
    assert_close(r_s.first_flow, r_u.first_flow, atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(r_s.frames_used),
                                  np.asarray(r_u.frames_used))
