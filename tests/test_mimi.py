"""Mimi decoder JAX path vs the NumPy oracle (tiny random checkpoint)."""

import numpy as np
import pytest

import jax.numpy as jnp

import refimpl
from helpers import TINY_MIMI, assert_close
from ptts_tpu.models import mimi

CFG = TINY_MIMI
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def weights():
    return mimi.random_weights(CFG, seed=5, scale=0.3)


@pytest.fixture(scope="module")
def dweights(weights):
    return mimi.to_device(weights, cfg=CFG)


def randn(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def test_frame_samples():
    assert CFG.frame_samples == CFG.upsample_stride * np.prod(CFG.ratios)
    from ptts_tpu.config import MimiConfig

    assert MimiConfig().frame_samples == 1920  # 16*6*5*4 (ptts.c:1113)
    assert MimiConfig().sample_rate == 24000


def test_transformer_windowed(weights, dweights):
    T = 12  # > context=5 so the window actually masks
    x = randn(T, CFG.d_model)
    want = refimpl.mimi_transformer(weights["_torch"]["transformer"], x, CFG)
    got = mimi.transformer(dweights["transformer"], jnp.asarray(x)[None], CFG)
    assert_close(got[0], want, atol=3e-5, rtol=3e-5)


def test_decode_matches_oracle(weights, dweights):
    frames = 3
    latents = randn(frames, CFG.latent_dim)
    want = refimpl.mimi_decode(weights["_torch"], latents, CFG)
    got = mimi.decode(dweights, jnp.asarray(latents)[None], CFG)
    assert got.shape == (1, frames * CFG.frame_samples)
    assert want.shape == (frames * CFG.frame_samples,)
    assert_close(got[0], want, atol=5e-5, rtol=5e-5)


def test_decode_batched_consistency(weights, dweights):
    """Batched decode == per-stream decode (batch independence)."""
    frames = 2
    lats = randn(4, frames, CFG.latent_dim)
    batched = np.asarray(mimi.decode(dweights, jnp.asarray(lats), CFG))
    for b in range(4):
        single = np.asarray(mimi.decode(dweights, jnp.asarray(lats[b])[None], CFG))
        assert_close(batched[b], single[0], atol=1e-5, msg=f"stream {b}")


def test_decode_with_local_attention_block(weights, dweights, monkeypatch):
    """Force the block-local windowed attention path in the full decoder and
    check it matches the naive path."""
    frames = 4  # upsample x2 -> T=8 200Hz positions
    latents = randn(1, frames, CFG.latent_dim)
    baseline = np.asarray(mimi.decode(dweights, jnp.asarray(latents), CFG))
    # block = max(4, context-1=4) = 4 >= context-1, T=8 > 4 -> local path
    monkeypatch.setattr(mimi, "LOCAL_ATTN_BLOCK", 4)
    mimi.decode.clear_cache()
    got = np.asarray(mimi.decode(dweights, jnp.asarray(latents), CFG))
    mimi.decode.clear_cache()
    assert_close(got, baseline, atol=3e-5, rtol=3e-5)
