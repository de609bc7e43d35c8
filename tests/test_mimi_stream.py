"""Streaming Mimi == full-sequence Mimi, chunk by chunk."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import TINY_MIMI, assert_close
from ptts_tpu.config import MimiConfig
from ptts_tpu.models import mimi, mimi_stream

CFG = TINY_MIMI
RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def dweights():
    return mimi.to_device(mimi.random_weights(CFG, seed=5, scale=0.3), cfg=CFG)


def randn(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


@pytest.mark.parametrize("chunk", [1, 2, 3])
def test_chunked_equals_full(dweights, chunk):
    B, frames = 2, 6
    latents = randn(B, frames, CFG.latent_dim)
    full = np.asarray(mimi.decode(dweights, jnp.asarray(latents), CFG))

    state = mimi_stream.init_state(dweights, CFG, B)
    chunks = []
    for f0 in range(0, frames, chunk):
        state, pcm = mimi_stream.decode_stream(
            dweights, state, jnp.asarray(latents[:, f0 : f0 + chunk]), CFG
        )
        chunks.append(np.asarray(pcm))
    streamed = np.concatenate(chunks, axis=1)

    assert streamed.shape == full.shape
    assert_close(streamed, full, atol=5e-5, rtol=5e-5)


def test_streaming_past_context_window(dweights):
    """Stream more positions than the attention window + ring size to verify
    the ring-buffer masking matches the full decoder's sliding window."""
    # context=5, upsample_stride=2 -> 5 frames ~ 10 positions; run 40 frames so
    # the ring wraps (RING=384 won't wrap with tiny cfg; shrink via monkeypatch
    # is intrusive -- instead verify long-sequence equality which exercises the
    # window mask thoroughly).
    B, frames = 1, 40
    latents = randn(B, frames, CFG.latent_dim)
    full = np.asarray(mimi.decode(dweights, jnp.asarray(latents), CFG))

    state = mimi_stream.init_state(dweights, CFG, B)
    outs = []
    for f0 in range(0, frames, 4):
        state, pcm = mimi_stream.decode_stream(
            dweights, state, jnp.asarray(latents[:, f0 : f0 + 4]), CFG
        )
        outs.append(np.asarray(pcm))
    streamed = np.concatenate(outs, axis=1)
    assert_close(streamed, full, atol=1e-4, rtol=1e-4)


def test_ring_wraparound(dweights, monkeypatch):
    """Force the ring to wrap by shrinking RING below the streamed length."""
    monkeypatch.setattr(mimi_stream, "RING", 16)
    # context=5 positions at 200 Hz; ring of 16 > 5 + chunk(2*2=4). Stream 20
    # frames = 40 positions -> wraps twice.
    B, frames = 1, 20
    latents = randn(B, frames, CFG.latent_dim)
    full = np.asarray(mimi.decode(dweights, jnp.asarray(latents), CFG))

    state = mimi_stream.init_state(dweights, CFG, B)
    outs = []
    for f0 in range(0, frames, 2):
        state, pcm = mimi_stream.decode_stream(
            dweights, state, jnp.asarray(latents[:, f0 : f0 + 2]), CFG
        )
        outs.append(np.asarray(pcm))
    streamed = np.concatenate(outs, axis=1)
    assert_close(streamed, full, atol=1e-4, rtol=1e-4)


def test_chunk_sizes_agree(dweights):
    """Different chunkings must produce identical streams."""
    B, frames = 1, 6
    latents = randn(B, frames, CFG.latent_dim)

    def stream(chunk):
        state = mimi_stream.init_state(dweights, CFG, B)
        outs = []
        for f0 in range(0, frames, chunk):
            state, pcm = mimi_stream.decode_stream(
                dweights, state, jnp.asarray(latents[:, f0 : f0 + chunk]), CFG
            )
            outs.append(np.asarray(pcm))
        return np.concatenate(outs, axis=1)

    assert_close(stream(1), stream(3), atol=3e-5, rtol=3e-5)
