"""Streaming session == offline batch generation, chunk by chunk."""

import numpy as np
import pytest

from helpers import TINY_FLOWLM, TINY_MIMI, assert_close, write_model_dir
from ptts_tpu import api
from ptts_tpu.io import wav
from ptts_tpu.runtime.streaming import StreamingSession


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    d = tmp_path_factory.mktemp("streammodel")
    path, fw, mw = write_model_dir(d, seed=4)
    return api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)


@pytest.mark.slow
def test_streaming_matches_offline(ctx):
    """Streaming emits device-quantized int16; compare against the offline
    f32 audio pushed through the exact host quantizer (io/wav.quantize_i16,
    ptts_audio.c:82-88). Offline vs streaming f32 already agree to ~2e-4,
    i.e. ~7 LSB after *32767."""
    p = api.Params(num_frames=5, num_steps=1, seed=9, temp=0.6, eos_enabled=False)
    texts = ["hello world", "how low"]

    offline = ctx.engine.batch_generate(texts, params=p)

    session = StreamingSession.start(ctx.engine, texts, params=p)
    chunks = [c.pcm_i16 for c in session]
    assert len(chunks) == 5
    streamed = np.concatenate(chunks, axis=1)

    for b, audio in enumerate(offline):
        n = audio.num_samples
        ref = wav.quantize_i16(audio.samples)
        diff = np.abs(streamed[b, :n].astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 8, f"stream {b}: max {diff.max()} LSB"


@pytest.mark.slow
def test_context_stream_api_matches_generate(ctx):
    """api.Context.stream: one Audio chunk per frame; concatenation matches
    generate() for the same params (single stream -> same seed+0 noise)."""
    p = api.Params(num_frames=4, num_steps=1, seed=11, temp=0.5,
                   eos_enabled=False)
    chunks = list(ctx.stream("hello world", params=p))
    assert len(chunks) == 4
    fs = TINY_MIMI.frame_samples
    for c in chunks:
        assert c.pcm_i16.shape == (fs,)
        assert c.sample_rate == p.sample_rate
    streamed = np.concatenate([c.pcm_i16 for c in chunks])
    ref = wav.quantize_i16(ctx.generate("hello world", params=p).samples)
    diff = np.abs(streamed.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 8


def test_device_quantization_matches_host_bitexact():
    """quantize_i16_device == io/wav.quantize_i16 byte-for-byte, including
    the adversarial cases: out-of-range clamps, exact integer multiples,
    truncation toward zero for both signs, and +/-1.0 endpoints."""
    import jax.numpy as jnp

    from ptts_tpu.runtime.streaming import quantize_i16_device

    adversarial = np.array(
        [0.0, 1.0, -1.0, 1.5, -1.5, 0.99999, -0.99999,
         1.0 / 32767.0, -1.0 / 32767.0, 0.5, -0.5,
         np.float32(100.0 / 32767.0), -np.float32(100.0 / 32767.0),
         3.05e-5, -3.05e-5], np.float32)
    rng = np.random.default_rng(0)
    rand = (rng.standard_normal(4096) * 0.7).astype(np.float32)
    for samples in (adversarial, rand):
        dev = np.asarray(quantize_i16_device(jnp.asarray(samples)))
        host = wav.quantize_i16(samples)
        np.testing.assert_array_equal(dev, host)


def test_streaming_chunk_shape_and_framecount(ctx):
    p = api.Params(num_frames=3, num_steps=1, seed=1, temp=0.0, eos_enabled=False)
    session = StreamingSession.start(ctx.engine, ["hello"], params=p)
    chunk = session.step()
    assert chunk.pcm.shape == (1, TINY_MIMI.frame_samples)
    assert chunk.frame_index == 0
    total = 1
    for c in session:
        total += 1
    assert total == 3
    assert session.frames_used[0] == 3


def test_streaming_eos_stops_early(ctx):
    # threshold -inf forces EOS at min_frames; eos_after=1 -> stops at frame 2
    p = api.Params(num_frames=8, num_steps=1, seed=3, temp=0.4,
                   eos_enabled=True, eos_threshold=-1e9,
                   eos_min_frames=2, eos_after=1)
    session = StreamingSession.start(ctx.engine, ["hello"], params=p)
    chunks = list(session)
    # eos fires at frame idx 1; stop after frame idx 2 -> 3 chunks emitted
    assert len(chunks) == 3


def test_pipelined_equals_serial(ctx):
    """Double-buffered stepping (dispatch N+1 before reading N) must emit
    chunk-identical output to the serial path, including ragged EOS."""
    p = api.Params(num_frames=6, num_steps=1, seed=4, temp=0.5,
                   eos_enabled=True, eos_threshold=-1e9, eos_min_frames=2,
                   eos_after=1)
    texts = ["hello world", "how low"]
    serial = StreamingSession.start(ctx.engine, texts, params=p,
                                    pipeline=False)
    piped = StreamingSession.start(ctx.engine, texts, params=p,
                                   pipeline=True)
    cs = [c for c in serial]
    cp = [c for c in piped]
    assert len(cs) == len(cp)
    for a, b in zip(cs, cp):
        assert a.frame_index == b.frame_index
        assert np.array_equal(a.active, b.active)
        np.testing.assert_array_equal(a.pcm, b.pcm)
    np.testing.assert_array_equal(serial.frames_used, piped.frames_used)


def test_per_stream_frame_budgets(ctx):
    """A stream with a smaller requested num_frames stops emitting active
    chunks at ITS budget while the longer stream continues to the max."""
    p = api.Params(num_frames=0, num_steps=1, seed=3, temp=0.4,
                   eos_enabled=False)
    # num_frames=0 -> per-text estimate_frames; force explicit budgets via
    # the constructor instead for determinism
    from ptts_tpu.runtime.streaming import StreamingSession as S

    prefixes, eos_afters = [], []
    for text in ("hello world", "how low"):
        from ptts_tpu.text import prepare_text
        prepared, wc, guess = prepare_text(text)
        ids = ctx.engine.ctx.tokenize(prepared)
        cond, _ = ctx.engine._voice_cond(None)
        prefixes.append(ctx.engine._build_prefix(ids, cond))
        eos_afters.append(guess)
    sess = S(ctx.engine, prefixes, 5,
             api.Params(num_frames=5, num_steps=1, seed=3, temp=0.4,
                        eos_enabled=False).normalized(),
             np.asarray(eos_afters, np.int32),
             frames_each=np.asarray([2, 5], np.int32))
    chunks = [c for c in sess]
    assert len(chunks) == 5
    actives = np.stack([c.active for c in chunks])   # [5, 2]
    assert actives[:, 0].tolist() == [True, True, False, False, False]
    assert actives[:, 1].tolist() == [True] * 5
    assert sess.frames_used.tolist() == [2, 5]
