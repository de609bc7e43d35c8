"""Native (C++) host library vs the pure-Python implementations."""

import os
import struct

import numpy as np
import pytest

from ptts_tpu import native
from ptts_tpu.io.wav import load_wav, quantize_i16
from ptts_tpu.tokenizer.spm import SentencePieceModel
from test_spm import BASIC_PIECES, WS, make_model

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


@pytest.fixture(scope="module")
def model_bytes():
    extra = [(chr(c), -25.0, 1) for c in range(ord("a"), ord("z") + 1)]
    extra += [(".", -3.0, 1), ("<laugh>", 0.0, 4)]
    return make_model(BASIC_PIECES + extra)


def test_native_tokenizer_matches_python(model_bytes):
    py = SentencePieceModel.from_bytes(model_bytes)
    nat = native.NativeTokenizer(model_bytes)
    assert nat.vocab_size == py.vocab_size
    prompts = [
        "hello world",
        "  hello   world  ",
        "how low",
        "hellz and <laugh> stuff",
        "héllo wörld",   # non-ASCII passthrough
        "",
        "h",
        "hello " * 50,   # long input
    ]
    for text in prompts:
        assert nat.encode(text) == py.encode(text), repr(text)
    for pid in range(py.vocab_size):
        assert nat.piece(pid) == py.piece(pid)


def test_native_tokenizer_charsmap(model_bytes):
    """XCDA replacement path: A -> a (same handcrafted trie as test_spm)."""
    from test_spm import _xcda_node

    arr = [0] * 70
    arr[0] = _xcda_node(0, 0, False)
    arr[65] = _xcda_node(65 ^ 2, 0x41, True)
    arr[2] = 0
    blob = struct.pack("<I", len(arr) * 4) + b"".join(struct.pack("<I", n) for n in arr)
    blob += b"a\x00"
    pieces = [("<unk>", 0.0, 2), ("a", -1.0, 1), ("b", -1.0, 1), (WS, -1.0, 1)]
    model = make_model(pieces, charsmap=blob, add_dummy_prefix=False,
                       remove_extra_whitespaces=False)
    py = SentencePieceModel.from_bytes(model)
    nat = native.NativeTokenizer(model)
    for text in ["A", "AbA", "bA", "aaa"]:
        assert nat.encode(text) == py.encode(text), repr(text)


def test_native_quantize_matches_python():
    rng = np.random.default_rng(0)
    s = (rng.standard_normal(10000) * 0.8).astype(np.float32)
    s[:4] = [2.0, -2.0, 1.0, -1.0]
    want = quantize_i16(s)
    got = native.quantize_i16(s)
    np.testing.assert_array_equal(got, want)


def test_native_wav_write(tmp_path):
    rng = np.random.default_rng(1)
    s = (rng.standard_normal(2400) * 0.5).astype(np.float32)
    path = str(tmp_path / "native.wav")
    assert native.wav_write(path, s, 24000, 1)
    back = load_wav(path)
    assert back.sample_rate == 24000
    np.testing.assert_allclose(back.samples, np.clip(s, -1, 1), atol=1.5 / 32767)

    # byte-identical with the python writer
    from ptts_tpu.io.wav import Audio, save_wav

    path2 = str(tmp_path / "python.wav")
    save_wav(Audio(24000, 1, s), path2)
    assert open(path, "rb").read() == open(path2, "rb").read()


def test_native_f16_matches_numpy():
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(1000).astype(np.float16)
    # add specials: zero, -zero, subnormals, inf, nan
    extras = np.array([0.0, -0.0, 6e-8, -6e-8, np.inf, -np.inf, np.nan],
                      np.float16)
    vals = np.concatenate([vals, extras])
    bits = vals.view(np.uint16)
    got = native.f16_to_f32(bits)
    want = vals.astype(np.float32)
    np.testing.assert_array_equal(
        np.nan_to_num(got, nan=12345.0), np.nan_to_num(want, nan=12345.0)
    )


def test_context_uses_native_by_default(tmp_path, monkeypatch):
    from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
    from ptts_tpu import api

    path, _, _ = write_model_dir(tmp_path / "m", seed=3)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    assert type(ctx.tokenizer).__name__ == "NativeTokenizer"

    monkeypatch.setenv("PTTS_NATIVE", "0")
    ctx2 = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    assert type(ctx2.tokenizer).__name__ == "SentencePieceModel"
    assert ctx.tokenize("hello world") == ctx2.tokenize("hello world")
