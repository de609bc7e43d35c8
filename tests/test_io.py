"""Safetensors reader/writer + WAV container tests."""

import numpy as np
import pytest

from ptts_tpu.io.safetensors import SafetensorsFile, save_safetensors, _bf16_bits_to_f32
from ptts_tpu.io.wav import Audio, audio_create, load_wav, quantize_i16, save_wav


def test_safetensors_roundtrip(tmp_path):
    path = str(tmp_path / "t.safetensors")
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((3, 5)).astype(np.float32),
        "b.bias": rng.standard_normal((7,)).astype(np.float32),
        "c.f16": rng.standard_normal((2, 2, 2)).astype(np.float16),
        "d.ints": np.arange(6, dtype=np.int64).reshape(2, 3),
        "e.bf16": rng.standard_normal((4, 4)).astype(np.float32),
    }
    save_safetensors(path, tensors, bf16=["e.bf16"])

    with SafetensorsFile(path) as st:
        assert st.num_tensors == 5
        t = st.find("a.weight")
        assert t is not None and t.shape == (3, 5) and t.dtype == "F32"
        np.testing.assert_array_equal(st.get_f32(t), tensors["a.weight"])

        # F16 -> F32 is exact IEEE widening
        t16 = st.find("c.f16")
        np.testing.assert_array_equal(
            st.get_f32(t16), tensors["c.f16"].astype(np.float32)
        )

        # BF16: truncated f32 must round-trip through the <<16 conversion
        tb = st.find("e.bf16")
        assert tb.dtype == "BF16"
        expected = _bf16_bits_to_f32(
            (tensors["e.bf16"].view(np.uint32) >> np.uint32(16)).astype(np.uint16)
        )
        np.testing.assert_array_equal(st.get_f32(tb), expected)

        ti = st.find("d.ints")
        np.testing.assert_array_equal(st.view(ti), tensors["d.ints"])

        assert st.find("nope") is None
        assert "a.weight" in st.format_all()


def test_safetensors_header_errors(tmp_path):
    p = tmp_path / "bad.safetensors"
    p.write_bytes(b"\x01\x02")
    with pytest.raises(ValueError):
        SafetensorsFile(str(p))
    p.write_bytes(b"\xff\xff\xff\xff\xff\xff\xff\x00somejunk")
    with pytest.raises(ValueError):
        SafetensorsFile(str(p))


def test_wav_quantization_matches_reference_semantics():
    s = np.array([0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.5, 1e-9], dtype=np.float32)
    q = quantize_i16(s)
    # clamp then trunc(s * 32767)
    assert q[0] == 0
    assert q[1] == 32767
    assert q[2] == -32767
    assert q[3] == 32767  # clamped
    assert q[4] == -32767
    assert q[5] == int(0.5 * 32767)  # 16383 (truncation, not rounding)
    assert q[6] == -int(0.5 * 32767)
    assert q[7] == 0


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "t.wav")
    t = np.linspace(0, 1, 2400, dtype=np.float32)
    samples = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    audio = Audio(sample_rate=24000, channels=1, samples=samples)
    save_wav(audio, path)

    back = load_wav(path)
    assert back.sample_rate == 24000
    assert back.channels == 1
    assert back.num_samples == 2400
    np.testing.assert_allclose(back.samples, samples, atol=1.0 / 32767)

    # header bytes: RIFF size and data size fields
    raw = open(path, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert len(raw) == 44 + 2 * 2400


def test_audio_create():
    a = audio_create(24000, 1, 100)
    assert a.num_samples == 100
    assert a.duration == pytest.approx(100 / 24000)
    with pytest.raises(ValueError):
        audio_create(0, 1, 10)
