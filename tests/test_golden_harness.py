"""Golden/parity harness machinery tests (self-consistency; real-asset runs
skip automatically in this zero-egress environment)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import hello_world_test as hw  # noqa: E402


def test_metrics_identical_signals():
    t = np.linspace(0, 1, 24000).astype(np.float32)
    x = 0.3 * np.sin(2 * np.pi * 220 * t)
    m = hw.compare(x, x.copy())
    assert m["stft_logmag_mse"] < 1e-8
    assert m["duration_diff_s"] == 0
    assert abs(m["rms_ratio"] - 1) < 1e-6
    assert m["corr"] > 0.99
    assert hw.gates_pass(m)


def test_metrics_lag_alignment():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(30000).astype(np.float32) * 0.1
    shifted = np.concatenate([np.zeros(500, np.float32), base])[:30000]
    m = hw.compare(base, shifted)
    assert abs(m["lag"]) <= 525 and m["corr"] > 0.8


def test_metrics_detect_garbage():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 24000).astype(np.float32)
    speechish = (0.3 * np.sin(2 * np.pi * 220 * t) *
                 (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    silence = np.zeros(24000, np.float32) + 1e-5
    m = hw.compare(silence, speechish)
    assert not hw.gates_pass(m)


def test_harness_skips_without_assets(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PTTS_MODEL_DIR="")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "hello_world_test.py"),
         "--ref", str(tmp_path / "missing.wav")],
        capture_output=True, env=env,
    )
    assert r.returncode == 77

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "flowlm_parity.py"),
         "--model-dir", str(tmp_path / "nope")],
        capture_output=True, env=env,
    )
    assert r.returncode == 77


def test_golden_gate_against_reference_wav_selfcheck():
    """The checked-in reference WAV must pass the gates against itself."""
    ref = "/root/reference/pocket-tts-hello-world.wav"
    if not os.path.isfile(ref):
        pytest.skip("reference golden wav not present")
    from ptts_tpu.io.wav import load_wav

    audio = load_wav(ref)
    assert audio.sample_rate == 24000
    m = hw.compare(np.asarray(audio.samples), np.asarray(audio.samples))
    assert hw.gates_pass(m)


def test_parity_harness_dump_compare(tmp_path):
    """--other-dumps mode: engine vs its own dumps must report ~0 diff."""
    from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
    import functools
    from ptts_tpu import api, cli

    path, _, _ = write_model_dir(tmp_path / "m", seed=8)
    # route the harness CLI at tiny configs
    orig = api.load_dir
    cli.api.load_dir = functools.partial(
        api.Context, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI
    )
    try:
        import flowlm_parity as fp

        ours = fp.run_ours(path, "hello world", 2, 7, str(tmp_path))
        for k, v in ours.items():
            v.astype("<f4").tofile(str(tmp_path / f"{k}.f32"))
        again = fp.run_ours(path, "hello world", 2, 7, str(tmp_path))
        assert fp.report("latents", ours["latents"], again["latents"]) == 0.0
    finally:
        cli.api.load_dir = orig
