"""CLI surface tests (flags/modes per /root/reference/main.c)."""

import functools

import numpy as np
import pytest

from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
from ptts_tpu import api, cli
from ptts_tpu.io.wav import load_wav


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("climodel")
    path, fw, mw = write_model_dir(d, seed=2)
    return path


@pytest.fixture(autouse=True)
def tiny_configs(monkeypatch):
    """Point the CLI's load_dir at the tiny test configs."""
    monkeypatch.setattr(
        cli.api, "load_dir",
        functools.partial(api.Context, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI),
    )


def test_dummy_generation(tmp_path, capsys):
    out = str(tmp_path / "dummy.wav")
    rc = cli.main(["--dummy", "-p", "hi", "-o", out, "-q"])
    assert rc == 0
    audio = load_wav(out)
    assert audio.num_samples > 0


def test_requires_prompt():
    assert cli.main(["-o", "x.wav"]) == 1
    assert cli.main(["-p", "hi"]) == 1


def test_info_list_find_tokens(model_dir, capsys):
    rc = cli.main(["--info", "--list", "--find", "flow_net", "--tokens",
                   "-p", "hello", "-d", model_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Pocket-TTS model info" in out
    assert "Tensors:" in out
    assert "flow_net.cond_embed.weight" in out
    assert "Tokens (" in out


def test_verify(model_dir, capsys):
    assert cli.main(["--verify", "-d", model_dir]) == 0


def test_verify_fails_on_wrong_checkpoint(tmp_path, capsys):
    from ptts_tpu.io.safetensors import save_safetensors

    save_safetensors(str(tmp_path / "w.safetensors"),
                     {"bogus": np.zeros((2, 2), np.float32)})
    assert cli.main(["--verify", "-d", str(tmp_path)]) == 1


def test_generate_wav(model_dir, tmp_path):
    out = str(tmp_path / "gen.wav")
    rc = cli.main(["-d", model_dir, "-p", "hello world", "-o", out,
                   "--frames", "3", "-S", "11", "-q"])
    assert rc == 0
    audio = load_wav(out)
    assert audio.sample_rate == 24000
    assert audio.num_samples % TINY_MIMI.frame_samples == 0


def test_flow_test_with_dumps(model_dir, tmp_path, capsys):
    latent_out = str(tmp_path / "lat.f32")
    cond_out = str(tmp_path / "cond.f32")
    flow_out = str(tmp_path / "flow.f32")
    rc = cli.main([
        "-d", model_dir, "-p", "hello", "--flow-test",
        "--frames", "2", "-S", "3", "-t", "0",
        "--latent-out", latent_out, "--cond-out", cond_out, "--flow-out", flow_out,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "FlowLM step: eos_logit=" in out

    lat = np.fromfile(latent_out, dtype="<f4")
    assert lat.size % TINY_FLOWLM.latent_dim == 0
    cond = np.fromfile(cond_out, dtype="<f4")
    assert cond.size == TINY_FLOWLM.d_model
    flow = np.fromfile(flow_out, dtype="<f4")
    assert flow.size == TINY_FLOWLM.latent_dim


def test_mimi_wave(model_dir, tmp_path, capsys):
    wav = str(tmp_path / "mimi.wav")
    rc = cli.main(["-d", model_dir, "-p", "hello", "--mimi-test", "--mimi-wave", wav,
                   "--frames", "2", "-S", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Mimi decode (transformer) stats:" in out
    audio = load_wav(wav)
    assert audio.num_samples == 2 * TINY_MIMI.frame_samples
