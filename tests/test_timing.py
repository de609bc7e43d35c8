"""Timing/observability subsystem (PTTS_TIMING analogue)."""

import importlib

import pytest

from ptts_tpu.utils import timing


def test_span_records_stats():
    stats = timing.Stats()
    with timing.span("unit", stats=stats):
        pass
    with timing.span("unit", stats=stats):
        pass
    s = stats.summary()
    assert s["unit"]["count"] == 2
    assert s["unit"]["total_ms"] >= 0
    stats.reset()
    assert stats.summary() == {}


def test_timing_env_gate(monkeypatch, capsys):
    monkeypatch.setattr(timing, "_enabled", None)
    monkeypatch.setenv("PTTS_TIMING", "1")
    with timing.span("gated", detail="x"):
        pass
    err = capsys.readouterr().err
    assert "[ptts] gated:" in err and "ms (x)" in err

    monkeypatch.setattr(timing, "_enabled", None)
    monkeypatch.setenv("PTTS_TIMING", "0")
    with timing.span("quiet"):
        pass
    assert "[ptts] quiet" not in capsys.readouterr().err


def test_engine_stats(tmp_path):
    from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
    from ptts_tpu import api

    path, _, _ = write_model_dir(tmp_path / "m", seed=12)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    ctx.generate("hello", params=api.Params(num_frames=2, seed=1))
    s = ctx.engine.stats()
    assert "FlowLM latents" in s
    assert "Mimi decode" in s
    assert s["FlowLM latents"]["count"] >= 1
