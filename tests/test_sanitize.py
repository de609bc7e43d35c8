"""Sanitizer subsystem (utils/sanitize.py): stage-boundary finite guards,
weight-tree checks, and the engine integration.

Role of the reference's cuda-sanitize / PTTS_CUDA_VALIDATE pair
(/root/reference/Makefile:159-160, ptts_cuda.c:1095-1110); the full
interpret-mode sweep lives in tools/sanitize.py (`make sanitize`)."""

from __future__ import annotations

import numpy as np
import pytest

from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
from ptts_tpu.utils import sanitize


@pytest.fixture
def sanitizing():
    sanitize.set_enabled(True)
    yield
    sanitize.set_enabled(None)


def test_disabled_is_noop():
    sanitize.set_enabled(False)
    try:
        # would raise if the guard ran
        sanitize.check_finite("x", np.array([np.nan]))
        sanitize.check_tree("x", {"w": np.array([np.inf])})
    finally:
        sanitize.set_enabled(None)


def test_check_finite_passes_clean(sanitizing):
    sanitize.check_finite("s", np.zeros(3), np.ones((2, 2), np.float16), None)


def test_check_finite_catches_nan_and_inf(sanitizing):
    with pytest.raises(sanitize.SanitizeError, match="stage 'lat'"):
        sanitize.check_finite("lat", np.array([[0.0, np.nan]]),
                              names=("latents",))
    with pytest.raises(sanitize.SanitizeError, match="index \\(1,\\)"):
        sanitize.check_finite("pcm", np.array([0.0, np.inf]))


def test_check_finite_bf16(sanitizing):
    import jax.numpy as jnp

    ok = jnp.zeros((4, 4), jnp.bfloat16)
    sanitize.check_finite("bf16", ok)
    bad = jnp.full((2,), jnp.nan, jnp.bfloat16)
    with pytest.raises(sanitize.SanitizeError):
        sanitize.check_finite("bf16", bad)


def test_integers_always_pass(sanitizing):
    sanitize.check_finite("ints", np.array([1, 2], np.int32),
                          np.array([True, False]))


def test_check_tree_names_the_tensor(sanitizing):
    tree = {"a": np.zeros(2), "nested": {"b": np.array([1.0, np.nan])},
            "opt": None}
    with pytest.raises(sanitize.SanitizeError, match="'b'"):
        sanitize.check_tree("load", tree)


def test_engine_rejects_corrupt_checkpoint(tmp_path, sanitizing):
    """A NaN planted in the checkpoint must fail engine construction with
    the tensor's name (the reference's verifier only checks shapes,
    ptts.c:586-776 -- value-level corruption there reaches generation)."""
    from ptts_tpu import api
    from ptts_tpu.models import flowlm as flowlm_mod
    from ptts_tpu.runtime.engine import TTSEngine

    path, fw, mw = write_model_dir(tmp_path / "m", seed=5)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)

    orig = flowlm_mod.load_weights

    def poisoned(st, cfg):
        w = dict(orig(st, cfg))
        w["emb_std"] = np.array(w["emb_std"], np.float32)
        w["emb_std"][0] = np.nan
        return w

    flowlm_mod.load_weights = poisoned
    try:
        with pytest.raises(sanitize.SanitizeError, match="emb_std"):
            TTSEngine(ctx)
    finally:
        flowlm_mod.load_weights = orig


def test_engine_clean_generate_stays_silent(tmp_path, sanitizing):
    from ptts_tpu import api
    from ptts_tpu.runtime.engine import TTSEngine

    path, _, _ = write_model_dir(tmp_path / "m", seed=6)
    ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)
    eng = TTSEngine(ctx)
    audio = eng.generate("Hello", params=api.Params(num_frames=3, seed=1,
                                                    num_steps=1))
    assert np.isfinite(audio.samples).all()
