"""Shared tiny configs + weight fixtures for hermetic tests."""

from __future__ import annotations

import numpy as np

from ptts_tpu.config import FlowLMConfig, MimiConfig

TINY_FLOWLM = FlowLMConfig(
    vocab=11,
    text_dim=16,
    d_model=16,
    num_heads=2,
    head_dim=8,
    num_layers=2,
    hidden=32,
    latent_dim=8,
    flow_dim=16,
    flow_depth=2,
    time_freqs=4,
)

TINY_MIMI = MimiConfig(
    latent_dim=8,
    d_model=8,
    num_heads=2,
    head_dim=4,
    num_layers=1,
    hidden=16,
    context=5,
    upsample_kernel=4,
    upsample_stride=2,
    n_filters=4,
    ratios=(3, 2),
    kernel_size=5,
    last_kernel_size=3,
    residual_kernel=3,
    compress=2,
)


def assert_close(a, b, atol=1e-5, rtol=1e-5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)
