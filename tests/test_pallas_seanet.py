"""Fused SEANet decoder kernel vs the XLA conv stack (interpret mode).

The kernel is off by default in production (slower than XLA on v5e, see
PERF.md "fused SEANet experiment") but stays correctness-tested so the
opt-in path (PTTS_PALLAS_CONV=1) and any future perf round start green.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from helpers import TINY_MIMI as cfg
from helpers import assert_close
from ptts_tpu.models import mimi

seanet = pytest.importorskip("ptts_tpu.ops.pallas.seanet")


@pytest.fixture(scope="module")
def weights():
    return mimi.to_device(mimi.random_weights(cfg, seed=5, scale=0.3), cfg=cfg)


def test_halo_recurrence():
    # full-size geometry: k7 dec_in, ratios (6,5,4), k3 res, k3 out
    assert seanet._halo_frames(7, (6, 5, 4), 3, 3) == 8
    # tiny geometry used below
    assert seanet._halo_frames(cfg.kernel_size, tuple(cfg.ratios),
                               cfg.residual_kernel, cfg.last_kernel_size) == 7


@pytest.mark.parametrize("B,T,block,block_b", [(4, 20, 8, 2), (2, 7, 8, 1),
                                               (3, 17, 16, 2)])
def test_fused_seanet_matches_conv_stack(weights, B, T, block, block_b):
    """Multi-block, ragged-T, non-divisible-B cases; block 0's left edge
    must reproduce causal zero-padding exactly."""
    rng = np.random.default_rng(B * 100 + T)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)) * 0.5,
                    jnp.float32)
    want = np.asarray(mimi.conv_stack(weights, x, cfg))[..., 0]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            seanet.conv_stack_pallas(weights, x, cfg, block=block,
                                     block_b=block_b)
        )
    assert got.shape == want.shape
    assert_close(got, want, atol=2e-5, rtol=2e-5)


def test_decode_conv_impl_pallas_matches_xla(weights):
    """mimi.decode(conv_impl='pallas') == conv_impl='xla' end to end."""
    rng = np.random.default_rng(9)
    lat = jnp.asarray(rng.standard_normal((2, 9, cfg.latent_dim)) * 0.5,
                      jnp.float32)
    want = mimi.decode(weights, lat, cfg, window_impl="local",
                       conv_impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = mimi.decode(weights, lat, cfg, window_impl="local",
                          conv_impl="pallas")
    assert_close(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
