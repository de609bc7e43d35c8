"""Pallas flash-decode attention vs the XLA path (interpret mode on CPU;
the same validate-both-paths discipline as the reference's
PTTS_CUDA_VALIDATE gate, Makefile:152-157)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import assert_close
from ptts_tpu.ops.attention import decode_attention

pallas_mod = pytest.importorskip("ptts_tpu.ops.pallas.decode_attention")


def _run_pallas_interpret(q, k, v, lengths, block_t=128, block_b=8):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return pallas_mod.decode_attention_pallas(
            q, k, v, lengths, block_t=block_t, block_b=block_b
        )


@pytest.mark.parametrize("lengths", [[5, 120, 64, 128, 1, 99, 128, 33]])
def test_pallas_decode_matches_xla(lengths):
    B, Tmax, H, D = 8, 128, 4, 64
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((B, H, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    ln = np.asarray(lengths, np.int32)

    want = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(ln))
    got = _run_pallas_interpret(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(ln), block_t=64, block_b=4)
    assert_close(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_pallas_decode_multi_tblock():
    """Lengths spanning several T blocks exercise the online softmax."""
    B, Tmax, H, D = 8, 256, 2, 64
    rng = np.random.default_rng(1)
    q = (rng.standard_normal((B, H, D)) * 1.5).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D)) * 1.5).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    ln = np.array([256, 130, 129, 255, 64, 65, 1, 200], np.int32)

    want = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(ln))
    got = _run_pallas_interpret(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(ln), block_t=64, block_b=8)
    assert_close(np.asarray(got), np.asarray(want), atol=3e-5, rtol=3e-5)
