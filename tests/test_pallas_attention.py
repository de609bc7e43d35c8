"""Pallas flash-decode attention vs the XLA path (interpret mode on CPU;
the same validate-both-paths discipline as the reference's
PTTS_CUDA_VALIDATE gate, Makefile:152-157)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import assert_close
from ptts_tpu.ops.attention import decode_attention_masked

pallas_mod = pytest.importorskip("ptts_tpu.ops.pallas.decode_attention")


def _mask(prefix_len, start, cursor, Tmax):
    t = np.arange(Tmax)[None, :]
    return (t < prefix_len[:, None]) | (
        (t >= start[:, None]) & (t <= cursor)
    )


def _run_both(q, k, v, prefix_len, start, cursor, block_t, block_b):
    from jax.experimental.pallas import tpu as pltpu

    Tmax = k.shape[1]
    mask = jnp.asarray(_mask(prefix_len, start, cursor, Tmax))
    want = decode_attention_masked(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), mask)
    with pltpu.force_tpu_interpret_mode():
        got = pallas_mod.decode_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(prefix_len), jnp.asarray(start),
            jnp.asarray(cursor, jnp.int32),
            block_t=block_t, block_b=block_b,
        )
    return np.asarray(got), np.asarray(want)


def test_pallas_decode_matches_xla():
    B, Tmax, H, D = 8, 128, 4, 64
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((B, H, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    prefix = np.array([5, 60, 64, 64, 1, 33, 64, 17], np.int32)
    start = np.full(8, 64, np.int32)
    cursor = 99  # decode columns [64, 99]
    got, want = _run_both(q, k, v, prefix, start, cursor, block_t=64, block_b=4)
    assert_close(got, want, atol=2e-5, rtol=2e-5)


def test_pallas_decode_with_admission_gaps():
    """Streams admitted at different cursors (continuous batching): gap
    between prefix and start must be masked, tail beyond cursor skipped."""
    B, Tmax, H, D = 8, 256, 2, 64
    rng = np.random.default_rng(1)
    q = (rng.standard_normal((B, H, D)) * 1.5).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D)) * 1.5).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    prefix = np.array([10, 64, 32, 5, 64, 1, 40, 64], np.int32)
    start = np.array([64, 64, 100, 130, 64, 190, 64, 100], np.int32)
    cursor = 193
    got, want = _run_both(q, k, v, prefix, start, cursor, block_t=64, block_b=8)
    assert_close(got, want, atol=3e-5, rtol=3e-5)


def test_pallas_skips_tail_blocks():
    """Stale (finite) garbage in masked/unread regions must not leak into
    results. (The cache only ever holds finite values -- retired streams
    leave stale K/V behind, never NaN.)"""
    B, Tmax, H, D = 4, 256, 2, 64
    rng = np.random.default_rng(2)
    q = (rng.standard_normal((B, H, D))).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    k[:, 80:] = 1e30  # huge stale garbage beyond the valid region
    v[:, 80:] = -1e30
    prefix = np.array([10, 20, 30, 40], np.int32)
    start = np.full(4, 40, np.int32)
    cursor = 64
    clean_k = k.copy()
    clean_v = v.copy()
    clean_k[:, 80:] = 0.0
    clean_v[:, 80:] = 0.0
    _, want = _run_both(q, clean_k, clean_v, prefix, start, cursor,
                        block_t=64, block_b=4)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_mod.decode_attention_pallas(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(prefix), jnp.asarray(start),
            jnp.asarray(cursor, jnp.int32), block_t=64, block_b=4,
        ))
    assert np.isfinite(got).all()
    assert_close(got, want, atol=3e-5, rtol=3e-5)


# The round-1 windowed (Mimi) kernel was superseded by the fused QKV kernel
# (ops/pallas/fused_attention.py, tested in test_pallas_fused.py) which beat
# it 86 ms vs 115 ms per transformer call at B=256, T=800 on v5e -- the
# dominated kernel was removed (VERDICT round 1, "win or cut").
