"""Cursor-blocked decode attention vs the full-read masked einsum.

decode_attention_blocked (ops/attention.py) is the OPT-IN long-cache
experiment path (flags.decode_impl='blocked'; 'auto' resolves to the masked
einsum, which measured 2.6x faster inside the AR while_loop -- flowlm.py
dispatch notes): it reads only cache blocks up to the cursor with an online
softmax, assuming a NON-WRAPPING cache (the continuous batcher's decode
ring rejects it at construction). These tests pin its validity semantics
(prefix | [start, cursor]) against the masked-einsum oracle -- the same
cases that guarded the removed round-1 Pallas kernel.
"""

import numpy as np

import jax.numpy as jnp

from helpers import assert_close
from ptts_tpu.ops.attention import (decode_attention_blocked,
                                    decode_attention_masked)


def _mask(prefix_len, start, cursor, Tmax):
    t = np.arange(Tmax)[None, :]
    return (t < prefix_len[:, None]) | (
        (t >= start[:, None]) & (t <= cursor)
    )


def _run_both(q, k, v, prefix_len, start, cursor, block_t):
    Tmax = k.shape[1]
    mask = jnp.asarray(_mask(prefix_len, start, cursor, Tmax))
    want = decode_attention_masked(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), mask)
    got = decode_attention_blocked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(prefix_len), jnp.asarray(start),
        jnp.asarray(cursor, jnp.int32), block_t=block_t,
    )
    return np.asarray(got), np.asarray(want)


def test_blocked_decode_matches_masked():
    B, Tmax, H, D = 8, 128, 4, 64
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((B, H, D)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D)) * 0.5).astype(np.float32)
    prefix = np.array([5, 60, 64, 64, 1, 33, 64, 17], np.int32)
    start = np.full(8, 64, np.int32)
    cursor = 99  # decode columns [64, 99]
    got, want = _run_both(q, k, v, prefix, start, cursor, block_t=64)
    assert_close(got, want, atol=2e-5, rtol=2e-5)


def test_blocked_decode_with_admission_gaps():
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
    got, want = _run_both(q, k, v, prefix, start, cursor, block_t=64)
    assert_close(got, want, atol=3e-5, rtol=3e-5)


def test_blocked_decode_never_reads_tail_garbage():
    """Values beyond the last cursor block must not affect the result at
    all -- the blocked path never reads them (even NaN there is safe)."""
    B, Tmax, H, D = 4, 256, 2, 64
    rng = np.random.default_rng(2)
    q = (rng.standard_normal((B, H, D))).astype(np.float32)
    k = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    v = (rng.standard_normal((B, Tmax, H, D))).astype(np.float32)
    prefix = np.array([10, 20, 30, 40], np.int32)
    start = np.full(4, 40, np.int32)
    cursor = 63  # exactly one 64-col block is live
    clean_got, want = _run_both(q, k, v, prefix, start, cursor, block_t=64)
    k_dirty = k.copy()
    v_dirty = v.copy()
    k_dirty[:, 64:] = np.nan  # never-read region
    v_dirty[:, 64:] = np.nan
    dirty_got = np.asarray(decode_attention_blocked(
        jnp.asarray(q), jnp.asarray(k_dirty), jnp.asarray(v_dirty),
        jnp.asarray(prefix), jnp.asarray(start),
        jnp.asarray(cursor, jnp.int32), block_t=64,
    ))
    assert np.isfinite(dirty_got).all()
    assert_close(dirty_got, clean_got, atol=0, rtol=0)
    assert_close(dirty_got, want, atol=3e-5, rtol=3e-5)


def test_generation_equal_einsum_vs_blocked():
    """Whole-generation equivalence: flags.decode_impl 'blocked' ==
    'einsum' on a tiny model (the production dispatch point)."""
    from helpers import TINY_FLOWLM as cfg
    from ptts_tpu.config import KernelFlags
    from ptts_tpu.models import flowlm

    w = flowlm.to_device(flowlm.random_weights(cfg, seed=3), jnp.float32, cfg)
    rng = np.random.default_rng(4)
    B, T0, F = 2, 8, 6
    prefix = jnp.asarray(rng.standard_normal((B, T0, cfg.d_model)) * 0.1,
                         jnp.float32)
    lengths = jnp.asarray([8, 5], jnp.int32)
    noise = jnp.asarray(rng.standard_normal((B, F, cfg.latent_dim)) * 0.5,
                        jnp.float32)

    outs = {}
    for impl in ("einsum", "blocked"):
        cache, x0 = flowlm.prefill_init(w, prefix, lengths, cfg, T0 + F)
        res = flowlm.generate_latents_while(
            w, cache, x0, noise, cfg, max_frames=F, num_steps=1,
            eos_threshold=1e9, eos_min_frames=1, eos_after=0,
            flags=KernelFlags(decode_impl=impl),
        )
        outs[impl] = np.asarray(res.latents)
    assert_close(outs["blocked"], outs["einsum"], atol=2e-5, rtol=2e-5)
