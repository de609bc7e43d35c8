"""Fused-attention Pallas kernels vs their XLA compositions (interpret mode
on CPU; same validate-both-paths discipline as test_pallas_attention.py).

Covers:
  * ops/pallas/fused_attention.window_attention_qkv -- RoPE-in-kernel
    sliding-window attention off the raw QKV projection (Mimi transformer)
  * ops/pallas/fused_attention.causal_attention_qkv -- RoPE-in-kernel
    full-causal + lengths mask off the raw QKV projection (FlowLM prefill),
    emitting rotated K as a second output for the KV cache

Oracles are the existing ops (rope_rotate_halves + causal/windowed
attention), which are themselves oracle-tested against NumPy in
tests/test_ops.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from helpers import assert_close
from ptts_tpu.ops.attention import causal_attention, windowed_attention_local
from ptts_tpu.ops.rope import rope_rotate_halves

fused = pytest.importorskip("ptts_tpu.ops.pallas.fused_attention")


def _qkv_split(qkv, H, D):
    """[B, T, 3HD] -> q/k/v [B, T, H, D] (flowlm._split_qkv layout)."""
    B, T, _ = qkv.shape
    d = H * D
    q = qkv[..., :d].reshape(B, T, H, D)
    k = qkv[..., d : 2 * d].reshape(B, T, H, D)
    v = qkv[..., 2 * d :].reshape(B, T, H, D)
    return q, k, v


# -- fused QKV kernels (RoPE in-kernel) ---------------------------------------


def test_causal_attention_qkv_masks_padding_garbage():
    """Stale finite values beyond each stream's length must not leak into
    the attention output (the cache DOES store them; masked at read time)."""
    B, T, H, D = 2, 32, 1, 64
    rng = np.random.default_rng(1)
    qkv = (rng.standard_normal((B, T, 3 * H * D)) * 0.5).astype(np.float32)
    lens = np.array([7, 20], np.int32)
    qkv_dirty = qkv.copy()
    for b, n in enumerate(lens):
        qkv_dirty[b, n:, H * D :] = 1e20  # poison padded K and V rows
    q, k, v = _qkv_split(jnp.asarray(qkv), H, D)
    pos = jnp.arange(T)[None, :]
    q, k = rope_rotate_halves(q, k, pos, 10000.0)
    want = np.asarray(
        causal_attention(q, k, v, lengths=jnp.asarray(lens))
    ).reshape(B, T, H * D)
    with pltpu.force_tpu_interpret_mode():
        got, _ = fused.causal_attention_qkv(
            jnp.asarray(qkv_dirty), jnp.asarray(lens), num_heads=H,
            head_dim=D, block_b=2,
        )
    got = np.asarray(got)
    for b, n in enumerate(lens):
        assert np.isfinite(got[b]).all()
        assert_close(got[b, :n], want[b, :n], atol=3e-5, rtol=3e-5)


def _window_oracle(qkv, H, D, context, max_period):
    q, k, v = _qkv_split(jnp.asarray(qkv), H, D)
    B, T = q.shape[:2]
    pos = jnp.arange(T)[None, :]
    q, k = rope_rotate_halves(q, k, pos, max_period)
    return np.asarray(
        causal_attention(q, k, v, context=context).reshape(B, T, H * D)
    )


@pytest.mark.parametrize(
    "B,T,context,block,block_b",
    [(2, 40, 5, 8, 2), (3, 37, 9, 16, 1), (4, 16, 17, 16, 4)],
)
def test_window_attention_qkv_matches_composition(B, T, context, block, block_b):
    H, D = 2, 64
    rng = np.random.default_rng(2)
    qkv = (rng.standard_normal((B, T, 3 * H * D)) * 0.5).astype(np.float32)
    want = _window_oracle(qkv, H, D, context, 10000.0)
    with pltpu.force_tpu_interpret_mode():
        got = fused.window_attention_qkv(
            jnp.asarray(qkv), num_heads=H, head_dim=D, context=context,
            block=block, block_b=block_b,
        )
    assert_close(np.asarray(got), want, atol=5e-5, rtol=5e-5)


def test_window_attention_qkv_multiblock_matches_local():
    """T spanning several key blocks: equals windowed_attention_local."""
    B, T, H, D, context, block = 2, 70, 2, 64, 9, 16
    rng = np.random.default_rng(3)
    qkv = (rng.standard_normal((B, T, 3 * H * D)) * 0.5).astype(np.float32)
    q, k, v = _qkv_split(jnp.asarray(qkv), H, D)
    pos = jnp.arange(T)[None, :]
    q, k = rope_rotate_halves(q, k, pos, 10000.0)
    want = np.asarray(
        windowed_attention_local(q, k, v, context=context, block=block)
    ).reshape(B, T, H * D)
    with pltpu.force_tpu_interpret_mode():
        got = fused.window_attention_qkv(
            jnp.asarray(qkv), num_heads=H, head_dim=D, context=context,
            block=block, block_b=2,
        )
    assert_close(np.asarray(got), want, atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("lengths", [[5, 33, 64, 17], [64, 64, 64, 64]])
def test_causal_attention_qkv_matches_composition(lengths):
    B, T, H, D = 4, 64, 2, 64
    rng = np.random.default_rng(4)
    qkv = (rng.standard_normal((B, T, 3 * H * D)) * 0.5).astype(np.float32)
    lens = np.asarray(lengths, np.int32)
    q, k, v = _qkv_split(jnp.asarray(qkv), H, D)
    pos = jnp.arange(T)[None, :]
    q, k = rope_rotate_halves(q, k, pos, 10000.0)
    B_, T_ = q.shape[:2]
    want = np.asarray(
        causal_attention(q, k, v, lengths=jnp.asarray(lens)).reshape(B_, T_, H * D)
    )
    with pltpu.force_tpu_interpret_mode():
        got, k_rot = fused.causal_attention_qkv(
            jnp.asarray(qkv), jnp.asarray(lens), num_heads=H, head_dim=D,
            block_b=2,
        )
    got = np.asarray(got)
    want_k = np.asarray(k).reshape(B, T, H * D)
    for b, n in enumerate(lens):
        assert_close(got[b, :n], want[b, :n], atol=5e-5, rtol=5e-5)
    # rotated K (cache input) matches the XLA rope on ALL positions --
    # the cache stores padded columns too (masked at read time)
    assert_close(np.asarray(k_rot), want_k, atol=5e-5, rtol=5e-5)


def test_prefill_kv_pallas_matches_xla():
    """flowlm.prefill_kv(attn_impl='pallas') == 'xla' on the valid region
    AND the cached K/V (all positions -- the cache stores padded columns)."""
    from helpers import TINY_FLOWLM as cfg
    from ptts_tpu.models import flowlm

    w = flowlm.to_device(flowlm.random_weights(cfg, seed=7), jnp.float32, cfg)
    rng = np.random.default_rng(8)
    B, T = 4, 16
    x = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)) * 0.1,
                    jnp.float32)
    lens = jnp.asarray([16, 3, 9, 16], jnp.int32)
    k_x, v_x, last_x = flowlm.prefill_kv(w, x, lens, cfg, "xla")
    with pltpu.force_tpu_interpret_mode():
        k_p, v_p, last_p = flowlm.prefill_kv(w, x, lens, cfg, "pallas")
    assert_close(np.asarray(k_p), np.asarray(k_x), atol=1e-4, rtol=1e-4)
    assert_close(np.asarray(v_p), np.asarray(v_x), atol=1e-4, rtol=1e-4)
    assert_close(np.asarray(last_p), np.asarray(last_x), atol=1e-4, rtol=1e-4)


def test_fused_transformer_path_matches_xla():
    """mimi.transformer(window_impl='pallas') == window_impl='local' on the
    default-positions path (the fused kernel integration point)."""
    from helpers import TINY_MIMI as cfg
    from ptts_tpu.models import mimi

    w = mimi.to_device(mimi.random_weights(cfg, seed=5, scale=0.3), cfg=cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 40, cfg.d_model)) * 0.1,
                    jnp.float32)
    want = mimi.transformer(w["transformer"], x, cfg, window_impl="local")
    with pltpu.force_tpu_interpret_mode():
        got = mimi.transformer(w["transformer"], x, cfg, window_impl="pallas")
    assert_close(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
