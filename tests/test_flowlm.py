"""FlowLM JAX path vs the NumPy oracle (tiny random checkpoint)."""

import numpy as np
import pytest

import jax.numpy as jnp

import refimpl
from helpers import TINY_FLOWLM, assert_close
from ptts_tpu.models import flowlm
from ptts_tpu.rng import frame_noise

CFG = TINY_FLOWLM
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def weights():
    return flowlm.random_weights(CFG, seed=3, scale=0.3)


@pytest.fixture(scope="module")
def dweights(weights):
    return flowlm.to_device(weights, cfg=CFG)


def randn(*shape, scale=1.0):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


# -- transformer ---------------------------------------------------------------


def test_prefill_matches_oracle_batch_forward(weights, dweights):
    T = 6
    x = randn(T, CFG.d_model)
    want_hidden = refimpl.flowlm_transformer(weights, x, CFG)

    cache = flowlm.make_cache(CFG, batch=1, max_len=T + 4)
    cache, last = flowlm.prefill(
        dweights, cache, jnp.asarray(x)[None], jnp.asarray([T], jnp.int32), CFG
    )
    assert_close(last[0], want_hidden[-1], atol=2e-5, rtol=2e-5)
    assert int(cache.cursor) == T
    assert int(cache.prefix_len[0]) == T
    assert int(cache.pos[0]) == T


def test_decode_steps_match_batch_forward(weights, dweights):
    """KV-cached decode == full causal forward, position by position."""
    T0, extra = 4, 3
    full = randn(T0 + extra, CFG.d_model)

    cache = flowlm.make_cache(CFG, batch=1, max_len=T0 + extra + 1)
    cache, last = flowlm.prefill(
        dweights, cache, jnp.asarray(full[:T0])[None], jnp.asarray([T0], jnp.int32), CFG
    )
    for i in range(extra):
        cache, last = flowlm.decode_step(dweights, cache, jnp.asarray(full[T0 + i])[None], CFG)
        want = refimpl.flowlm_transformer(weights, full[: T0 + i + 1], CFG)[-1]
        assert_close(last[0], want, atol=3e-5, rtol=3e-5, msg=f"step {i}")


def test_prefill_ragged_lengths(weights, dweights):
    """Padded batched prefill must match per-stream oracle results."""
    lengths = [3, 6]
    Tmax = max(lengths)
    xs = [randn(L, CFG.d_model) for L in lengths]
    padded = np.zeros((len(lengths), Tmax, CFG.d_model), np.float32)
    for b, x in enumerate(xs):
        padded[b, : len(x)] = x

    cache = flowlm.make_cache(CFG, batch=2, max_len=Tmax + 2)
    cache, last = flowlm.prefill(
        dweights, cache, jnp.asarray(padded), jnp.asarray(lengths, jnp.int32), CFG
    )
    for b, x in enumerate(xs):
        want = refimpl.flowlm_transformer(weights, x, CFG)[-1]
        assert_close(last[b], want, atol=2e-5, rtol=2e-5, msg=f"stream {b}")


# -- flow net -------------------------------------------------------------------


def test_timestep_embed(weights, dweights):
    for idx, t in [(0, 0.0), (0, 0.5), (1, 1.0), (1, 0.25)]:
        want = refimpl.timestep_embed(weights["flow"]["time"], idx, t, CFG)
        got = flowlm.timestep_embed(dweights, idx, jnp.float32(t), CFG)
        assert_close(got, want, atol=2e-5, rtol=2e-5)


def test_flow_net(weights, dweights):
    cond = randn(2, CFG.d_model)
    x_in = randn(2, CFG.latent_dim)
    s, t = 0.0, 0.5

    ts = refimpl.timestep_embed(weights["flow"]["time"], 0, s, CFG)
    tt = refimpl.timestep_embed(weights["flow"]["time"], 1, t, CFG)
    want0 = refimpl.flow_net(weights, cond[0], s, t, x_in[0], CFG)
    want1 = refimpl.flow_net(weights, cond[1], s, t, x_in[1], CFG)

    fw = dweights["flow"]
    cond_emb = jnp.einsum("bi,oi->bo", jnp.asarray(cond), fw["cond_w"]) + fw["cond_b"]
    te = (flowlm.timestep_embed(dweights, 0, jnp.float32(s), CFG)
          + flowlm.timestep_embed(dweights, 1, jnp.float32(t), CFG)) * 0.5
    got = flowlm.flow_net(dweights, cond_emb, te, jnp.asarray(x_in), CFG)
    assert_close(got[0], want0, atol=2e-5, rtol=2e-5)
    assert_close(got[1], want1, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("num_steps", [1, 4])
def test_lsd_decode(weights, dweights, num_steps):
    cond = randn(1, CFG.d_model)
    x0 = randn(1, CFG.latent_dim)
    want = refimpl.lsd_decode(weights, cond[0], num_steps, x0[0], CFG)

    te = flowlm.lsd_time_embeds(dweights, num_steps, CFG)
    got, first = flowlm.lsd_decode(dweights, jnp.asarray(cond), te, jnp.asarray(x0), CFG)
    assert_close(got[0], want, atol=3e-5, rtol=3e-5)

    want_first = refimpl.flow_net(weights, cond[0], 0.0, 1.0 / num_steps, x0[0], CFG)
    assert_close(first[0], want_first, atol=3e-5, rtol=3e-5)


# -- end-to-end generation -------------------------------------------------------


def _build_prefix(weights, tokens, cond_prefix):
    """Embed prompt like the generation driver (ptts_flowlm.c:1159-1185)."""
    parts = []
    if cond_prefix is not None:
        parts.append(cond_prefix)
    embeds = [weights["embed"][t] for t in tokens]
    parts.append(np.stack(embeds))
    bos = refimpl.linear(weights["input_linear"], None, weights["bos_emb"])
    parts.append(bos[None])
    return np.concatenate(parts, 0).astype(np.float32)


@pytest.mark.parametrize("temp,steps", [(0.0, 1), (0.7, 2)])
def test_generate_latents_matches_oracle(weights, dweights, temp, steps):
    tokens = np.array([1, 4, 2, 9], np.int32)
    cond_prefix = randn(2, CFG.d_model, scale=0.3)
    max_frames = 5
    noise = frame_noise(123, max_frames, CFG.latent_dim, temp=temp)

    want = refimpl.flowlm_generate_latents(
        weights, tokens, cond_prefix, max_frames, steps, noise, CFG,
        eos_enabled=False,
    )

    prefix = _build_prefix(weights, tokens, cond_prefix)
    T0 = len(prefix)
    cache = flowlm.make_cache(CFG, 1, T0 + max_frames)
    cache, x0 = flowlm.prefill(dweights, cache, jnp.asarray(prefix)[None],
                               jnp.asarray([T0], jnp.int32), CFG)
    res = flowlm.generate_latents(
        dweights, cache, x0, jnp.asarray(noise)[None], CFG,
        max_frames=max_frames, num_steps=steps, eos_enabled=False,
    )
    assert int(res.frames_used[0]) == want["frames_used"]
    assert_close(res.latents[0], want["latents"], atol=1e-4, rtol=1e-4)
    assert_close(res.eos_logits[0], want["eos_logits"], atol=1e-4, rtol=1e-3)
    assert_close(res.first_cond[0], want["first_cond"], atol=5e-5, rtol=5e-5)
    assert_close(res.first_flow[0], want["first_flow"], atol=1e-4, rtol=1e-4)


def test_generate_eos_semantics(weights, dweights):
    """Force EOS via threshold=-inf and check min_frames/eos_after behavior."""
    tokens = np.array([1, 2], np.int32)
    max_frames = 8
    noise = frame_noise(5, max_frames, CFG.latent_dim, temp=0.5)
    kwargs = dict(eos_threshold=-1e9, eos_min_frames=2, eos_after=3)

    want = refimpl.flowlm_generate_latents(
        weights, tokens, None, max_frames, 1, noise, CFG, eos_enabled=True, **kwargs
    )
    # eos fires at frame index 1 (min_frames=2), stop after frame 1+3=4 -> used=5
    assert want["frames_used"] == 5

    prefix = _build_prefix(weights, tokens, None)
    T0 = len(prefix)
    cache = flowlm.make_cache(CFG, 1, T0 + max_frames)
    cache, x0 = flowlm.prefill(dweights, cache, jnp.asarray(prefix)[None],
                               jnp.asarray([T0], jnp.int32), CFG)
    res = flowlm.generate_latents(
        dweights, cache, x0, jnp.asarray(noise)[None], CFG,
        max_frames=max_frames, num_steps=1, eos_enabled=True, **kwargs
    )
    used = int(res.frames_used[0])
    assert used == want["frames_used"]
    assert_close(res.latents[0, :used], want["latents"], atol=1e-4, rtol=1e-4)


def test_while_loop_generation_matches_scan(weights, dweights):
    """The on-device while_loop EOS generator (engine's serving path) must
    reproduce the scan path exactly: latents, frames_used, eos state, taps --
    including ragged per-stream EOS in a batch."""
    max_frames = 8
    B = 3
    prefixes = [_build_prefix(weights, np.array(t, np.int32), None)
                for t in ([1, 2], [3], [2, 4, 5])]
    T0 = max(len(p) for p in prefixes)
    padded = np.zeros((B, T0, CFG.d_model), np.float32)
    for b, p in enumerate(prefixes):
        padded[b, : len(p)] = p
    lengths = jnp.asarray([len(p) for p in prefixes], jnp.int32)
    noise = np.stack([frame_noise(5 + b, max_frames, CFG.latent_dim, temp=0.5)
                      for b in range(B)])
    kwargs = dict(eos_threshold=-1e9, eos_min_frames=2)
    eos_after = jnp.asarray([3, 1, 4], jnp.int32)  # ragged finish times

    def fresh():
        cache = flowlm.make_cache(CFG, B, T0 + max_frames)
        return flowlm.prefill(dweights, cache, jnp.asarray(padded), lengths, CFG)

    cache, x0 = fresh()
    scan = flowlm.generate_latents(
        dweights, cache, x0, jnp.asarray(noise), CFG,
        max_frames=max_frames, num_steps=1, eos_enabled=True,
        eos_after=eos_after, **kwargs
    )
    cache, x0 = fresh()
    wl = flowlm.generate_latents_while(
        dweights, cache, x0, jnp.asarray(noise), CFG,
        max_frames=max_frames, num_steps=1, eos_after=eos_after, **kwargs
    )
    assert np.array_equal(np.asarray(wl.frames_used), np.asarray(scan.frames_used))
    assert np.array_equal(np.asarray(wl.eos_step), np.asarray(scan.eos_step))
    hi = int(np.max(np.asarray(wl.frames_used)))
    # eos fires at idx 1; last stream stops at 1+4 -> hi = 6 < max_frames,
    # so the loop actually exited early on device
    assert hi == 6
    assert_close(wl.latents[:, :hi], scan.latents[:, :hi], atol=0, rtol=0)
    assert_close(wl.eos_logits[:, :hi], scan.eos_logits[:, :hi], atol=0, rtol=0)
    assert_close(wl.first_cond, scan.first_cond, atol=0, rtol=0)
    assert_close(wl.first_flow, scan.first_flow, atol=0, rtol=0)
    # frames past the early exit were never computed (stay zero)
    assert np.all(np.asarray(wl.latents[:, hi:]) == 0)


def test_while_loop_per_stream_budget(weights, dweights):
    """max_frames_per_stream caps individual streams (continuous batching)."""
    max_frames = 8
    prefix = _build_prefix(weights, np.array([1, 2], np.int32), None)
    T0 = len(prefix)
    noise = frame_noise(9, max_frames, CFG.latent_dim, temp=0.5)[None]
    cache = flowlm.make_cache(CFG, 1, T0 + max_frames)
    cache, x0 = flowlm.prefill(dweights, cache, jnp.asarray(prefix)[None],
                               jnp.asarray([T0], jnp.int32), CFG)
    res = flowlm.generate_latents_while(
        dweights, cache, x0, jnp.asarray(noise), CFG,
        max_frames=max_frames, num_steps=1, eos_threshold=1e9,
        max_frames_per_stream=jnp.asarray([3], jnp.int32),
    )
    assert int(res.frames_used[0]) == 3
    assert np.all(np.asarray(res.latents[0, 3:]) == 0)


def test_scale_latents(weights, dweights):
    lat = randn(2, 3, CFG.latent_dim)
    got = flowlm.scale_latents(dweights, jnp.asarray(lat))
    want = refimpl.scale_latents(weights, lat)
    assert_close(got, want, atol=1e-6)


def test_embed_tokens_clamps(weights, dweights):
    ids = jnp.asarray([0, CFG.vocab, -1, CFG.vocab + 1, 3])
    emb = flowlm.embed_tokens(dweights, ids, CFG)
    assert_close(emb[2], weights["embed"][0])  # -1 -> row 0
    assert_close(emb[3], weights["embed"][0])  # vocab+1 -> row 0
    assert_close(emb[1], weights["embed"][CFG.vocab])  # vocab is valid (vocab+1 rows)


def test_forward_next_matches_cached_generation(weights, dweights):
    """The O(T^2) non-cached path must agree with the KV-cached decode."""
    tokens = np.array([2, 5, 1], np.int32)
    noise = frame_noise(17, 2, CFG.latent_dim, temp=0.5)

    prefix = _build_prefix(weights, tokens, None)
    T0 = len(prefix)
    cache = flowlm.make_cache(CFG, 1, T0 + 2)
    cache, x0 = flowlm.prefill(dweights, cache, jnp.asarray(prefix)[None],
                               jnp.asarray([T0], jnp.int32), CFG)
    res = flowlm.generate_latents(
        dweights, cache, x0, jnp.asarray(noise)[None], CFG,
        max_frames=2, num_steps=1, eos_enabled=False,
    )

    # frame 0 via forward_next over [prefix]
    lat0, eos0 = flowlm.forward_next(
        dweights, jnp.asarray(prefix)[None], jnp.asarray([T0], jnp.int32),
        jnp.asarray(noise[0])[None], CFG, 1,
    )
    assert_close(lat0[0], res.latents[0, 0], atol=3e-5, rtol=3e-5)
    assert_close(eos0[0], res.eos_logits[0, 0], atol=3e-5, rtol=1e-3)

    # frame 1: sequence extended by input_linear(latent 0)
    nxt = refimpl.linear(weights["input_linear"], None, np.asarray(lat0[0]))
    seq = np.concatenate([prefix, nxt[None]], 0)
    lat1, _ = flowlm.forward_next(
        dweights, jnp.asarray(seq)[None], jnp.asarray([len(seq)], jnp.int32),
        jnp.asarray(noise[1])[None], CFG, 1,
    )
    assert_close(lat1[0], res.latents[0, 1], atol=5e-5, rtol=5e-5)


def test_lsd_decode_ragged_matches_lsd_decode():
    """Direct pin of the lsd_decode_ragged docstring claim: a stream whose
    per-stream table row equals lsd_time_embeds(n_b) padded to S_max
    integrates equal to lsd_decode with n_b steps -- bitwise for
    power-of-two n_b, 1 ulp otherwise (XLA folds /n-by-constant differently
    than /n-by-array), for every n_b <= S_max."""
    import jax.numpy as jnp

    cfg = TINY_FLOWLM
    w = flowlm.to_device(flowlm.random_weights(cfg, seed=11, scale=0.3),
                         jnp.float32, cfg)
    rng = np.random.default_rng(4)
    S_max = 4
    B = S_max  # stream b uses n_b = b + 1 Euler steps
    cond = jnp.asarray(rng.standard_normal((B, cfg.d_model)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((B, cfg.latent_dim)), jnp.float32)

    tables = np.zeros((B, S_max, cfg.flow_dim), np.float32)
    num_steps = np.arange(1, S_max + 1, dtype=np.int32)
    for b, n in enumerate(num_steps):
        tables[b, :n] = np.asarray(flowlm.lsd_time_embeds(w, int(n), cfg))

    lat_r, ff_r = flowlm.lsd_decode_ragged(
        w, cond, jnp.asarray(tables), jnp.asarray(num_steps), noise, cfg)

    # compare at the SAME batch shape (a [1]-row run compiles different GEMM
    # shapes -> ~1-ulp fusion differences; the claim is about the masked
    # integration math): run lsd_decode for the whole pool at each n and
    # check the row whose ragged step count is n.
    for b, n in enumerate(num_steps):
        te = flowlm.lsd_time_embeds(w, int(n), cfg)
        lat, ff = flowlm.lsd_decode(w, cond, te, noise, cfg)
        np.testing.assert_allclose(
            np.asarray(lat_r[b]), np.asarray(lat[b]), rtol=3e-7, atol=1e-6,
            err_msg=f"ragged latent != lsd_decode at n={n}")
        np.testing.assert_array_equal(
            np.asarray(ff_r[b]), np.asarray(ff[b]),
            err_msg=f"ragged first_flow != lsd_decode at n={n}")


# -- decode-ring KV cache --------------------------------------------------------


def test_ring_mask_equals_linear_mask_before_wrap():
    """With cursor - t0 <= R the ring valid_mask must equal the linear mask
    (prefix | [start, hi)) bit-for-bit -- the offline paths rely on it."""
    Tmax, t0 = 12, 5
    prefix_len = jnp.asarray([3, 5, 0], jnp.int32)
    start = jnp.asarray([5, 7, 9], jnp.int32)
    for cursor in range(t0, Tmax + 1):
        cache = flowlm.make_cache(CFG, 3, Tmax)._replace(
            prefix_len=prefix_len, start=start,
            cursor=jnp.asarray(cursor, jnp.int32),
            t0=jnp.asarray(t0, jnp.int32))
        for through in (False, True):
            hi = cursor + 1 if through else cursor
            t = np.arange(Tmax)[None, :]
            linear = (t < np.asarray(prefix_len)[:, None]) | (
                (t >= np.asarray(start)[:, None]) & (t < hi))
            got = np.asarray(cache.valid_mask(through_cursor=through))
            if hi <= Tmax:
                # before wrap the ring mask must equal the linear mask
                np.testing.assert_array_equal(got, linear,
                                              err_msg=f"cursor={cursor}")
            else:
                # the FIRST wrapping write: cursor=Tmax, through=True ->
                # hi = Tmax+1. The write at abs cursor lands in ring column
                # t0 (R = Tmax - t0 columns, m = cursor - t0 = R, R % R = 0),
                # overwriting abs t0; every other decode column j still holds
                # abs j. Validity = prefix | abs in [start, hi).
                assert (cursor, through) == (Tmax, True)
                abs_idx = np.arange(Tmax)
                abs_idx = abs_idx.copy()
                abs_idx[t0] = cursor  # column t0 now holds the wrapped write
                t = abs_idx[None, :]
                want = (np.arange(Tmax)[None, :]
                        < np.asarray(prefix_len)[:, None]) | (
                    (t >= np.asarray(start)[:, None]) & (t < hi))
                np.testing.assert_array_equal(
                    got, want, err_msg="first wrapping write (cursor=Tmax)")


def test_ring_mask_after_wrap_tracks_absolute_positions():
    """Past one lap, ring column j holds the LATEST decode write m with
    m % R == j; validity = that write's absolute index in [start, hi)."""
    Tmax, t0 = 9, 5          # R = 4 decode columns
    # stream 0 admitted at abs 11 (its live span <= R by construction);
    # stream 1 retired (start pinned at 5, everything overwritten)
    cache = flowlm.make_cache(CFG, 2, Tmax)._replace(
        prefix_len=jnp.asarray([2, 4], jnp.int32),
        start=jnp.asarray([11, 5], jnp.int32),
        cursor=jnp.asarray(13, jnp.int32),     # decode writes m = 0..7
        t0=jnp.asarray(t0, jnp.int32))
    got = np.asarray(cache.valid_mask(through_cursor=True))  # hi = 14
    # column j holds write m*(j): latest m < 9 with m % 4 == j
    #   j=0 -> m=8 (abs 13), j=1 -> m=5 (abs 10), j=2 -> m=6 (abs 11),
    #   j=3 -> m=7 (abs 12)
    abs_idx = np.array([13, 10, 11, 12])
    want0 = np.concatenate([np.arange(5) < 2, (abs_idx >= 11) & (abs_idx < 14)])
    want1 = np.concatenate([np.arange(5) < 4, (abs_idx >= 5) & (abs_idx < 14)])
    np.testing.assert_array_equal(got[0], want0)
    np.testing.assert_array_equal(got[1], want1)


def test_decode_step_ring_write_wraps(dweights):
    """decode_step past one lap writes at t0 + (cursor - t0) % R and the new
    K lands where the mask expects it (cross-checked against a wide cache
    that never wraps)."""
    T0, extra = 4, 3
    prefix = randn(1, T0, CFG.d_model)
    lengths = jnp.asarray([T0], jnp.int32)
    # wide cache: enough room for 6 decode steps, never wraps
    wide, x0 = flowlm.prefill_init(dweights, jnp.asarray(prefix), lengths,
                                   CFG, T0 + 6)
    # narrow cache: R = 3 decode columns, wraps twice over 6 steps
    narrow, _ = flowlm.prefill_init(dweights, jnp.asarray(prefix), lengths,
                                    CFG, T0 + extra)
    xw = xn = x0
    for i in range(6):
        # keep the narrow stream's window inside R columns: advance start so
        # the live span is at most R (mimics the batcher's bounded requests)
        if i >= extra:
            narrow = narrow._replace(
                start=jnp.asarray([T0 + i - extra + 1], jnp.int32))
            wide = wide._replace(
                start=jnp.asarray([T0 + i - extra + 1], jnp.int32))
        wide, xw = flowlm.decode_step(dweights, wide, xw, CFG)
        narrow, xn = flowlm.decode_step(dweights, narrow, xn, CFG)
        np.testing.assert_allclose(np.asarray(xn), np.asarray(xw),
                                   rtol=2e-6, atol=2e-6,
                                   err_msg=f"step {i}")
