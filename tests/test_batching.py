"""Continuous batching: staggered admission must reproduce offline results."""

import numpy as np
import pytest

from helpers import TINY_FLOWLM, TINY_MIMI, assert_close, write_model_dir
from ptts_tpu import api
from ptts_tpu.io import wav
from ptts_tpu.runtime.batching import ContinuousBatcher


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    d = tmp_path_factory.mktemp("cbmodel")
    path, fw, mw = write_model_dir(d, seed=6)
    return api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)


def _offline(ctx, text, params):
    return ctx.engine.generate(text, params=params)


def _assert_pcm_close(got, want_f32, msg="", max_lsb=8):
    """Batcher output is device-quantized int16; compare against the offline
    f32 audio pushed through the exact host quantizer. The pre-existing
    batcher-vs-offline f32 drift was ~2-3e-4, i.e. ~7-10 LSB after *32767."""
    ref = wav.quantize_i16(want_f32)
    assert got.pcm_i16.shape == ref.shape, msg
    diff = np.abs(got.pcm_i16.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= max_lsb, f"{msg}: max {diff.max()} LSB"


@pytest.mark.slow
def test_single_request_matches_offline(ctx):
    p = api.Params(num_frames=4, num_steps=1, seed=5, temp=0.5, eos_enabled=False)
    batcher = ContinuousBatcher(ctx.engine, slots=4, max_len=96, admit_chunk=2, prefix_budget=32)
    rid = batcher.submit("hello world", params=p)
    results = batcher.drain()
    got = results[rid]

    # offline reference with the same per-request noise stream (seed + rid)
    p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
    want = _offline(ctx, "hello world", p_off)
    assert got.frames == 4
    _assert_pcm_close(got, want.samples)


@pytest.mark.slow
def test_staggered_admission_matches_offline(ctx):
    """More requests than slots; late admissions into freed rows must not
    perturb in-flight streams and must match their own offline runs."""
    p = api.Params(num_frames=3, num_steps=1, seed=100, temp=0.4,
                   eos_enabled=False)
    texts = ["hello world", "how low", "hello hello", "world world", "who who"]
    batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2, prefix_budget=32)
    rids = [batcher.submit(t, params=p) for t in texts]
    results = batcher.drain()
    assert set(results.keys()) == set(rids)

    for rid, text in zip(rids, texts):
        p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
        want = _offline(ctx, text, p_off)
        got = results[rid]
        _assert_pcm_close(got, want.samples, msg=text, max_lsb=10)


def test_eos_frees_slots(ctx):
    p = api.Params(num_frames=6, num_steps=1, seed=2, temp=0.3,
                   eos_enabled=True, eos_threshold=-1e9,
                   eos_min_frames=2, eos_after=1)
    batcher = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1, prefix_budget=32)
    r0 = batcher.submit("hello", params=p)
    r1 = batcher.submit("world", params=p)
    results = batcher.drain()
    # eos at frame 1, stop after frame 2 -> 3 frames each
    assert results[r0].frames == 3
    assert results[r1].frames == 3


@pytest.mark.slow
def test_multi_frame_dispatch_matches_single(ctx):
    """frames_per_step=3 (K fused frames per device dispatch, one readback
    per K chunks) must reproduce the K=1 batcher and the offline engine:
    same frame counts, same chunk routing across ragged EOS + slot reuse,
    PCM equal to a few quantization LSB."""
    def p(frames, seed):
        return api.Params(num_frames=frames, num_steps=1, seed=seed,
                          temp=0.4, eos_enabled=False)

    # ragged lengths, more requests than slots, K does not divide lengths
    specs = [("hello world", 7), ("how low", 2), ("hello hello", 5),
             ("world world", 4)]

    def run(k):
        b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                              prefix_budget=32, frames_per_step=k)
        rids = [b.submit(t, params=p(f, 70 + i))
                for i, (t, f) in enumerate(specs)]
        return rids, b.drain()

    rids1, res1 = run(1)
    rids3, res3 = run(3)
    assert rids1 == rids3
    for rid, (text, frames) in zip(rids1, specs):
        assert res3[rid].frames == frames == res1[rid].frames, text
        a = res1[rid].pcm_i16.astype(np.int32)
        c = res3[rid].pcm_i16.astype(np.int32)
        assert a.shape == c.shape, text
        assert np.abs(a - c).max() <= 4, text  # jit-boundary fusion drift


def test_pack_flags_matches_unpacked(ctx):
    """pack_flags rides the done/was_done flags on the PCM buffer's last two
    int16 columns (one d2h copy instead of three). Finish semantics (EOS,
    frame counts, slot reuse) and PCM must match the unpacked readback
    exactly: the float compute graph is identical, the flags are appended
    AFTER int16 quantization."""
    def p(frames, seed):
        return api.Params(num_frames=frames, num_steps=1, seed=seed,
                          temp=0.5, eos_enabled=True, eos_threshold=-1e9,
                          eos_min_frames=2, eos_after=1)

    specs = [("hello world", 7), ("how low", 4), ("hello hello", 6),
             ("world world", 5)]

    def run(pack):
        b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                              prefix_budget=32, frames_per_step=3,
                              pipeline=True, pack_flags=pack)
        assert b.pack_flags is pack
        rids = [b.submit(t, params=p(f, 40 + i))
                for i, (t, f) in enumerate(specs)]
        return rids, b.drain()

    rids_u, res_u = run(False)
    rids_p, res_p = run(True)
    assert rids_u == rids_p
    for rid, (text, _) in zip(rids_u, specs):
        # forced EOS at frame 2 (min_frames) + eos_after 1 -> 3 frames
        assert res_p[rid].frames == res_u[rid].frames == 3, text
        np.testing.assert_array_equal(res_u[rid].pcm_i16,
                                      res_p[rid].pcm_i16, err_msg=text)


def test_pack_flags_off_device_bound(ctx):
    """Device-bound pools (collect_pcm=False) have no PCM copy for flags to
    ride: pack_flags must resolve to False even when requested."""
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=48, admit_chunk=1,
                          prefix_budget=32, collect_pcm=False,
                          pack_flags=True)
    assert b.pack_flags is False


def test_blocked_decode_impl_rejected(ctx):
    """The opt-in 'blocked' decode attention reads [start, cursor) as a
    contiguous span -- wrong once the decode ring wraps, so the batcher
    must refuse it at construction."""
    import dataclasses
    eng = ctx.engine
    orig = eng.flags
    eng.flags = dataclasses.replace(orig, decode_impl="blocked")
    try:
        with pytest.raises(api.PttsError, match="decode ring"):
            ContinuousBatcher(eng, slots=1, max_len=48, admit_chunk=1,
                              prefix_budget=32)
    finally:
        eng.flags = orig


@pytest.mark.slow
def test_split_admit_matches_unsplit(ctx):
    """split_admit dispatches an admitting step as k=1 + k=K-1 programs
    (first chunks ride the small readback). The split must be invisible in
    the results: same frame counts, same PCM, same ragged-EOS routing; and
    every finished Result must carry a collect-time first-chunk stamp."""
    def p(frames, seed):
        return api.Params(num_frames=frames, num_steps=1, seed=seed,
                          temp=0.4, eos_enabled=False)

    specs = [("hello world", 7), ("how low", 2), ("hello hello", 5),
             ("world world", 4)]

    def run(split, pipeline=False):
        b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                              prefix_budget=32, frames_per_step=3,
                              split_admit=split, pipeline=pipeline)
        rids = [b.submit(t, params=p(f, 70 + i))
                for i, (t, f) in enumerate(specs)]
        res = b.drain()
        assert not b.first_chunk_t  # stamps move onto Results, no leak
        return rids, res

    rids0, res0 = run(False)
    rids1, res1 = run(True)
    rids2, res2 = run(True, pipeline=True)
    assert rids0 == rids1 == rids2
    for rid, (text, frames) in zip(rids0, specs):
        for res in (res1, res2):
            assert res[rid].frames == frames == res0[rid].frames, text
            a = res0[rid].pcm_i16.astype(np.int32)
            c = res[rid].pcm_i16.astype(np.int32)
            assert a.shape == c.shape, text
            # same single-frame body in the same order; the k=1 program is
            # a different jit unit, so allow jit-boundary fusion drift (the
            # K=1-vs-K=3 test's established bound)
            assert np.abs(a - c).max() <= 4, text
            assert res[rid].first_chunk_t > 0, text


def test_multi_frame_dispatch_eos(ctx):
    """Per-request EOS mid-K-window: the finished stream's tail frames inside
    the same dispatch must not emit chunks, and the slot must be reused."""
    p = api.Params(num_frames=6, num_steps=1, seed=2, temp=0.3,
                   eos_enabled=True, eos_threshold=-1e9,
                   eos_min_frames=2, eos_after=1)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1,
                          prefix_budget=32, frames_per_step=4)
    r0 = b.submit("hello", params=p)
    r1 = b.submit("world", params=p)
    results = b.drain()
    # eos at frame 1, stop after frame 2 -> 3 frames each (not 4 = K)
    assert results[r0].frames == 3
    assert results[r1].frames == 3


@pytest.mark.slow
def test_ring_survives_early_finishers(ctx):
    """A stream that finished early must not poison the ring: its dead
    decode span (start stays fixed while the shared cursor advances with
    live streams) is simply overwritten once the cursor laps it, and
    later admissions into the freed slot decode correctly."""
    batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=48,
                                admit_chunk=2, prefix_budget=32)

    def p(frames, seed):
        return api.Params(num_frames=frames, num_steps=1, seed=seed, temp=0.4,
                          eos_enabled=False)

    # R = 16 decode columns. A long (14 frames) + B short (2 frames): B's
    # slot frees at cursor 34 but keeps start=32 while A drives the cursor
    # to 46. C then D reuse the slot; D's columns wrap past decode index 16
    # onto A/B's retired columns mid-stream.
    specs = [("hello world", 14), ("how low", 2), ("hello hello", 8),
             ("world world", 8)]
    rids = [batcher.submit(t, params=p(f, 70 + i))
            for i, (t, f) in enumerate(specs)]
    results = batcher.drain()
    for i, (rid, (text, frames)) in enumerate(zip(rids, specs)):
        p_off = api.Params(num_frames=frames, num_steps=1,
                           seed=70 + i + rid, temp=0.4, eos_enabled=False)
        want = _offline(ctx, text, p_off)
        assert results[rid].frames == frames, text
        _assert_pcm_close(results[rid], want.samples, msg=text, max_lsb=10)


def test_decode_ring_wrap(ctx):
    """Drive the shared cursor PAST the decode-ring width mid-stream so the
    ring wraps (decode writes land back on retired columns); outputs must
    still match offline generation exactly."""
    # max_len 48, prefix_budget 32 -> 16 decode columns; 4 sequential
    # 8-frame requests through 2 slots = 32 decode writes = 2 full laps.
    p = api.Params(num_frames=8, num_steps=1, seed=41, temp=0.4,
                   eos_enabled=False)
    batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=48,
                                admit_chunk=2, prefix_budget=32)
    texts = ["hello world", "how low", "world world", "hello hello"]
    rids = [batcher.submit(t, params=p) for t in texts]
    results = batcher.drain()
    for rid, text in zip(rids, texts):
        p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
        want = _offline(ctx, text, p_off)
        _assert_pcm_close(results[rid], want.samples, msg=text, max_lsb=10)


@pytest.mark.slow
def test_heterogeneous_params_match_offline(ctx):
    """Per-REQUEST Params in one pool (ptts.h:27-40 semantics): different
    num_steps, eos settings, and temps served concurrently must each match
    their own offline run (VERDICT r1 #7)."""
    specs = [
        ("hello world", api.Params(num_frames=4, num_steps=1, seed=11,
                                   temp=0.5, eos_enabled=False)),
        ("how low", api.Params(num_frames=5, num_steps=3, seed=12,
                               temp=0.8, eos_enabled=False)),
        ("hello hello", api.Params(num_frames=6, num_steps=2, seed=13,
                                   temp=0.3, eos_enabled=True,
                                   eos_threshold=-1e9, eos_min_frames=2,
                                   eos_after=1)),
        ("world world", api.Params(num_frames=4, num_steps=4, seed=14,
                                   temp=0.6, eos_enabled=False)),
    ]
    batcher = ContinuousBatcher(ctx.engine, slots=3, max_len=96,
                                admit_chunk=2, prefix_budget=32,
                                max_num_steps=4)
    rids = [batcher.submit(t, params=p) for t, p in specs]
    results = batcher.drain()

    for rid, (text, p) in zip(rids, specs):
        p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
        want = _offline(ctx, text, p_off)
        got = results[rid]
        _assert_pcm_close(got, want.samples, msg=text, max_lsb=10)


def test_num_steps_above_pool_cap_rejected(ctx):
    batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=96,
                                admit_chunk=2, prefix_budget=32,
                                max_num_steps=2)
    with pytest.raises(api.PttsError):
        batcher.submit("hello", params=api.Params(num_frames=2, num_steps=3))


def test_direct_enqueue_revalidates_ring_safety(ctx):
    """enqueue() must enforce the ring-safety invariant on raw Requests, not
    only on prepare()-built ones: an over-budget direct enqueue (the pattern
    bench.py uses) would otherwise silently recycle live decode-ring columns
    mid-stream instead of failing loudly."""
    import dataclasses
    batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=96,
                                admit_chunk=2, prefix_budget=32,
                                max_num_steps=2)
    # explicit seed -> host-drawn parity noise rows travel on the Request
    ok = batcher.prepare("hello", params=api.Params(num_frames=2, num_steps=1,
                                                    seed=7))

    over_frames = dataclasses.replace(
        ok, max_frames=batcher.noise_budget + 1, noise=None)
    with pytest.raises(api.PttsError, match="noise_budget"):
        batcher.enqueue(over_frames)

    assert ok.noise is not None
    short_noise = dataclasses.replace(ok, noise=ok.noise[:1], max_frames=2)
    with pytest.raises(api.PttsError, match="noise rows"):
        batcher.enqueue(short_noise)

    over_steps = dataclasses.replace(ok, num_steps=batcher.max_num_steps + 1)
    with pytest.raises(api.PttsError, match="max_num_steps"):
        batcher.enqueue(over_steps)

    # the untouched original must still admit and run
    rid = batcher.enqueue(ok)
    results = batcher.drain()
    assert results[rid].frames == 2


@pytest.mark.slow
def test_pipelined_equals_serial_batcher(ctx):
    """Double-buffered step loop (dispatch N+1 before collecting N) must
    produce identical results to the serial loop, including staggered
    admissions into freed slots and ragged EOS."""
    def build(pipeline):
        return ContinuousBatcher(ctx.engine, slots=2, max_len=96,
                                 admit_chunk=2, prefix_budget=32,
                                 max_num_steps=2, pipeline=pipeline)

    specs = [
        ("hello world", api.Params(num_frames=4, num_steps=1, seed=21,
                                   temp=0.5, eos_enabled=False)),
        ("how low", api.Params(num_frames=6, num_steps=2, seed=22, temp=0.7,
                               eos_enabled=True, eos_threshold=-1e9,
                               eos_min_frames=2, eos_after=1)),
        ("hello hello", api.Params(num_frames=3, num_steps=1, seed=23,
                                   temp=0.4, eos_enabled=False)),
        ("world world", api.Params(num_frames=5, num_steps=2, seed=24,
                                   temp=0.9, eos_enabled=False)),
    ]
    results = {}
    for pipeline in (False, True):
        b = build(pipeline)
        rids = [b.submit(t, params=p) for t, p in specs]
        results[pipeline] = (rids, b.drain())
    rids_s, res_s = results[False]
    rids_p, res_p = results[True]
    assert rids_s == rids_p
    for rid in rids_s:
        assert res_s[rid].frames == res_p[rid].frames
        np.testing.assert_array_equal(res_s[rid].pcm_i16, res_p[rid].pcm_i16)


def test_sharded_batcher_matches_unsharded(ctx):
    """Slot pool sharded over the hybrid (dcn, batch) mesh with per-host
    admission must reproduce the single-device batcher. Streams are
    row-independent, but GSPMD repartitioning may re-fuse f32 ops, so samples
    sitting exactly on a quantization boundary may flip by 1 LSB."""
    import jax

    from ptts_tpu.parallel import mesh as pmesh

    hmesh = pmesh.make_multihost_mesh(num_hosts=2, devices=jax.devices()[:8])
    specs = [
        ("hello world", api.Params(num_frames=3, num_steps=1, seed=31,
                                   temp=0.5, eos_enabled=False)),
        ("how low can it go", api.Params(num_frames=5, num_steps=2, seed=32,
                                         temp=0.7, eos_enabled=True,
                                         eos_threshold=-1e9,
                                         eos_min_frames=2, eos_after=1)),
        ("hello hello", api.Params(num_frames=2, num_steps=1, seed=33,
                                   temp=0.4, eos_enabled=False)),
        ("more text here", api.Params(num_frames=4, num_steps=1, seed=34,
                                      temp=0.6, eos_enabled=False)),
        ("last one", api.Params(num_frames=3, num_steps=2, seed=35,
                                temp=0.8, eos_enabled=False)),
    ]

    def run(mesh):
        b = ContinuousBatcher(ctx.engine, slots=4, max_len=64, admit_chunk=2,
                              prefix_budget=32, max_num_steps=2, mesh=mesh)
        rids = [b.submit(t, params=p) for t, p in specs]
        return rids, b.drain(), b

    rids_u, res_u, _ = run(None)
    rids_s, res_s, bs = run(hmesh)
    assert rids_u == rids_s
    # pool rows divide the mesh; both host groups own slots
    assert bs.B1 % hmesh.size == 0
    assert all(bs._host_slots[h] for h in range(bs.n_hosts))
    for rid, (text, _) in zip(rids_u, specs):
        assert res_s[rid].frames == res_u[rid].frames, text
        a = res_s[rid].pcm_i16.astype(np.int32)
        b = res_u[rid].pcm_i16.astype(np.int32)
        assert a.shape == b.shape, text
        assert np.abs(a - b).max() <= 1, text


def test_sharded_device_bound_combined_flags(ctx):
    """Device-bound mode over a sharded mesh: the combined [k+1, B] flag
    buffer (one readback per step) must survive GSPMD -- frame counts
    equal to the unsharded device-bound run."""
    import jax

    from ptts_tpu.parallel import mesh as pmesh

    hmesh = pmesh.make_multihost_mesh(num_hosts=2, devices=jax.devices()[:8])
    p = api.Params(num_frames=5, num_steps=1, seed=21, temp=0.5,
                   eos_enabled=True, eos_threshold=-1e9,
                   eos_min_frames=2, eos_after=1)
    texts = ["hello world", "how low", "who who", "more text here"]

    def run(mesh):
        b = ContinuousBatcher(ctx.engine, slots=4, max_len=64, admit_chunk=2,
                              prefix_budget=32, frames_per_step=3,
                              pipeline=True, collect_pcm=False, mesh=mesh)
        rids = [b.submit(t, params=p) for t in texts]
        return rids, b.drain()

    rids_u, res_u = run(None)
    rids_s, res_s = run(hmesh)
    assert rids_u == rids_s
    for rid, text in zip(rids_u, texts):
        assert res_s[rid].frames == res_u[rid].frames == 3, text
        assert res_s[rid].pcm_i16.size == 0


def test_sharded_batcher_host_pinning(ctx):
    """submit(host=h) admits into host h's own slot rows."""
    import jax

    from ptts_tpu.parallel import mesh as pmesh

    hmesh = pmesh.make_multihost_mesh(num_hosts=2, devices=jax.devices()[:8])
    b = ContinuousBatcher(ctx.engine, slots=4, max_len=64, admit_chunk=2,
                          prefix_budget=32, mesh=hmesh)
    p = api.Params(num_frames=2, num_steps=1, seed=40, temp=0.5,
                   eos_enabled=False)
    rid0 = b.submit("hello world", params=p, host=0)
    rid1 = b.submit("hello world", params=p, host=1)
    b.step()  # admission happens at the top of step()
    slot_of = {req.rid: s for s, req in enumerate(b.slot_req)
               if req is not None}
    assert slot_of[rid0] in b._host_slots[0]
    assert slot_of[rid1] in b._host_slots[1]
    res = b.drain()
    assert res[rid0].frames == 2 and res[rid1].frames == 2


def test_ids_admission_matches_prefix_admission(ctx):
    """The device-built prompt (admit_slots_ids: cond bank + token-id
    embedding gather + projected BOS) must equal the host-assembled prefix
    path (engine._build_prefix) request-for-request."""
    p = api.Params(num_frames=3, num_steps=1, seed=11, temp=0.5,
                   eos_enabled=False)
    texts = ["hello world", "one two three", "hi"]

    def run(voice_cap):
        b = ContinuousBatcher(ctx.engine, slots=4, max_len=96, admit_chunk=2,
                              prefix_budget=32, voice_cap=voice_cap)
        rids = [b.submit(t, params=p) for t in texts]
        reqs = {r: req for req in b.queue for r in [req.rid]}
        res = b.drain()
        return rids, reqs, res

    rids_i, reqs_i, res_i = run(voice_cap=4)     # ids path
    rids_p, reqs_p, res_p = run(voice_cap=0)     # bank disabled -> prefix path
    assert all(reqs_i[r].ids is not None for r in rids_i)
    assert all(reqs_p[r].prefix is not None for r in rids_p)
    for ri, rp in zip(rids_i, rids_p):
        a, b_ = res_i[ri], res_p[rp]
        assert a.frames == b_.frames
        diff = np.abs(a.pcm_i16.astype(np.int32) - b_.pcm_i16.astype(np.int32))
        assert diff.max() <= 8, f"ids vs prefix path: {diff.max()} LSB"


def test_device_bound_mode_counts_frames(ctx):
    """collect_pcm=False (the co-located-serving measurement mode) must
    retire requests with the exact frame counts of the normal mode while
    never transferring PCM (empty pcm_i16)."""
    p = api.Params(num_frames=3, num_steps=1, seed=7, temp=0.5,
                   eos_enabled=False)
    frames = {}
    for collect in (True, False):
        batcher = ContinuousBatcher(ctx.engine, slots=2, max_len=96,
                                    admit_chunk=2, prefix_budget=32,
                                    collect_pcm=collect)
        rids = [batcher.submit(t, params=p) for t in ("hello", "world hi")]
        results = batcher.drain()
        assert set(results) == set(rids)
        frames[collect] = [results[r].frames for r in rids]
        for r in rids:
            if collect:
                assert results[r].pcm_i16.size > 0
            else:
                assert results[r].pcm_i16.size == 0
    assert frames[True] == frames[False]


def test_device_noise_routing(ctx):
    """prepare(): explicit seed -> host parity noise; seed=-1 -> device draw."""
    b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=1,
                          prefix_budget=32)
    req = b.prepare("hello", params=api.Params(num_frames=3, seed=7))
    assert req.noise is not None
    req2 = b.prepare("hello", params=api.Params(num_frames=3, seed=-1,
                                                temp=0.5, noise_clamp=1.0))
    assert req2.noise is None
    assert req2.temp == 0.5 and req2.noise_clamp == 1.0
    # device_noise=False forces the host path even for seed=-1
    b2 = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=1,
                           prefix_budget=32, device_noise=False)
    req3 = b2.prepare("hello", params=api.Params(num_frames=3, seed=-1))
    assert req3.noise is not None


def test_device_noise_rows_semantics():
    """_device_noise_rows: std scaling, clamping, frame masking, per-seed
    decorrelation -- the exact table the host path would have uploaded."""
    import jax.numpy as jnp

    from ptts_tpu.runtime import batching

    seeds = jnp.asarray([1, 2, 1], jnp.int32)
    std = np.float32(np.sqrt(0.7))
    meta = jnp.asarray([[std, 1.0, std], [0.0, 0.1, 0.0]], jnp.float32)
    frames = jnp.asarray([50.0, 10.0, 50.0], jnp.float32)
    rows = np.asarray(batching._device_noise_rows(
        seeds, meta, frames, 64, 32, jnp.float32))
    # frame mask: rows at/after the request's frame count are zero
    assert np.all(rows[0, 50:] == 0) and np.all(rows[1, 10:] == 0)
    assert np.all(rows[0, :50] != 0)
    # std: N(0, 0.7) over 1600 draws
    got_std = rows[0, :50].std()
    assert abs(got_std - std) < 0.1, got_std
    # clamp
    assert np.abs(rows[1, :10]).max() <= 0.1 + 1e-6
    # same seed -> same rows; different seed -> different rows
    np.testing.assert_array_equal(rows[0], rows[2])
    assert np.any(rows[0, :10] != rows[1, :10])


@pytest.mark.slow
def test_device_noise_roundtrip_matches_host_path(ctx):
    """A device-noise request must produce bit-identical PCM to a host-noise
    request fed the SAME noise values (the table read back off the device):
    proves the device-noise plumbing only changes where the table comes
    from, not how it is consumed."""
    import jax.numpy as jnp

    p = api.Params(num_frames=4, num_steps=1, seed=-1, temp=0.5,
                   eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=1,
                          prefix_budget=32)
    req = b.prepare("hello world", params=p)
    assert req.noise is None
    rid = b.enqueue(req)
    b.step()  # admits (and runs the first frame)
    slot = next(s for s in b.slot_rows if b.slot_req[s] is not None
                and b.slot_req[s].rid == rid)
    noise = np.asarray(b.noise_tab[slot].astype(jnp.float32))[:4]
    res = b.drain()[rid]
    assert res.frames == 4

    b2 = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=1,
                           prefix_budget=32)
    req2 = b2.prepare("hello world", params=api.Params(
        num_frames=4, num_steps=1, seed=3, temp=0.5, eos_enabled=False))
    req2.noise = noise  # override with the device-drawn values
    rid2 = b2.enqueue(req2)
    res2 = b2.drain()[rid2]
    np.testing.assert_array_equal(res.pcm_i16, res2.pcm_i16)


def test_max_queue_backpressure(ctx):
    """Past max_queue, enqueue raises QueueFull instead of growing the
    deque/chunks without bound (serving-front-door backpressure)."""
    from ptts_tpu.runtime.batching import QueueFull

    p = api.Params(num_frames=2, num_steps=1, seed=1, eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1,
                          prefix_budget=32, max_queue=2)
    b.submit("one", params=p)
    b.submit("two", params=p)
    with pytest.raises(QueueFull):
        b.submit("three", params=p)
    assert len(b.queue) == 2 and len(b.chunks) == 2
    # QueueFull is a PttsError, so the HTTP layer's 4xx mapping catches it
    assert issubclass(QueueFull, api.PttsError)


def test_cancel_queued_request(ctx):
    """Cancelling a queued request dequeues it; it never runs and leaves no
    chunk buffer behind."""
    p = api.Params(num_frames=2, num_steps=1, seed=1, eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1,
                          prefix_budget=32)
    r0 = b.submit("hello", params=p)
    r1 = b.submit("world", params=p)
    assert b.cancel(r1)
    assert not b.cancel(r1)      # idempotent: second cancel is a no-op
    assert not b.cancel(10_000)  # unknown rid
    results = b.drain()
    assert set(results) == {r0}
    assert r1 not in b.chunks and not b.queue


@pytest.mark.slow
def test_cancel_in_slot_frees_it_for_next_admission(ctx):
    """Cancelling an in-flight request frees its slot: with one slot, the
    queued follower is admitted and still matches its own offline run."""
    p = api.Params(num_frames=6, num_steps=1, seed=2, temp=0.3,
                   eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1,
                          prefix_budget=32)
    r0 = b.submit("hello", params=p)
    r1 = b.submit("world", params=p)
    b.step()  # admits r0, runs its first frame
    slot = b.slot_rows[0]
    assert b.slot_req[slot] is not None and b.slot_req[slot].rid == r0
    assert b.cancel(r0)
    assert b.slot_req[slot] is None and bool(b._done_np[slot])
    results = b.drain()
    assert set(results) == {r1}
    assert results[r1].frames == 6
    p_off = api.Params(**{**p.__dict__, "seed": p.seed + r1})
    want = _offline(ctx, "world", p_off)
    _assert_pcm_close(results[r1], want.samples, msg="follower", max_lsb=10)


def test_cancel_finished_unclaimed(ctx):
    """Cancelling after completion drops the unclaimed Result."""
    p = api.Params(num_frames=2, num_steps=1, seed=1, eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=1,
                          prefix_budget=32)
    rid = b.submit("hello", params=p)
    for _ in range(64):
        b.step()
        if rid in b.finished:
            break
    assert rid in b.finished
    assert b.cancel(rid)
    assert rid not in b.finished and rid not in b.chunks


@pytest.mark.slow
def test_spec_admit_matches_host_admit(ctx):
    """Speculative admission (device-chosen rows, receipt-resolved host
    mirrors) must reproduce host-picked admission per rid: slot assignment
    may differ, but every computation is row-wise identical and noise is
    per-request, so the PCM matches."""
    p = api.Params(num_frames=3, num_steps=1, seed=100, temp=0.4,
                   eos_enabled=False)
    texts = ["hello world", "how low", "hello hello", "world world",
             "who who"]
    want = {}
    b0 = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                           prefix_budget=32)
    for t in texts:
        want[b0.submit(t, params=p)] = t
    ref = b0.drain()

    b1 = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                           prefix_budget=32, spec_admit=True)
    rids = [b1.submit(t, params=p) for t in texts]
    got = b1.drain()
    assert set(got) == set(rids) == set(ref)
    assert b1._spec_inflight == 0 and not b1._receipts
    for rid in rids:
        np.testing.assert_array_equal(got[rid].pcm_i16, ref[rid].pcm_i16)


@pytest.mark.slow
def test_spec_admit_overshoot_requeues(ctx):
    """Requests the device could not place (no free row at admit execution)
    land in the trash row and must be re-queued by the receipt resolution,
    finishing eventually with correct output."""
    p = api.Params(num_frames=2, num_steps=1, seed=7, temp=0.3,
                   eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=1, max_len=96, admit_chunk=2,
                          prefix_budget=32, spec_admit=True)
    b._finish_ema = 8.0  # force a large speculative overshoot
    rids = [b.submit(t, params=p) for t in ["one two", "three four",
                                            "five six"]]
    got = b.drain()
    assert set(got) == set(rids)
    assert b._spec_inflight == 0 and not b._receipts
    for rid, text in zip(rids, ["one two", "three four", "five six"]):
        p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
        want = _offline(ctx, text, p_off)
        _assert_pcm_close(got[rid], want.samples, msg=text, max_lsb=10)


@pytest.mark.slow
def test_spec_admit_pipelined(ctx):
    """spec_admit under the pipelined loop (its production operating point):
    staggered EOS + slot reuse, results match the offline runs."""
    p = api.Params(num_frames=3, num_steps=1, seed=50, temp=0.4,
                   eos_enabled=False)
    texts = ["hello world", "how low", "hello hello", "world world"]
    b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                          prefix_budget=32, pipeline=True, spec_admit=True)
    rids = [b.submit(t, params=p) for t in texts]
    got = b.drain()
    assert set(got) == set(rids)
    for rid, text in zip(rids, texts):
        p_off = api.Params(**{**p.__dict__, "seed": p.seed + rid})
        want = _offline(ctx, text, p_off)
        _assert_pcm_close(got[rid], want.samples, msg=text, max_lsb=10)


def test_spec_admit_cancel_in_receipt(ctx):
    """Cancelling a request whose speculative admit is still unresolved
    marks it; the resolution skips the install and the rest drain fine."""
    p = api.Params(num_frames=2, num_steps=1, seed=7, eos_enabled=False)
    b = ContinuousBatcher(ctx.engine, slots=2, max_len=96, admit_chunk=2,
                          prefix_budget=32, spec_admit=True)
    r0 = b.submit("hello", params=p)
    r1 = b.submit("world", params=p)
    assert b._admit() == 2 and b._receipts  # both in an unresolved receipt
    assert b.cancel(r1)
    assert not b.cancel(r1)  # idempotent
    got = b.drain()
    assert set(got) == {r0}
    assert not b._spec_cancelled and b._spec_inflight == 0
