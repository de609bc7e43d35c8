"""Serving benchmark: concurrent real-time 24 kHz streams per chip.

Runs the full pipeline (prefill -> jitted AR frame loop -> latent scaling ->
Mimi vocoder) for B independent streams on one chip and reports

    streams = B * generated_audio_seconds / wall_seconds

i.e. how many independent real-time streams the chip sustains. Baseline is
the BASELINE.json north-star target of 200 streams/chip on TPU v5e (the
reference publishes no wall-clock numbers -- BASELINE.md).

Prints ONE JSON line:
    {"metric": "concurrent_realtime_streams", "value": N, "unit": "streams/chip",
     "vs_baseline": N/200}

Env knobs: PTTS_BENCH_BATCH (default 256), PTTS_BENCH_FRAMES (default 50),
PTTS_BENCH_DTYPE (f32|bf16, default bf16), PTTS_BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: first bench run pays the compile,
    later runs (and the driver's round-end run) hit the cache."""
    try:
        import jax

        cache_dir = os.environ.get("PTTS_COMPILE_CACHE",
                                   os.path.expanduser("~/.cache/ptts_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def run_bench(batch: int, frames: int, dtype_name: str, repeats: int,
              verbose: bool = True,
              modes=("on", "off", "ragged", "ragged_bucketed")):
    import jax
    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg = FlowLMConfig()
    mcfg = MimiConfig()

    T0 = 64                       # voice cond (~30) + tokens (~30) + BOS
    frame_bucket = ((frames + 63) // 64) * 64
    max_len = T0 + frame_bucket

    # Cold-start decomposition (round 4): the FIRST device interaction of a
    # process pays a large, highly variable transport attach cost (measured
    # 30-500 s through the remote tunnel; zero on a local TPU host). Warm
    # the attach on a background thread while the host draws the random
    # weights, and report it separately -- weights_s then measures the
    # actual production upload path (one packed transfer, utils/packing.py;
    # the per-leaf path it replaced measured 25.5 s vs 7.1 s packed for the
    # same 221 MB).
    import threading

    t_a = time.perf_counter()
    attach_s = [0.0]

    def _attach():
        float(jnp.sum(jax.device_put(np.ones(8, np.float32))))
        attach_s[0] = time.perf_counter() - t_a

    th = threading.Thread(target=_attach, daemon=True)
    th.start()
    fw_h = flowlm.random_weights(cfg, seed=0)
    mw_h = mimi.random_weights(mcfg, seed=1)
    th.join()
    t_w = time.perf_counter()
    fw = flowlm.to_device(fw_h, dtype, cfg)
    mw = mimi.to_device(mw_h, dtype, mcfg)
    jax.block_until_ready(jax.tree.leaves(fw) + jax.tree.leaves(mw))
    # belt and braces: block_until_ready is unreliable through the tunnel;
    # a scalar readback off the largest weight is a true fence
    float(jnp.sum(jax.tree.leaves(fw)[0][..., :1].astype(jnp.float32)))
    weights_s = time.perf_counter() - t_w
    pimpl = flowlm.resolve_prefill_impl()  # Pallas fused-QKV kernel on TPU

    rng = np.random.default_rng(0)
    prefix = jnp.asarray(
        rng.standard_normal((batch, T0, cfg.d_model)) * 0.02, dtype
    )
    lengths = jnp.full((batch,), T0, jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((batch, frame_bucket, cfg.latent_dim)) * 0.8, dtype
    )

    # Ragged early-exit case: EOS fires at frame 0, per-stream eos_after
    # spreads the stop over [10, frames] -> frames_used = eos_after + 1.
    ragged_after = jnp.asarray(
        9 + (np.arange(batch) * (frames - 10) // max(batch - 1, 1)), jnp.int32
    )

    # NB: weights must be ARGUMENTS of the jitted fn -- closing over large
    # arrays inlines them as HLO constants and explodes compile time.
    @functools.partial(jax.jit, static_argnames=())
    def scale_and_decode(fw_, mw_, lat):
        return mimi.decode(mw_, flowlm.scale_latents(fw_, lat[:, :frames]), mcfg)

    def pipeline(prefix, lengths, noise, eos_mode: str):
        # Three separately-jitted stages (the production engine's call
        # pattern). One monolithic jit of the whole pipeline measured the
        # same runtime but 100x the XLA compile time.
        cache, x0 = flowlm.prefill_init(fw, prefix, lengths, cfg, max_len, pimpl)
        if eos_mode == "off":
            res = flowlm.generate_latents(
                fw, cache, x0, noise, cfg, max_frames=frame_bucket,
                num_steps=1, eos_enabled=False,
            )
        else:
            # the engine's serving path: on-device lax.while_loop with full
            # per-frame EOS bookkeeping (ptts_flowlm.c:1207-1238 semantics)
            # and the TRUE per-stream frame budget (the dynamic trip count
            # stops at the requested length, not the compile bucket)
            res = flowlm.generate_latents_while(
                fw, cache, x0, noise, cfg, max_frames=frame_bucket,
                num_steps=1,
                eos_threshold=1e9 if eos_mode == "on" else -1e9,
                eos_min_frames=1,
                eos_after=ragged_after if eos_mode == "ragged" else 0,
                max_frames_per_stream=jnp.full((batch,), frames, jnp.int32),
            )
        return scale_and_decode(fw, mw, res.latents), res.frames_used

    def run_chained(n: int, eos_mode: str) -> float:
        """Run the pipeline n times back-to-back (each dependent on the
        previous via a data tap) and sync with a HOST READBACK. Through the
        axon tunnel block_until_ready() returns before device execution
        finishes, so only a readback is a true fence; chaining + slope
        removes the fixed readback latency."""
        t0 = time.perf_counter()
        tap = jnp.zeros((), jnp.float32)
        px = prefix
        used = None
        for _ in range(n):
            pcm, used = pipeline(px + tap.astype(dtype) * 0, lengths, noise,
                                 eos_mode)
            tap = jnp.sum(pcm[:1, :8].astype(jnp.float32))
        float(tap)  # host readback = fence
        run_chained.last_used = np.asarray(used)
        return time.perf_counter() - t0

    # Length-bucketed ragged pipeline: the engine.batch_generate strategy
    # (sort by frame budget into equal-size groups; each group's while_loop
    # exits at the GROUP max and its vocoder runs at the group's own
    # 16-frame-rounded width) -- without it one long stream pins the whole
    # lockstep batch (round-3 VERDICT item 3).
    after_np = np.asarray(ragged_after)
    g_idx = np.array_split(np.argsort(after_np, kind="stable"), 4)
    g_take = [jnp.asarray(g) for g in g_idx]
    g_width = [min(frames, (int(after_np[g].max()) + 1 + 15) // 16 * 16)
               for g in g_idx]

    @functools.partial(jax.jit, static_argnames=("width",))
    def scale_decode_w(fw_, mw_, lat, width: int):
        return mimi.decode(mw_, flowlm.scale_latents(fw_, lat[:, :width]),
                           mcfg)

    def pipeline_ragged_bucketed(px):
        taps, useds = [], []
        for take, width in zip(g_take, g_width):
            cache, x0 = flowlm.prefill_init(
                fw, px[take], lengths[take], cfg, max_len, pimpl)
            res = flowlm.generate_latents_while(
                fw, cache, x0, noise[take], cfg, max_frames=frame_bucket,
                num_steps=1, eos_threshold=1e9, eos_min_frames=1,
                eos_after=ragged_after[take],
                max_frames_per_stream=jnp.full((take.size,), frames,
                                               jnp.int32),
            )
            pcm = scale_decode_w(fw, mw, res.latents, width)
            taps.append(jnp.sum(pcm[:1, :8].astype(jnp.float32)))
            useds.append(res.frames_used)  # stays on device until the fence
        return sum(taps), useds

    def run_chained_bucketed(n: int) -> float:
        t0 = time.perf_counter()
        tap = jnp.zeros((), jnp.float32)
        useds = None
        for _ in range(n):
            tap, useds = pipeline_ragged_bucketed(prefix + tap.astype(dtype) * 0)
        float(tap)  # host readback = fence (timed region ends here)
        wall = time.perf_counter() - t0
        used = np.zeros(batch, np.int64)
        for gi, u in zip(g_idx, useds):
            used[gi] = np.asarray(u)
        run_chained_bucketed.last_used = used
        return wall

    def measure(eos_mode: str):
        runner = (run_chained_bucketed if eos_mode == "ragged_bucketed"
                  else lambda n, m=eos_mode: run_chained(n, m))
        t_compile = time.perf_counter()
        runner(1)
        compile_s = time.perf_counter() - t_compile
        walls = []
        for _ in range(repeats):
            t1 = runner(1)
            t3 = runner(3)
            walls.append((t3 - t1) / 2)  # slope: fixed costs cancel
        wall = min(walls)
        # emitted audio only (ragged EOS emits fewer frames per stream)
        last_used = (run_chained_bucketed.last_used
                     if eos_mode == "ragged_bucketed"
                     else run_chained.last_used)
        audio_seconds = float(np.minimum(last_used, frames).sum()) \
            / mcfg.frame_rate
        streams = audio_seconds / wall
        if verbose:
            tag = " (length-bucketed)" if eos_mode == "ragged_bucketed" else ""
            print(
                f"[bench] eos={eos_mode}{tag}: B={batch} frames={frames} "
                f"dtype={dtype_name} wall={wall:.3f}s compile={compile_s:.1f}s "
                f"-> {streams:.1f} streams/chip",
                file=sys.stderr,
            )
        return streams, wall, compile_s

    # Headline = the honest serving path: full per-frame EOS bookkeeping in
    # the on-device while_loop, no stream exiting early (worst case).
    out = {m: measure(m) for m in modes}
    streams_on, wall_on, compile_on = out.get("on", (0.0, 0.0, 0.0))
    streams_off, wall_off, compile_off = out.get("off", (1e-9, 0.0, 0.0))
    streams_ragged, wall_ragged, _ = out.get("ragged", (0.0, 0.0, 0.0))
    # length-bucketed alternative, measured for the record: it LOSES on TPU
    # (3032 vs 3418 at B=256) -- per-frame cost is weight-streaming-bound
    # and nearly batch-independent, so 4 sequential B/4 while_loops raise
    # total trips 50 -> 140, which early exits can't pay back (PERF.md r4)
    streams_rb, _, _ = out.get("ragged_bucketed", (0.0, 0.0, 0.0))

    return {
        "metric": "concurrent_realtime_streams",
        "value": round(float(streams_on), 2),
        "unit": "streams/chip",
        "vs_baseline": round(float(streams_on) / 200.0, 3),
        "detail": {
            "batch": batch,
            "frames": frames,
            "dtype": dtype_name,
            "wall_s": round(wall_on, 4),
            "compile_s": round(compile_on + compile_off, 1),
            "weights_s": round(weights_s, 1),
            "attach_s": round(attach_s[0], 1),
            "platform": jax.default_backend(),
            "eos_off_streams": round(float(streams_off), 2),
            "eos_on_vs_off": round(float(streams_on / streams_off), 4),
            "ragged_eos_streams": round(float(streams_ragged), 2),
            "ragged_wall_s": round(wall_ragged, 4),
            "ragged_bucketed_streams": round(float(streams_rb), 2),
        },
    }


def run_batcher_bench(slots: int, dtype_name: str, target_finished: int,
                      max_seconds: float = 120.0, verbose: bool = True,
                      frames_per_step: int = 1, collect_pcm: bool = True,
                      admit_chunk: int = 32, pipeline: bool = False,
                      max_len: int = 128, label: str = "",
                      split_admit=None, spec_admit: bool = False,
                      pack_flags=None, stats_out: dict = None):
    """Sustained continuous-batching throughput on the chip.

    Drives the production ContinuousBatcher (admission -> fused
    FlowLM+streaming-Mimi frame step -> per-frame PCM readback -> slot
    reuse) closed-loop-saturated with ragged-length requests (10..50
    frames) until ``target_finished`` requests complete. This is the
    serving number the offline lockstep bench can't show: ragged EOS frees
    slots mid-flight and the batcher re-admits into them, instead of dead
    slots riding until the slowest stream finishes.

    Returns (streams, first_chunk_p50_ms, finished, wall).
    """
    import types

    import jax.numpy as jnp

    from ptts_tpu.config import FlowLMConfig, KernelFlags, MimiConfig
    from ptts_tpu.models import flowlm, mimi
    from ptts_tpu.runtime.batching import ContinuousBatcher, Request

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg, mcfg = FlowLMConfig(), MimiConfig()
    fw = flowlm.to_device(flowlm.random_weights(cfg, seed=0), dtype, cfg)
    mw = mimi.to_device(mimi.random_weights(mcfg, seed=1), dtype, mcfg)
    # minimal engine surface the batcher touches (prepare() is bypassed --
    # requests are enqueued directly, so no tokenizer/ctx is needed)
    eng = types.SimpleNamespace(flowlm_cfg=cfg, mimi_cfg=mcfg, dtype=dtype,
                                fw=fw, mw=mw, flags=KernelFlags())

    T0 = 64
    # max_len = prefix + decode RING: requests are <= 50 frames, so 64 ring
    # columns hold every live span and the wrap recycles retired columns --
    # the pre-ring bench needed 256 columns of headroom for the same load
    # (2x the decode-attention cache traffic per frame)
    b = ContinuousBatcher(eng, slots=slots, max_len=max_len,
                          admit_chunk=admit_chunk,
                          prefix_budget=T0, max_num_steps=1,
                          frames_per_step=frames_per_step,
                          collect_pcm=collect_pcm, pipeline=pipeline,
                          split_admit=split_admit, spec_admit=spec_admit,
                          pack_flags=pack_flags)
    rng = np.random.default_rng(0)
    # ids admission path (the production prepare() route): one voice cond
    # cached on device, each request ships token ids only -- a host-built
    # [64, 1024] prefix upload per request was the admission bottleneck
    # through the tunnel (PERF.md round 3)
    cond = (rng.standard_normal((40, cfg.d_model)) * 0.02).astype(np.float32)
    vidx = b.register_voice("bench", cond)
    assert vidx >= 0
    admit_t = {}          # rid -> time the batcher placed it in a slot
    first_chunk_ms = []   # admission -> first 80 ms chunk read back
    pending_first = set()

    def make_req():
        frames = int(rng.integers(10, 51))
        ids = rng.integers(1, cfg.vocab, size=int(rng.integers(4, 21)))
        # production serving path (seed=-1 requests): the noise table is
        # drawn ON DEVICE at admission -- the padded host row upload
        # (~25 KB/request) dominated remote admission (PERF.md round 3)
        req = Request(rid=-1, prefix=None, noise=None, max_frames=frames,
                      eos_after=0, num_steps=1,
                      eos_threshold=np.float32(1e30), eos_min_frames=1,
                      ids=ids.astype(np.int32), voice_idx=vidx,
                      noise_seed=int(rng.integers(0, 2**31)), temp=0.7)
        with b._rid_lock:
            req.rid = b._next_rid
            b._next_rid += 1
        return req

    def top_up():
        # closed-loop saturation: enough queued work to refill EVERY free
        # slot on the next step. (The previous admit_chunk*2 depth was an
        # accidental admission-bandwidth cap: _admit() drains the whole
        # queue, so occupancy equilibrated at ~2 admit groups/step x avg
        # stream lifetime ~= 240 live streams REGARDLESS of pool size --
        # bigger pools then paid padded-row device time at the same live
        # count, which is what the round-4 "512-slot cliff" was. Measured
        # occupancy-vs-slots in PERF.md.)
        while len(b.queue) < slots + b.admit_chunk:
            req = make_req()
            b.enqueue(req)
            pending_first.add(req.rid)

    def note_admissions(when):
        # ``when`` is the START of the step that performed the admission:
        # a request admitted at the top of step() can have its first chunk
        # read back within that same step (serial loop), so stamping it
        # after step() returns would under-report the latency as ~0
        for req in b.slot_req:
            if req is not None and req.rid not in admit_t:
                admit_t[req.rid] = when

    def note_first_chunks():
        # admission -> first-chunk latency (queue wait under closed-loop
        # saturation is an artifact of the load generator, so it's excluded).
        # The chunk-arrival side uses the batcher's collect-time stamp
        # (first_chunk_t): with split_admit, a fresh stream's first chunk
        # lands on the small k=1 readback mid-step; a post-step clock would
        # charge it the whole k=K-1 bulk PCM transfer it didn't wait for.
        done = []
        for rid in pending_first:
            ts = b.first_chunk_t.get(rid)
            if ts is None and rid in b.finished:
                fc = b.finished[rid].first_chunk_t
                ts = fc if fc >= 0 else None
            if ts is not None:  # first 80 ms chunk has been read back
                if rid in admit_t:
                    first_chunk_ms.append((ts - admit_t[rid]) * 1000.0)
                done.append(rid)
            elif rid in b.finished or rid not in b.chunks:
                done.append(rid)
        pending_first.difference_update(done)

    # warmup: compiles admit_slots + fused_stream_step
    for _ in range(12):
        top_up()
        b.step()
    b.finished.clear()
    # requests admitted during warmup carry compile time in their first-chunk
    # clock; exclude them from the latency stats (throughput still counts them)
    pending_first.clear()
    first_chunk_ms.clear()
    b.phase_s = {k: 0.0 for k in b.phase_s}
    b.n_steps = 0
    b.n_admit_groups = 0

    frames_done = 0
    finished = 0
    t0 = time.perf_counter()
    while finished < target_finished:
        top_up()
        t_step = time.perf_counter()
        b.step()
        note_admissions(t_step)
        note_first_chunks()
        if b.finished:
            for r, res in list(b.finished.items()):
                frames_done += res.frames
                finished += 1
                del b.finished[r]
        if time.perf_counter() - t0 > max_seconds:
            break
    wall = time.perf_counter() - t0
    streams = frames_done / mcfg.frame_rate / wall
    p50 = float(np.percentile(first_chunk_ms, 50)) if first_chunk_ms else -1.0
    if verbose:
        tags = "".join(
            [" (device-bound)" if not collect_pcm else "",
             " (pipelined)" if pipeline else "",
             f" [{label}]" if label else ""])
        print(
            f"[bench] batcher{tags}: "
            f"slots={slots} dtype={dtype_name} "
            f"fps={frames_per_step} "
            f"finished={finished} frames={frames_done} wall={wall:.1f}s -> "
            f"{streams:.1f} sustained streams/chip, "
            # device-bound mode never reads PCM back, so its 'first chunk'
            # stamp is the first done/was_done FLAG readback for the stream
            # -- label it honestly (round-4 VERDICT item 7)
            + (f"first-flag p50 {p50:.0f} ms (flag-readback latency; PCM "
               f"stays on chip)" if not collect_pcm
               else f"first-chunk p50 {p50:.0f} ms"),
            file=sys.stderr,
        )
        n = max(b.n_steps, 1)
        phases = " ".join(f"{k}={v / n * 1e3:.1f}" for k, v in b.phase_s.items())
        # c_wait/c_pcm are sub-phases OF collect -- exclude them from the
        # total or "other" goes negative
        top = sum(v for k, v in b.phase_s.items() if not k.startswith("c_"))
        print(
            f"[bench] batcher phases (ms/step over {b.n_steps} steps, "
            f"{b.n_admit_groups} admit groups): {phases} "
            f"other={(wall - top) / n * 1e3:.1f}",
            file=sys.stderr,
        )
    if stats_out is not None:
        stats_out.update(
            n_steps=b.n_steps, B1=b.B1, phase_s=dict(b.phase_s),
            frames_done=frames_done, frame_samples=mcfg.frame_samples,
            frames_per_step=frames_per_step, wall=wall,
            n_admit_groups=b.n_admit_groups)
    return streams, p50, finished, wall


def run_batcher_bench_prepared(slots: int, target_finished: int,
                               max_seconds: float = 120.0,
                               frames_per_step: int = 8,
                               verbose: bool = True):
    """Sustained batcher throughput WITH the host-side request prep on the
    clock: real tokenizer + prefix/params assembly via ``batcher.prepare()``
    on 4 feeder threads (the server's handler-thread layout), feeding the
    same closed loop. The plain batcher bench enqueues pre-built Requests,
    so its figures exclude tokenize/prefix work -- this variant measures
    whether that prep can starve the device loop (round-3 VERDICT item 6).

    Uses a FULL-SIZE synthetic model dir (cached in /tmp across runs) so
    prepare() runs the production tokenizer bytes.
    """
    import subprocess
    import threading

    from ptts_tpu import api
    from ptts_tpu.runtime.batching import ContinuousBatcher

    model_dir = os.environ.get("PTTS_BENCH_MODEL_DIR",
                               "/tmp/ptts_bench_model")
    if not os.path.isfile(os.path.join(model_dir, "tts_b6369a24.safetensors")):
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "tools", "make_synth_checkpoint.py"),
                        model_dir], check=True, stdout=sys.stderr)
    os.environ.setdefault("PTTS_DTYPE", "bf16")
    ctx = api.Context(model_dir)
    eng = ctx.engine  # full engine: mmap load + packed upload

    b = ContinuousBatcher(eng, slots=slots, max_len=128, admit_chunk=32,
                          prefix_budget=64, max_num_steps=1,
                          frames_per_step=frames_per_step,
                          collect_pcm=False, pipeline=True)
    rng = np.random.default_rng(0)
    words = ["hello", "world", "how", "low", "can", "you", "go", "today"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 9))))
             for _ in range(64)]
    stop = threading.Event()

    def feeder():
        r = np.random.default_rng(threading.get_ident() & 0xFFFF)
        while not stop.is_set():
            # queue depth must cover every free slot or occupancy caps
            # below the pool size (see top_up in run_batcher_bench)
            if len(b.queue) < slots + b.admit_chunk:
                p = api.Params(num_frames=int(r.integers(10, 51)),
                               num_steps=1, seed=-1, temp=0.7,
                               eos_enabled=False)
                try:
                    b.enqueue(b.prepare(texts[int(r.integers(len(texts)))],
                                        params=p))
                except api.PttsError:
                    break
            else:
                time.sleep(0.0005)

    threads = [threading.Thread(target=feeder, daemon=True) for _ in range(4)]
    for th in threads:
        th.start()
    try:
        # wait for the feeders to build a full queue BEFORE warmup: warmup
        # steps on an empty queue compile nothing, which pushes every program
        # compile into the timed window -- and the timed loop's hot spin then
        # GIL-starves the feeders (measured: 686 and even 37 streams/chip for
        # the same config that sustains ~2000; the production server waits on
        # a condition variable instead of spinning, so this is harness-only)
        t_fill = time.perf_counter()
        while len(b.queue) < slots and time.perf_counter() - t_fill < 60:
            time.sleep(0.005)
        for _ in range(12):  # warmup compiles (pool now saturated)
            b.step()
        b.finished.clear()
        frames_done = 0
        finished = 0
        t0 = time.perf_counter()
        while finished < target_finished:
            if b.step() == 0:
                time.sleep(0.001)  # nothing active: yield the GIL to feeders
            for r, res in list(b.finished.items()):
                frames_done += res.frames
                finished += 1
                del b.finished[r]
            if time.perf_counter() - t0 > max_seconds:
                break
        wall = time.perf_counter() - t0
    finally:
        stop.set()
    streams = frames_done / eng.mimi_cfg.frame_rate / wall
    if verbose:
        print(f"[bench] batcher (prepared, device-bound, pipelined): "
              f"slots={slots} fps={frames_per_step} finished={finished} "
              f"frames={frames_done} wall={wall:.1f}s -> {streams:.1f} "
              f"sustained streams/chip", file=sys.stderr)
        ph = {k: round(v / max(b.n_steps, 1) * 1000, 1)
              for k, v in b.phase_s.items()}
        print(f"[bench] prepared phases (ms/step over {b.n_steps} steps, "
              f"{b.n_admit_groups} admit groups, queue={len(b.queue)}): "
              f"{ph}", file=sys.stderr)
    return streams, finished, wall


def main() -> int:
    _enable_compile_cache()
    batch = int(os.environ.get("PTTS_BENCH_BATCH", "256"))
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "50"))
    dtype = os.environ.get("PTTS_BENCH_DTYPE", "bf16")
    repeats = int(os.environ.get("PTTS_BENCH_REPEATS", "3"))

    result = None
    b = batch
    while b >= 1:
        try:
            result = run_bench(b, frames, dtype, repeats)
            break
        except Exception as e:  # OOM etc: halve the batch and retry
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
                print(f"[bench] B={b} OOM, retrying with {b // 2}", file=sys.stderr)
                b //= 2
                continue
            raise
    if result is None:
        print(json.dumps({"metric": "concurrent_realtime_streams", "value": 0,
                          "unit": "streams/chip", "vs_baseline": 0}))
        return 1

    # Sustained continuous-batching serving (ragged arrivals, slot reuse,
    # per-frame PCM readback) -- the closest-to-production number.
    try:
        bslots = int(os.environ.get("PTTS_BENCH_BATCHER_SLOTS", str(b)))
        breqs = int(os.environ.get("PTTS_BENCH_BATCHER_REQS", "1200"))
        bfps = int(os.environ.get("PTTS_BENCH_FPS", "8"))
        streams_b, p50_b, fin_b, wall_b = run_batcher_bench(
            bslots, dtype, breqs, frames_per_step=bfps)
        result["detail"]["sustained_batcher_streams"] = round(streams_b, 2)
        result["detail"]["batcher_first_chunk_p50_ms"] = round(p50_b, 1)
        result["detail"]["batcher_finished"] = fin_b
        result["detail"]["batcher_frames_per_step"] = bfps
        # round-5 tunnel operating point: pipelined dispatch (PCM copy
        # overlaps the next window's compute) + speculative admission --
        # measured strictly dominant over the serial default above
        # (+25% sustained AND ~5x lower first-chunk p50; PERF.md round 5)
        streams_ps, p50_ps, _, _ = run_batcher_bench(
            bslots, dtype, breqs, frames_per_step=bfps, pipeline=True,
            spec_admit=True, label="pipelined+spec")
        result["detail"]["sustained_batcher_streams_pipelined_spec"] = round(
            streams_ps, 2)
        result["detail"]["batcher_pipelined_spec_p50_ms"] = round(p50_ps, 1)
        # low-latency operating point: K=4 trades ~15% sustained throughput
        # for ~2x lower admission->first-chunk latency
        streams_l, p50_l, _, _ = run_batcher_bench(
            bslots, dtype, breqs // 2, frames_per_step=4)
        result["detail"]["batcher_lowlat_streams"] = round(streams_l, 2)
        result["detail"]["batcher_lowlat_p50_ms"] = round(p50_l, 1)
        # device-bound mode: PCM stays on the chip (only done flags read
        # back) -- what co-located serving would sustain, where the bulk
        # PCM leaves over local DMA instead of the remote tunnel RPC.
        # Operating point from the round-4 slots x K x mode sweep
        # (tools/bench_batcher_sweep.py, PERF.md): slots=384, K=8,
        # PIPELINED (dispatch step N+1 before collecting N -- the done
        # readback overlaps the next step's compute). The serial point is
        # the low-latency alternative (p50 ~120 ms vs ~165 ms).
        dslots = int(os.environ.get("PTTS_BENCH_DEVICE_SLOTS", "384"))
        dreqs = breqs * dslots // max(bslots, 1)
        streams_d, p50_d, _, _ = run_batcher_bench(
            dslots, dtype, dreqs, frames_per_step=bfps, collect_pcm=False,
            pipeline=True)
        result["detail"]["batcher_device_streams"] = round(streams_d, 2)
        result["detail"]["batcher_device_p50_ms"] = round(p50_d, 1)
        # speculative (mid-step) admission: the admit program picks its
        # target rows ON DEVICE, so rows freed in the still-uncollected
        # window refill for the very next window -- closes the occupancy
        # gap that capped the pipelined plateau at ~71% (PERF.md round 5)
        streams_sp, p50_sp, _, _ = run_batcher_bench(
            dslots, dtype, dreqs, frames_per_step=bfps, collect_pcm=False,
            pipeline=True, spec_admit=True, label="spec-admit")
        result["detail"]["batcher_device_spec_streams"] = round(streams_sp, 2)
        result["detail"]["batcher_device_spec_p50_ms"] = round(p50_sp, 1)
        streams_ds, p50_ds, _, _ = run_batcher_bench(
            dslots, dtype, dreqs, frames_per_step=bfps, collect_pcm=False)
        result["detail"]["batcher_device_serial_streams"] = round(streams_ds, 2)
        result["detail"]["batcher_device_serial_p50_ms"] = round(p50_ds, 1)
        # with host-side prepare() (tokenizer + prefix/params assembly) on
        # 4 feeder threads -- the other batcher rows enqueue pre-built
        # Requests and EXCLUDE that work (documented; VERDICT r3 item 6)
        if os.environ.get("PTTS_BENCH_PREPARED", "1") == "1":
            streams_p, _, _ = run_batcher_bench_prepared(
                dslots, dreqs, frames_per_step=bfps)
            result["detail"]["sustained_batcher_streams_prepared"] = round(
                streams_p, 2)
    except Exception as e:  # never sink the headline metric
        print(f"[bench] batcher bench failed: {e}", file=sys.stderr)

    # HTTP front door: first-byte latency + requests/s measured through the
    # real server (round-4 VERDICT item 4 -- the north-star <150 ms
    # first-chunk target is a serving-surface claim)
    if os.environ.get("PTTS_BENCH_HTTP", "1") == "1":
        try:
            # pipelined + spec-admit: the serving config the round-5 fences
            # measured strictly dominant for sustained traffic (HTTP A/B:
            # 36.7 -> 54.1 stream req/s, total p95 937 -> 593 ms, first-byte
            # p50 174.8 vs 188.5 ms -- both under the 200 ms bar).
            # Subprocess, not in-process: after the batcher legs this
            # process holds every prior leg's engines/slot pools and a long
            # tunnel session -- measured in-process HTTP 30.2 req/s / p50
            # 325 ms vs 52.7 / 199.6 standalone the same hour. A clean
            # process measures the server, not the bench's leftovers.
            import subprocess
            env = dict(os.environ, PTTS_HTTP_PIPELINE="1", PTTS_HTTP_SPEC="1")
            out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "bench_http.py")],
                env=env, stdout=subprocess.PIPE, stderr=sys.stderr,
                timeout=1800, check=True)
            result["detail"].update(json.loads(out.stdout.decode()))
        except Exception as e:
            print(f"[bench] http bench failed: {e}", file=sys.stderr)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
