"""Streaming synthesis: emit one 80 ms PCM chunk per FlowLM frame.

The reference has no streaming mode (it decodes whole sequences,
SURVEY.md §7 step 7); this is the serving path behind the north-star
time-to-first-chunk target. A StreamingSession drives B lockstep streams:

    session = StreamingSession.start(engine, texts, voices, params)
    for chunk in session:        # chunk: [B, 1920] f32 PCM @ 24 kHz
        play(chunk)

Each step runs one jitted FlowLM frame (out_norm -> EOS -> flow-matching
Euler -> input_linear -> KV decode step) and one jitted streaming-Mimi chunk
decode; both carry donated device state, so per-frame host work is just the
two dispatches.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import api
from ..config import FlowLMConfig
from ..models import flowlm, mimi_stream
from ..ops.norms import layernorm
from ..rng import frame_noise
from ..text import estimate_frames, prepare_text


@functools.partial(
    jax.jit, static_argnames=("cfg", "eos_enabled", "flags"),
    donate_argnames=("cache",),
)
def flow_frame_step(
    w,
    cache: flowlm.KVCache,
    x: jnp.ndarray,            # [B, d_model] transformer output at prev pos
    noise: jnp.ndarray,        # [B, latent]
    time_embs: jnp.ndarray,    # [S, flow_dim]
    frame_idx: jnp.ndarray,    # [B] or scalar int32 (per-stream frame counter)
    eos_step: jnp.ndarray,     # [B]
    done: jnp.ndarray,         # [B] bool
    cfg: FlowLMConfig,
    eos_enabled: bool,
    eos_threshold,             # float or [B] (per-request in the batcher)
    eos_min_frames,            # int or [B]
    eos_after: jnp.ndarray,    # [B]
    max_frames: jnp.ndarray | None = None,  # [B] per-stream frame budget
    num_steps: jnp.ndarray | None = None,   # [B] when time_embs is [B, S, fd]
    flags: "flowlm.KernelFlags" = flowlm.DEFAULT_FLAGS,
):
    """One generation frame (mirrors the body of flowlm.generate_latents).

    ``time_embs`` is either a shared [S, fd] table (lockstep pools) or a
    per-stream [B, S_max, fd] table with ``num_steps`` [B] -- heterogeneous
    Params in the continuous batcher."""
    normed = layernorm(x, w["out_norm_w"], w["out_norm_b"], cfg.ln_eps)
    eos = flowlm.eos_logit(w, normed)
    hit = eos_enabled & ((frame_idx + 1) >= eos_min_frames) & (eos >= eos_threshold)
    eos_step = jnp.where((eos_step < 0) & hit, frame_idx, eos_step)

    if time_embs.ndim == 3:
        latent, _ = flowlm.lsd_decode_ragged(w, normed, time_embs, num_steps,
                                             noise, cfg, flags)
    else:
        latent, _ = flowlm.lsd_decode(w, normed, time_embs, noise, cfg, flags)
    newly_done = (eos_step >= 0) & (frame_idx >= eos_step + eos_after)
    done = done | newly_done
    if max_frames is not None:
        done = done | (frame_idx + 1 >= max_frames)

    scaled = flowlm.scale_latents(w, latent)
    nxt = jnp.einsum("bi,oi->bo", latent, w["input_linear"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
    cache, x = flowlm.decode_step(w, cache, nxt, cfg, flags)
    return cache, x, scaled, eos, eos_step, done


def quantize_i16_device(pcm: jnp.ndarray) -> jnp.ndarray:
    """Reference PCM quantization ON DEVICE: clamp to [-1, 1], *32767,
    truncate toward zero (ptts_audio.c:82-88; bit-equal to io/wav
    quantize_i16 of the same f32 values). Emitting int16 from the fused
    step quarters the per-frame readback bytes -- the client-facing frame
    cost is readback-bound (PERF.md)."""
    s = jnp.clip(pcm.astype(jnp.float32), -1.0, 1.0)
    return jnp.trunc(s * jnp.float32(32767.0)).astype(jnp.int16)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mcfg", "eos_enabled", "flags", "emit_i16",
                     "pack_flags"),
    donate_argnames=("cache", "mimi_state"),
)
def fused_stream_step(
    fw,
    mw,
    cache: flowlm.KVCache,
    mimi_state,
    x: jnp.ndarray,
    noise: jnp.ndarray,        # [B, latent] row OR [B, F, latent] table
    time_embs: jnp.ndarray,
    frame_idx: jnp.ndarray,
    eos_step: jnp.ndarray,
    done: jnp.ndarray,
    cfg: FlowLMConfig,
    mcfg,
    eos_enabled: bool,
    eos_threshold,             # float or [B]
    eos_min_frames,            # int or [B]
    eos_after: jnp.ndarray,
    max_frames: jnp.ndarray | None = None,
    num_steps: jnp.ndarray | None = None,
    flags: "flowlm.KernelFlags" = flowlm.DEFAULT_FLAGS,
    emit_i16: bool = False,
    pack_flags: bool = False,
):
    """One serving frame in a single device program: FlowLM frame step +
    streaming-Mimi chunk decode. One dispatch per 80 ms frame (dispatch
    latency is the streaming-path bottleneck on remote-tunnel setups).

    ``noise`` may be the whole per-stream noise table [B, F, latent]
    (device-resident, uploaded once at admission/start): the current frame's
    row is gathered ON DEVICE from ``frame_idx``, so the steady-state step
    takes no per-frame host uploads at all. ``emit_i16`` returns int16 PCM
    (quantize_i16_device) -- 4x smaller readback.

    ``pack_flags`` (requires emit_i16) appends two int16 flag columns to the
    PCM buffer -- [B, S]: was_done (pre-step done), [B, S+1]: post-step done
    -- so ONE device->host copy carries PCM *and* the step's liveness flags.
    Through a remote tunnel the two tiny flag RPCs otherwise serialize with
    the bulk PCM stream (PERF.md round 5: c_wait ~190 ms/step at 256 slots,
    the last ~20%% of the link)."""
    from ..models import mimi_stream

    if noise.ndim == 3:
        fi = jnp.broadcast_to(jnp.asarray(frame_idx, jnp.int32),
                              (noise.shape[0],))
        fi = jnp.clip(fi, 0, noise.shape[1] - 1)
        noise = jnp.take_along_axis(noise, fi[:, None, None], axis=1)[:, 0]

    was_done = done  # pre-step liveness (chunk is live iff ~was_done)
    cache, x, scaled, eos, eos_step, done = flow_frame_step(
        fw, cache, x, noise, time_embs, frame_idx, eos_step, done,
        cfg, eos_enabled, eos_threshold, eos_min_frames, eos_after, max_frames,
        num_steps, flags,
    )
    mimi_state, pcm = mimi_stream.decode_stream(
        mw, mimi_state, scaled[:, None, :], mcfg
    )
    if emit_i16:
        pcm = quantize_i16_device(pcm)
    if pack_flags:
        assert emit_i16, "pack_flags requires int16 PCM"
        extra = jnp.stack([was_done.astype(jnp.int16),
                           done.astype(jnp.int16)], axis=-1)   # [B, 2]
        pcm = jnp.concatenate([pcm, extra], axis=-1)
    return cache, mimi_state, x, pcm, eos, eos_step, done


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mcfg", "eos_enabled", "k", "flags", "emit_i16",
                     "pack_flags"),
    donate_argnames=("cache", "mimi_state"),
)
def fused_stream_steps(
    fw,
    mw,
    cache: flowlm.KVCache,
    mimi_state,
    x: jnp.ndarray,
    noise_tab: jnp.ndarray,    # [B, F, latent] device-resident table
    time_embs: jnp.ndarray,
    frame_idx: jnp.ndarray,    # [B] int32
    eos_step: jnp.ndarray,
    done: jnp.ndarray,
    cfg: FlowLMConfig,
    mcfg,
    eos_enabled: bool,
    eos_threshold,             # [B]
    eos_min_frames,            # [B]
    eos_after: jnp.ndarray,    # [B]
    max_frames: jnp.ndarray,   # [B]
    num_steps: jnp.ndarray,    # [B]
    k: int,
    flags: "flowlm.KernelFlags" = flowlm.DEFAULT_FLAGS,
    emit_i16: bool = True,
    pack_flags: bool = False,
):
    """K serving frames in ONE device program (lax.scan of the fused step).

    Amortizes the per-dispatch host/RPC cost (the batcher's bottleneck on
    remote-tunnel setups: one ~30 ms readback per 80 ms frame caps the pool
    at a few hundred streams) over ``k`` frames: one dispatch + one PCM
    readback yields ``k`` chunks per slot. Numerically identical to ``k``
    sequential fused_stream_step calls (same jitted ops in the same order).

    Returns (cache, mimi_state, x, pcm [k, B, samples], eos [k, B],
    eos_step, done, was_done [k, B], frame_idx) where ``was_done[j]`` is the
    pre-step done mask of frame j (chunk j of slot b is live iff
    ``~was_done[j, b]``) and ``done`` after frame j is ``was_done[j+1]``
    (final ``done`` for j = k-1).

    The AR FlowLM frames run in a lax.scan, but the vocoder is a pure
    consumer of the latents (no feedback into the language model), so all
    ``k`` frames decode in ONE mimi_stream.decode_stream call -- the
    per-frame streaming decode re-read every conv/transformer weight each
    frame and dominated the fused step's device time (PERF.md round 3);
    chunked decoding is exactly equal to per-frame (test_mimi_stream).
    """
    from ..models import mimi_stream

    def body(carry, _):
        cache, x, frame_idx, eos_step, done = carry
        was_done = done
        fi = jnp.clip(frame_idx, 0, noise_tab.shape[1] - 1)
        noise = jnp.take_along_axis(noise_tab, fi[:, None, None], axis=1)[:, 0]
        cache, x, scaled, eos, eos_step, done = flow_frame_step(
            fw, cache, x, noise, time_embs, frame_idx, eos_step, done,
            cfg, eos_enabled, eos_threshold, eos_min_frames, eos_after,
            max_frames, num_steps, flags,
        )
        return ((cache, x, frame_idx + 1, eos_step, done),
                (scaled, eos, was_done))

    (cache, x, frame_idx, eos_step, done), (scaled_k, eos_k, wd_k) = (
        jax.lax.scan(
            body, (cache, x, frame_idx, eos_step, done), None, length=k,
        )
    )
    B = scaled_k.shape[1]
    mimi_state, pcm = mimi_stream.decode_stream(
        mw, mimi_state, scaled_k.transpose(1, 0, 2), mcfg
    )                                       # [B, k * frame_samples]
    pcm_k = pcm.reshape(B, k, -1).transpose(1, 0, 2)
    if emit_i16:
        pcm_k = quantize_i16_device(pcm_k)
    if pack_flags:
        # Append 2 int16 flag columns per frame so the bulk PCM copy carries
        # the liveness flags too: [..., -2] = was_done[j] (pre-frame-j done),
        # [..., -1] = post-step done broadcast over frames. Kills the two
        # per-step flag RPCs that serialize with the PCM stream through a
        # remote tunnel (PERF.md round 5 transport fence).
        assert emit_i16, "pack_flags requires int16 PCM"
        extra = jnp.stack(
            [wd_k.astype(jnp.int16),
             jnp.broadcast_to(done.astype(jnp.int16)[None, :], wd_k.shape)],
            axis=-1)                                   # [k, B, 2]
        pcm_k = jnp.concatenate([pcm_k, extra], axis=-1)
    return (cache, mimi_state, x, pcm_k, eos_k, eos_step, done, wd_k,
            frame_idx)


@dataclasses.dataclass
class StreamChunk:
    pcm_i16: np.ndarray      # [B, frame_samples] int16 (device-quantized,
    #                          exact WAV bytes -- ptts_audio.c:82-88)
    frame_index: int
    active: np.ndarray       # [B] bool: stream still producing at this frame
    eos_logits: np.ndarray   # [B]

    @property
    def pcm(self) -> np.ndarray:
        """[B, frame_samples] f32 view (i16/32767) for numeric consumers."""
        return self.pcm_i16.astype(np.float32) / np.float32(32767.0)


class StreamingSession:
    """B lockstep streams emitting one 80 ms chunk per step.

    Double-buffered by default (``pipeline=True``): ``step()`` dispatches
    frame N+1 to the device BEFORE converting frame N's PCM on the host, and
    frame N's device->host copy is started asynchronously at dispatch time --
    so the (remote-tunnel-expensive) readback of chunk N overlaps with the
    device computing chunk N+1 instead of serializing with it. Outputs are
    bit-identical to the serial path (the state evolution is the same
    sequence of jitted calls); at most one speculative frame of device work
    is wasted when every stream EOSes at once.
    """

    def __init__(self, engine, prefixes: List[np.ndarray], max_frames: int,
                 params: "api.Params", eos_after: np.ndarray,
                 pipeline: bool = True,
                 frames_each: Optional[np.ndarray] = None):
        self.engine = engine
        cfg = engine.flowlm_cfg
        self.cfg = cfg
        self.params = params
        self.max_frames = max_frames
        B = len(prefixes)
        self.batch = B
        # per-stream frame budgets: a stream stops (and stops emitting
        # active chunks) at ITS requested num_frames, not the session max
        self.frames_each = jnp.asarray(
            frames_each if frames_each is not None
            else np.full(B, max_frames), jnp.int32,
        )

        lengths = np.array([len(p) for p in prefixes], np.int32)
        T0 = int(lengths.max())
        padded = np.zeros((B, T0, cfg.d_model), np.float32)
        for b, p in enumerate(prefixes):
            padded[b, : len(p)] = p

        seed = params.seed if params.seed != -1 else int(time.time())
        # whole noise table to device ONCE; each frame's row is gathered on
        # device inside fused_stream_step (no per-frame host upload)
        self._noise_dev = jnp.asarray(
            np.stack(
                [
                    frame_noise(seed + b, max_frames, cfg.latent_dim,
                                temp=params.temp, noise_clamp=params.noise_clamp)
                    for b in range(B)
                ]
            ),
            engine.dtype,
        )

        cache = flowlm.make_cache(cfg, B, T0 + max_frames, engine.dtype)
        self.cache, self.x = flowlm.prefill(
            engine.fw, cache, jnp.asarray(padded, engine.dtype),
            jnp.asarray(lengths), cfg, flags=engine.flags
        )
        self.time_embs = flowlm.lsd_time_embeds(engine.fw, params.num_steps, cfg)
        self.mimi_state = mimi_stream.init_state(
            engine.mw, engine.mimi_cfg, B, engine.dtype
        )
        self.eos_step = jnp.full((B,), -1, jnp.int32)
        self.done = jnp.zeros((B,), jnp.bool_)
        self.eos_after = jnp.asarray(eos_after, jnp.int32)
        self.frame = 0                      # next frame index to DISPATCH
        self.frames_used = np.zeros(B, np.int64)
        self.pipeline = pipeline
        self._pending = None                # dispatched-but-not-yielded frame
        self._host_all_done = False

    # -- construction -------------------------------------------------------

    @classmethod
    def start(cls, engine, texts: Sequence[str],
              voices: Optional[Sequence[Optional[str]]] = None,
              params: Optional["api.Params"] = None,
              pipeline: bool = True) -> "StreamingSession":
        p = (params or api.Params()).normalized()
        if voices is None:
            voices = [None] * len(texts)
        prefixes, frames, eos_afters = [], [], []
        for text, voice in zip(texts, voices):
            prepared, wc, eos_after_guess = prepare_text(text)
            ids = engine.ctx.tokenize(prepared)
            cond, _ = engine._voice_cond(voice)
            prefixes.append(engine._build_prefix(ids, cond))
            frames.append(p.num_frames if p.num_frames > 0 else estimate_frames(wc))
            eos_afters.append(p.eos_after if p.eos_after > 0 else eos_after_guess)
        return cls(engine, prefixes, max(frames), p,
                   np.asarray(eos_afters, np.int32), pipeline=pipeline,
                   frames_each=np.asarray(frames, np.int32))

    # -- stepping -------------------------------------------------------------

    @property
    def all_done(self) -> bool:
        if self._pending is not None and not self._host_all_done:
            return False
        return self.frame >= self.max_frames or self._host_all_done \
            or bool(np.all(np.asarray(self.done)))

    def _dispatch(self) -> None:
        """Queue one jitted frame step; start the PCM device->host copy."""
        engine = self.engine
        was_done_dev = self.done
        (self.cache, self.mimi_state, self.x, pcm, eos,
         self.eos_step, self.done) = fused_stream_step(
            engine.fw, engine.mw, self.cache, self.mimi_state, self.x,
            self._noise_dev,
            self.time_embs, jnp.int32(self.frame), self.eos_step, self.done,
            self.cfg, engine.mimi_cfg, bool(self.params.eos_enabled),
            self.params.eos_threshold, self.params.eos_min_frames,
            self.eos_after, self.frames_each, flags=engine.flags,
            emit_i16=True,
        )
        try:  # overlap the transfer with the next frame's device work
            pcm.copy_to_host_async()
        except Exception:
            pass
        self._pending = (self.frame, pcm, eos, was_done_dev, self.done)
        self.frame += 1

    def step(self) -> StreamChunk:
        """Return the next 80 ms chunk; dispatch the following frame first
        (double buffering) so its device work overlaps this readback."""
        if self.all_done:
            raise StopIteration
        if self._pending is None:
            self._dispatch()
        idx, pcm, eos, was_done_dev, done_dev = self._pending
        self._pending = None
        if self.pipeline and self.frame < self.max_frames \
                and not self._host_all_done:
            self._dispatch()  # speculative: overlaps the readback below
        was_done = np.asarray(was_done_dev)
        done_np = np.asarray(done_dev)
        self._host_all_done = bool(done_np.all())
        active = ~was_done
        self.frames_used += active.astype(np.int64)
        return StreamChunk(
            pcm_i16=np.asarray(pcm),
            frame_index=idx,
            active=active,
            eos_logits=np.asarray(eos, np.float32),
        )

    def __iter__(self) -> Iterator[StreamChunk]:
        while not self.all_done:
            yield self.step()
