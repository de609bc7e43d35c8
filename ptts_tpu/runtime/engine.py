"""TTSEngine: device-resident weights + jitted end-to-end pipeline.

This is the serving counterpart of ptts_generate (ptts.c:1011-1161), with the
reference's per-call weight reload and host-looped decode replaced by:

  * weights loaded from the safetensors mmap to device ONCE at construction
  * prefill + AR frame loop + Euler sampler fully jitted (models/flowlm.py)
  * Mimi vocoder fully jitted (models/mimi.py)
  * shape bucketing (prefix length, frame count) so repeated calls reuse
    compiled executables instead of recompiling per prompt length
  * batch_generate: B independent streams in one device program -- the unit
    of serving throughput (SURVEY.md §7, BASELINE.json north star)

Noise: params-driven parity path uses the host xorshift64*/Box-Muller RNG
(rng.py) for bit-compatible output with the reference at a given seed.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FlowLMConfig, KernelFlags, MimiConfig
from ..io.wav import Audio
from ..models import flowlm, mimi
from ..rng import frame_noise
from ..text import estimate_frames, prepare_text
from ..utils import sanitize
from ..utils.timing import span
from .. import api


def flags_from_env() -> KernelFlags:
    """Env-var kernel switches, the reference's PTTS_CUDA_* pattern
    (ptts_kernels.c:42-67); PTTS_VALIDATE=1 runs both decode-attention paths
    and prints maxdiffs."""
    return KernelFlags(
        decode_impl=os.environ.get("PTTS_DECODE_IMPL", "auto"),
        window_impl={"0": "local", "1": "pallas"}.get(
            os.environ.get("PTTS_PALLAS_WINDOW", "auto"), "auto"
        ),
        prefill_impl={"0": "xla", "1": "pallas"}.get(
            os.environ.get("PTTS_PALLAS_PREFILL", "auto"), "auto"
        ),
        layer_impl=os.environ.get("PTTS_LAYER_IMPL", "auto"),
        validate=os.environ.get("PTTS_VALIDATE", "0") == "1",
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _is_pallas_failure(exc: BaseException) -> bool:
    """True iff the exception plausibly comes from Pallas/Mosaic kernel
    compilation or launch (the only failures the engine's XLA-fallback should
    absorb). Anything else -- OOM, shape errors, bad prompts -- must propagate
    unchanged.

    Matching is type-first: an exception TYPE defined in a pallas/mosaic
    module is definitive. Message matching is the fallback (Mosaic errors
    surface as plain XlaRuntimeError), restricted to compiler-emitted
    markers ('Mosaic', 'pallas_call', 'Internal TPU kernel compiler error')
    rather than any substring -- a traceback message merely *containing* a
    pallas file path no longer demotes the engine."""
    seen = set()
    e: Optional[BaseException] = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        mod = f"{type(e).__module__}.{type(e).__name__}".lower()
        if "pallas" in mod or "mosaic" in mod:
            return True
        text = str(e)
        if any(s in text for s in ("Mosaic", "pallas_call",
                                   "Internal TPU kernel compiler error",
                                   "Only interpret mode is supported")):
            return True
        e = e.__cause__ or e.__context__
    return False


@dataclasses.dataclass
class GenerateOutput:
    """Single-stream result with the debug taps main.c exposes
    (--latent-out/--cond-out/--flow-out, main.c:354-412)."""

    audio: Optional[Audio]
    latents: np.ndarray          # [used, 32] raw (pre-scale) latents
    frames_used: int
    first_eos_logit: float
    first_cond: np.ndarray       # [1024]
    first_flow: np.ndarray       # [32]


class TTSEngine:
    def __init__(self, ctx: "api.Context", dtype=None,
                 prefix_bucket: int = 64, frame_bucket: int = 64,
                 flags: Optional[KernelFlags] = None):
        if dtype is None:
            # f32 is the parity default (golden/flow-test harnesses); serving
            # deployments set PTTS_DTYPE=bf16 for MXU throughput
            # (quality bounded by tests/test_bf16.py).
            dtype = jnp.bfloat16 if os.environ.get("PTTS_DTYPE") == "bf16" \
                else jnp.float32
        # persistent compile cache: each serving executable compiles at most
        # once per machine (PTTS_COMPILE_CACHE=0 disables; see
        # utils/compile_cache.py and warmup() for the cold-start story)
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.ctx = ctx
        self.flowlm_cfg = ctx.flowlm_cfg
        self.mimi_cfg = ctx.mimi_cfg
        self.dtype = dtype
        self.prefix_bucket = prefix_bucket
        self.frame_bucket = frame_bucket
        self.flags = flags if flags is not None else flags_from_env()
        # resolve the Mimi windowed-attention impl once, outside any trace
        self.window_impl = mimi.resolve_window_impl(self.flags.window_impl)
        self.prefill_impl = flowlm.resolve_prefill_impl(self.flags.prefill_impl)

        # Warm the device attach on a background thread while the host walks
        # the checkpoint mmap: the first device interaction of a process
        # pays a transport-dependent attach cost (30-500 s measured through
        # a remote tunnel, PERF.md round 4) that otherwise lands on the
        # first weight upload below. Device ops queue behind it either way,
        # so no join is needed.
        import threading

        def _attach():
            try:
                jax.device_put(np.zeros(8, np.float32)).block_until_ready()
            except Exception:
                pass  # attach failures surface on the real upload instead

        threading.Thread(target=_attach, daemon=True).start()

        # bf16 engines load FlowLM (82% of the params) straight to bf16:
        # BF16-stored checkpoint tensors are zero-copy views of the mmap, so
        # the cold-start upload ships half the bytes with no host f32 round
        # trip; to_device's jnp.asarray is then conversion-free. Mimi stays
        # on the f32 load (host math in its convtr prep; ~18% of params).
        if dtype == jnp.bfloat16:
            import ml_dtypes

            fw_host = flowlm.load_weights(ctx.weights, self.flowlm_cfg,
                                          dtype=ml_dtypes.bfloat16)
        else:
            fw_host = flowlm.load_weights(ctx.weights, self.flowlm_cfg)
        mw_host = mimi.load_weights(ctx.weights, self.mimi_cfg)
        # sanitize mode (PTTS_SANITIZE=1): corrupt checkpoints fail fast at
        # construction with the offending tensor's name (utils/sanitize.py)
        sanitize.check_tree("load_weights(flowlm)", fw_host)
        sanitize.check_tree("load_weights(mimi)", mw_host)
        # Host copies for prefix embedding assembly (off the hot path) --
        # always f32: the host matmul/gather path doesn't speak bf16.
        self._embed = np.asarray(fw_host["embed"], np.float32)
        self._input_linear = np.asarray(fw_host["input_linear"], np.float32)
        self._bos_emb = np.asarray(fw_host["bos_emb"], np.float32)

        self.fw = flowlm.to_device(fw_host, dtype, self.flowlm_cfg)
        self.mw = mimi.to_device(mw_host, dtype, self.mimi_cfg)

        self._voice_cache: dict = {}

    # -- prompt assembly -----------------------------------------------------

    def _voice_cond(self, voice: Optional[str]) -> Tuple[Optional[np.ndarray], int]:
        key = voice or "alba"
        if key not in self._voice_cache:
            self._voice_cache[key] = api.load_voice_conditioning(
                self.ctx.model_dir, voice, self.flowlm_cfg.d_model
            )
        return self._voice_cache[key]

    def _build_prefix(self, token_ids: Sequence[int],
                      cond: Optional[np.ndarray]) -> np.ndarray:
        """[T0, d_model]: voice cond frames + token embeddings + projected BOS
        (ptts_flowlm.c:1159-1185)."""
        cfg = self.flowlm_cfg
        parts = []
        if cond is not None and len(cond):
            parts.append(cond.astype(np.float32))
        ids = np.asarray(token_ids, dtype=np.int64)
        ids = np.where((ids < 0) | (ids >= cfg.vocab + 1), 0, ids)
        parts.append(self._embed[ids])
        bos = self._bos_emb @ self._input_linear.T
        parts.append(bos[None, :].astype(np.float32))
        return np.concatenate(parts, axis=0)

    # -- generation ------------------------------------------------------------

    def generate_latents_batch(
        self,
        prefixes: List[np.ndarray],       # list of [T0_b, d_model]
        max_frames: int,
        params: "api.Params",
        noise: Optional[np.ndarray] = None,  # [B, max_frames, latent] override
        eos_after: Optional[np.ndarray] = None,  # [B] per-stream override
        frames_each: Optional[np.ndarray] = None,  # [B] per-stream budgets
    ) -> flowlm.GenResult:
        """Run the jitted prefill + AR loop for B ragged streams.

        ``frames_each`` (default: max_frames for every stream) is the true
        per-stream frame budget: the EOS while_loop's trip count is dynamic,
        so it stops at the REQUESTED length instead of the compile bucket
        (frame bucketing still bounds recompiles; the loop just exits early
        -- the reference generates exactly num_frames, ptts_flowlm.c:1207).
        """
        cfg = self.flowlm_cfg
        B = len(prefixes)
        lengths = np.array([len(p) for p in prefixes], np.int32)
        T0 = _round_up(int(lengths.max()), self.prefix_bucket)
        frames = _round_up(max_frames, self.frame_bucket)

        padded = np.zeros((B, T0, cfg.d_model), np.float32)
        for b, p in enumerate(prefixes):
            padded[b, : len(p)] = p

        if noise is None:
            seed = params.seed
            if seed == -1:
                seed = int(time.time())
            noise = np.stack(
                [
                    frame_noise(seed + b, frames, cfg.latent_dim,
                                temp=params.temp, noise_clamp=params.noise_clamp)
                    for b in range(B)
                ]
            )
        elif noise.shape[1] < frames:
            pad = np.zeros((B, frames - noise.shape[1], cfg.latent_dim), np.float32)
            noise = np.concatenate([noise, pad], axis=1)
        elif noise.shape[1] > frames:
            noise = noise[:, :frames]

        max_len = T0 + frames
        ea = jnp.asarray(
            eos_after if eos_after is not None else params.eos_after, jnp.int32
        )

        def run(flags):
            cache, x0 = flowlm.prefill_init(
                self.fw, jnp.asarray(padded, self.dtype),
                jnp.asarray(lengths), cfg, max_len, self.prefill_impl,
                flags,
            )
            # One on-device lax.while_loop that stops the moment every
            # stream is done -- the reference's per-frame break at EOS
            # (ptts_flowlm.c:1238) with zero host round trips, exiting at
            # each stream's TRUE frame budget rather than the compile
            # bucket (bit-equal to the scan path,
            # tests/test_flowlm.py::test_while_loop_generation_matches_scan).
            # EOS-disabled == a threshold that can never fire.
            budgets = jnp.asarray(
                frames_each if frames_each is not None else max_frames,
                jnp.int32,
            )
            return flowlm.generate_latents_while(
                self.fw, cache, x0, jnp.asarray(noise, self.dtype), cfg,
                max_frames=frames, num_steps=params.num_steps,
                eos_threshold=(params.eos_threshold if params.eos_enabled
                               else 1e30),
                eos_min_frames=params.eos_min_frames,
                eos_after=ea, flags=flags,
                max_frames_per_stream=jnp.broadcast_to(budgets, (B,)),
            )

        try:
            res = run(self.flags)
        except Exception as e:
            # Graceful degradation, the reference's backend-fallback pattern
            # (ptts_kernels.c:70-81): a failing Pallas kernel permanently
            # drops this engine to the XLA path. Only Pallas/Mosaic failures
            # qualify; anything else propagates unchanged.
            if self.prefill_impl != "pallas" or not _is_pallas_failure(e):
                raise
            import warnings

            warnings.warn(
                f"[ptts] Pallas kernel failed ({type(e).__name__}: {e}); "
                "permanently degrading this engine to the XLA path"
            )
            self.prefill_impl = "xla"
            res = run(self.flags)
        # cap frames_used at the caller's true max (bucketing may exceed it)
        capped = jnp.minimum(res.frames_used, max_frames)
        if sanitize.enabled():
            sanitize.check_finite("generate_latents_batch",
                                  res.latents, res.eos_logits,
                                  names=("latents", "eos_logits"))
        return res._replace(frames_used=capped, cache=None, x=None)

    def decode_audio_batch(self, scaled_latents: jnp.ndarray) -> np.ndarray:
        """[B, F, 32] scaled latents -> PCM [B, F * 1920]."""
        try:
            pcm = np.asarray(
                mimi.decode(self.mw, scaled_latents, self.mimi_cfg,
                            window_impl=self.window_impl)
            )
            if sanitize.enabled():
                sanitize.check_finite("decode_audio_batch", pcm,
                                      names=("pcm",))
            return pcm
        except Exception as e:
            # same degradation contract as generate_latents_batch: only
            # Pallas/Mosaic failures drop to XLA, everything else propagates
            if self.window_impl != "pallas" or not _is_pallas_failure(e):
                raise
            import warnings

            self.window_impl = "local"
            warnings.warn(
                f"[ptts] Pallas Mimi kernel failed ({type(e).__name__}: {e});"
                " permanently degrading: window->local"
            )
            return np.asarray(
                mimi.decode(self.mw, scaled_latents, self.mimi_cfg,
                            window_impl=self.window_impl)
            )

    def generate_full(self, text: str, voice: Optional[str] = None,
                      params: Optional["api.Params"] = None,
                      decode_audio: bool = True) -> GenerateOutput:
        p = (params or api.Params()).normalized()

        prepared, word_count, eos_after_guess = prepare_text(text)
        token_ids = self.ctx.tokenize(prepared)
        if p.num_frames <= 0:
            p = dataclasses.replace(p, num_frames=estimate_frames(word_count))
        if p.eos_after <= 0:
            p = dataclasses.replace(p, eos_after=eos_after_guess)

        cond, _ = self._voice_cond(voice)
        prefix = self._build_prefix(token_ids, cond)

        with span("FlowLM latents", f"{p.num_frames} frames"):
            res = self.generate_latents_batch([prefix], p.num_frames, p)
            used = int(res.frames_used[0])
        latents = np.asarray(res.latents[0][:used])

        audio = None
        if decode_audio:
            # decode on a bucketed frame count (bounds recompiles), slice after
            fbucket = min(res.latents.shape[1], _round_up(used, self.frame_bucket))
            scaled = flowlm.scale_latents(self.fw, res.latents[:, :fbucket])
            with span("Mimi decode", f"{used} frames"):
                pcm = self.decode_audio_batch(scaled)
            samples = pcm[0][: used * self.mimi_cfg.frame_samples]
            audio = Audio(sample_rate=p.sample_rate, channels=1,
                          samples=np.asarray(samples, np.float32))

        return GenerateOutput(
            audio=audio,
            latents=latents,
            frames_used=used,
            first_eos_logit=float(res.eos_logits[0, 0]),
            first_cond=np.asarray(res.first_cond[0]),
            first_flow=np.asarray(res.first_flow[0]),
        )

    def generate(self, text: str, voice: Optional[str] = None,
                 params: Optional["api.Params"] = None) -> Audio:
        out = self.generate_full(text, voice=voice, params=params)
        assert out.audio is not None
        return out.audio

    def warmup(self, batch_sizes: Sequence[int] = (1,),
               num_frames: Optional[int] = None,
               decode_audio: bool = True) -> float:
        """Precompile the serving executables (prefill + EOS while_loop +
        vocoder) for the given batch sizes at the engine's shape buckets.

        The reference starts serving within seconds (per-call load,
        ptts.c:1047-1059); a jitted path pays XLA compiles on first use
        instead. Call this at deployment startup -- together with the
        persistent compile cache (utils/compile_cache.py, enabled at
        construction) the first request then runs at steady-state latency.
        Returns wall seconds spent.
        """
        t0 = time.perf_counter()
        cfg = self.flowlm_cfg
        frames = num_frames if num_frames else self.frame_bucket
        p = api.Params(num_steps=1, seed=0).normalized()
        prefix = np.zeros((self.prefix_bucket, cfg.d_model), np.float32)
        for B in batch_sizes:
            res = self.generate_latents_batch([prefix] * B, frames, p)
            if decode_audio:
                scaled = flowlm.scale_latents(self.fw, res.latents)
                self.decode_audio_batch(scaled)
        return time.perf_counter() - t0

    def stats(self) -> dict:
        """Observability: per-span timing summary (counts/totals/min/max),
        the structured counterpart of the reference's PTTS_TIMING stderr
        lines (ptts.c:31-44)."""
        from ..utils.timing import GLOBAL_STATS

        return GLOBAL_STATS.summary()

    def batch_generate(self, texts: Sequence[str],
                       voices: Optional[Sequence[Optional[str]]] = None,
                       params: Optional["api.Params"] = None,
                       length_buckets: int = 1) -> List[Audio]:
        """B independent utterances in one device program (optionally
        length-bucketed -- OFF by default, see the measurement below).

        Ragged frame budgets in one lockstep batch make every stream pay for
        the slowest one: the EOS while_loop's dynamic trip count only exits
        when ALL streams are done (the reference breaks per call,
        ptts_flowlm.c:1238 -- one stream per batch, so it never has this
        problem). ``length_buckets > 1`` sorts the B streams by frame budget
        into equal-size groups so each group's while_loop stops at the GROUP
        max and each group's vocoder runs at the group's own width.

        **Measured WORSE on TPU and therefore default-off** (round 4,
        bench.py ragged_bucketed: 3,032 vs 3,418 streams/chip at B=256,
        budgets 10..50): the AR frame cost is weight-streaming-bound and
        nearly batch-independent (B=64 per-frame measured 0.69x the B=256
        cost, not 0.25x), so splitting into G sequential while_loops raises
        the TOTAL trip count (50 -> 140) far more than per-group early exit
        saves. The lockstep loop minimizes total trips, which is the only
        lever that matters in this regime. Bucketing could only win for
        extreme budget skew (sum of group maxima < ~1.45x the global max);
        callers with such loads can opt in.

        Per-stream output is identical either way: noise is keyed by the
        original stream index, and each stream runs its own exact budget/EOS
        bookkeeping (tested equal across bucketing).
        """
        p = (params or api.Params()).normalized()
        if voices is None:
            voices = [None] * len(texts)

        prefixes = []
        frames = []
        eos_afters = []
        for text, voice in zip(texts, voices):
            prepared, wc, eos_after_guess = prepare_text(text)
            ids = self.ctx.tokenize(prepared)
            cond, _ = self._voice_cond(voice)
            prefixes.append(self._build_prefix(ids, cond))
            frames.append(p.num_frames if p.num_frames > 0 else estimate_frames(wc))
            eos_afters.append(p.eos_after if p.eos_after > 0 else eos_after_guess)

        B = len(texts)
        frames_np = np.asarray(frames, np.int32)
        eos_np = np.asarray(eos_afters, np.int32)
        G = max(1, min(length_buckets, B // 2)) if B >= 4 else 1
        if int(frames_np.max()) - int(frames_np.min()) < 16:
            G = 1  # near-uniform budgets: splitting only shrinks the GEMMs
        # spread (stable) by budget: groups of equal size gB, shortest first
        order = np.argsort(frames_np, kind="stable") if G > 1 else np.arange(B)
        gB = -(-B // G)

        # noise is keyed by the ORIGINAL stream index (seed + i), not the
        # batch position, so bucketing reorders streams without changing any
        # stream's noise (bucketed == unbucketed audio, tested)
        seed = p.seed if p.seed != -1 else int(time.time())

        out: List[Optional[Audio]] = [None] * B
        for g in range(G):
            idx = order[g * gB : (g + 1) * gB]
            if idx.size == 0:
                continue
            pad = gB - idx.size if G > 1 else 0
            gidx = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad \
                else idx
            gmax = int(frames_np[gidx].max())
            noise = np.stack([
                frame_noise(seed + int(i), gmax, self.flowlm_cfg.latent_dim,
                            temp=p.temp, noise_clamp=p.noise_clamp)
                for i in gidx
            ])
            res = self.generate_latents_batch(
                [prefixes[i] for i in gidx],
                gmax, p,
                noise=noise,
                eos_after=eos_np[gidx],
                frames_each=frames_np[gidx],
            )
            used = np.minimum(np.asarray(res.frames_used), frames_np[gidx])
            # vocoder at the group's own width (16-frame granularity bounds
            # compile variants; the lockstep path decoded EVERY stream at
            # the global max width)
            fmax = min(res.latents.shape[1],
                       _round_up(max(int(used.max()), 1), 16))
            scaled = flowlm.scale_latents(self.fw, res.latents[:, :fmax])
            pcm = self.decode_audio_batch(scaled)
            for j, i in enumerate(idx):
                n = int(used[j]) * self.mimi_cfg.frame_samples
                out[i] = Audio(sample_rate=p.sample_rate, channels=1,
                               samples=np.asarray(pcm[j][:n], np.float32))
        assert all(a is not None for a in out)
        return out  # type: ignore[return-value]
