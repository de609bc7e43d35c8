"""Continuous batching: admit new utterances into freed KV slots.

The serving loop keeps a fixed pool of B device-resident stream slots
(FlowLM KV cache rows + streaming-Mimi state rows). Finished streams free
their slot; queued requests are prefilled in fixed-size admit groups and
scattered into the freed rows without touching the other streams. This is the
"batched serving / continuous batching" item of SURVEY.md §7 step 8 -- the
reference has nothing comparable (hardwired batch 1, ptts.c:328-333).

Cache geometry (see models/flowlm.KVCache): columns [0, prefix_budget) hold
each slot's prompt K/V; decode columns form a RING of width
max_len - prefix_budget driven by the shared monotonic cursor, so a slot
admitted mid-flight simply gets start = cursor and its gap is masked. The
ring wraps transparently -- a recycled column's owner stream is necessarily
finished because per-request frames <= noise_budget <= ring width -- so the
pool never compacts and decode-attention traffic stays at ring width
columns per frame no matter how long the server runs.

Shapes stay static for jit: the pool is [B+1] rows where row B is a trash
slot that absorbs padded admissions; admit groups are padded to
``admit_chunk``; every frame step runs the full pool with done-masking.

The step loop is double-buffered (``pipeline=True``): frame N+1 is
dispatched to the device before frame N's PCM is converted on the host, so
the readback RPC overlaps device compute (same contract as
StreamingSession). Host mirrors of cursor/frame/done state keep dispatch
decisions sync-free; admissions landing while a frame is in flight are
sequence-tracked so the stale frame cannot clobber a new slot's liveness.
Outputs are bit-identical to the serial loop (equality-tested).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import api
from ..config import FlowLMConfig
from ..models import flowlm, mimi_stream
from ..parallel import mesh as pmesh
from ..rng import frame_noise
from ..text import estimate_frames, prepare_text
from .streaming import fused_stream_step, fused_stream_steps

# shared zero-length chunk: device-bound collection appends one as a
# "stream started" marker (PCM stays on chip; see _collect_counts)
_EMPTY_I16 = np.zeros(0, np.int16)
_EMPTY_I16.setflags(write=False)


@jax.jit
def _combine_flags(wd, done):
    """[k,B]|[B] was_done + [B] done -> one [k+1,B] bool buffer, so the
    device-bound loop reads ONE tiny flag array per step instead of two
    (each np.asarray is a full RPC roundtrip through a remote tunnel --
    the measured reason K=4 lost ~12% to K=8 device-bound, PERF.md)."""
    if wd.ndim == 1:
        wd = wd[None]
    return jnp.concatenate([wd, done[None]], axis=0)


class _QueueView:
    """Deque-like façade over the per-host admission queues.

    External consumers (server drain/shutdown, benches) treat the batcher's
    queue as one logical deque; internally admission is per host group so a
    request's prefix/noise upload only targets its owning hosts' pool rows."""

    def __init__(self, qs: Sequence[deque]):
        self._qs = qs

    def __len__(self) -> int:
        return sum(len(q) for q in self._qs)

    def __iter__(self):
        for q in self._qs:
            yield from q

    def __bool__(self) -> bool:
        return any(self._qs)

    def popleft(self):
        for q in self._qs:
            if q:
                return q.popleft()
        raise IndexError("pop from empty queue")

    def clear(self) -> None:
        for q in self._qs:
            q.clear()

    def remove_rid(self, rid: int):
        """Remove and return the queued Request with this rid (or None).

        Tolerates concurrent mutation by the serving thread (whose _admit
        poplefts these deques without a lock): iteration raising
        RuntimeError is retried, and a remove() losing the race to a
        popleft (ValueError) reports not-found -- the caller's slot scan
        will see the request once admission lands it."""
        for q in self._qs:
            while True:
                try:
                    hit = next((r for r in q if r.rid == rid), None)
                    if hit is not None:
                        q.remove(hit)
                        return hit
                    break
                except RuntimeError:   # deque mutated during iteration
                    continue
                except ValueError:     # popped by _admit between find+remove
                    return None
        return None


class QueueFull(api.PttsError):
    """Admission queue is at max_queue; the client should back off (the
    serving front door maps this to HTTP 429)."""


@dataclasses.dataclass
class Request:
    rid: int
    prefix: Optional[np.ndarray]  # [T0, d_model] host-assembled prompt, or
    #                               None when (ids, voice_idx) carry the
    #                               prompt for device-side construction
    noise: Optional[np.ndarray]  # [max_frames, latent] host-drawn parity
    #                              noise (xorshift64*/Box-Muller,
    #                              ptts_flowlm.c:1211-1231), or None to draw
    #                              the table ON DEVICE at admission
    #                              (threefry; ~8 B over the wire instead of
    #                              the padded [F_max, 32] f32 row -- the
    #                              noise upload dominated admission through
    #                              remote tunnels, PERF.md round 3)
    max_frames: int
    eos_after: int
    # per-request generation params (ptts.h:27-40 semantics: every call's
    # Params are honored, not the pool's first submit)
    num_steps: int = 1
    eos_threshold: float = 1e30   # +inf == EOS disabled for this stream
    eos_min_frames: int = 1
    # device-build admission path (admit_slots_ids): token ids + a row of
    # the batcher's voice-cond bank; ~100 bytes over the wire instead of a
    # ~128 KB embedding matrix
    ids: Optional[np.ndarray] = None   # int32, already clamped to vocab
    voice_idx: int = -1
    # device-noise admission path (noise is None): per-request draw params.
    # Distributionally identical to the host path (N(0, temp) clamped) but a
    # different RNG, so it is NOT bit-matching the fixed-seed parity path --
    # prepare() only routes here for seed=-1 requests (the reference's own
    # non-reproducible default, ptts_flowlm.c:1187-1188).
    noise_seed: int = 0
    temp: float = 0.7
    noise_clamp: float = 0.0


@dataclasses.dataclass
class Result:
    rid: int
    pcm_i16: np.ndarray         # concatenated PCM, device-quantized int16
    #                             (exact WAV bytes -- ptts_audio.c:82-88)
    frames: int
    # wall clock (time.perf_counter) when the stream's FIRST 80 ms chunk was
    # collected off the device -- the serving-latency stamp a streaming
    # consumer observes (chunks are readable from batcher.chunks as soon as
    # a collect lands them, not only at finish)
    first_chunk_t: float = -1.0

    @property
    def audio(self) -> np.ndarray:
        """f32 view (i16/32767) for numeric consumers."""
        return self.pcm_i16.astype(np.float32) / np.float32(32767.0)


def _device_noise_rows(noise_seed, noise_meta, frames, F, C, dtype):
    """Draw the per-slot noise tables on device at admission time.

    [n, F, C] rows ~ N(0, std^2), optionally clamped, rows >= the request's
    frame count zeroed -- the same table the host path uploads, built from a
    per-request threefry fold instead of shipped over the wire. std=0
    (temp<=0) gives all-zeros like the host path (ptts_flowlm.c:1211-1231
    semantics; different RNG, same distribution).
    """
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda s: jax.random.fold_in(base, s))(
        noise_seed.astype(jnp.int32))
    z = jax.vmap(lambda k: jax.random.normal(k, (F, C), jnp.float32))(keys)
    std = noise_meta[0][:, None, None]
    clamp = noise_meta[1][:, None, None]
    z = z * std
    z = jnp.where(clamp > 0, jnp.clip(z, -clamp, clamp), z)
    live = jnp.arange(F)[None, :, None] < frames.astype(jnp.int32)[:, None, None]
    return jnp.where(live, z, 0.0).astype(dtype)


def _select_free_rows(done, slot_mask, n_valid, n, trash_row):
    """Choose up to ``n`` free pool rows ON DEVICE: the lowest-index rows
    where ``done & slot_mask`` (speculative admission -- the host dispatches
    this program without knowing which rows are free; the device state is
    the truth, including EOS from steps whose flags the host has not read
    back yet). Entries beyond ``n_valid`` (chunk padding) and requests that
    found no free row map to the trash row; the host re-queues the latter
    when the row receipt arrives (ContinuousBatcher._resolve_receipt)."""
    B1 = done.shape[0]
    score = jnp.where(done & slot_mask,
                      B1 - jnp.arange(B1, dtype=jnp.int32), 0)
    vals, rows = jax.lax.top_k(score, n)      # distinct lowest-index frees
    ok = (vals > 0) & (jnp.arange(n) < n_valid)
    return jnp.where(ok, rows, trash_row).astype(jnp.int32)


def _admit_core(
    w, cache, x_all, eos_step, done, frame_idx, mimi_state, time_embs,
    noise_tab, params, slot_ids, prefix, lengths, te_rows, noise_rows,
    new_params, cfg, flags,
):
    """Shared admission body: prefill n prompts, scatter state + params."""
    n, T0, d = prefix.shape
    k_new, v_new, last = flowlm.prefill_kv(w, prefix, lengths, cfg, flags=flags)

    k = cache.k.at[:, slot_ids, :T0].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[:, slot_ids, :T0].set(v_new.astype(cache.v.dtype))
    cache = cache._replace(
        k=k,
        v=v,
        prefix_len=cache.prefix_len.at[slot_ids].set(lengths.astype(jnp.int32)),
        start=cache.start.at[slot_ids].set(cache.cursor),
    )

    x_all = x_all.at[slot_ids].set(last.astype(x_all.dtype))
    eos_step = eos_step.at[slot_ids].set(-1)
    done = done.at[slot_ids].set(False)
    frame_idx = frame_idx.at[slot_ids].set(0)
    time_embs = time_embs.at[slot_ids].set(te_rows.astype(time_embs.dtype))
    noise_tab = noise_tab.at[slot_ids].set(noise_rows.astype(noise_tab.dtype))

    # per-slot generation params updated ON DEVICE: five host re-uploads per
    # admit group were five tunnel RPCs apiece on remote setups
    eos_threshold, eos_min_frames, eos_after, max_frames, num_steps = params
    params = (
        eos_threshold.at[slot_ids].set(new_params[0]),
        eos_min_frames.at[slot_ids].set(new_params[1].astype(jnp.int32)),
        eos_after.at[slot_ids].set(new_params[2].astype(jnp.int32)),
        max_frames.at[slot_ids].set(new_params[3].astype(jnp.int32)),
        num_steps.at[slot_ids].set(new_params[4].astype(jnp.int32)),
    )

    mimi_state = {
        "up": mimi_state["up"].at[slot_ids].set(0.0),
        "ring": {
            # stale K/V need no zeroing: kpos=-1 masks every slot of the
            # reused stream until its own chunks are written (the global
            # write cursor ``wc`` is shared state and survives admission)
            "k": mimi_state["ring"]["k"],
            "v": mimi_state["ring"]["v"],
            "pos": mimi_state["ring"]["pos"].at[slot_ids].set(0),
            "kpos": mimi_state["ring"]["kpos"].at[slot_ids].set(-1),
            "wc": mimi_state["ring"]["wc"],
        },
        "dec_in": mimi_state["dec_in"].at[slot_ids].set(0.0),
        "stages": [
            {k2: st[k2].at[slot_ids].set(0.0) for k2 in st}
            for st in mimi_state["stages"]
        ],
        "dec_out": mimi_state["dec_out"].at[slot_ids].set(0.0),
    }
    return (cache, x_all, eos_step, done, frame_idx, mimi_state, time_embs,
            noise_tab, params)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "flags", "device_noise", "spec_select",
                     "trash_row"),
    # only the big buffers are donated: the [B1]-scalar state (done,
    # eos_step, frame_idx) and x_all stay un-donated because the in-flight
    # pipelined frame (ContinuousBatcher._pending) still references them
    # when an admission lands between its dispatch and its collection
    # (params ARE donatable: dispatches read but never retain them)
    donate_argnames=("cache", "mimi_state", "time_embs", "noise_tab",
                     "params"),
)
def admit_slots(
    w,
    cache: flowlm.KVCache,
    x_all: jnp.ndarray,         # [B1, d]
    eos_step: jnp.ndarray,      # [B1]
    done: jnp.ndarray,          # [B1]
    frame_idx: jnp.ndarray,     # [B1]
    mimi_state,
    time_embs: jnp.ndarray,     # [B1, S_max, flow_dim] per-slot Euler tables
    noise_tab: jnp.ndarray,     # [B1, F_max, latent] per-slot noise tables
    params,                     # 5-tuple of [B1] per-slot generation params
    slot_ids: jnp.ndarray,      # [n] target rows (trash row for padding)
    prefix: jnp.ndarray,        # [n, T0, d] back-padded prompts
    lengths: jnp.ndarray,       # [n]
    te_rows: jnp.ndarray,       # [n, S_max, flow_dim] new slots' tables
    noise_rows: jnp.ndarray,    # [n, F_max, latent] new slots' noise
    new_params: jnp.ndarray,    # [5, n] f32 packed per-request params
    cfg: FlowLMConfig,
    flags: "flowlm.KernelFlags" = flowlm.DEFAULT_FLAGS,
    noise_seed: Optional[jnp.ndarray] = None,   # [n] device-noise seeds
    noise_meta: Optional[jnp.ndarray] = None,   # [2, n] f32 (std, clamp)
    device_noise: bool = False,
    spec_select: bool = False,
    n_valid: Optional[jnp.ndarray] = None,      # [] int32 real requests
    slot_mask: Optional[jnp.ndarray] = None,    # [B1] bool candidate rows
    trash_row: int = 0,
):
    """Prefill n new prompts and scatter their state into the pool rows.

    New prompts' K/V go to prefix columns [0, T0); their decode region begins
    at the current shared cursor (cache.start[slot] = cache.cursor).

    ``spec_select=True`` (speculative admission): ignore ``slot_ids`` and
    choose target rows ON DEVICE from the live ``done`` flags; additionally
    return the chosen rows so the host can resolve rid -> slot."""
    if spec_select:
        n = prefix.shape[0]
        slot_ids = _select_free_rows(done, slot_mask, n_valid, n, trash_row)
    if device_noise:
        noise_rows = _device_noise_rows(
            noise_seed, noise_meta, new_params[3],
            noise_tab.shape[1], noise_tab.shape[2], noise_tab.dtype)
    out = _admit_core(w, cache, x_all, eos_step, done, frame_idx, mimi_state,
                      time_embs, noise_tab, params, slot_ids, prefix,
                      lengths, te_rows, noise_rows, new_params, cfg, flags)
    return out + (slot_ids,) if spec_select else out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "flags", "prefix_budget", "device_noise",
                     "spec_select", "trash_row"),
    donate_argnames=("cache", "mimi_state", "time_embs", "noise_tab",
                     "params"),
)
def admit_slots_ids(
    w,
    cache: flowlm.KVCache,
    x_all: jnp.ndarray,
    eos_step: jnp.ndarray,
    done: jnp.ndarray,
    frame_idx: jnp.ndarray,
    mimi_state,
    time_embs: jnp.ndarray,
    noise_tab: jnp.ndarray,
    params,
    slot_ids: jnp.ndarray,      # [n]
    ids: jnp.ndarray,           # [n, Tt] int32 token ids (0-padded)
    n_tokens: jnp.ndarray,      # [n] int32
    cond_idx: jnp.ndarray,      # [n] int32 rows of the voice-cond bank
    cond_bank: jnp.ndarray,     # [Vcap, Tc, d] device-cached voice conds
    cond_len: jnp.ndarray,      # [Vcap] int32
    te_rows: jnp.ndarray,
    noise_rows: jnp.ndarray,
    new_params: jnp.ndarray,    # [5, n]
    prefix_budget: int,
    cfg: FlowLMConfig,
    flags: "flowlm.KernelFlags" = flowlm.DEFAULT_FLAGS,
    noise_seed: Optional[jnp.ndarray] = None,   # [n] device-noise seeds
    noise_meta: Optional[jnp.ndarray] = None,   # [2, n] f32 (std, clamp)
    device_noise: bool = False,
    spec_select: bool = False,
    n_valid: Optional[jnp.ndarray] = None,      # [] int32 real requests
    slot_mask: Optional[jnp.ndarray] = None,    # [B1] bool candidate rows
    trash_row: int = 0,
):
    """Admission from TOKEN IDS: the prompt embedding matrix is built ON
    DEVICE (engine._build_prefix semantics, ptts_flowlm.c:1159-1185:
    voice-cond frames + text-embedding rows + projected BOS).

    ``spec_select=True``: device-chosen target rows (see admit_slots).

    A host-assembled [T0, d_model] prefix is ~128 KB/request over the wire;
    ids + a bank index are ~100 bytes. On remote-tunnel serving the prefix
    upload was the admission bottleneck (PERF.md round 3)."""
    if spec_select:
        slot_ids = _select_free_rows(done, slot_mask, n_valid,
                                     ids.shape[0], trash_row)
    n, Tt = ids.shape
    T0 = prefix_budget
    Tc = cond_bank.shape[1]

    c = cond_len[cond_idx]                                   # [n]
    p = jnp.arange(T0)[None, :]                              # [1, T0]

    # cond occupies columns [0, c): bank rows are already column-aligned
    cond_part = jnp.pad(cond_bank[cond_idx], ((0, 0), (0, T0 - Tc), (0, 0)))

    # tokens occupy [c, c+t): column p reads ids[j, p - c]
    tok_col = jnp.clip(p - c[:, None], 0, Tt - 1)            # [n, T0]
    tok_ids = jnp.take_along_axis(ids, tok_col, axis=1)      # [n, T0]
    tok_part = jnp.take(w["embed"], tok_ids, axis=0)         # [n, T0, d]

    # projected BOS at column c+t (f32 accumulation like the host builder)
    bos = jnp.einsum("i,oi->o", w["bos_emb"], w["input_linear"],
                     preferred_element_type=jnp.float32)     # [d]
    bos = bos.astype(cond_bank.dtype)

    col = p[:, :, None]                                      # [1, T0, 1]
    ct = c[:, None, None]
    tt = (c + n_tokens)[:, None, None]
    prefix = jnp.where(
        col < ct, cond_part,
        jnp.where(col < tt, tok_part,
                  jnp.where(col == tt, bos[None, None, :], 0.0)),
    ).astype(cond_bank.dtype)
    lengths = (c + n_tokens + 1).astype(jnp.int32)

    if device_noise:
        noise_rows = _device_noise_rows(
            noise_seed, noise_meta, new_params[3],
            noise_tab.shape[1], noise_tab.shape[2], noise_tab.dtype)
    out = _admit_core(w, cache, x_all, eos_step, done, frame_idx, mimi_state,
                      time_embs, noise_tab, params, slot_ids, prefix,
                      lengths, te_rows, noise_rows, new_params, cfg, flags)
    return out + (slot_ids,) if spec_select else out


class ContinuousBatcher:
    """Fixed-slot continuous batching server for one chip (or one mesh).

    With ``mesh`` (parallel/mesh.make_mesh or make_multihost_mesh) the whole
    slot pool -- KV cache, streaming-Mimi state, per-slot params, noise/Euler
    tables -- is sharded on the slot axis across the mesh (weights stay
    replicated; serving is pure data parallelism, SURVEY.md §2). Admission is
    PER HOST GROUP along the slow ``dcn`` axis: each host group owns a
    contiguous block of pool rows and its own queue, so a request's prefill
    scatter only writes rows resident on that group's devices and no stream
    state ever crosses DCN. ``submit(..., host=h)`` pins a request; the
    default routes to the group with the most headroom. The jitted step/admit
    functions are unchanged -- shardings ride in on the arrays and GSPMD
    partitions the same programs."""

    # pipeline=False by default: PCM leaves the device via an async copy
    # started at dispatch (copy_to_host_async), so the speculative
    # double-buffered frame no longer hides any readback -- it just piles an
    # extra program onto the device queue ahead of the next admission's
    # uploads (measured 2.4x slower sustained through the remote tunnel,
    # PERF.md round 3). pipeline=True remains available and equality-tested.
    def __init__(self, engine, slots: int = 32, max_len: int = 512,
                 admit_chunk: int = 8, prefix_budget: int = 128,
                 max_num_steps: int = 8, pipeline: bool = False,
                 noise_budget: int = 0, mesh=None,
                 frames_per_step: int = 1, voice_cap: int = 8,
                 cond_budget: int = 0, collect_pcm: bool = True,
                 device_noise: bool = True,
                 split_admit: Optional[bool] = None,
                 max_queue: int = 0,
                 spec_admit: bool = False,
                 pack_flags: Optional[bool] = None):
        # max_queue bounds the admission queue (0 = unbounded): enqueue()
        # raises QueueFull past the bound so a submit flood turns into
        # client backpressure (HTTP 429) instead of unbounded host memory
        # growth in the deque + chunks dict.
        self.max_queue = int(max_queue)
        # spec_admit (speculative / mid-step admission): the admit program
        # chooses its target rows ON DEVICE from the live done flags instead
        # of host-picked slots, so the host can dispatch admissions for rows
        # it has not yet learned are free. In the pipelined loop a row that
        # EOSes in the in-flight window refills for the very next window --
        # per-stream dead time drops from ~1.5K frames (EOS-to-window-end +
        # one full window of host flag latency) to ~K/2 (PERF.md round-5
        # occupancy model). The host learns rid->row from a tiny async
        # "receipt" readback resolved in dispatch order before the first
        # step that could carry the new rows' flags; requests that found no
        # free row land in the trash row and are re-queued at resolve time.
        self.spec_admit = bool(spec_admit)
        # split_admit: when a step admitted fresh requests and K > 1,
        # dispatch that step as TWO programs (k=1 then k=K-1, numerically
        # identical to one k=K scan) so the fresh streams' first chunks ride
        # the small k=1 readback instead of waiting out the whole K-frame
        # program + bulk PCM transfer. PCM bytes per frame are unchanged;
        # the only extra cost is one dispatch + flag RPC on admitting steps.
        # Default: on for PCM-collecting (tunnel) pools where the K-frame
        # transfer dominates first-chunk latency; off device-bound (flags-
        # only readback already meets the latency target, PERF.md round 4).
        self.split_admit = (collect_pcm and frames_per_step > 1
                            if split_admit is None else split_admit)
        # collect_pcm=False keeps the PCM chunks ON DEVICE (only the tiny
        # done/was_done flags are read back): the co-located-serving
        # measurement mode, where the bulk PCM leaves over local DMA instead
        # of this environment's ~32 MB/s tunnel RPC. Results then carry
        # frame counts with empty pcm_i16.
        self.collect_pcm = collect_pcm
        # pack_flags (default: on whenever PCM is collected): the step
        # program appends the done/was_done flags as 2 int16 columns to the
        # PCM buffer, so ONE d2h copy carries chunks AND liveness -- the two
        # tiny flag RPCs otherwise serialize with the bulk PCM stream
        # through a remote tunnel (PERF.md round-5 transport fence measured
        # them as the last ~20% of the link). Device-bound pools keep the
        # flags-only readback (there is no PCM copy to ride).
        self.pack_flags = (bool(collect_pcm) if pack_flags is None
                           else bool(pack_flags and collect_pcm))
        # device_noise: seed=-1 requests (the reference's non-reproducible
        # default) draw their noise tables ON DEVICE at admission; explicit
        # seeds always take the host xorshift64* parity path so fixed-seed
        # results bit-match the offline engine
        self.device_noise = device_noise
        self.engine = engine
        self.cfg = engine.flowlm_cfg
        self.slots = slots
        self.mesh = mesh
        self.n_hosts = pmesh.num_host_groups(mesh) if mesh is not None else 1
        # Pool-row layout. Rows shard over the mesh in dcn-major order, so
        # host group h's devices hold the contiguous block
        # [h*rows_per_host, (h+1)*rows_per_host). Each block is that group's
        # usable slots followed by its own trash row(s) (absorb padded
        # admissions locally + pad the row axis to divide the mesh). "Slot"
        # IS the pool-row index throughout; self.slot_rows lists the usable
        # ones.
        if mesh is not None and self.n_hosts > 1:
            H = self.n_hosts
            if slots % H:
                raise ValueError(
                    f"slots={slots} must divide evenly across {H} host groups"
                )
            u = slots // H
            per_dev = mesh.size // H  # devices per host group
            rows = -(-(u + 1) // per_dev) * per_dev  # >= u+1, shards evenly
            self.B1 = H * rows
            self._host_slots = [list(range(h * rows, h * rows + u))
                                for h in range(H)]
            self._host_trash = [h * rows + u for h in range(H)]
        else:
            self.B1 = (pmesh.pad_batch_to_mesh(slots + 1, mesh)
                       if mesh is not None else slots + 1)
            self._host_slots = [list(range(slots))]
            self._host_trash = [slots]
        self.trash = self._host_trash[0]
        self.slot_rows = np.array(
            [s for hs in self._host_slots for s in hs], np.int64
        )
        dead = np.ones(self.B1, bool)
        dead[self.slot_rows] = False
        self._dead_rows = np.nonzero(dead)[0]
        self.max_len = max_len
        self.admit_chunk = admit_chunk
        # frames per device dispatch: K > 1 amortizes the per-step host/RPC
        # cost (readback, dispatch, admission) over K chunks per slot --
        # higher sustained throughput at up to (K-1) frames (80 ms each) of
        # extra chunk latency. K=1 is the latency-optimal streaming default.
        self.frames_per_step = int(frames_per_step)
        assert self.frames_per_step >= 1
        self.prefix_budget = prefix_budget
        self.max_num_steps = max_num_steps  # pool-wide Euler table width
        # widest per-request frame count the pool accepts: sizes the
        # device-resident noise tables (uploaded once at admission; each
        # frame's row is gathered on device, so the steady-state step needs
        # no per-frame host uploads)
        self.noise_budget = noise_budget or (max_len - prefix_budget)
        assert prefix_budget < max_len
        # ring-safety invariant (flowlm.KVCache): a live stream's decode span
        # is bounded by its request's max_frames <= noise_budget, so no live
        # column is ever recycled as long as the budget fits the ring.
        # An explicit raise (not assert): the check must survive python -O.
        if self.noise_budget > max_len - prefix_budget:
            raise api.PttsError(
                f"noise_budget={self.noise_budget} exceeds the decode ring "
                f"({max_len - prefix_budget} columns): a request could "
                f"outlive its own KV columns; raise max_len"
            )
        # the opt-in 'blocked' decode attention reads [start, cursor) as a
        # contiguous span -- wrong once the ring wraps (flowlm.KVCache)
        if engine.flags.decode_impl == "blocked":
            raise api.PttsError(
                "PTTS_DECODE_IMPL=blocked assumes a non-wrapping KV cache "
                "and cannot serve the continuous batcher's decode ring; "
                "use 'auto' or 'einsum'"
            )

        dt = engine.dtype
        cfg = self.cfg
        self.cache = flowlm.make_cache(cfg, self.B1, max_len, dt)
        # decode ring starts after the prefix region
        self.cache = self.cache._replace(
            cursor=jnp.asarray(prefix_budget, jnp.int32),
            start=jnp.full((self.B1,), prefix_budget, jnp.int32),
            t0=jnp.asarray(prefix_budget, jnp.int32),
        )
        self.x = jnp.zeros((self.B1, cfg.d_model), dt)
        self.eos_step = jnp.full((self.B1,), -1, jnp.int32)
        self.done = jnp.ones((self.B1,), jnp.bool_)  # all slots start free
        self.frame_idx = jnp.zeros((self.B1,), jnp.int32)
        self.mimi_state = mimi_stream.init_state(engine.mw, engine.mimi_cfg,
                                                 self.B1, dt)
        # per-slot Euler time-embed tables [B1, S_max, flow_dim] -- each
        # slot carries its own num_steps grid (per-request Params)
        self.time_embs = jnp.zeros(
            (self.B1, max_num_steps, cfg.flow_dim), jnp.float32
        )
        # per-slot noise tables [B1, F_max, latent], device-resident
        self.noise_tab = jnp.zeros(
            (self.B1, self.noise_budget, cfg.latent_dim), dt
        )
        if mesh is not None:
            # shard the pool on the slot axis; jitted step/admit programs
            # pick the shardings up from the arrays (GSPMD)
            self.cache = pmesh.shard_cache(mesh, self.cache)
            self.mimi_state = pmesh.shard_mimi_stream_state(mesh, self.mimi_state)
            self.x = self._put_b(self.x)
            self.eos_step = self._put_b(self.eos_step)
            self.done = self._put_b(self.done)
            self.frame_idx = self._put_b(self.frame_idx)
            self.time_embs = self._put_b(self.time_embs)
            self.noise_tab = self._put_b(self.noise_tab)
        self._te_cache: Dict[int, np.ndarray] = {}  # num_steps -> padded row

        # device voice-cond bank for the ids admission path (admit_slots_ids):
        # a voice's conditioning frames upload ONCE, then every request for
        # it ships only token ids + a bank row index
        self.voice_cap = voice_cap
        self.cond_budget = cond_budget or max(prefix_budget - 2, 1)
        assert self.cond_budget < prefix_budget
        self.cond_bank = self._put_rep(
            jnp.zeros((voice_cap, self.cond_budget, cfg.d_model), dt))
        self.cond_len = self._put_rep(jnp.zeros((voice_cap,), jnp.int32))
        self._voice_idx: Dict[str, int] = {}

        # row-indexed; only rows in slot_rows ever hold a request
        self.slot_req: List[Optional[Request]] = [None] * self.B1
        self.queues: List[deque] = [deque() for _ in range(self.n_hosts)]
        self.queue = _QueueView(self.queues)
        self.chunks: Dict[int, List[np.ndarray]] = {}
        self.finished: Dict[int, Result] = {}
        # rid -> perf_counter stamp of the first collected chunk; moved onto
        # the Result at finish (popped, so long-running servers don't leak)
        self.first_chunk_t: Dict[int, float] = {}
        self._next_rid = 0
        import threading

        self._rid_lock = threading.Lock()  # prepare() runs on handler threads
        self._eos_after = np.zeros(self.B1, np.int32)
        self._max_frames = np.full(self.B1, 1, np.int32)
        self._num_steps = np.ones(self.B1, np.int32)
        self._eos_threshold = np.full(self.B1, 1e30, np.float32)
        self._eos_min_frames = np.ones(self.B1, np.int32)
        # device copies of the per-slot params: they only change at
        # admission, so the steady-state dispatch re-uses these instead of
        # re-uploading five host arrays every frame (each upload is a
        # host->device RPC on remote-tunnel setups)
        self._refresh_params_dev()
        # host-blocking wall time per serving phase (step() bookkeeping;
        # read by tools/bench + profile runs). "admit" is tight-timed
        # admission WORK (group assembly + program dispatch); "admit_wait"
        # is the remainder of the admission window -- queue scans plus GIL
        # hand-offs to feeder/handler threads -- so multi-threaded drivers
        # don't misread thread preemption as admission cost (round-4
        # VERDICT: the prepared-bench row showed admit=140 ms/step that was
        # really feeder-thread time-sharing).
        self.phase_s = {"admit": 0.0, "admit_wait": 0.0, "dispatch": 0.0,
                        "collect": 0.0}
        self._admit_work = 0.0
        self.n_admit_groups = 0
        self.n_steps = 0

        # Host MIRROR of the device done flags, so the double-buffered step
        # loop (dispatch frame N+1 before reading frame N's chunk) never has
        # to sync the device mid-step. It lags the device by the one
        # in-flight frame (EOS decisions arrive with the readback) --
        # everywhere it is consumed (admission, speculative dispatch) a
        # lagged "still running" view is conservative-safe.
        self._done_np = np.ones(self.B1, bool)         # lagged device done
        self._pending: List[tuple] = []    # dispatched, not collected (FIFO)
        self._seq = 0                            # dispatch counter
        self._admit_seq = np.full(self.B1, -1, np.int64)
        self._slot_nframes = np.zeros(self.B1, np.int64)  # device-bound count
        self.pipeline = pipeline
        # speculative-admission state (spec_admit): FIFO receipts of
        # (device rows array, [requests in chunk order], tag) where tag is
        # the seq of the first step program dispatched AFTER the admit --
        # _collect resolves every receipt with tag <= the step being
        # collected, so slot_req/host mirrors are installed exactly between
        # the last pre-admit step and the first post-admit step.
        if self.spec_admit and self.n_hosts > 1:
            raise api.PttsError(
                "spec_admit requires a single host group (device row "
                "selection has no per-group queue affinity)")
        self._receipts: List[tuple] = []
        self._spec_inflight = 0        # receipt requests not yet resolved
        self._spec_cancelled: set = set()
        self._finish_ema = 0.0         # finishes per collected step (EMA)
        if self.spec_admit:
            mask = np.zeros(self.B1, bool)
            mask[self.slot_rows] = True
            self._spec_mask = self._put_b(jnp.asarray(mask))

    # -- device placement ------------------------------------------------------

    def _refresh_params_dev(self) -> None:
        """Full upload of the per-slot generation params (init/recovery only;
        steady-state admissions scatter params on device in admit_slots*)."""
        self._params_dev = (
            self._put_b(self._eos_threshold),
            self._put_b(self._eos_min_frames),
            self._put_b(self._eos_after),
            self._put_b(self._max_frames),
            self._put_b(self._num_steps),
        )

    def register_voice(self, name: str, cond: Optional[np.ndarray]) -> int:
        """Cache a voice's conditioning frames in the device bank; returns the
        bank row, or -1 if the bank is full / the cond doesn't fit (callers
        fall back to the host-assembled prefix path)."""
        idx = self._voice_idx.get(name)
        if idx is not None:
            return idx
        n = 0 if cond is None else len(cond)
        if len(self._voice_idx) >= self.voice_cap or n > self.cond_budget:
            return -1
        idx = len(self._voice_idx)
        if n:
            row = np.zeros((self.cond_budget, self.cfg.d_model), np.float32)
            row[:n] = cond
            self.cond_bank = self._put_rep(
                self.cond_bank.at[idx, :].set(
                    jnp.asarray(row, self.cond_bank.dtype)))
        self.cond_len = self._put_rep(self.cond_len.at[idx].set(n))
        self._voice_idx[name] = idx
        return idx

    def _put_b(self, x, batch_dim: int = 0):
        """Place a per-slot array ([..., B1, ...]) sharded on the slot axis."""
        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        return jax.device_put(x, pmesh.batch_sharding(self.mesh, batch_dim))

    def _put_rep(self, x, dtype=None):
        """Place an admission-group array replicated across the mesh."""
        x = jnp.asarray(x, dtype) if dtype is not None else jnp.asarray(x)
        if self.mesh is None:
            return x
        return jax.device_put(x, pmesh.replicated(self.mesh))

    # -- submission ----------------------------------------------------------

    def prepare(self, text: str, voice: Optional[str] = None,
                params: Optional[api.Params] = None) -> Request:
        """Tokenize + assemble a Request WITHOUT touching the serving queue.

        All the host-heavy work (text prep, tokenization, prefix embedding,
        noise draw) happens here, so HTTP handler threads can run it outside
        the serving lock (runtime/server.py); only enqueue() needs the lock.
        The rid is taken under a dedicated counter lock (noise is seeded
        seed + rid, matching the offline engine's per-stream streams).
        """
        p = (params or api.Params()).normalized()
        if p.num_steps > self.max_num_steps:
            raise api.PttsError(
                f"num_steps {p.num_steps} > pool max_num_steps "
                f"{self.max_num_steps} (raise it at construction)"
            )
        prepared, wc, eos_after_guess = prepare_text(text)
        ids = self.engine.ctx.tokenize(prepared)
        cond, _ = self.engine._voice_cond(voice)
        # ids admission path: ship token ids + a voice-bank row instead of a
        # host-assembled [T0, d] embedding matrix (admit_slots_ids builds it
        # on device); falls back to the host prefix if the bank is full
        vidx = self.register_voice(voice or "alba", cond)
        n_cond = 0 if cond is None else len(cond)
        prefix = None
        ids_np = None
        if vidx >= 0 and len(ids) <= self.prefix_budget:
            v = self.cfg.vocab + 1
            ids_np = np.asarray(ids, np.int64)
            ids_np = np.where((ids_np < 0) | (ids_np >= v), 0,
                              ids_np).astype(np.int32)
            need = n_cond + len(ids_np) + 1
        else:
            prefix = self.engine._build_prefix(ids, cond)
            need = len(prefix)
        if need > self.prefix_budget:
            raise api.PttsError(
                f"prompt needs {need} prefix columns > budget "
                f"{self.prefix_budget}"
            )
        max_frames = p.num_frames if p.num_frames > 0 else estimate_frames(wc)
        if max_frames > self.noise_budget:
            raise api.PttsError(
                f"request needs {max_frames} frames > pool noise_budget "
                f"{self.noise_budget} (raise it at construction)"
            )
        seed = p.seed if p.seed != -1 else int(time.time())
        with self._rid_lock:
            rid = self._next_rid
            self._next_rid += 1
        # explicit seed -> host parity noise (bit-matches the offline
        # engine's seed+rid stream); seed=-1 + device_noise -> the noise
        # table is drawn on device at admission (no bulk upload)
        if self.device_noise and p.seed == -1:
            noise = None
        else:
            noise = frame_noise(seed + rid, max_frames, self.cfg.latent_dim,
                                temp=p.temp, noise_clamp=p.noise_clamp)
        return Request(
            rid=rid,
            prefix=prefix,
            noise=noise,
            noise_seed=(seed + rid) & 0xFFFFFFFF,
            temp=p.temp,
            noise_clamp=p.noise_clamp,
            max_frames=max_frames,
            eos_after=p.eos_after if p.eos_after > 0 else eos_after_guess,
            num_steps=p.num_steps,
            eos_threshold=(p.eos_threshold if p.eos_enabled
                           else np.float32(1e30)),
            eos_min_frames=p.eos_min_frames,
            ids=ids_np,
            voice_idx=vidx,
        )

    def _route_host(self) -> int:
        """Pick the host group with the most admission headroom."""
        if self.n_hosts == 1:
            return 0

        def backlog(h: int) -> int:
            free = sum(1 for s in self._host_slots[h]
                       if self.slot_req[s] is None)
            return len(self.queues[h]) - free

        return min(range(self.n_hosts), key=lambda h: (backlog(h), h))

    def enqueue(self, req: Request, host: Optional[int] = None) -> int:
        """Queue a prepared Request for admission (cheap; lock-holding ok).

        ``host`` pins the request to one host group's slot rows (multi-host
        mesh); default routes to the group with the most headroom.

        The ring-safety invariant is re-validated HERE, not only in
        prepare(): a directly-enqueued over-budget request would otherwise
        silently recycle live decode-ring columns mid-stream (the admit
        scatter clamps rather than errors)."""
        if req.max_frames > self.noise_budget:
            raise api.PttsError(
                f"request rid={req.rid} needs {req.max_frames} frames > pool "
                f"noise_budget {self.noise_budget} (raise it at construction)"
            )
        if req.noise is not None and len(req.noise) < req.max_frames:
            raise api.PttsError(
                f"request rid={req.rid} carries {len(req.noise)} noise rows "
                f"< max_frames {req.max_frames}: the tail frames would "
                f"integrate zero noise"
            )
        if req.num_steps > self.max_num_steps:
            raise api.PttsError(
                f"request rid={req.rid} num_steps {req.num_steps} > pool "
                f"max_num_steps {self.max_num_steps}"
            )
        if self.max_queue and len(self.queue) >= self.max_queue:
            raise QueueFull(
                f"admission queue full ({self.max_queue} requests); retry "
                f"later"
            )
        h = self._route_host() if host is None else host
        self.queues[h].append(req)
        self.chunks[req.rid] = []
        return req.rid

    def cancel(self, rid: int) -> bool:
        """Abandon a request wherever it is: queued (dequeued), in a slot
        (the slot is freed for the next admission), or finished-unclaimed
        (the Result is dropped). Returns False if the rid is unknown.

        Pure host bookkeeping -- no device program. A cancelled slot's row
        keeps computing inside in-flight/subsequent step programs until its
        own max_frames (identical cost to an early-EOS row: every row is
        always computed under static shapes, so the padded work slows
        nothing), but the slot is re-admittable IMMEDIATELY -- the next
        admission overwrites its cache/params/done wholesale, exactly like
        reusing an early-finisher's row (test_ring_survives_early_finishers).

        Safe to call from another thread while the serving thread is inside
        step(): the writes here are GIL-atomic container/array-scalar
        updates, _collect tolerates a mid-iteration disappearance (it
        re-reads chunks via .get), and the _admit_seq bump keeps in-flight
        frames dispatched BEFORE the cancel from flipping the host done
        mirror back to live. The one benign race: a device EOS collected in
        the same step window can still publish a Result, which then ages out
        via the server's result TTL."""
        deadline = time.perf_counter() + 0.05
        while True:
            # queued?
            req = self.queue.remove_rid(rid)
            if req is not None:
                self.chunks.pop(rid, None)
                self.first_chunk_t.pop(rid, None)
                return True
            # in a slot?
            for slot in self.slot_rows:
                r = self.slot_req[slot]
                if r is not None and r.rid == rid:
                    self.slot_req[slot] = None
                    self._done_np[slot] = True
                    # frames dispatched before this point must not resurrect
                    # the mirror at collect time (same guard as admission)
                    self._admit_seq[slot] = self._seq
                    self._slot_nframes[slot] = 0
                    self.chunks.pop(rid, None)
                    self.first_chunk_t.pop(rid, None)
                    return True
            # in an unresolved speculative-admit receipt? mark it: resolve
            # skips the install (the device row, if one was chosen, runs to
            # its own max_frames unobserved and then frees itself)
            for rec in list(self._receipts):
                if any(r.rid == rid for r in rec[1]):
                    if rid not in self._spec_cancelled:
                        self._spec_cancelled.add(rid)
                        self.chunks.pop(rid, None)
                        self.first_chunk_t.pop(rid, None)
                        return True
                    return False  # already cancelled
            # finished but unclaimed?
            if self.finished.pop(rid, None) is not None:
                self.chunks.pop(rid, None)
                self.first_chunk_t.pop(rid, None)
                return True
            # A chunks entry without a queue/slot/finished hit means the rid
            # is mid-admission on the serving thread (between its queue pop
            # and its slot_req write); spin briefly until it lands in a slot.
            if rid not in self.chunks or time.perf_counter() > deadline:
                return False
            time.sleep(0.0005)

    def submit(self, text: str, voice: Optional[str] = None,
               params: Optional[api.Params] = None,
               host: Optional[int] = None) -> int:
        return self.enqueue(self.prepare(text, voice=voice, params=params),
                            host=host)

    def _te_row(self, num_steps: int) -> np.ndarray:
        """[S_max, flow_dim] Euler table for num_steps, zero-padded."""
        row = self._te_cache.get(num_steps)
        if row is None:
            te = np.asarray(
                flowlm.lsd_time_embeds(self.engine.fw, num_steps, self.cfg),
                np.float32,
            )
            row = np.zeros((self.max_num_steps, self.cfg.flow_dim), np.float32)
            row[:num_steps] = te
            self._te_cache[num_steps] = row
        return row

    # -- serving loop ----------------------------------------------------------

    def _admit(self) -> int:
        # Returns the number of requests admitted (step() splits the next
        # dispatch when fresh streams are aboard -- see split_admit).
        # NO host fence after admission: the frame step consumes the admit
        # program's (donated) outputs, so device-stream data dependencies
        # already order them. An explicit np.asarray fence here was once a
        # measured win on the remote tunnel, but after ids admission +
        # device-drawn noise + the decode-ring cache it re-measured as pure
        # loss in BOTH modes (device-bound 947 -> 1138 streams/chip, tunnel
        # 276 -> 394; the RPC roundtrip serialized every admitting step --
        # PERF.md round 3 "admission fence removal").
        if self.spec_admit:
            return self._admit_spec()
        admitted = 0
        work = 0.0  # tight-timed assembly+dispatch (phase_s attribution)
        for h in range(self.n_hosts):
            q = self.queues[h]
            if not q:
                continue
            free = [s for s in self._host_slots[h] if self.slot_req[s] is None]
            while free and q:
                group: List[Tuple[int, Request]] = []
                while free and q and len(group) < self.admit_chunk:
                    group.append((free.pop(0), q.popleft()))
                tg = time.perf_counter()
                self._admit_group(group, self._host_trash[h])
                work += time.perf_counter() - tg
                admitted += len(group)
        self._admit_work += work
        return admitted

    def _admit_spec(self) -> int:
        """Speculative admission: dispatch admit programs whose target rows
        are chosen ON DEVICE, budgeted past the host's lagged free count by
        the recent finish rate -- that overshoot is exactly what lets rows
        freed in the still-uncollected window refill for the next window.
        Overshoot that finds no free row lands in the trash row and is
        re-queued when the receipt resolves (a wasted padded prefill, bounded
        by the EMA error)."""
        q = self.queues[0]
        if not q:
            return 0
        known_free = sum(1 for s in self._host_slots[0]
                         if self.slot_req[s] is None)
        budget = (known_free - self._spec_inflight
                  + int(np.ceil(self._finish_ema * 1.5)))
        budget = min(budget, len(q))
        admitted = 0
        work = 0.0
        while budget > 0 and q:
            take = min(self.admit_chunk, budget, len(q))
            group = [(None, q.popleft()) for _ in range(take)]
            tg = time.perf_counter()
            self._admit_group(group, self._host_trash[0], spec=True)
            work += time.perf_counter() - tg
            admitted += take
            budget -= take
        self._spec_inflight += admitted
        self._admit_work += work
        return admitted

    def _admit_group(self, group: List[Tuple[int, Request]],
                     trash_row: int, spec: bool = False) -> None:
        # partition by admit program variant: (prompt as ids vs host prefix)
        # x (noise drawn on device vs host-uploaded parity rows). A MIXED
        # group pays one full-chunk-padded admit program per variant present
        # (worst case 4), halving admission throughput vs a uniform group --
        # acceptable because production traffic is uniform (seed=-1 ids
        # requests); host-noise rows exist for parity/debug only. If mixed
        # traffic ever matters, blend per-slot host/device noise in one
        # program instead of partitioning.
        for by_ids in (True, False):
            for dev_noise in (True, False):
                sub = [g for g in group
                       if (g[1].ids is not None) == by_ids
                       and (g[1].noise is None) == dev_noise]
                if not sub:
                    continue
                if by_ids:
                    self._admit_group_ids(sub, trash_row, dev_noise, spec)
                else:
                    self._admit_group_prefix(sub, trash_row, dev_noise, spec)

    def _admit_bookkeep(self, group, trash_row, dev_noise: bool):
        """Shared per-group host bookkeeping; returns the padded admission
        arrays every path uploads (slots, Euler tables, noise, params).

        ``dev_noise`` groups carry only a seed + (std, clamp) per request --
        the [F_max, latent] noise rows are drawn on device in the admit
        program (the padded host row was ~25 KB/request over the wire and
        dominated remote admission)."""
        n = self.admit_chunk
        slot_ids = np.full(n, trash_row, np.int32)
        te_rows = np.zeros((n, self.max_num_steps, self.cfg.flow_dim),
                           np.float32)
        if dev_noise:
            noise = {"seed": np.zeros(n, np.int32),
                     "meta": np.zeros((2, n), np.float32)}
        else:
            noise = {"rows": np.zeros((n, self.noise_budget,
                                       self.cfg.latent_dim), np.float32)}
        # packed [5, n] f32 (ints < 2^24, exact): one upload instead of five
        new_params = np.zeros((5, n), np.float32)
        new_params[0] = 1e30
        new_params[1] = 1
        new_params[3] = 1
        new_params[4] = 1
        for j, (slot, req) in enumerate(group):
            te_rows[j] = self._te_row(req.num_steps)
            if dev_noise:
                noise["seed"][j] = np.uint32(req.noise_seed & 0xFFFFFFFF).view(np.int32)
                noise["meta"][0, j] = (np.sqrt(np.float32(req.temp))
                                       if req.temp > 0 else 0.0)
                noise["meta"][1, j] = req.noise_clamp
            else:
                noise["rows"][j, : len(req.noise)] = req.noise
            new_params[:, j] = (req.eos_threshold, req.eos_min_frames,
                                req.eos_after, req.max_frames, req.num_steps)
            if slot is None:  # spec_admit: the device picks the row; host
                continue      # mirrors install at receipt-resolve time
            slot_ids[j] = slot
            self._install_slot(slot, req, self._seq)
        self.n_admit_groups += 1
        return slot_ids, te_rows, noise, new_params

    def _install_slot(self, slot: int, req: Request, admit_seq: int) -> None:
        """Host mirrors for a newly admitted request: the slot becomes live
        for every dispatch with seq >= admit_seq (see __init__)."""
        self.slot_req[slot] = req
        self._eos_after[slot] = req.eos_after
        self._max_frames[slot] = req.max_frames
        self._num_steps[slot] = req.num_steps
        self._eos_threshold[slot] = req.eos_threshold
        self._eos_min_frames[slot] = req.eos_min_frames
        self._done_np[slot] = False
        self._admit_seq[slot] = admit_seq
        self._slot_nframes[slot] = 0

    def _noise_args(self, noise: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """kwargs for the admit program's noise variant (host vs device)."""
        if "rows" in noise:
            return {"noise_rows": self._put_rep(noise["rows"],
                                                self.engine.dtype),
                    "device_noise": False}
        return {"noise_rows": None,
                "noise_seed": self._put_rep(noise["seed"]),
                "noise_meta": self._put_rep(noise["meta"]),
                "device_noise": True}

    def _spec_kwargs(self, n_valid: int) -> Dict[str, Any]:
        return {"spec_select": True,
                "n_valid": self._put_rep(np.int32(n_valid)),
                "slot_mask": self._spec_mask,
                "trash_row": int(self.trash)}

    def _push_receipt(self, rows_dev, group) -> None:
        """Record a speculative admit's device-chosen rows for later
        resolution (tag = the seq of the first step dispatched after it)."""
        try:
            rows_dev.copy_to_host_async()
        except Exception:
            pass
        self._receipts.append((rows_dev, [req for _, req in group],
                               self._seq))

    def _admit_group_prefix(self, group: List[Tuple[int, Request]],
                            trash_row: int, dev_noise: bool,
                            spec: bool = False) -> None:
        n = self.admit_chunk
        T0 = self.prefix_budget
        slot_ids, te_rows, noise, new_params = self._admit_bookkeep(
            group, trash_row, dev_noise)
        prefix = np.zeros((n, T0, self.cfg.d_model), np.float32)
        lengths = np.ones(n, np.int32)
        for j, (_, req) in enumerate(group):
            prefix[j, : len(req.prefix)] = req.prefix
            lengths[j] = len(req.prefix)

        out = admit_slots(
            self.engine.fw, self.cache, self.x, self.eos_step, self.done,
            self.frame_idx, self.mimi_state, self.time_embs,
            self.noise_tab, self._params_dev,
            self._put_rep(slot_ids),
            self._put_rep(prefix, self.engine.dtype),
            self._put_rep(lengths), self._put_rep(te_rows),
            new_params=self._put_rep(new_params), cfg=self.cfg,
            flags=self.engine.flags,
            **self._noise_args(noise),
            **(self._spec_kwargs(len(group)) if spec else {}),
        )
        (self.cache, self.x, self.eos_step, self.done, self.frame_idx,
         self.mimi_state, self.time_embs, self.noise_tab,
         self._params_dev) = out[:9]
        if spec:
            self._push_receipt(out[9], group)

    def _admit_group_ids(self, group: List[Tuple[int, Request]],
                         trash_row: int, dev_noise: bool,
                         spec: bool = False) -> None:
        n = self.admit_chunk
        Tt = self.prefix_budget
        slot_ids, te_rows, noise, new_params = self._admit_bookkeep(
            group, trash_row, dev_noise)
        ids = np.zeros((n, Tt), np.int32)
        n_tokens = np.zeros(n, np.int32)
        cond_idx = np.zeros(n, np.int32)
        for j, (_, req) in enumerate(group):
            ids[j, : len(req.ids)] = req.ids
            n_tokens[j] = len(req.ids)
            cond_idx[j] = req.voice_idx

        out = admit_slots_ids(
            self.engine.fw, self.cache, self.x, self.eos_step, self.done,
            self.frame_idx, self.mimi_state, self.time_embs,
            self.noise_tab, self._params_dev,
            self._put_rep(slot_ids),
            self._put_rep(ids), self._put_rep(n_tokens),
            self._put_rep(cond_idx), self.cond_bank, self.cond_len,
            self._put_rep(te_rows),
            new_params=self._put_rep(new_params),
            prefix_budget=self.prefix_budget, cfg=self.cfg,
            flags=self.engine.flags,
            **self._noise_args(noise),
            **(self._spec_kwargs(len(group)) if spec else {}),
        )
        (self.cache, self.x, self.eos_step, self.done, self.frame_idx,
         self.mimi_state, self.time_embs, self.noise_tab,
         self._params_dev) = out[:9]
        if spec:
            self._push_receipt(out[9], group)

    # -- double-buffered frame machinery --------------------------------------
    #
    # step() dispatches frame N+1 to the device BEFORE converting frame N's
    # PCM on the host, so the readback RPC overlaps device compute (same
    # contract as StreamingSession.pipeline). The host mirrors in __init__
    # carry everything dispatch decisions need; admissions that land between
    # a frame's dispatch and its collection are sequence-tracked so the
    # stale in-flight frame can't clobber the new slot's liveness.

    def _dispatch(self, k: Optional[int] = None) -> None:
        """Queue one k-frame pool step on the device; start the PCM host
        copy. ``k`` defaults to the pool cadence (frames_per_step)."""
        engine = self.engine
        was_done_dev = self.done  # DEVICE pre-step done: exact chunk routing
        # eos params are per-slot arrays; "disabled" is threshold=+1e30;
        # noise rows are gathered on device from the per-slot tables
        eos_threshold, eos_min_frames, eos_after, max_frames, num_steps = (
            self._params_dev  # admission-time device copies, no re-upload
        )
        if k is None:
            k = self.frames_per_step
        if k == 1:
            (self.cache, self.mimi_state, self.x, pcm, eos,
             self.eos_step, self.done) = fused_stream_step(
                engine.fw, engine.mw, self.cache, self.mimi_state, self.x,
                self.noise_tab,
                self.time_embs, self.frame_idx, self.eos_step, self.done,
                self.cfg, engine.mimi_cfg, True,
                eos_threshold, eos_min_frames,
                eos_after, max_frames,
                num_steps, flags=engine.flags, emit_i16=True,
                pack_flags=self.pack_flags,
            )
            self.frame_idx = self.frame_idx + 1
            wd = was_done_dev  # [B]: chunk is live iff not done pre-step
        else:
            (self.cache, self.mimi_state, self.x, pcm, eos,
             self.eos_step, self.done, wd, self.frame_idx) = (
                fused_stream_steps(
                    engine.fw, engine.mw, self.cache, self.mimi_state, self.x,
                    self.noise_tab,
                    self.time_embs, self.frame_idx, self.eos_step, self.done,
                    self.cfg, engine.mimi_cfg, True,
                    eos_threshold, eos_min_frames,
                    eos_after, max_frames,
                    num_steps, k=k, flags=engine.flags, emit_i16=True,
                    pack_flags=self.pack_flags,
                )
            )  # pcm [k, B, S]; wd [k, B] per-frame pre-step done
        # no post-dispatch fence: like the admission fence (see _admit), the
        # [:4] done-read here re-measured as a small consistent loss in both
        # modes once admission got cheap (A/B on chip: device-bound 1066 ->
        # 1092, tunnel 374 -> 388 streams/chip) -- _collect's done readback
        # right after is the loop's real wait point anyway.
        # start every readback the collect will need as early as possible:
        # each blocking np.asarray at collect time is a full RPC roundtrip
        # through the tunnel (PERF.md rounds 4-5)
        if not self.collect_pcm:
            # device-bound: combine was_done+done into ONE tiny [k+1, B]
            # readback (two RPCs -> one; PCM never leaves the chip)
            flags = _combine_flags(wd, self.done)
            try:
                flags.copy_to_host_async()
            except Exception:
                pass
            self._pending.append((None, flags, None, self._seq))
        else:
            try:
                pcm.copy_to_host_async()
                if not self.pack_flags:
                    # packed mode: the flags ride the PCM buffer -- no
                    # separate flag copies to start (or to serialize with
                    # the PCM stream)
                    self.done.copy_to_host_async()
                    wd.copy_to_host_async()
            except Exception:
                pass
            self._pending.append((pcm, self.done, wd, self._seq))
        self._seq += 1

    def _dispatch_step(self, fresh: int) -> None:
        """Dispatch one pool step of frames_per_step frames -- as a single
        K-frame program, or (split_admit, when ``fresh`` requests were just
        admitted) as k=1 + k=K-1 back-to-back programs so the fresh streams'
        first chunks come back after ONE frame of compute + a 1-frame PCM
        transfer instead of the whole K-frame program + K-frame transfer.
        The two programs chain on device (each consumes the donated state of
        the last); fused_stream_steps is a scan of the identical single-frame
        body, so the split is numerically equivalent to the unsplit step up
        to jit-boundary fusion drift (<=4 LSB on int16 PCM -- the same bound
        test_split_admit_matches_unsplit holds the K=1-vs-K comparison to;
        the k=1 program is a separate jit unit, so bit-exactness is NOT
        guaranteed and nothing may assume it). Reference
        bar: the per-frame loop emits every frame as it is produced
        (ptts_flowlm.c:1195-1246); K-frame batching is our amortization, so
        its latency cost must not land on a stream's FIRST chunk."""
        k = self.frames_per_step
        if fresh and k > 1 and self.split_admit:
            self._dispatch(1)
            self._dispatch(k - 1)
        else:
            self._dispatch(k)

    def _resolve_receipt(self, rec) -> None:
        """Install a speculative admit's device-chosen rows into the host
        mirrors. Called in dispatch order: after collecting every step that
        ran before the admit, before collecting the first step after it --
        so slot_req/chunk routing sees exactly the device's timeline.
        Requests the device dumped in the trash row (no free row at admit
        execution time) re-enter the FRONT of the queue."""
        rows_dev, reqs, tag = rec
        rows = np.asarray(rows_dev)
        requeue = []
        for j, req in enumerate(reqs):
            self._spec_inflight -= 1
            if req.rid in self._spec_cancelled:
                # cancelled while in flight: if the device installed it, the
                # row burns to its own max_frames unobserved, then becomes
                # choosable again (host keeps slot_req[row] None)
                self._spec_cancelled.discard(req.rid)
                continue
            row = int(rows[j])
            if row == self.trash:
                requeue.append(req)
            else:
                self._install_slot(row, req, tag)
        q = self.queues[0]
        for req in reversed(requeue):
            q.appendleft(req)

    def _collect(self, pend) -> int:
        """Read an in-flight frame's chunk(s); finalize finished requests."""
        pcm_dev, done_dev, was_done_dev, seq = pend
        # speculative admits that were dispatched before this step: their
        # rows are live IN this step's flags -- install them first
        while self._receipts and self._receipts[0][2] <= seq:
            self._resolve_receipt(self._receipts.pop(0))
        t = time.perf_counter
        t0 = t()
        if not self.collect_pcm:
            # device-bound: ONE combined [k+1, B] flag readback (PCM never
            # leaves the chip); done_dev holds the combined buffer
            fl = np.asarray(done_dev)
            self.phase_s["c_wait"] = (self.phase_s.get("c_wait", 0.0)
                                      + (t() - t0))
            was_done = fl[:-1]                             # [k, B]
            done_np = fl[-1]                               # [B] post-step
            pcm_np = np.zeros((was_done.shape[0], done_np.shape[0], 0),
                              np.int16)
        elif self.pack_flags:
            # one transfer carries PCM + flags; the whole wait is the PCM
            # copy (c_wait/c_wd collapse to ~0 by construction)
            raw = np.asarray(pcm_dev)
            t_pcm = t()
            self.phase_s["c_pcm"] = (self.phase_s.get("c_pcm", 0.0)
                                     + (t_pcm - t0))
            if raw.ndim == 2:
                raw = raw[None]
            pcm_np = raw[:, :, :-2]
            was_done = raw[:, :, -2] != 0                  # [k, B]
            done_np = raw[-1, :, -1] != 0                  # [B] post-step
        else:
            done_np = np.asarray(done_dev)  # tiny: isolates queue wait...
            t1 = t()
            pcm_np = np.asarray(pcm_dev)  # ...from the bulk PCM transfer
            t2 = t_pcm = t()
            self.phase_s["c_wait"] = (self.phase_s.get("c_wait", 0.0)
                                      + (t1 - t0))
            self.phase_s["c_pcm"] = self.phase_s.get("c_pcm", 0.0) + (t2 - t1)
            was_done = np.asarray(was_done_dev)  # [B] or [k, B]
            self.phase_s["c_wd"] = self.phase_s.get("c_wd", 0.0) + (t() - t2)
            if pcm_np.ndim == 2:  # single-frame dispatch
                pcm_np = pcm_np[None]
            if was_done.ndim == 1:
                was_done = was_done[None]
        # slots admitted AFTER this frame was dispatched keep their mirror
        # (the frame predates them); the trash row is never live on the host
        fresh = self._admit_seq > seq
        self._done_np = np.where(fresh, self._done_np, done_np)
        self._done_np[self._dead_rows] = True
        if not self.collect_pcm:
            return self._collect_counts(done_np, was_done, fresh)
        # t_pcm (set in the branch above): chunks became host-readable when
        # the PCM copy landed
        n_pub = 0
        for slot in self.slot_rows:
            req = self.slot_req[slot]
            if req is None or fresh[slot]:
                continue
            # .get: a concurrent cancel() may have popped the buffer between
            # the slot_req read above and here -- skip, the slot is gone
            parts = self.chunks.get(req.rid)
            if parts is None:
                continue
            had = bool(parts)
            for j in range(pcm_np.shape[0]):
                if not was_done[j, slot]:
                    parts.append(pcm_np[j, slot])
            if not had and parts:
                self.first_chunk_t[req.rid] = t_pcm
            if done_np[slot]:
                parts = self.chunks.pop(req.rid, parts)
                self.finished[req.rid] = Result(
                    rid=req.rid,
                    pcm_i16=(np.concatenate(parts) if parts
                             else np.zeros(0, np.int16)),
                    frames=len(parts),
                    first_chunk_t=self.first_chunk_t.pop(req.rid, -1.0),
                )
                self.slot_req[slot] = None
                n_pub += 1
        self._finish_ema = 0.8 * self._finish_ema + 0.2 * n_pub
        return sum(1 for s in self.slot_req if s is not None)

    def _collect_counts(self, done_np, was_done, fresh) -> int:
        """Device-bound collect: PCM never left the chip, so the per-slot
        chunk routing reduces to vectorized frame counting. The per-slot
        Python loop it replaces was ~25 ms/step at 384 slots x K=8 -- a
        third of the whole pipelined step wall (PERF.md round 4)."""
        live = np.fromiter((r is not None for r in self.slot_req),
                           bool, len(self.slot_req))
        act = live & ~fresh
        emit = np.where(act, (~was_done).sum(axis=0), 0)  # frames this step
        started = act & (self._slot_nframes == 0) & (emit > 0)
        self._slot_nframes += emit
        t_now = time.perf_counter()
        for slot in np.nonzero(started)[0]:
            # placeholder so first-chunk trackers see the stream start
            req = self.slot_req[slot]
            parts = None if req is None else self.chunks.get(req.rid)
            if parts is None:  # concurrently cancelled
                continue
            parts.append(_EMPTY_I16)
            self.first_chunk_t[req.rid] = t_now
        for slot in np.nonzero(act & done_np)[0]:
            req = self.slot_req[slot]
            if req is None:  # concurrently cancelled
                continue
            n = int(self._slot_nframes[slot])
            self._slot_nframes[slot] = 0
            self.chunks.pop(req.rid, None)
            self.finished[req.rid] = Result(
                rid=req.rid, pcm_i16=np.zeros(0, np.int16), frames=n,
                first_chunk_t=self.first_chunk_t.pop(req.rid, -1.0))
            self.slot_req[slot] = None
        self._finish_ema = (0.8 * self._finish_ema
                            + 0.2 * int((act & done_np).sum()))
        return int(live.sum() - (act & done_np).sum())

    def step(self) -> int:
        """Admit + collect one pool step. Returns #active streams."""
        t = time.perf_counter
        self.n_steps += 1
        self._admit_work = 0.0
        if (self._pending and not self._receipts
                and all(r is None for r in self.slot_req)):
            pend, self._pending = self._pending, []
            for p in pend:
                self._collect(p)  # flush stale speculative frames
        t0 = t()
        fresh = self._admit()
        if (self._receipts and not self._pending
                and not any(r is not None for r in self.slot_req)):
            # nothing in flight to carry the receipts forward: resolve them
            # now (blocking on the tiny rows array) so their requests either
            # go live in slot_req or re-queue, then admit again
            while self._receipts:
                self._resolve_receipt(self._receipts.pop(0))
            fresh += self._admit()
        t1 = t()
        have_active = any(r is not None for r in self.slot_req)
        if not self._pending:
            if not have_active:
                self.phase_s["admit"] += self._admit_work
                self.phase_s["admit_wait"] += (t1 - t0) - self._admit_work
                return 0
            self._dispatch_step(fresh)
            fresh = 0  # this dispatch already carries the fresh streams
        pend, self._pending = self._pending, []
        if self.pipeline and (self._spec_inflight > 0
                              or not self._done_np[self.slot_rows].all()):
            # speculative next step: overlaps the readback in _collect()
            self._dispatch_step(fresh)
        t2 = t()
        out = 0
        for p in pend:  # FIFO: _done_np mirrors stay in dispatch order
            out = self._collect(p)
        t3 = t()
        self.phase_s["admit"] += self._admit_work
        self.phase_s["admit_wait"] += (t1 - t0) - self._admit_work
        self.phase_s["dispatch"] += t2 - t1
        self.phase_s["collect"] += t3 - t2
        return out

    def drain(self, max_steps: int = 100000) -> Dict[int, Result]:
        steps = 0
        while (self.queue or self._receipts
               or any(r is not None for r in self.slot_req)):
            self.step()
            steps += 1
            if steps > max_steps:
                raise RuntimeError("continuous batcher failed to drain")
        if self._pending:
            pend, self._pending = self._pending, []
            for p in pend:
                self._collect(p)  # retire the trailing speculative frames
        return self.finished
