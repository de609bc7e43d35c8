"""Fence the tunnel-transport ceiling for PCM-collecting serving.

Round-4 VERDICT item 2: the 260-395 streams/chip tunnel-mode figure was
*blamed* on the single RPC stream without a measurement. This tool produces
the fence:

1. **Wire probe** -- raw device->host and host->device MB/s for a
   PCM-step-sized buffer (the readback unit the serving loop actually
   moves), repeated for variance.
2. **Operating-point accounting** -- run the tunnel-mode batcher
   (collect_pcm=True) and report achieved PCM bytes/s against the probe:
   if achieved ~= wire rate, the transport is saturated and the item closes
   permanently; if not, the gap names the next lever.
3. **A/B ladder** -- serial vs pipelined (>= 2 steps' PCM copies in
   flight), and speculative admission (occupancy up -> fewer padded bytes
   per live frame at the same wire rate).

Run on the real chip:  python tools/bench_tunnel_transport.py
Reference bar: the reference's per-frame host<->device chattiness is the
sin this build exists to eliminate (SURVEY.md §3.1); this tool proves where
OUR loop sits against the physical link.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def probe_wire(n_bytes: int, reps: int = 8):
    """Raw tunnel bandwidth for one buffer of n_bytes, each direction."""
    import jax
    import jax.numpy as jnp

    x_host = np.zeros(n_bytes // 2, np.int16)
    d2h, h2d = [], []
    dev = jax.device_put(jnp.asarray(x_host))
    np.asarray(dev)  # materialize
    for _ in range(reps):
        t0 = time.perf_counter()
        dev = jax.device_put(x_host)
        dev.block_until_ready()
        h2d.append(n_bytes / (time.perf_counter() - t0) / 1e6)
        t0 = time.perf_counter()
        np.asarray(dev)  # the host readback is the only true fence
        d2h.append(n_bytes / (time.perf_counter() - t0) / 1e6)
    return np.array(d2h), np.array(h2d)


def main() -> int:
    bench._enable_compile_cache()
    slots = int(os.environ.get("PTTS_TUNNEL_SLOTS", "256"))
    k = int(os.environ.get("PTTS_TUNNEL_FPS", "8"))
    reqs = int(os.environ.get("PTTS_TUNNEL_REQS", "1500"))

    # one serving step's PCM readback unit: [k, B1, frame_samples] int16
    frame_samples = 1920
    step_bytes = k * (slots + 1) * frame_samples * 2
    d2h, h2d = probe_wire(step_bytes)
    print(f"[wire] step-sized buffer {step_bytes / 1e6:.1f} MB: "
          f"d2h {d2h.min():.0f}-{d2h.max():.0f} (med {np.median(d2h):.0f}) "
          f"MB/s, h2d {h2d.min():.0f}-{h2d.max():.0f} "
          f"(med {np.median(h2d):.0f}) MB/s", file=sys.stderr)

    rows = {}
    for label, kw in [
        ("serial", dict()),
        ("pipelined", dict(pipeline=True)),
        ("serial+spec", dict(spec_admit=True)),
        # pack_flags A/B: flags ride the PCM buffer (1 d2h copy/step) vs
        # separate done/was_done RPCs that serialize with the PCM stream
        ("pipelined+spec", dict(pipeline=True, spec_admit=True)),
        ("pipelined+spec-nopack", dict(pipeline=True, spec_admit=True,
                                       pack_flags=False)),
    ]:
        stats = {}
        streams, p50, fin, wall = bench.run_batcher_bench(
            slots, "bf16", reqs, frames_per_step=k, collect_pcm=True,
            label=f"tunnel:{label}", stats_out=stats, **kw)
        n_steps = max(stats["n_steps"], 1)
        pcm_bytes = stats["n_steps"] * k * stats["B1"] * frame_samples * 2
        ach = pcm_bytes / wall / 1e6
        live_frac = stats["frames_done"] / (stats["n_steps"] * k * slots)
        rows[label] = dict(streams=streams, p50=p50, ach_MBps=ach,
                           occupancy=live_frac,
                           c_wait_ms=stats["phase_s"].get("c_wait", 0.0)
                           / n_steps * 1e3,
                           c_pcm_ms=stats["phase_s"].get("c_pcm", 0.0)
                           / n_steps * 1e3)
        print(f"[tunnel:{label}] {streams:.1f} streams/chip p50 {p50:.0f} ms"
              f" | PCM readback {ach:.0f} MB/s achieved vs wire med "
              f"{np.median(d2h):.0f} MB/s ({ach / np.median(d2h) * 100:.0f}%"
              f" of link) | occupancy {live_frac * 100:.0f}%",
              file=sys.stderr)

    best = max(rows, key=lambda r: rows[r]["streams"])
    print(f"[tunnel] best: {best} {rows[best]['streams']:.1f} streams/chip, "
          f"{rows[best]['ach_MBps']:.0f} MB/s of "
          f"{np.median(d2h):.0f} MB/s wire", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
