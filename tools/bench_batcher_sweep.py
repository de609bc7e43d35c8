#!/usr/bin/env python3
"""Sustained-batcher operating-point sweep on the real chip.

Grid-sweeps the ContinuousBatcher bench (bench.run_batcher_bench) over
  mode   x  slots  x  frames_per_step(K)
where mode is serial vs pipelined (dispatch step N+1 before collecting N,
overlapping the done-flag readback RPC with device compute) in device-bound
collection (PCM stays on chip; only done flags read back -- the co-located
serving regime).

Answers round-3 VERDICT item 1: is the device-bound batcher transport-bound
(readback RPC under c_wait with the chip idle) or compute-bound? If the
pipelined mode recovers the c_wait gap, it was transport; if not, the fenced
per-step accounting shows where the time goes.

Usage:
  python tools/bench_batcher_sweep.py                      # default grid
  python tools/bench_batcher_sweep.py --slots 256,512 --k 8,16 --modes pipe
  PTTS_BENCH_DTYPE=bf16 python tools/bench_batcher_sweep.py --reqs 1200

Prints one JSON line per grid point and a final summary table to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", default="256,384,512")
    ap.add_argument("--k", default="4,8,16")
    ap.add_argument("--modes", default="serial,pipe",
                    help="comma list of serial|pipe")
    ap.add_argument("--reqs", type=int, default=1200)
    ap.add_argument("--dtype", default=os.environ.get("PTTS_BENCH_DTYPE",
                                                      "bf16"))
    ap.add_argument("--collect-pcm", action="store_true",
                    help="read PCM back per step (tunnel regime) instead of "
                    "device-bound")
    ap.add_argument("--max-seconds", type=float, default=60.0)
    args = ap.parse_args()

    bench._enable_compile_cache()
    slots_list = [int(s) for s in args.slots.split(",")]
    k_list = [int(k) for k in args.k.split(",")]
    modes = args.modes.split(",")

    rows = []
    for slots in slots_list:
        for k in k_list:
            for mode in modes:
                pipe = mode == "pipe"
                # target scales with slots so each point runs a comparable
                # number of steps (requests average ~30 frames)
                reqs = max(args.reqs * slots // 256, 200)
                streams, p50, fin, wall = bench.run_batcher_bench(
                    slots, args.dtype, reqs,
                    max_seconds=args.max_seconds,
                    frames_per_step=k,
                    collect_pcm=args.collect_pcm,
                    pipeline=pipe,
                    label=f"sweep {mode}",
                )
                row = {"slots": slots, "k": k, "mode": mode,
                       "streams": round(streams, 1),
                       "first_chunk_p50_ms": round(p50, 1),
                       "finished": fin, "wall_s": round(wall, 1)}
                rows.append(row)
                print(json.dumps(row))
                sys.stdout.flush()

    best = max(rows, key=lambda r: r["streams"])
    print("\n[sweep] slots  K  mode    streams  p50_ms", file=sys.stderr)
    for r in rows:
        star = " *" if r is best else ""
        print(f"[sweep] {r['slots']:>5} {r['k']:>2}  {r['mode']:<7}"
              f"{r['streams']:>8.1f} {r['first_chunk_p50_ms']:>7.1f}{star}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
