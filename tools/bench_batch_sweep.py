"""Offline batch-size sweep: does the headline scale past B=256?

PERF.md's bucketing rejection measured the AR per-frame cost as nearly
batch-independent (B=64 costs 0.69x of B=256, not 0.25x) -- the loop is
weight/cache-streaming-bound, not FLOP-bound. If that holds above 256,
raising B is the single biggest lever on BOTH the lockstep headline and the
ragged-EOS number (throughput ~ active streams / per-frame cost). No sweep
above 256 exists on record; this runs one.

Usage: python tools/bench_batch_sweep.py [B ...]   (default 256 384 512)
Prints one JSON line per batch size plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 384, 512]
    frames = int(os.environ.get("PTTS_BENCH_FRAMES", "50"))
    repeats = int(os.environ.get("PTTS_BENCH_REPEATS", "2"))
    bench._enable_compile_cache()
    rows = []
    for b in sizes:
        r = bench.run_bench(b, frames, "bf16", repeats,
                            modes=("on", "ragged"))
        row = {"batch": b,
               "streams_on": r["value"],
               "ragged": r["detail"]["ragged_eos_streams"],
               "wall_s": r["detail"]["wall_s"],
               "compile_s": r["detail"]["compile_s"]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["streams_on"])
    print(json.dumps({"sweep": rows, "best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
