"""Device-level profiling: the TPU counterpart of the reference's
PTTS_FLOWNET_PROFILE cudaEvent segment timing (ptts_cuda.c:86-93, 1581-1673).

Two pieces:

  * ``device_trace(label)`` -- context manager around ``jax.profiler.trace``.
    Active when PTTS_PROFILE is set (or ``force=True``); dumps an xplane/
    perfetto trace under $PTTS_PROFILE_DIR (default /tmp/ptts_profile/<label>).
    The engine wraps its pipeline stages in this.

  * ``summarize_trace(dir)`` -- parses the dumped trace.json.gz and returns
    per-op DEVICE times aggregated by HLO op, so PERF.md splits can cite real
    device measurements instead of host-side slope timing (which, through the
    axon tunnel, is the only other option -- see PERF.md "methodology").

Usage:
    PTTS_PROFILE=1 python -m ptts_tpu.cli -p "hello" ...   # dumps + prints
    python tools/profile_stages.py                          # per-stage tables
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import os
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def profile_enabled() -> bool:
    return os.environ.get("PTTS_PROFILE", "0") not in ("", "0")


def profile_dir(label: str) -> str:
    base = os.environ.get("PTTS_PROFILE_DIR", "/tmp/ptts_profile")
    return os.path.join(base, label)


@contextlib.contextmanager
def device_trace(label: str, force: bool = False):
    """Wrap a code region in a jax.profiler trace dump when profiling is on.

    Yields the dump directory (or None when disabled). The caller must fence
    with a host readback inside the region for device events to be captured.
    """
    if not (force or profile_enabled()):
        yield None
        return
    import jax

    out = profile_dir(label)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield out


def _latest_trace_json(trace_dir: str) -> Optional[str]:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    return paths[-1] if paths else None


# HLO op names look like "fusion.123", "convolution.4", "copy-start";
# aggregate by the dotted stem so repeated instances sum together.
_STEM = re.compile(r"^([a-zA-Z_\-]+[a-zA-Z_\-0-9]*?)(?:\.\d+)?$")


def _stem(name: str) -> str:
    m = _STEM.match(name)
    return m.group(1) if m else name


def summarize_trace(trace_dir: str) -> Dict[str, dict]:
    """Aggregate device-side op durations from the newest trace in trace_dir.

    Returns {op_stem: {"total_us": float, "count": int, "max_us": float}},
    covering only events on a /device: track (host events are dropped).
    """
    path = _latest_trace_json(trace_dir)
    if path is None:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in str(e.get("args", {}).get("name", "")):
                device_pids.add(e["pid"])

    agg: Dict[str, dict] = defaultdict(lambda: {"total_us": 0.0, "count": 0,
                                                "max_us": 0.0})
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = str(e.get("name", ""))
        # jit_<fn>(fingerprint) wrapper rows duplicate their children; skip
        if name.startswith("jit_") or "(" in name:
            continue
        dur = float(e.get("dur", 0.0))
        s = _stem(name)
        a = agg[s]
        a["total_us"] += dur
        a["count"] += 1
        a["max_us"] = max(a["max_us"], dur)
    return dict(agg)


def top_ops(trace_dir: str, n: int = 20) -> List[Tuple[str, dict]]:
    agg = summarize_trace(trace_dir)
    return sorted(agg.items(), key=lambda kv: -kv[1]["total_us"])[:n]


def format_summary(trace_dir: str, n: int = 20) -> str:
    rows = top_ops(trace_dir, n)
    total = sum(v["total_us"] for _, v in rows)
    lines = [f"{'op':<28}{'total ms':>10}{'count':>8}{'max us':>10}"]
    for name, v in rows:
        lines.append(
            f"{name:<28}{v['total_us'] / 1000:>10.3f}{v['count']:>8}"
            f"{v['max_us']:>10.1f}"
        )
    lines.append(f"{'TOTAL (top shown)':<28}{total / 1000:>10.3f}")
    return "\n".join(lines)
