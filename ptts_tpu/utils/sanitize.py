"""Numerical / memory sanitizer: the TPU counterpart of the reference's
compute-sanitizer target and per-layer validation mode
(/root/reference/Makefile:159-160 `cuda-sanitize`,
/root/reference/ptts_cuda.c:1095-1110 `PTTS_CUDA_VALIDATE`).

A raw-pointer memcheck has no TPU analogue: XLA-managed buffers are
bounds-safe by construction, and the only hand-indexed memory in this
framework is inside Pallas kernels. The failure classes that CAN occur, and
how this module covers each:

  * **Out-of-bounds / mis-tiled Pallas block indexing** -- caught by running
    every kernel in interpret mode (`pltpu.force_tpu_interpret_mode`), which
    evaluates block index maps against the logical array bounds instead of
    trusting Mosaic's lowering. `tools/sanitize.py` sweeps the full pipeline
    this way (the `make sanitize` target).
  * **Numerical corruption** (NaN/Inf from a bad kernel, corrupt weights, or
    an unstable reduction) -- caught by stage-boundary finite guards on the
    engine pipeline (`PTTS_SANITIZE=1`), with `jax_debug_nans` available for
    intra-stage attribution once a stage is implicated.
  * **Cross-implementation divergence** -- the existing `PTTS_VALIDATE`
    dual-path maxdiff mode (models/flowlm.py) plus the executed C-binary
    parity gate (`make parity`).

Guards are zero-cost when disabled (one env lookup, cached); when enabled
they read each stage output back to host once -- sanitize mode is a
debugging configuration, not a serving one, exactly like the reference's
`cuda-validate` build.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np


class SanitizeError(RuntimeError):
    """A stage-boundary guard found a non-finite value."""


_enabled_cache: Optional[bool] = None


def enabled() -> bool:
    """True iff PTTS_SANITIZE=1. Cached after the first read so the guard
    call sites cost one dict probe on the serving path."""
    global _enabled_cache
    if _enabled_cache is None:
        _enabled_cache = os.environ.get("PTTS_SANITIZE", "0") == "1"
    return _enabled_cache


def set_enabled(on: Optional[bool]) -> None:
    """Override (or None to re-read the env next time); used by tests and
    tools/sanitize.py."""
    global _enabled_cache
    _enabled_cache = on


def _find_nonfinite(x: np.ndarray):
    """Return (index-tuple, value) of the first non-finite element, or None."""
    if x.dtype.kind in "iub":  # integers/bools are always finite
        return None
    if x.dtype.kind != "f" or x.dtype.itemsize < 4:
        # bf16/f16 (ml_dtypes or half): widen for a ufunc-safe isfinite
        x = x.astype(np.float32)
    bad = ~np.isfinite(x)
    if not bad.any():
        return None
    idx = tuple(int(i) for i in np.argwhere(bad)[0])
    return idx, float(x[idx]) if idx else float(x)


def check_finite(stage: str, *arrays, names: Optional[Iterable[str]] = None):
    """Stage-boundary guard: raise SanitizeError if any array holds NaN/Inf.

    No-op unless sanitize mode is enabled. Arrays may be device or host;
    None entries are skipped (optional weights).
    """
    if not enabled():
        return
    labels = list(names) if names is not None else [
        str(i) for i in range(len(arrays))
    ]
    for label, a in zip(labels, arrays):
        if a is None:
            continue
        found = _find_nonfinite(np.asarray(a))
        if found is not None:
            idx, val = found
            raise SanitizeError(
                f"[sanitize] non-finite value at stage '{stage}', "
                f"array '{label}', index {idx}: {val!r}"
            )


def check_tree(stage: str, tree) -> None:
    """Guard every leaf of a weight pytree (engine construction check --
    corrupt checkpoints fail fast with the tensor's tree path)."""
    if not enabled():
        return
    import jax

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None
    )[0]
    for path, leaf in leaves_with_paths:
        if leaf is None:
            continue
        found = _find_nonfinite(np.asarray(leaf))
        if found is not None:
            idx, val = found
            raise SanitizeError(
                f"[sanitize] non-finite weight at stage '{stage}', tensor "
                f"'{jax.tree_util.keystr(path)}', index {idx}: {val!r}"
            )
