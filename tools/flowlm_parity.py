#!/usr/bin/env python3
"""Cross-implementation parity harness.

Port of /root/reference/tools/flowlm_parity.py with the same report format
(max/mean/RMS abs diff of N latent frames, the first 1024-d condition vector,
and the first 32-d flow vector at temp=0). Three comparison modes:

  1. --c-binary PATH:   run the reference C binary's --flow-test dump taps and
                        compare against this engine's dumps (ground truth).
  2. --torch:           run the upstream PyTorch pocket_tts package (if
                        installed) step-by-step and compare.
  3. --other-dumps DIR: compare against pre-generated raw-f32 dumps
                        (latents.f32 / cond.f32 / flow.f32) from any source.

Exits 77 (skip) when neither a model checkpoint nor a comparison source is
available (zero-egress CI).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROMPT_DEFAULT = "Hello world!"


def report(name: str, a: np.ndarray, b: np.ndarray) -> float:
    n = min(a.size, b.size)
    d = np.abs(a.flat[:n] - b.flat[:n])
    print(f"{name}: max={d.max():.6e} mean={d.mean():.6e} "
          f"rms={np.sqrt((d**2).mean()):.6e} (n={n})")
    return float(d.max())


def run_ours(model_dir: str, prompt: str, frames: int, seed: int, outdir: str):
    from ptts_tpu import cli

    paths = {k: os.path.join(outdir, f"ours_{k}.f32")
             for k in ("latents", "cond", "flow")}
    rc = cli.main([
        "-d", model_dir, "-p", prompt, "--flow-test",
        "--frames", str(frames), "-S", str(seed), "-t", "0",
        "--latent-out", paths["latents"],
        "--cond-out", paths["cond"],
        "--flow-out", paths["flow"],
        "-q",
    ])
    if rc != 0:
        raise RuntimeError("engine --flow-test failed")
    return {k: np.fromfile(v, dtype="<f4") for k, v in paths.items()}


def run_c_binary(binary: str, model_dir: str, prompt: str, frames: int,
                 seed: int, outdir: str):
    paths = {k: os.path.join(outdir, f"c_{k}.f32")
             for k in ("latents", "cond", "flow")}
    subprocess.run(
        [binary, "-d", model_dir, "-p", prompt, "--flow-test",
         "--frames", str(frames), "-S", str(seed), "-t", "0",
         "--latent-out", paths["latents"],
         "--cond-out", paths["cond"],
         "--flow-out", paths["flow"], "-q"],
        check=True,
    )
    return {k: np.fromfile(v, dtype="<f4") for k, v in paths.items()}


def run_torch(model_dir: str, prompt: str, frames: int):
    """Upstream PyTorch pocket-tts, if installed (reference parity oracle)."""
    try:
        import torch  # noqa: F401
        from pocket_tts import TTSModel  # type: ignore
    except ImportError:
        return None
    raise NotImplementedError(
        "pocket_tts package found but the step-through driver is not wired; "
        "use --c-binary or --other-dumps"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=os.environ.get("PTTS_MODEL_DIR", ""))
    ap.add_argument("--prompt", default=PROMPT_DEFAULT)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--c-binary", default="", help="path to the reference ptts binary")
    ap.add_argument("--other-dumps", default="",
                    help="dir with latents.f32/cond.f32/flow.f32 to compare against")
    ap.add_argument("--torch", action="store_true")
    ap.add_argument("--tolerance", type=float, default=1e-3)
    args = ap.parse_args()

    if not args.model_dir or not os.path.isdir(args.model_dir):
        print("SKIP: model dir not available", file=sys.stderr)
        return 77

    with tempfile.TemporaryDirectory() as tmp:
        ours = run_ours(args.model_dir, args.prompt, args.frames, args.seed, tmp)

        other = None
        if args.c_binary:
            other = run_c_binary(args.c_binary, args.model_dir, args.prompt,
                                 args.frames, args.seed, tmp)
        elif args.other_dumps:
            other = {
                k: np.fromfile(os.path.join(args.other_dumps, f"{k}.f32"),
                               dtype="<f4")
                for k in ("latents", "cond", "flow")
            }
        elif args.torch:
            other = run_torch(args.model_dir, args.prompt, args.frames)

        if other is None:
            print("SKIP: no comparison source (use --c-binary / --other-dumps)",
                  file=sys.stderr)
            return 77

        worst = 0.0
        worst = max(worst, report("latents", ours["latents"], other["latents"]))
        worst = max(worst, report("cond", ours["cond"], other["cond"]))
        worst = max(worst, report("flow", ours["flow"], other["flow"]))

    if worst <= args.tolerance:
        print(f"PARITY OK (max abs diff {worst:.2e} <= {args.tolerance:.0e})")
        return 0
    print(f"PARITY FAILED (max abs diff {worst:.2e})", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
