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


def run_torch(model_dir: str, prompt: str, frames: int, steps: int = 4,
              seed: int = 123):
    """Upstream PyTorch pocket-tts step-through driver (reference parity
    oracle; role of /root/reference/tools/flowlm_parity.py:38-100).

    Steps the upstream ``TTSModel`` flow-LM one frame at a time at temp=0
    (deterministic: each Euler solve starts from x0=0, so no RNG enters the
    latent path) and collects the same three taps our ``--flow-test`` CLI
    dumps: N latent frames, the BOS-position backbone output (``cond``), and
    one flow_net evaluation at (s=0, t=1/steps, x0=0) (``flow``).

    Returns None when torch / pocket_tts aren't importable so the caller can
    fall through to a SKIP (zero-egress CI can't install them)."""
    try:
        import torch
        from pocket_tts.models.tts_model import (  # type: ignore
            TTSModel, prepare_text_prompt)
        from pocket_tts.modules.stateful_module import init_states  # type: ignore
        from pocket_tts.utils.config import load_config  # type: ignore
    except ImportError:
        return None

    cfg_path = os.path.join(model_dir, "config.yaml")
    weights = None
    for name in sorted(os.listdir(model_dir)):
        if name.startswith("tts_") and name.endswith(".safetensors"):
            weights = os.path.join(model_dir, name)
    if weights is None or not os.path.isfile(cfg_path):
        print("SKIP: --torch needs config.yaml + tts_*.safetensors in model dir",
              file=sys.stderr)
        return None

    cfg = load_config(cfg_path)
    cfg.weights_path = weights
    cfg.weights_path_without_voice_cloning = weights
    # temp=0, no noise clamp: the deterministic regime our --flow-test uses
    model = TTSModel._from_pydantic_config_with_weights(cfg, 0.0, steps, None, 1e9)
    model.eval()
    torch.manual_seed(seed)

    text, _ = prepare_text_prompt(prompt)
    prepared = model.flow_lm.conditioner.prepare(text)
    state = init_states(model.flow_lm, batch_size=1, sequence_length=1000)
    model._run_flow_lm_and_increment_step(model_state=state,
                                          text_tokens=prepared.tokens)

    # cond/flow taps on a CLONED state so the latent walk below is unaffected
    probe = {mk: {sk: sv.clone() for sk, sv in mv.items()}
             for mk, mv in state.items()}
    ldim, dim = model.flow_lm.ldim, model.flow_lm.dim
    bos = model.flow_lm.bos_emb.reshape(1, 1, ldim).to(model.flow_lm.dtype)
    h = model.flow_lm.backbone(
        model.flow_lm.input_linear(bos),
        torch.empty((1, 0, dim), dtype=model.flow_lm.dtype), bos,
        model_state=probe,
    ).to(torch.float32)[:, -1]
    cond = h[0].detach().cpu().numpy().astype(np.float32)
    flow = model.flow_lm.flow_net(
        h, torch.zeros((1, 1), dtype=h.dtype),
        torch.full((1, 1), 1.0 / max(steps, 1), dtype=h.dtype),
        torch.zeros((1, ldim), dtype=h.dtype),
    )[0].detach().cpu().numpy().astype(np.float32)

    nan_in = torch.full((1, 1, ldim), float("nan"), dtype=model.flow_lm.dtype)
    latents, back_in = [], nan_in  # NaN input == BOS frame upstream
    with torch.no_grad():
        for _ in range(frames):
            latent, _eos = model._run_flow_lm_and_increment_step(
                model_state=state, backbone_input_latents=back_in)
            latents.append(latent[0, 0].cpu().numpy().astype(np.float32))
            back_in = latent
    return {"latents": np.concatenate(latents), "cond": cond, "flow": flow}


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
            other = run_torch(args.model_dir, args.prompt, args.frames,
                              seed=args.seed)

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
