#!/usr/bin/env python3
"""Generate a FULL-SIZE synthetic Pocket-TTS model directory.

Produces everything the reference C binary (/root/reference) needs to run its
--verify / --tokens / --flow-test / --mimi-wave paths without the real
(zero-egress) checkpoint:

  * tts_b6369a24.safetensors -- every tensor of the real checkpoint schema
    (ptts.c:586-983 / ptts_tpu/verify.py) at full size, seeded random values
  * tokenizer.model          -- synthetic SentencePiece ModelProto (unigram
    pieces for ASCII prose, same proto layout ptts_spm.c parses)
  * embeddings/alba.safetensors -- synthetic voice conditioning [1, N, 1024]

This is the foundation of the executed cross-implementation parity gate
(tools/ref_parity.py): the reference binary and this framework load the SAME
bytes and must produce the SAME latents/cond/flow/WAV.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scale", type=float, default=0.05,
                    help="stddev of random weights")
    ap.add_argument("--voice-frames", type=int, default=5)
    args = ap.parse_args()

    from helpers import write_model_dir
    from ptts_tpu.config import FlowLMConfig, MimiConfig
    from ptts_tpu.models import flowlm, mimi

    fcfg, mcfg = FlowLMConfig(), MimiConfig()
    fw = flowlm.random_weights(fcfg, seed=args.seed, scale=args.scale)
    mw = mimi.random_weights(mcfg, seed=args.seed + 1, scale=args.scale)
    path, _, _ = write_model_dir(
        args.out_dir, fw=fw, mw=mw, flowlm_cfg=fcfg, mimi_cfg=mcfg,
        voice_frames=args.voice_frames, seed=args.seed,
    )
    size = os.path.getsize(os.path.join(path, "tts_b6369a24.safetensors"))
    # stderr: callers (bench.py, bench_http.py) reserve stdout for their
    # single JSON result line and run this as a subprocess with inherited
    # stdout -- a stray line here would corrupt the driver's BENCH parse
    print(f"wrote synthetic full-size model dir: {path} "
          f"({size / 1e6:.1f} MB checkpoint)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
