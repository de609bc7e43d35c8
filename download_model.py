#!/usr/bin/env python3
"""Download the Pocket-TTS checkpoint, tokenizer, and voice embeddings.

Port of /root/reference/download_model.py: fetches the pinned weights
(tts_b6369a24.safetensors) from kyutai/pocket-tts plus tokenizer.model and
voice embeddings from the without-voice-cloning repo via huggingface_hub.

Usage:
    python download_model.py [--dir pocket-tts-model] [--voice alba ...]
"""

from __future__ import annotations

import argparse
import os
import sys

WEIGHTS_REPO = "kyutai/pocket-tts"
WEIGHTS_FILE = "tts_b6369a24.safetensors"
VOICES_REPO = "kyutai/tts-voices"  # embeddings/<voice>.safetensors
TOKENIZER_FILE = "tokenizer.model"
DEFAULT_VOICES = ("alba",)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="pocket-tts-model")
    ap.add_argument("--voice", action="append", default=[],
                    help="voice embedding name (repeatable; default: alba)")
    ap.add_argument("--revision", default=None,
                    help="pin a weights repo revision")
    args = ap.parse_args()

    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("error: huggingface_hub is not installed "
              "(pip install huggingface_hub)", file=sys.stderr)
        return 1

    os.makedirs(args.dir, exist_ok=True)
    voices = args.voice or list(DEFAULT_VOICES)

    def fetch(repo: str, filename: str, dest_rel: str) -> bool:
        dest = os.path.join(args.dir, dest_rel)
        if os.path.isfile(dest):
            print(f"have {dest}")
            return True
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        try:
            path = hf_hub_download(repo_id=repo, filename=filename,
                                   revision=args.revision)
        except Exception as e:  # gated-repo guidance like the reference
            print(f"error downloading {repo}/{filename}: {e}", file=sys.stderr)
            if "gated" in str(e).lower() or "401" in str(e):
                print(
                    "This repo may be gated. Visit "
                    f"https://huggingface.co/{repo} to accept the terms, then\n"
                    "  huggingface-cli login",
                    file=sys.stderr,
                )
            return False
        import shutil

        shutil.copy(path, dest)
        print(f"downloaded {dest}")
        return True

    ok = fetch(WEIGHTS_REPO, WEIGHTS_FILE, WEIGHTS_FILE)
    ok &= fetch(WEIGHTS_REPO, TOKENIZER_FILE, TOKENIZER_FILE)
    for v in voices:
        ok &= fetch(VOICES_REPO, f"embeddings/{v}.safetensors",
                    os.path.join("embeddings", f"{v}.safetensors"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
