#!/usr/bin/env python3
"""Sanitizer sweep: the TPU analogue of the reference's `cuda-sanitize`
target (/root/reference/Makefile:159-160 -- compute-sanitizer memcheck over
a full generate).

Four phases, end-to-end on a tiny synthetic checkpoint (hermetic, CPU):

  1. **Interpret-mode Pallas sweep** -- runs the fused attention kernels
     (FlowLM prefill + Mimi window) under pltpu.force_tpu_interpret_mode,
     which evaluates every block index map against logical array bounds:
     the out-of-bounds-access check Mosaic-compiled kernels can't give.
  2. **jax_debug_nans generate** -- full pipeline with XLA's per-primitive
     NaN trap armed (intra-stage attribution).
  3. **Stage-boundary finite guards** (PTTS_SANITIZE=1) over a clean
     generate: must stay silent.
  4. **Detection self-test** -- corrupts one weight with NaN and asserts
     the guard FIRES with the tensor's name (a sanitizer that can't detect
     a planted defect proves nothing).

Exit 0 = all phases pass. Run via `make sanitize`.
"""

from __future__ import annotations

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from helpers import TINY_FLOWLM, TINY_MIMI, write_model_dir
    from ptts_tpu import api
    from ptts_tpu.runtime.engine import TTSEngine
    from ptts_tpu.utils import sanitize

    failures = []

    def phase(name: str, ok: bool, detail: str = ""):
        print(f"[sanitize] {'PASS' if ok else 'FAIL'}: {name}"
              + (f" -- {detail}" if detail else ""))
        if not ok:
            failures.append(name)

    with tempfile.TemporaryDirectory() as d:
        path, _, _ = write_model_dir(os.path.join(d, "model"), seed=3)
        ctx = api.Context(path, flowlm_cfg=TINY_FLOWLM, mimi_cfg=TINY_MIMI)

        # -- 1. interpret-mode Pallas sweep (OOB block-index check) ----------
        try:
            from jax.experimental.pallas import tpu as pltpu

            from ptts_tpu.ops.pallas import fused_attention as fa

            rng = np.random.default_rng(0)
            B, T, H, D = 2, 16, TINY_FLOWLM.num_heads, TINY_FLOWLM.head_dim
            qkv = jnp.asarray(
                rng.standard_normal((B, T, 3 * H * D)), jnp.float32
            )
            lengths = jnp.asarray([T, T - 5], jnp.int32)
            with pltpu.force_tpu_interpret_mode():
                out, _ = fa.causal_attention_qkv(
                    qkv, lengths, num_heads=H, head_dim=D,
                    max_period=TINY_FLOWLM.max_period, interpret=True,
                )
                jax.block_until_ready(out)
                Hm, Dm = TINY_MIMI.num_heads, TINY_MIMI.head_dim
                qkv_m = jnp.asarray(
                    rng.standard_normal((B, T, 3 * Hm * Dm)), jnp.float32
                )
                wout = fa.window_attention_qkv(
                    qkv_m, num_heads=Hm, head_dim=Dm,
                    context=TINY_MIMI.context,
                    max_period=TINY_MIMI.max_period, interpret=True,
                )
                jax.block_until_ready(wout)
            phase("interpret-mode Pallas sweep (OOB index-map check)", True)
        except Exception as e:  # noqa: BLE001 -- report, don't crash the sweep
            phase("interpret-mode Pallas sweep (OOB index-map check)", False,
                  f"{type(e).__name__}: {e}")

        # -- 2. jax_debug_nans full generate ---------------------------------
        try:
            jax.config.update("jax_debug_nans", True)
            try:
                eng = TTSEngine(ctx)
                eng.generate("Hello world", params=api.Params(
                    num_frames=4, seed=7, num_steps=1))
            finally:
                jax.config.update("jax_debug_nans", False)
            phase("jax_debug_nans generate", True)
        except Exception as e:  # noqa: BLE001
            phase("jax_debug_nans generate", False,
                  f"{type(e).__name__}: {e}")

        # -- 3. stage guards on a clean generate must stay silent ------------
        try:
            sanitize.set_enabled(True)
            try:
                eng = TTSEngine(ctx)
                eng.generate("Quiet please", params=api.Params(
                    num_frames=4, seed=9, num_steps=1))
            finally:
                sanitize.set_enabled(None)
            phase("stage-boundary guards, clean generate", True)
        except Exception as e:  # noqa: BLE001
            sanitize.set_enabled(None)
            phase("stage-boundary guards, clean generate", False,
                  f"{type(e).__name__}: {e}")

        # -- 4. detection self-test: planted NaN must be caught --------------
        try:
            sanitize.set_enabled(True)
            try:
                bad = api.Context(path, flowlm_cfg=TINY_FLOWLM,
                                  mimi_cfg=TINY_MIMI)
                from ptts_tpu.models import flowlm as flowlm_mod

                orig = flowlm_mod.load_weights

                def poisoned(st, cfg):
                    w = orig(st, cfg)
                    w = dict(w)
                    w["out_norm_w"] = np.array(w["out_norm_w"], np.float32)
                    w["out_norm_w"][0] = np.nan
                    return w

                flowlm_mod.load_weights = poisoned
                try:
                    TTSEngine(bad)
                    caught = False
                    detail = "engine constructed despite NaN weight"
                except sanitize.SanitizeError as e:
                    caught = "out_norm_w" in str(e)
                    detail = str(e)
                finally:
                    flowlm_mod.load_weights = orig
            finally:
                sanitize.set_enabled(None)
            phase("detection self-test (planted NaN weight)", caught, detail)
        except Exception as e:  # noqa: BLE001
            sanitize.set_enabled(None)
            phase("detection self-test (planted NaN weight)", False,
                  f"{type(e).__name__}: {e}")

    print(f"[sanitize] {'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
