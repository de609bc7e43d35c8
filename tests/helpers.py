"""Shared tiny configs + weight fixtures for hermetic tests."""

from __future__ import annotations

import numpy as np

from ptts_tpu.config import FlowLMConfig, MimiConfig

TINY_FLOWLM = FlowLMConfig(
    vocab=11,
    text_dim=16,
    d_model=16,
    num_heads=2,
    head_dim=8,
    num_layers=2,
    hidden=32,
    latent_dim=8,
    flow_dim=16,
    flow_depth=2,
    time_freqs=4,
)

TINY_MIMI = MimiConfig(
    latent_dim=8,
    d_model=8,
    num_heads=2,
    head_dim=4,
    num_layers=1,
    hidden=16,
    context=5,
    upsample_kernel=4,
    upsample_stride=2,
    n_filters=4,
    ratios=(3, 2),
    kernel_size=5,
    last_kernel_size=3,
    residual_kernel=3,
    compress=2,
)


def assert_close(a, b, atol=1e-5, rtol=1e-5, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=msg)


def checkpoint_tensors(fw: dict, mw: dict, flowlm_cfg=None, mimi_cfg=None,
                       include_encoder: bool = True) -> dict:
    """Flatten random weight pytrees into reference-named tensors
    (inverse of the model loaders), for synthetic .safetensors checkpoints."""
    flowlm_cfg = flowlm_cfg or TINY_FLOWLM
    mimi_cfg = mimi_cfg or TINY_MIMI
    t = {}

    # ---- FlowLM (names per ptts_flowlm_load) ----
    t["conditioner.embed.weight"] = fw["embed"]
    t["speaker_proj_weight"] = fw["speaker_proj"]
    t["emb_std"] = fw["emb_std"]
    t["emb_mean"] = fw["emb_mean"]
    t["bos_emb"] = fw["bos_emb"]
    t["input_linear.weight"] = fw["input_linear"]
    t["out_norm.weight"] = fw["out_norm_w"]
    t["out_norm.bias"] = fw["out_norm_b"]
    t["out_eos.weight"] = fw["out_eos_w"].reshape(1, -1)
    t["out_eos.bias"] = np.array([fw["out_eos_b"]], np.float32)
    for i in range(flowlm_cfg.num_layers):
        base = f"transformer.layers.{i}"
        t[f"{base}.self_attn.in_proj.weight"] = fw["in_proj"][i]
        t[f"{base}.self_attn.out_proj.weight"] = fw["out_proj"][i]
        t[f"{base}.norm1.weight"] = fw["norm1_w"][i]
        t[f"{base}.norm1.bias"] = fw["norm1_b"][i]
        t[f"{base}.norm2.weight"] = fw["norm2_w"][i]
        t[f"{base}.norm2.bias"] = fw["norm2_b"][i]
        t[f"{base}.linear1.weight"] = fw["linear1"][i]
        t[f"{base}.linear2.weight"] = fw["linear2"][i]
    fl = fw["flow"]
    t["flow_net.cond_embed.weight"] = fl["cond_w"]
    t["flow_net.cond_embed.bias"] = fl["cond_b"]
    t["flow_net.input_proj.weight"] = fl["input_w"]
    t["flow_net.input_proj.bias"] = fl["input_b"]
    for k in range(2):
        t[f"flow_net.time_embed.{k}.mlp.0.weight"] = fl["time"]["lin0_w"][k]
        t[f"flow_net.time_embed.{k}.mlp.0.bias"] = fl["time"]["lin0_b"][k]
        t[f"flow_net.time_embed.{k}.mlp.2.weight"] = fl["time"]["lin2_w"][k]
        t[f"flow_net.time_embed.{k}.mlp.2.bias"] = fl["time"]["lin2_b"][k]
        t[f"flow_net.time_embed.{k}.mlp.3.alpha"] = fl["time"]["rms_alpha"][k]
        t[f"flow_net.time_embed.{k}.freqs"] = fl["time"]["freqs"][k]
    for i in range(flowlm_cfg.flow_depth):
        base = f"flow_net.res_blocks.{i}"
        t[f"{base}.in_ln.weight"] = fl["res"]["in_ln_w"][i]
        t[f"{base}.in_ln.bias"] = fl["res"]["in_ln_b"][i]
        t[f"{base}.mlp.0.weight"] = fl["res"]["mlp0_w"][i]
        t[f"{base}.mlp.0.bias"] = fl["res"]["mlp0_b"][i]
        t[f"{base}.mlp.2.weight"] = fl["res"]["mlp2_w"][i]
        t[f"{base}.mlp.2.bias"] = fl["res"]["mlp2_b"][i]
        t[f"{base}.adaLN_modulation.1.weight"] = fl["res"]["ada_w"][i]
        t[f"{base}.adaLN_modulation.1.bias"] = fl["res"]["ada_b"][i]
    t["flow_net.final_layer.linear.weight"] = fl["final_linear_w"]
    t["flow_net.final_layer.linear.bias"] = fl["final_linear_b"]
    t["flow_net.final_layer.adaLN_modulation.1.weight"] = fl["final_ada_w"]
    t["flow_net.final_layer.adaLN_modulation.1.bias"] = fl["final_ada_b"]

    # ---- Mimi (names per ptts_mimi_load) ----
    mt = mw["_torch"]
    t["quantizer.output_proj.weight"] = mt["quant_w"][:, :, None]
    # real checkpoints double the module name (loader falls back to it,
    # ptts_mimi.c:385-388; --verify expects it, ptts.c:916-917)
    t["upsample.convtr.convtr.weight"] = mt["upsample_w"]
    t["decoder.model.0.conv.weight"] = mt["dec_in_w"]
    t["decoder.model.0.conv.bias"] = mt["dec_in_b"]
    idx = 2
    for st in mt["stages"]:
        t[f"decoder.model.{idx}.convtr.weight"] = st["up_w"]
        t[f"decoder.model.{idx}.convtr.bias"] = st["up_b"]
        t[f"decoder.model.{idx+1}.block.1.conv.weight"] = st["res1_w"]
        t[f"decoder.model.{idx+1}.block.1.conv.bias"] = st["res1_b"]
        t[f"decoder.model.{idx+1}.block.3.conv.weight"] = st["res2_w"]
        t[f"decoder.model.{idx+1}.block.3.conv.bias"] = st["res2_b"]
        idx += 3
    t[f"decoder.model.{idx}.conv.weight"] = mt["dec_out_w"]
    t[f"decoder.model.{idx}.conv.bias"] = mt["dec_out_b"]
    tr = mt["transformer"]
    for i in range(mimi_cfg.num_layers):
        base = f"decoder_transformer.transformer.layers.{i}"
        t[f"{base}.self_attn.in_proj.weight"] = tr["in_proj"][i]
        t[f"{base}.self_attn.out_proj.weight"] = tr["out_proj"][i]
        t[f"{base}.norm1.weight"] = tr["norm1_w"][i]
        t[f"{base}.norm1.bias"] = tr["norm1_b"][i]
        t[f"{base}.norm2.weight"] = tr["norm2_w"][i]
        t[f"{base}.norm2.bias"] = tr["norm2_b"][i]
        t[f"{base}.linear1.weight"] = tr["linear1"][i]
        t[f"{base}.linear2.weight"] = tr["linear2"][i]
        t[f"{base}.layer_scale_1.scale"] = tr["ls1"][i]
        t[f"{base}.layer_scale_2.scale"] = tr["ls2"][i]

    if include_encoder:
        t.update(_encoder_tensors(mimi_cfg))
    return t


def _encoder_tensors(cfg) -> dict:
    """Zero-filled Mimi encoder tensors (present in real checkpoints,
    unused by decode; the --verify schema checks them, ptts.c:919-944)."""
    t = {}
    z = lambda *s: np.zeros(s, np.float32)
    dim, nf = cfg.d_model, cfg.n_filters
    t["downsample.conv.conv.weight"] = z(dim, dim, cfg.upsample_kernel)
    t["encoder.model.0.conv.weight"] = z(nf, 1, cfg.kernel_size)
    t["encoder.model.0.conv.bias"] = z(nf)
    idx = 1
    mult = 1
    for ratio in reversed(cfg.ratios):
        hidden = mult * nf // cfg.compress
        t[f"encoder.model.{idx}.block.1.conv.weight"] = z(hidden, mult * nf, cfg.residual_kernel)
        t[f"encoder.model.{idx}.block.1.conv.bias"] = z(hidden)
        t[f"encoder.model.{idx}.block.3.conv.weight"] = z(mult * nf, hidden, 1)
        t[f"encoder.model.{idx}.block.3.conv.bias"] = z(mult * nf)
        idx += 2
        t[f"encoder.model.{idx}.conv.weight"] = z(mult * nf * 2, mult * nf, ratio * 2)
        t[f"encoder.model.{idx}.conv.bias"] = z(mult * nf * 2)
        idx += 1
        mult *= 2
    idx += 1
    t[f"encoder.model.{idx}.conv.weight"] = z(dim, mult * nf, cfg.last_kernel_size)
    t[f"encoder.model.{idx}.conv.bias"] = z(dim)
    L, h = cfg.num_layers, cfg.hidden
    for i in range(L):
        base = f"encoder_transformer.transformer.layers.{i}"
        t[f"{base}.self_attn.in_proj.weight"] = z(3 * dim, dim)
        t[f"{base}.self_attn.out_proj.weight"] = z(dim, dim)
        t[f"{base}.norm1.weight"] = z(dim)
        t[f"{base}.norm1.bias"] = z(dim)
        t[f"{base}.norm2.weight"] = z(dim)
        t[f"{base}.norm2.bias"] = z(dim)
        t[f"{base}.linear1.weight"] = z(h, dim)
        t[f"{base}.linear2.weight"] = z(dim, h)
        t[f"{base}.layer_scale_1.scale"] = z(dim)
        t[f"{base}.layer_scale_2.scale"] = z(dim)
    return t


# Mimi-owned tensor-name heads: everything else in a checkpoint belongs to
# FlowLM. Mirrors the reference's two resolvers (find_tensor_flowlm tries
# the 'flow_lm.' prefix, find_tensor_mimi tries 'mimi.'/'model.';
# ptts_flowlm.c:107-122, ptts_mimi.c:77-95).
MIMI_NAME_HEADS = ("quantizer.", "upsample.", "decoder.", "decoder_transformer.",
                   "downsample.", "encoder.", "encoder_transformer.")


def prefix_tensor_names(tensors: dict) -> dict:
    """Rename to the real checkpoint's prefixed form: 'flow_lm.<name>' /
    'mimi.<name>' (the exact-name form never appears in shipped
    checkpoints; both implementations must hit their prefix fallbacks)."""
    return {
        (("mimi." if n.startswith(MIMI_NAME_HEADS) else "flow_lm.") + n): v
        for n, v in tensors.items()
    }


def write_model_dir(path, fw=None, mw=None, flowlm_cfg=None, mimi_cfg=None,
                    voice_frames: int = 3, seed: int = 0,
                    prefixed: bool = False, bf16: bool = False):
    """Create a synthetic model dir: weights + tokenizer.model + voice files.

    ``prefixed`` stores tensors under the real checkpoint's
    'flow_lm.'/'mimi.' names; ``bf16`` stores every tensor as BF16
    (ptts_safetensors.c:325-330) -- the two format axes real checkpoints
    exercise that exact-name F32 fixtures do not.

    Returns (model_dir, fw, mw).
    """
    import os

    from ptts_tpu.io.safetensors import save_safetensors
    from ptts_tpu.models import flowlm as flowlm_mod
    from ptts_tpu.models import mimi as mimi_mod

    flowlm_cfg = flowlm_cfg or TINY_FLOWLM
    mimi_cfg = mimi_cfg or TINY_MIMI
    if fw is None:
        fw = flowlm_mod.random_weights(flowlm_cfg, seed=seed, scale=0.3)
    if mw is None:
        mw = mimi_mod.random_weights(mimi_cfg, seed=seed + 1, scale=0.3)

    path = str(path)
    os.makedirs(path, exist_ok=True)
    tensors = checkpoint_tensors(fw, mw, flowlm_cfg, mimi_cfg)
    if prefixed:
        tensors = prefix_tensor_names(tensors)
    save_safetensors(os.path.join(path, "tts_b6369a24.safetensors"), tensors,
                     bf16=tuple(tensors) if bf16 else ())

    # tokenizer: enough pieces to tokenize simple ASCII prompts
    from test_spm import BASIC_PIECES, make_model

    extra = [(chr(c), -25.0, 1) for c in range(ord("a"), ord("z") + 1)]
    extra += [(chr(c), -25.0, 1) for c in range(ord("A"), ord("Z") + 1)]
    extra += [(".", -3.0, 1), ("!", -3.0, 1), (",", -3.0, 1), ("▁", -6.0, 1)]
    with open(os.path.join(path, "tokenizer.model"), "wb") as f:
        f.write(make_model(BASIC_PIECES + extra))

    # voice embedding
    rng = np.random.default_rng(seed + 2)
    cond = (rng.standard_normal((1, voice_frames, flowlm_cfg.d_model)) * 0.3).astype(np.float32)
    os.makedirs(os.path.join(path, "embeddings"), exist_ok=True)
    save_safetensors(os.path.join(path, "embeddings", "alba.safetensors"),
                     {"audio_prompt": cond})
    return path, fw, mw
