"""Packed weight upload (utils/packing.tree_to_device).

The packed path must be BIT-identical to the per-leaf jnp.asarray upload it
replaced (round 4, PERF.md "cold start decomposed"): same dtype conversion
(numpy round-to-nearest-even), concatenate+slice as identity, pass-through
for None / scalar / integer leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptts_tpu.config import FlowLMConfig
from ptts_tpu.models import flowlm
from ptts_tpu.utils.packing import tree_to_device
from helpers import TINY_FLOWLM


def _mixed_tree():
    rng = np.random.default_rng(3)
    return {
        "w": rng.standard_normal((7, 33), dtype=np.float32),
        "nested": {
            "b": rng.standard_normal(129, dtype=np.float32) * 1e-3,
            "idx": np.arange(5, dtype=np.int32),   # non-float: direct put
            "flag": True,                          # python scalar: untouched
            "none": None,
        },
        "f64": rng.standard_normal((4, 4)),        # float64 leaf
        "odd": rng.standard_normal((1, 1, 3), dtype=np.float32),
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_packed_matches_per_leaf(dtype):
    tree = _mixed_tree()
    packed = tree_to_device(tree, dtype)

    # per-leaf reference: exactly what the old path did
    def leaf_ref(x):
        return jnp.asarray(np.asarray(x), dtype)

    assert packed["nested"]["none"] is None
    assert packed["nested"]["flag"] is True
    np.testing.assert_array_equal(np.asarray(packed["nested"]["idx"]),
                                  tree["nested"]["idx"])
    for key, want in [("w", tree["w"]), ("f64", tree["f64"]),
                      ("odd", tree["odd"])]:
        got = np.asarray(packed[key])
        ref = np.asarray(leaf_ref(want))
        assert got.shape == want.shape
        assert got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)  # BIT-identical
    got_b = np.asarray(packed["nested"]["b"])
    np.testing.assert_array_equal(got_b, np.asarray(leaf_ref(tree["nested"]["b"])))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flowlm_to_device_uses_packed_path_bit_exact(dtype):
    """flowlm.to_device (the engine's cold-start path) must produce the same
    bits as a per-leaf conversion of the same host tree (after the RoPE
    row permutation to_device also applies)."""
    from ptts_tpu.ops.rope import permute_qk_rows_for_rope

    cfg = TINY_FLOWLM
    host = flowlm.random_weights(cfg, seed=0)
    dev = flowlm.to_device(host, dtype, cfg)

    host = dict(host)
    host["in_proj"] = permute_qk_rows_for_rope(
        np.asarray(host["in_proj"]), cfg.num_heads, cfg.head_dim)
    ref_leaves = [None if x is None else jnp.asarray(np.asarray(x), dtype)
                  if np.asarray(x).dtype.kind == "f" else x
                  for x in jax.tree.leaves(host, is_leaf=lambda v: v is None)]
    got_leaves = jax.tree.leaves(dev, is_leaf=lambda v: v is None)
    assert len(ref_leaves) == len(got_leaves)
    for ref, got in zip(ref_leaves, got_leaves):
        if ref is None:
            assert got is None
            continue
        ra, ga = np.asarray(ref), np.asarray(got)
        if ra.dtype.kind != "f" and ra.dtype.name != "bfloat16":
            np.testing.assert_array_equal(ga, ra)
            continue
        assert ga.dtype == ra.dtype
        np.testing.assert_array_equal(
            ga.view(np.uint16 if ga.dtype.itemsize == 2 else np.uint32),
            ra.view(np.uint16 if ra.dtype.itemsize == 2 else np.uint32))


def test_single_leaf_fast_path():
    x = np.linspace(-1, 1, 640, dtype=np.float32).reshape(8, 80)
    out = tree_to_device({"only": x}, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out["only"]).view(np.uint16),
        np.asarray(jnp.asarray(x, jnp.bfloat16)).view(np.uint16))
