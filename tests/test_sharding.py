"""Multi-device batch-parallel tests on the virtual 8-device CPU mesh.

Validates the production sharding story (SURVEY.md §2/§7): batch axis sharded
over ICI, weights replicated, no cross-stream effects, results identical to
the unsharded single-device run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import TINY_FLOWLM, TINY_MIMI, assert_close
from ptts_tpu.models import flowlm, mimi
from ptts_tpu.parallel import mesh as pmesh

CFG = TINY_FLOWLM
MCFG = TINY_MIMI


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return pmesh.make_mesh(jax.devices()[:8])


@pytest.fixture(scope="module")
def weights():
    return flowlm.random_weights(CFG, seed=9, scale=0.3)


def test_mesh_setup(mesh):
    assert mesh.size == 8
    assert mesh.axis_names == (pmesh.BATCH_AXIS,)
    assert pmesh.pad_batch_to_mesh(13, mesh) == 16


@pytest.mark.slow
def test_sharded_generation_matches_unsharded(mesh, weights):
    B = 16  # 2 streams per device
    T0, FRAMES = 4, 3
    rng = np.random.default_rng(0)
    prefix = (rng.standard_normal((B, T0, CFG.d_model)) * 0.3).astype(np.float32)
    lengths = np.full((B,), T0, np.int32)
    noise = (rng.standard_normal((B, FRAMES, CFG.latent_dim)) * 0.5).astype(np.float32)

    def run(device_put):
        w = flowlm.to_device(weights, cfg=CFG)
        cache = flowlm.make_cache(CFG, B, T0 + FRAMES)
        px, ln, nz = jnp.asarray(prefix), jnp.asarray(lengths), jnp.asarray(noise)
        if device_put:
            w = pmesh.shard_weights(mesh, w)
            cache = pmesh.shard_cache(mesh, cache)
            px = pmesh.shard_batch_array(mesh, px)
            ln = pmesh.shard_batch_array(mesh, ln)
            nz = pmesh.shard_batch_array(mesh, nz)
        cache, x0 = flowlm.prefill(w, cache, px, ln, CFG)
        res = flowlm.generate_latents(
            w, cache, x0, nz, CFG, max_frames=FRAMES, num_steps=1,
            eos_enabled=False,
        )
        return res

    base = run(device_put=False)
    sharded = run(device_put=True)

    # batch axis must actually be distributed
    assert len(sharded.latents.sharding.device_set) == 8
    assert_close(np.asarray(sharded.latents), np.asarray(base.latents),
                 atol=2e-5, rtol=2e-5)
    assert_close(np.asarray(sharded.eos_logits), np.asarray(base.eos_logits),
                 atol=2e-5, rtol=1e-3)


def test_sharded_mimi_decode(mesh):
    B, F = 8, 2
    w = mimi.to_device(mimi.random_weights(MCFG, seed=4, scale=0.3), cfg=MCFG)
    rng = np.random.default_rng(1)
    lat = (rng.standard_normal((B, F, MCFG.latent_dim)) * 0.5).astype(np.float32)

    base = np.asarray(mimi.decode(w, jnp.asarray(lat), MCFG))

    sw = pmesh.shard_weights(mesh, w)
    slat = pmesh.shard_batch_array(mesh, jnp.asarray(lat))
    out = mimi.decode(sw, slat, MCFG)
    assert len(out.sharding.device_set) == 8
    assert_close(np.asarray(out), base, atol=2e-5, rtol=2e-5)


def test_stream_independence(mesh, weights):
    """Changing one stream's input must not change any other stream's output
    (no hidden cross-batch coupling through the mesh program)."""
    B, T0, FRAMES = 8, 3, 2
    rng = np.random.default_rng(3)
    prefix = (rng.standard_normal((B, T0, CFG.d_model)) * 0.3).astype(np.float32)
    noise = (rng.standard_normal((B, FRAMES, CFG.latent_dim)) * 0.5).astype(np.float32)
    lengths = np.full((B,), T0, np.int32)

    w = pmesh.shard_weights(mesh, flowlm.to_device(weights, cfg=CFG))

    def run(px):
        cache = pmesh.shard_cache(mesh, flowlm.make_cache(CFG, B, T0 + FRAMES))
        cache, x0 = flowlm.prefill(
            w, cache, pmesh.shard_batch_array(mesh, jnp.asarray(px)),
            pmesh.shard_batch_array(mesh, jnp.asarray(lengths)), CFG
        )
        res = flowlm.generate_latents(
            w, cache, x0, pmesh.shard_batch_array(mesh, jnp.asarray(noise)),
            CFG, max_frames=FRAMES, num_steps=1, eos_enabled=False,
        )
        return np.asarray(res.latents)

    a = run(prefix)
    mutated = prefix.copy()
    mutated[5] += 1.0
    b = run(mutated)
    for s in range(B):
        if s == 5:
            assert np.abs(a[s] - b[s]).max() > 1e-6
        else:
            assert_close(a[s], b[s], atol=0, rtol=0, msg=f"stream {s} leaked")


def test_multihost_hybrid_mesh_matches_unsharded(weights):
    """2-D (dcn, batch) hybrid mesh (multi-host serving story): batch
    sharded over BOTH axes, weights replicated, outputs identical to the
    single-device run. Simulates 2 hosts x 4 devices on the CPU mesh."""
    hmesh = pmesh.make_multihost_mesh(num_hosts=2, devices=jax.devices()[:8])
    assert hmesh.axis_names == (pmesh.DCN_AXIS, pmesh.BATCH_AXIS)
    assert hmesh.shape[pmesh.DCN_AXIS] == 2
    B, T0, FRAMES = 16, 4, 3
    rng = np.random.default_rng(7)
    prefix = (rng.standard_normal((B, T0, CFG.d_model)) * 0.3).astype(np.float32)
    lengths = np.full((B,), T0, np.int32)
    noise = (rng.standard_normal((B, FRAMES, CFG.latent_dim)) * 0.5).astype(np.float32)

    def run(shard):
        w = flowlm.to_device(weights, cfg=CFG)
        cache = flowlm.make_cache(CFG, B, T0 + FRAMES)
        px, ln, nz = jnp.asarray(prefix), jnp.asarray(lengths), jnp.asarray(noise)
        if shard:
            w = pmesh.shard_weights(hmesh, w)
            cache = pmesh.shard_cache(hmesh, cache)
            px = pmesh.shard_batch_array(hmesh, px)
            ln = pmesh.shard_batch_array(hmesh, ln)
            nz = pmesh.shard_batch_array(hmesh, nz)
        cache, x0 = flowlm.prefill(w, cache, px, ln, CFG)
        res = flowlm.generate_latents(
            w, cache, x0, nz, CFG, max_frames=FRAMES, num_steps=1,
            eos_enabled=False,
        )
        return np.asarray(res.latents)

    want = run(shard=False)
    got = run(shard=True)
    assert_close(got, want, atol=2e-5, rtol=2e-5)
