"""Parity RNG tests: cross-check the Python xorshift64*/Box-Muller against a
freshly compiled C implementation of the same algorithm (float32 semantics)."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from ptts_tpu.rng import Xorshift64Star, frame_noise

C_SRC = r"""
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <math.h>

static uint32_t rng_next_u32(uint64_t *state) {
    uint64_t x = *state;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    *state = x;
    return (uint32_t)((x * 2685821657736338717ULL) >> 32);
}
static float rng_next_f01(uint64_t *state) {
    uint32_t u = rng_next_u32(state);
    return (u + 1.0f) / 4294967296.0f;
}
int main(int argc, char **argv) {
    int64_t seed = atoll(argv[1]);
    int frames = atoi(argv[2]);
    int dim = atoi(argv[3]);
    float temp = (float)atof(argv[4]);
    uint64_t rng = (uint64_t)seed;
    float std = temp > 0.0f ? sqrtf(temp) : 0.0f;
    for (int f = 0; f < frames; f++) {
        for (int d = 0; d < dim; d += 2) {
            float z0 = 0.0f, z1 = 0.0f;
            if (std > 0.0f) {
                float u1 = rng_next_f01(&rng);
                float u2 = rng_next_f01(&rng);
                float r = sqrtf(-2.0f * logf(u1));
                float theta = 2.0f * (float)3.14159265358979323846 * u2;
                z0 = r * cosf(theta) * std;
                z1 = r * sinf(theta) * std;
            }
            fwrite(&z0, 4, 1, stdout);
            if (d + 1 < dim) fwrite(&z1, 4, 1, stdout);
        }
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def c_noise_bin(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler available")
    d = tmp_path_factory.mktemp("crng")
    src = d / "rng.c"
    src.write_text(C_SRC)
    binpath = d / "rng"
    subprocess.run([cc, "-O2", "-o", str(binpath), str(src), "-lm"], check=True)
    return str(binpath)


@pytest.mark.parametrize("seed", [123, 1, -1234567, 2**62 + 17])
def test_xorshift_matches_c(c_noise_bin, seed):
    out = subprocess.run(
        [c_noise_bin, str(seed), "5", "32", "0.7"], capture_output=True, check=True
    ).stdout
    expected = np.frombuffer(out, dtype=np.float32).reshape(5, 32)
    got = frame_noise(seed, 5, 32, temp=0.7)
    # float32 transcendentals may differ by an ulp between libm and numpy
    np.testing.assert_allclose(got, expected, atol=2e-6, rtol=1e-5)


def test_temp_zero_no_draws():
    noise = frame_noise(123, 4, 32, temp=0.0)
    assert (noise == 0).all()


def test_clamp():
    noise = frame_noise(99, 20, 32, temp=4.0, noise_clamp=0.5)
    assert np.abs(noise).max() <= 0.5


def test_state_threads_across_frames():
    # noise for 2 frames must equal first 2 frames of a 4-frame run
    a = frame_noise(7, 4, 8, temp=1.0)
    b = frame_noise(7, 2, 8, temp=1.0)
    np.testing.assert_array_equal(a[:2], b)


def test_known_sequence_stability():
    """Pin the first few u32 draws so accidental changes are caught."""
    r = Xorshift64Star(123)
    seq = [int(r.next_u32()) for _ in range(4)]
    # reference algorithm computed independently with python ints
    state = 123

    def step(x):
        x ^= x >> 12
        x = (x ^ (x << 25)) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        return x

    expected = []
    for _ in range(4):
        state = step(state)
        expected.append(((state * 2685821657736338717) & 0xFFFFFFFFFFFFFFFF) >> 32)
    assert seq == expected


def test_native_frame_noise_matches_python():
    """C++ ptts_frame_noise == the Python xorshift/Box-Muller path.

    glibc vs numpy libm can differ by ~1 ulp in log/cos/sin, so the gate is
    tiny-but-nonzero; draw order and clamping must agree exactly.
    """
    import pytest

    from ptts_tpu import native
    from ptts_tpu.rng import Xorshift64Star, gaussian_pairs

    if not native.available():
        pytest.skip("native library unavailable")

    import numpy as np

    for seed, frames, dim, temp, clamp in [
        (123, 7, 32, 0.7, 0.0),
        (-5, 4, 32, 1.0, 1.5),
        (999, 3, 8, 0.25, 0.0),
        (1, 2, 32, 0.0, 0.0),   # temp<=0: zeros, RNG untouched
    ]:
        nat = native.frame_noise(seed, frames, dim, temp, clamp)
        assert nat is not None and nat.shape == (frames, dim)
        # python reference path (bypass the dispatcher)
        py = np.zeros((frames, dim), np.float32)
        if temp > 0:
            std = np.float32(np.sqrt(np.float32(temp)))
            r = Xorshift64Star(seed)
            for f in range(frames):
                z = gaussian_pairs(r, (dim + 1) // 2, std)[:dim]
                if clamp > 0:
                    z = np.clip(z, -np.float32(clamp), np.float32(clamp))
                py[f] = z
        np.testing.assert_allclose(nat, py, atol=2e-6, rtol=2e-6)
