"""Fully-fused SEANet decoder stack as ONE Pallas kernel.

STATUS: correct (oracle-exact in interpret mode, bf16-rounding-equal on real
v5e) but ~2x SLOWER than the tuned XLA path at serving shapes (slope-fenced
~75-90 ms vs ~40-46 ms for XLA with bf16 conv outputs at B=256, T=800), so
it ships OFF by default (PTTS_PALLAS_CONV=1 opts in; resolve_conv_impl).
Bisect findings (PERF.md "fused SEANet experiment"): the MXU dots themselves
hit ~230 TFLOPS, but Mosaic structural overheads dominate -- narrow-lane
(<128) blocks trigger a masked-store slow path (~21 ms/call for a 120-lane
output block alone), in-VMEM [F, s*C] -> [F*s, C] retiles and the ~3.3k
(stream, chunk) grid add per-program costs XLA's conv pipeline doesn't pay.
Kept as the starting point for a future round: the win requires restructuring
around >=128-lane tiles end-to-end and a coarser grid.

The XLA conv stack (models/mimi.conv_stack) round-trips every intermediate
activation through HBM: at serving shapes (B=256, T=800 -> 96k samples) the
stage tensors are 0.2-3.1 GB each; with f32 conv outputs it measured ~65
ms/call against a ~26 ms flop/bandwidth bound, dominated by ELU select
fusions, f32 converts, and layout copies between convs (bf16 conv outputs
recover ~19 ms of that -- ops/conv._acc_dtype). This kernel computes the
ENTIRE decoder -- dec_in k7 conv, three (convtr k=2s -> ELU -> conv k3 ->
ELU -> conv k1 -> residual) stages, final ELU + k3 conv to PCM -- in VMEM,
reading x once and writing PCM once. It is the TPU analogue of the
reference's fused CUDA conv stack (ptts_cuda.c:1112-1548).

Design:
  * Everything works on FLAT [rows, channels] arrays at each stage's sample
    rate; a transposed conv is two MXU dots off the (current, previous) input
    rows followed by an in-VMEM reshape [F, s*C] -> [F*s, C] (row-major, so
    the reshape is exact position interleaving).
  * k-tap causal convs are one im2col concat (k shifted row-slices on the
    lane axis) and one MXU dot with the tap-major [k*Cin, Cout] matrix.
  * Halo: each program processes S frames and additionally consumes the last
    H frames of the previous block (dual BlockSpec on the same input, the
    window_attention trick). H is the unique smallest halo such that the
    start-position recurrence p -> (p+1)*s + (k_res-1) lands the final-rate
    start at <= -(k_last-1); every halo row at position >= 0 is recomputed
    exactly, and rows at positions < 0 are masked to zero after every stage,
    which reproduces conv1d_causal's zero left-padding bit-for-bit.
  * Left edge (block 0) masking makes the previous-block DMA contents
    irrelevant there; the right edge is plain zero padding, sliced off.
  * block_b streams per grid program via fori_loop (bounded temporaries),
    so DMA pipelines across a small grid.

Numerics: dots run in the input dtype (bf16 serving = full MXU rate) with
f32 accumulation; biases add in f32 before the cast back -- at least as
close to the f32 oracle as the XLA path.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_frames(k_in: int, ratios: Sequence[int], k_res: int,
                 k_last: int) -> int:
    """Smallest H such that starting x at frame -H covers PCM position 0
    with the dec_out conv's k_last-1 left taps."""
    for H in range(1, 64):
        p = -H + (k_in - 1)          # y0 start (frames)
        ok = p < 0
        for s in ratios:
            p = (p + 1) * s + (k_res - 1)
            ok = ok and p < 0
        if ok and p <= -(k_last - 1):
            return H
    raise ValueError("no halo found (degenerate geometry)")


def _elu(x):
    # compare/exp in f32: v5e VPU has no native bf16 compare ("Target does
    # not support this comparison" from Mosaic)
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0.0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0
                     ).astype(x.dtype)


def _dotf(a, w):
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _seanet_kernel(
    x_cur_ref,    # [BB, S, C_in]
    x_prev_ref,   # [BB, S, C_in]
    w_in_ref,     # [k_in*C_in, C0] tap-major
    b_in_ref,     # [1, C0] f32
    *rest,        # per-stage (w1, w2, b_up, wr1, br1, wr2, br2), w_out, b_out, o_ref
    block_s: int,
    halo: int,
    bb: int,
    ratios: tuple,
    k_in: int,
    k_res: int,
    k_last: int,
):
    o_ref = rest[-1]
    w_out_ref, b_out_ref = rest[-3], rest[-2]
    stage_refs = rest[:-3]
    n_stages = len(ratios)
    assert len(stage_refs) == 7 * n_stages

    i = pl.program_id(1)
    S, H = block_s, halo
    dt = x_cur_ref.dtype
    upsample = 1
    for s in ratios:
        upsample *= s

    # Start positions are AFFINE in the block index: start = i*S*rate + off
    # with a STATIC per-stage offset `off` (rate = positions per 200 Hz
    # frame). Tracking `off` as a Python int keeps the final output slice
    # static; only the zero-masks need the traced i*S*rate term.

    def mask_neg(a, rate, off):
        """Zero rows at absolute positions < 0 (causal zero left-pad)."""
        pos = i * (S * rate) + off \
            + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        return jnp.where(pos >= 0, a, jnp.zeros_like(a))

    def conv_flat(a, w_ref, b_ref, k):
        """Causal k-tap conv on flat rows: k shifted dots accumulated in f32
        (a lane-concat im2col + single dot trips Mosaic's concat layout rule
        -- shifted slices carry different sublane offsets). Output rows shift
        forward by k-1 (off += k-1)."""
        M = a.shape[0] - (k - 1)
        C = a.shape[1]
        acc = b_ref[...]
        for d in range(k):
            acc = acc + _dotf(a[d : d + M],
                              w_ref[d * C : (d + 1) * C].astype(dt))
        return acc.astype(dt)

    OUT_W = (rest[-1]).shape[2]                         # upsample, 128-padded

    def stream(b, _):
        # dec_in: k_in-tap conv at the 200 Hz frame rate
        x_ext = jnp.concatenate(
            [x_prev_ref[b, S - H :, :], x_cur_ref[b]], axis=0
        )                                               # [H+S, C_in]
        rate, off = 1, -H
        x_ext = mask_neg(x_ext, rate, off)
        z = conv_flat(x_ext, w_in_ref, b_in_ref, k_in)
        off += k_in - 1
        z = mask_neg(z, rate, off)

        for st in range(n_stages):
            s = ratios[st]
            w1, w2, b_up, wr1, br1, wr2, br2 = stage_refs[7 * st : 7 * st + 7]
            cout = w1.shape[1] // s
            e = _elu(z)
            # convtr k=2s: two dots off (current, previous) rows
            up = _dotf(e[1:], w1[...].astype(dt)) \
                + _dotf(e[:-1], w2[...].astype(dt)) + b_up[...]
            up = up.astype(dt)                          # [F-1, s*cout]
            rate, off = rate * s, (off + 1) * s
            u = up.reshape(up.shape[0] * s, cout)       # flat at the new rate
            u = mask_neg(u, rate, off)
            # residual block: ELU -> conv k_res -> ELU -> conv 1x1 -> add
            h = _elu(u)
            y1 = conv_flat(h, wr1, br1, k_res)
            y2 = conv_flat(_elu(y1), wr2, br2, 1)
            z = u[k_res - 1 :] + y2
            off += k_res - 1
            z = mask_neg(z, rate, off)

        # dec_out: k_last-tap conv to 1 channel, per-tap VPU form. The lane
        # reduction runs as a block-diagonal MXU dot AFTER re-tiling to the
        # blocked [S, up*C] form -- narrow (<128-lane) arrays like an [M, 1]
        # PCM column hit Mosaic's masked-store slow path (measured ~21 ms/
        # call of pure overhead at serving shapes).
        e = _elu(z)                                     # [N, C] C=128-padded
        C = e.shape[1]
        M = e.shape[0] - (k_last - 1)
        w_out = w_out_ref[...]                          # [k_last, C] f32
        acc = jnp.zeros((M, C), jnp.float32)
        for d in range(k_last):
            acc = acc + e[d : d + M].astype(jnp.float32) * w_out[d][None, :]
        off += k_last - 1
        # PCM row 0 of this block is absolute position i*S*upsample, i.e.
        # local row -off (off is negative by construction of H)
        first = -off
        assert first >= 0 and first + S * upsample <= M, (first, M)
        a_b = acc[first : first + S * upsample].astype(dt)   # [S*up, C]
        a_b = a_b.reshape(S, upsample * C)
        # G[j*C + c, j] = 1: out[s, j] = sum_c acc[s*up + j, c]
        r = jax.lax.broadcasted_iota(jnp.int32, (upsample * C, OUT_W), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (upsample * C, OUT_W), 1)
        G = (r // C == cidx).astype(dt)
        pcm = _dotf(a_b, G) + b_out_ref[...]            # [S, OUT_W]
        o_ref[b] = pcm.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, stream, 0)


@functools.partial(
    jax.jit,
    static_argnames=("k_in", "k_res", "k_last", "ratios", "block", "block_b",
                     "interpret"),
)
def _conv_stack_call(
    x: jnp.ndarray,           # [B, T, C_in]
    w_in, b_in,               # [k_in*C_in, C0], [1, C0] f32
    stage_mats: tuple,        # flat tuple, 7 arrays per stage
    w_out, b_out,             # [k_last, C_last] f32, [1, 1] f32
    *,
    k_in: int,
    k_res: int,
    k_last: int,
    ratios: tuple,
    block: int,
    block_b: int,
    interpret: bool,
) -> jnp.ndarray:
    B, T, C_in = x.shape
    S = block
    H = _halo_frames(k_in, ratios, k_res, k_last)
    assert S >= H, (S, H)
    upsample = 1
    for s in ratios:
        upsample *= s

    nb = -(-T // S)
    pad = nb * S - T
    if pad:
        x = jnp.pad(x, [(0, 0), (0, pad), (0, 0)])
    bb = block_b
    while B % bb:
        bb //= 2

    def cur(b, i):
        return (b, i, 0)

    def prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def const(b, i):
        return (0, 0)

    wspecs = [pl.BlockSpec(a.shape, const, memory_space=pltpu.VMEM)
              for a in (w_in, b_in, *stage_mats, w_out, b_out)]
    kernel = functools.partial(
        _seanet_kernel, block_s=S, halo=H, bb=bb, ratios=ratios,
        k_in=k_in, k_res=k_res, k_last=k_last,
    )
    # output lane width padded to >= 128: narrow out blocks (e.g. 120 for
    # the 24 kHz upsample) hit a masked-store slow path (~21 ms/call)
    out_w = max(upsample, 128)
    out = pl.pallas_call(
        kernel,
        grid=(B // bb, nb),
        in_specs=[
            pl.BlockSpec((bb, S, C_in), cur, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, S, C_in), prev, memory_space=pltpu.VMEM),
            *wspecs,
        ],
        out_specs=pl.BlockSpec((bb, S, out_w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb * S, out_w), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, x, w_in, b_in, *stage_mats, w_out, b_out)
    pcm = out[:, :, :upsample].reshape(B, nb * S * upsample)
    return pcm[:, : T * upsample]


def conv_stack_pallas(w, x: jnp.ndarray, cfg, *, block: int = 64,
                      block_b: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for models/mimi.conv_stack.

    w: the prepared mimi weight pytree (dec_in_kernel WIO, stage up_w1/up_w2
    halves, res WIO kernels). Returns [B, T*prod(ratios)] in x.dtype
    (conv_stack returns [..., 1]; decode slices channel 0 -- this returns it
    pre-sliced).
    """
    k_in = w["dec_in_kernel"].shape[0]
    k_res = w["stages"][0]["res1_kernel"].shape[0]
    k_last = w["dec_out_kernel"].shape[0]
    c_in = w["dec_in_kernel"].shape[1]
    c0 = w["dec_in_kernel"].shape[2]

    # Mosaic's shape-cast lowering needs >= 128 lanes on both sides of the
    # [F, s*C] -> [F*s, C] retile (empirically: 256/128 OK, 64/32 fail), so
    # every stage's channel axis is zero-padded up to 128 and the padded
    # lanes are carried as exact zeros (weights/biases padded with zeros;
    # ELU(0)=0) -- full-size this only doubles the 64-channel last stage.
    def lanepad(n: int) -> int:
        return max(n, 128)

    def padc(a, width, axis=-1):
        n = a.shape[axis]
        if n == width:
            return a
        padw = [(0, 0)] * a.ndim
        padw[axis] = (0, width - n)
        return jnp.pad(a, padw)

    # pack weights into dot-ready matrices (tiny; CSE'd across calls under jit)
    c0p = lanepad(c0)
    w_in = padc(w["dec_in_kernel"].reshape(k_in * c_in, c0), c0p)
    b_in = padc(w["dec_in_bias"].astype(jnp.float32), c0p)[None, :]
    stage_mats = []
    cprev_p = c0p
    for st, s in zip(w["stages"], cfg.ratios):
        cin, _, cout = st["up_w1"].shape
        coutp = lanepad(cout)
        rh = st["res1_kernel"].shape[2]
        # convtr halves: pad the input rows (prev stage's lane pad) and each
        # phase's output block
        w1 = padc(padc(st["up_w1"], coutp).reshape(cin, s * coutp), cprev_p,
                  axis=0)
        w2 = padc(padc(st["up_w2"], coutp).reshape(cin, s * coutp), cprev_p,
                  axis=0)
        b_up = jnp.tile(padc(st["up_bias"].astype(jnp.float32), coutp), s)
        # res-hidden also lane-padded (32/64-lane intermediates hit the same
        # masked-store slow path as narrow outputs); zero rows/cols keep the
        # math exact (ELU(0)=0)
        rhp = lanepad(rh)
        stage_mats += [
            w1, w2, b_up[None, :],
            padc(padc(st["res1_kernel"], coutp, axis=1)
                 .reshape(k_res * coutp, rh), rhp),
            padc(st["res1_bias"].astype(jnp.float32), rhp)[None, :],
            padc(padc(st["res2_kernel"].reshape(rh, cout), coutp), rhp,
                 axis=0),
            padc(st["res2_bias"].astype(jnp.float32), coutp)[None, :],
        ]
        cprev_p = coutp
    w_out = padc(w["dec_out_kernel"][:, :, 0].astype(jnp.float32), cprev_p)
    b_out = w["dec_out_bias"].astype(jnp.float32).reshape(1, 1)

    return _conv_stack_call(
        x, w_in, b_in, tuple(stage_mats), w_out, b_out,
        k_in=k_in, k_res=k_res, k_last=k_last, ratios=tuple(cfg.ratios),
        block=block, block_b=block_b, interpret=interpret,
    )
