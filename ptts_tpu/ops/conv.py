"""Causal 1-D convolutions with the reference's exact padding semantics.

Reference semantics (/root/reference/ptts_kernels.c:114-207):
  * conv1d:  out_len = T // stride, zero left-pad of (k - stride)
  * convtranspose1d: full length (T-1)*stride + k, right-trimmed by
    (k - stride) => out_len = T * stride

Layout is channels-last [B, T, C] (C on the TPU lane dimension). Weights are
converted from the torch/safetensors layout to XLA 'WIO' kernels once on the
host (prepare_* helpers); the forward functions are pure jnp and fuse into the
surrounding graph under jit. Transposed convolution is expressed as an
input-dilated regular convolution (lhs_dilation=stride, flipped kernel) so
grouped/depthwise cases ride XLA's native conv path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = ("NWC", "WIO", "NWC")


def _acc_dtype(dt):
    """Conv OUTPUT dtype: f32 for f32 inputs (parity), the input dtype for
    bf16 serving (the MXU still accumulates in f32 internally)."""
    return jnp.float32 if dt == jnp.float32 else dt


def prepare_conv_kernel(w_torch: np.ndarray) -> np.ndarray:
    """torch Conv1d weight [out, in/g, k] -> XLA WIO kernel [k, in/g, out]."""
    return np.ascontiguousarray(np.transpose(w_torch, (2, 1, 0)))


def prepare_convtr_kernel(w_torch: np.ndarray, groups: int) -> np.ndarray:
    """torch ConvTranspose1d weight [in, out/g, k] -> flipped WIO [k, in/g, out].

    The transposed conv y[t*s + kk] += w[ic, ocg, kk] * x[ic, t]
    (ptts_kernels.c:190-204) equals a regular conv over the stride-dilated
    input with the kernel reversed along k.
    """
    in_ch, out_per_group, k = w_torch.shape
    in_per_group = in_ch // groups
    w = w_torch.reshape(groups, in_per_group, out_per_group, k)
    w = w[..., ::-1]                      # flip taps
    w = np.transpose(w, (3, 1, 0, 2))     # [k, in/g, g, out/g]
    w = w.reshape(k, in_per_group, groups * out_per_group)
    return np.ascontiguousarray(w)


def conv1d_causal(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    stride: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """x: [B, T, Cin]; kernel: WIO [k, in/g, out]. Returns [B, T//stride, Cout]."""
    k = kernel.shape[0]
    left_pad = k - stride
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=[(left_pad, 0)],
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        # MXU accumulation is f32 either way; bf16 OUTPUT avoids a separate
        # f32->bf16 convert pass over GB-scale vocoder activations
        # (measured 95 -> 77 ms for the serving conv stack on v5e)
        preferred_element_type=_acc_dtype(x.dtype),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def convtr1d_causal(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    stride: int,
    groups: int = 1,
) -> jnp.ndarray:
    """x: [B, T, Cin]; kernel: flipped WIO [k, in/g, out]. Returns [B, T*stride, Cout].

    Oracle cross-check variant (with prepare_convtr_kernel): production uses
    convtr1d_2s's convtr-as-GEMM for every Mimi k=2s transposed conv; this
    input-dilated lowering is kept only as the independent reference
    formulation exercised by tests/test_ops.py.
    """
    k = kernel.shape[0]
    y_full = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        preferred_element_type=_acc_dtype(x.dtype),
    )
    # full length (T-1)*s + k; reference trims the trailing (k - stride).
    T = x.shape[1]
    y = y_full[:, : T * stride, :]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def prepare_convtr_halves(w_torch: np.ndarray, groups: int):
    """Split a k == 2*stride ConvTranspose1d weight into two matmul tables.

    For k = 2s, output position p receives exactly two taps:
        y[p] = x[p//s] . W[:, :, p%s]  +  x[p//s - 1] . W[:, :, p%s + s]
    so the whole transposed conv is two GEMMs plus a one-frame shift -- pure
    MXU work instead of XLA's input-dilated conv path (which is the measured
    bottleneck of the vocoder). All of Mimi's transposed convs have k = 2s
    (upsample 32/16; stages 12/6, 10/5, 8/4 -- ptts_mimi.c:385-462).

    Returns (w1, w2):
      groups == 1:  [Cin, s, Cout]  (fused to a k=2 frame conv in convtr1d_2s)
      depthwise:    [s, C]          (broadcast multiply)
    """
    in_ch, out_per_group, k = w_torch.shape
    s = k // 2
    assert k == 2 * s
    if groups == 1:
        w1 = np.ascontiguousarray(np.transpose(w_torch[:, :, :s], (0, 2, 1)))
        w2 = np.ascontiguousarray(np.transpose(w_torch[:, :, s:], (0, 2, 1)))
        return w1, w2  # [Cin, s, Cout]
    assert groups == in_ch and out_per_group == 1, "only depthwise supported"
    w1 = np.ascontiguousarray(w_torch[:, 0, :s].T)  # [s, C]
    w2 = np.ascontiguousarray(w_torch[:, 0, s:].T)
    return w1, w2


def convtr1d_2s(
    x: jnp.ndarray,   # [B, T, Cin]
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    bias,
    *,
    stride: int,
    depthwise: bool = False,
) -> jnp.ndarray:
    """k == 2*stride transposed conv via a k=2 conv over frames.

    y[b, t*s + j, o] = x[b, t] . W1[:, j, o] + x[b, t-1] . W2[:, j, o],
    i.e. a kernel-size-2 causal conv on the FRAME axis with s*Cout output
    channels (one implicit GEMM [B*T, 2Cin] x [2Cin, s*Cout]), then a reshape.
    Matches convtr1d_causal's semantics (right-trimmed to T*stride).
    """
    B, T, Cin = x.shape
    s = stride
    if depthwise:
        # small tensors (the 12.5->200 Hz upsample): broadcast multiply
        y1 = (x[:, :, None, :] * w1[None, None].astype(x.dtype)).astype(x.dtype)
        y2 = (x[:, :, None, :] * w2[None, None].astype(x.dtype)).astype(x.dtype)
        y2 = jnp.concatenate([jnp.zeros_like(y2[:, :1]), y2[:, :-1]], axis=1)
        y = (y1 + y2).reshape(B, T * s, Cin)
        if bias is not None:
            y = y + bias
        return y.astype(x.dtype)

    Cout = w1.shape[-1]
    # kernel [2, Cin, s*Cout]: tap 0 sees x[t-1] (second-half taps), tap 1 x[t]
    kernel = jnp.stack(
        [w2.reshape(Cin, s * Cout), w1.reshape(Cin, s * Cout)], axis=0
    ).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(1, 0)],
        dimension_numbers=_DIMNUMS,
        preferred_element_type=_acc_dtype(x.dtype),
    ).astype(x.dtype)                      # [B, T, s*Cout]
    y = y.reshape(B, T * s, Cout)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def elu(x: jnp.ndarray) -> jnp.ndarray:
    """ELU(alpha=1) matching ptts_kernels.c:209-219 (x>=0 ? x : exp(x)-1)."""
    return jnp.where(x >= 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
