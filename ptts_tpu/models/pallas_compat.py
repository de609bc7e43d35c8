"""Lazy indirection to the Pallas kernels (kept out of the default import
path so environments without Mosaic support still run the XLA fallbacks)."""

from __future__ import annotations


def pallas_decode_attention(q, k_cache, v_cache, prefix_len, start, cursor,
                            *, block_b: int = 8):
    from ..ops.pallas.decode_attention import decode_attention_pallas

    return decode_attention_pallas(q, k_cache, v_cache, prefix_len, start,
                                   cursor, block_b=block_b)
