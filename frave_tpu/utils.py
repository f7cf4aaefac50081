"""Small integer utilities with exact reference semantics.

Reference: /root/reference/crates/libfri/src/utils.rs:5-48.
All functions here must be bit-exact with their Rust counterparts because
they participate in the coefficient <-> symbol mapping.
"""

from __future__ import annotations

import numpy as np


def get_prev_power_two(x: int) -> int:
    """Largest power of two <= x (0 for 0). Reference utils.rs:5-14."""
    if x <= 0:
        return 0
    return 1 << (int(x).bit_length() - 1)


def floor_log2(x: int) -> int:
    """floor(log2(x)); reference idiom get_prev_power_two(x).trailing_zeros()."""
    if x <= 0:
        raise ValueError("floor_log2 of non-positive value")
    return int(x).bit_length() - 1


def pack_signed(k):
    """Zig-zag map i32 -> u32: 0,-1,1,-2,2 -> 0,1,2,3,4. Reference utils.rs:34-40."""
    k = np.asarray(k, dtype=np.int64)
    return np.where(k >= 0, 2 * k, -2 * k - 1).astype(np.int64)


def unpack_signed(k):
    """Inverse zig-zag map u32 -> i32. Reference utils.rs:42-48."""
    k = np.asarray(k, dtype=np.int64)
    return np.where(k % 2 == 0, k // 2, -((k + 1) // 2)).astype(np.int64)


def trunc_div(a, q):
    """Rust-style truncated integer division (toward zero), vectorized.

    The reference's lifting and quantization use Rust `/` on i32, which
    truncates toward zero (wavelet_transform.rs:211-218, quantization.rs:17).
    numpy's // floors, so negative operands need the sign fix-up.
    """
    a = np.asarray(a)
    q = np.asarray(q)
    return np.where(a < 0, -((-a) // q), a // q)


def quantize_layer_of_index(i):
    """Tree-layer index used by quantization: floor(log2(i+1)).

    Reference quantization.rs:16: get_prev_power_two(i+1).trailing_zeros().
    DC (i=0) -> layer 0, root HF (i=1) -> layer 1, level-L HF -> layer L+1.
    """
    i = np.asarray(i, dtype=np.int64)
    return np.floor(np.log2(i + 1)).astype(np.int32)
