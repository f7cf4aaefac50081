"""Context frequency tables: Laplace-parametric fill + integer renormalization.

Replicates the reference's table pipeline (entropy_coding.rs:82-159) with
exact integer semantics, because both the encoder and the decoder
regenerate the tables from only (max_freq_bits, off_distribution_values)
(serialize.rs:93-105, 230-236) and they must agree bit-for-bit.

Determinism hardening vs the reference: the reference computes the Laplace
pmf with f32 libm exp at runtime (prediction.rs:220-222); a 1-ulp libm
difference between the encode and decode host would corrupt the tables.
Here exp(-|x|/width) is computed as r^|x| by exponentiation-by-squaring in
IEEE f64 from hardcoded hex-float constants — bit-identical on every
platform. (Tables therefore differ slightly from the Rust build's, which
only shifts the bitstream, never decoded pixels.)

Documented divergences from the reference (SURVEY.md section 7 "bugs to
consciously not replicate"):
  * empty-context max_freq_bits: reference computes trailing_zeros(0)=64
    and would panic on 1<<64 (entropy_coding.rs:113-114); we clamp to 8.
  * freqs[1023] after normalize: reference computes cum[1023]-target in u32
    which wraps when symbol 1023 has nonzero freq (entropy_coding.rs:157);
    we compute target-cum[1023] correctly.
  * max_freq_bits is capped at 14 (vs unbounded in the 64-bit-rANS
    reference) so the 32-bit-state/16-bit-renorm vectorized lanes keep the
    at-most-one-renorm-per-symbol invariant (frave_tpu/ops/rans.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

ALPHABET_SIZE = 1024  # zig-zag residual symbols (entropy_coding.rs:25)
CONTEXT_AMOUNT = 10  # Laplace-width buckets (prediction.rs:15)
MAX_FREQ_BITS_CAP = 14

# (exp(-1/width), 1/(2*width)) as IEEE-754 f64 hex literals for each
# bucket's representative width [2.5, 4.5, 6.3, 8.5, 12.7, 16, 20, 24, 28,
# 36, 50] (prediction.rs:70-84). Hardcoded for cross-platform determinism.
_LAPLACE_CONSTANTS: Tuple[Tuple[str, str], ...] = (
    ("0x1.57343067270eep-1", "0x1.999999999999ap-3"),  # width 2.5
    ("0x1.99fa40bc6c5f7p-1", "0x1.c71c71c71c71cp-4"),  # width 4.5
    ("0x1.b4da1cb5e42a6p-1", "0x1.4514514514514p-4"),  # width 6.3
    ("0x1.c72c49b875881p-1", "0x1.e1e1e1e1e1e1ep-5"),  # width 8.5
    ("0x1.d93b3c706d012p-1", "0x1.42850a142850ap-5"),  # width 12.7
    ("0x1.e0fabfbc702a4p-1", "0x1.0000000000000p-5"),  # width 16.0
    ("0x1.e7078b0a726a6p-1", "0x1.999999999999ap-6"),  # width 20.0
    ("0x1.eb1ae169e74aep-1", "0x1.5555555555555p-6"),  # width 24.0
    ("0x1.ee097670efc30p-1", "0x1.2492492492492p-6"),  # width 28.0
    ("0x1.f1f936ca50d7dp-1", "0x1.c71c71c71c71cp-7"),  # width 36.0
    ("0x1.f5dc99badec5bp-1", "0x1.47ae147ae147bp-7"),  # width 50.0
)

_BUCKET_WIDTHS = (2.5, 4.5, 6.3, 8.5, 12.7, 16.0, 20.0, 24.0, 28.0, 36.0, 50.0)


def width_of_bucket(bucket: int) -> float:
    """Representative Laplace width per bucket (prediction.rs:70-84)."""
    return _BUCKET_WIDTHS[min(bucket, 10)]


def assign_bucket(width) -> np.ndarray:
    """Width -> bucket LUT (prediction.rs:55-68). Input is the f32 width;
    the reference casts `width as u32` which truncates toward zero and
    saturates negatives to 0 — replicated here."""
    w = np.asarray(width, dtype=np.float64)
    wu = np.where(np.isnan(w), 0, np.clip(np.trunc(w), 0, 2**32 - 1)).astype(np.int64)
    edges = np.asarray([3, 5, 6, 8, 12, 16, 20, 25, 30], dtype=np.int64)
    return np.searchsorted(edges, wu, side="right").astype(np.int32)


def _pow_f64(r: float, e: int) -> float:
    """r**e by square-and-multiply with a fixed operation order (IEEE f64
    multiply is exactly rounded, so this is platform-deterministic)."""
    acc = 1.0
    base = r
    while e > 0:
        if e & 1:
            acc = acc * base
        base = base * base
        e >>= 1
    return acc


def _laplace_row(bucket: int, max_freq_bits: int) -> np.ndarray:
    """trunc(laplace(x_j; 0, width_b) * 2**bits) for all 1024 zig-zag symbols.

    Mirrors fill_with_laplace's value computation (entropy_coding.rs:85)
    with the deterministic f64 scheme described in the module docstring.
    """
    r = float.fromhex(_LAPLACE_CONSTANTS[bucket][0])
    s = float.fromhex(_LAPLACE_CONSTANTS[bucket][1])
    scale = float(1 << max_freq_bits)
    out = np.zeros(ALPHABET_SIZE, dtype=np.uint32)
    # |unpack_signed(j)|: j even -> j/2 ; j odd -> (j+1)/2
    for j in range(ALPHABET_SIZE):
        ax = (j + 1) // 2
        v = _pow_f64(r, ax) * s * scale
        out[j] = np.uint32(int(v))  # trunc toward zero; v >= 0
    return out


_laplace_cache = {}


def laplace_freqs(bucket: int, max_freq_bits: int) -> np.ndarray:
    key = (bucket, max_freq_bits)
    row = _laplace_cache.get(key)
    if row is None:
        row = _laplace_row(bucket, max_freq_bits)
        _laplace_cache[key] = row
    return row.copy()


@dataclasses.dataclass
class ContextTables:
    """Finalized rANS tables for one bucket context."""

    max_freq_bits: int
    off_distribution_values: np.ndarray  # [m] uint16, order preserved
    freqs: np.ndarray  # [1024] uint32, sums to 1 << max_freq_bits
    cdf: np.ndarray  # [1024] uint32 exclusive prefix sums


def _fill_with_laplace(
    freqs: np.ndarray, bucket: int, max_freq_bits: int, off_list: Sequence[int]
) -> Tuple[np.ndarray, List[int]]:
    """entropy_coding.rs:82-96 with the deterministic pmf."""
    lap = laplace_freqs(bucket, max_freq_bits)
    out = np.zeros_like(lap)
    off_in = set(int(x) for x in off_list)
    off_out: List[int] = list(int(x) for x in off_list)
    for j in range(ALPHABET_SIZE):
        if lap[j] == 0 and freqs[j] == 0 and j in off_in:
            out[j] = 1
        elif freqs[j] != 0 and lap[j] == 0:
            out[j] = 1
            if j not in off_in:
                off_out.append(j)
        else:
            out[j] = lap[j]
    return out, off_out


def _normalize_freqs(freqs: np.ndarray, target_total: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact integer renormalization with zero-frequency stealing.

    Replicates normalize_freqs (entropy_coding.rs:119-159) including the
    scan direction of the stealing loop, except the final symbol's
    frequency is computed without u32 wraparound (see module docstring).
    Returns (freqs, cdf).
    """
    freqs = freqs.astype(np.uint64)
    cum = np.zeros(ALPHABET_SIZE, dtype=np.uint64)
    np.cumsum(freqs[:-1], out=cum[1:])
    cur_total = int(cum[-1] + freqs[-1])
    if cur_total == 0:
        raise ValueError("cannot normalize an all-zero frequency table")
    cum = (int(target_total) * cum) // cur_total  # u64 exact
    cum[0] = 0

    # Fix symbols squeezed to zero by stealing from the smallest donor > 1.
    for i in range(ALPHABET_SIZE - 1):
        if freqs[i] != 0 and cum[i + 1] == cum[i]:
            best_freq = None
            best_steal = None
            for j in range(ALPHABET_SIZE - 1):
                f = int(cum[j + 1] - cum[j])
                if f > 1 and (best_freq is None or f < best_freq):
                    best_freq = f
                    best_steal = j
            if best_steal is None:
                continue
            if best_steal < i:
                cum[best_steal + 1 : i + 1] -= 1
            else:
                cum[i + 1 : best_steal + 1] += 1

    out = np.zeros(ALPHABET_SIZE, dtype=np.uint32)
    out[:-1] = (cum[1:] - cum[:-1]).astype(np.uint32)
    out[-1] = np.uint32(int(target_total) - int(cum[-1]))
    return out, cum.astype(np.uint32)


def finalize_context(
    hist: np.ndarray,
    bucket: int,
    max_freq_bits: int,
    off_list: Sequence[int] = (),
) -> ContextTables:
    """finalize_context (entropy_coding.rs:102-117): clamp bits, Laplace
    fill, renormalize to 1 << bits. `hist` is the raw residual histogram on
    the encode side and all-zeros on the decode side.

    Divergence: if the filled table has more nonzero symbols than 1 << bits
    (possible for wide residual spreads — e.g. noise images — where the
    off-distribution list alone exceeds the target total), bits is bumped
    until every data symbol can keep a nonzero normalized frequency. The
    reference would produce zero-frequency encode symbols here and panic
    inside the rans crate. The bumped value is what travels on the wire, so
    the decode side regenerates identically.
    """
    bits = max(8, min(int(max_freq_bits), MAX_FREQ_BITS_CAP))
    while True:
        filled, off_out = _fill_with_laplace(hist, bucket, bits, off_list)
        nnz = int(np.count_nonzero(filled))
        if (1 << bits) >= nnz or bits >= MAX_FREQ_BITS_CAP:
            break
        bits += 1
    freqs, cdf = _normalize_freqs(filled, 1 << bits)
    return ContextTables(
        max_freq_bits=bits,
        off_distribution_values=np.asarray(off_out, dtype=np.uint16),
        freqs=freqs,
        cdf=cdf,
    )


def context_from_histogram(hist: np.ndarray, bucket: int) -> ContextTables:
    """Encoder-side: bits from the histogram total (prediction.rs:302-305),
    clamped to [8, MAX_FREQ_BITS_CAP]."""
    total = int(hist.sum())
    bits = int(total).bit_length() - 1 if total > 0 else 8
    return finalize_context(hist, bucket, bits)


def context_from_wire(bucket: int, max_freq_bits: int, off_list: Sequence[int]) -> ContextTables:
    """Decoder-side regeneration from the wire fields only
    (serialize.rs:230-236)."""
    zeros = np.zeros(ALPHABET_SIZE, dtype=np.uint32)
    return finalize_context(zeros, bucket, max_freq_bits, off_list)
