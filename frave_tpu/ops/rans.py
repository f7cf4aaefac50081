"""Interleaved-lane rANS entropy coder (numpy host implementation).

Design (TPU-native redesign of entropy_coding.rs:161-352):

  * 32-bit state per lane, 16-bit renormalization words, state domain
    [2^16, 2^32). With per-context scale_bits <= MAX_FREQ_BITS_CAP = 14
    (< 16) each symbol moves at most one 16-bit word in either direction —
    the key invariant that makes both directions branch-free data-parallel
    lane updates. (The reference uses the `rans` crate's 64-bit multi-stream
    coder with byte renorm and one stream per context bucket,
    entropy_coding.rs:278,332-335.)
  * NL lanes; symbol k of the wavefront schedule belongs to lane k mod NL.
    Lane membership is static (unlike the reference, where the stream is
    chosen by the data-dependent bucket, entropy_coding.rs:239), so decode
    can advance all lanes of a wavefront step concurrently; only the
    frequency-table *choice* is data-dependent.
  * Encode pushes each lane's symbols in reverse schedule order
    (LIFO, like the reference's reversed put_at, entropy_coding.rs:332-334)
    and is vectorized over lanes as a reverse scan over the [R, NL] symbol
    grid.

Wire format per lane: final encoder state (u32) + words in decode order.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

RANS_L = 1 << 16  # lower bound of the normalized state interval


def build_symbol_grid(values: np.ndarray, nl: int, pad=0) -> np.ndarray:
    """[K] -> [R, NL] row-major grid, padded with `pad` (invalid slots)."""
    k = values.shape[0]
    r = -(-k // nl)
    out = np.full(r * nl, pad, dtype=values.dtype)
    out[:k] = values
    return out.reshape(r, nl)


def encode_lanes(
    symbols: np.ndarray,  # [K] uint32 zig-zag symbols in schedule order
    buckets: np.ndarray,  # [K] int32 context bucket per symbol
    freqs: np.ndarray,  # [10, 1024] uint32
    cdfs: np.ndarray,  # [10, 1024] uint32
    scale_bits: np.ndarray,  # [10] int32
    nl: int,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Returns (final_states [NL] u32, per-lane word arrays in decode order)."""
    K = symbols.shape[0]
    sym_g = build_symbol_grid(symbols.astype(np.int64), nl)
    bkt_g = build_symbol_grid(buckets.astype(np.int64), nl)
    valid_g = build_symbol_grid(np.ones(K, dtype=bool), nl, pad=False)
    R = sym_g.shape[0]

    x = np.full(nl, RANS_L, dtype=np.uint64)
    emitted: List[List[int]] = [[] for _ in range(nl)]  # emission order per lane

    f = freqs.astype(np.uint64)
    c = cdfs.astype(np.uint64)
    b = scale_bits.astype(np.uint64)

    for r in range(R - 1, -1, -1):
        s = sym_g[r]
        k = bkt_g[r]
        v = valid_g[r]
        fr = np.where(v, f[k, s], 1)
        cd = np.where(v, c[k, s], 0)
        bi = np.where(v, b[k], 0)
        if not np.all(fr[v] > 0):
            bad = np.nonzero(v & (fr == 0))[0]
            raise ValueError(
                f"symbol with zero frequency at grid row {r}, lanes {bad.tolist()}"
            )
        x_max = fr << (np.uint64(32) - bi)
        emit = v & (x >= x_max)
        for lane in np.nonzero(emit)[0]:
            emitted[lane].append(int(x[lane] & np.uint64(0xFFFF)))
        x = np.where(emit, x >> np.uint64(16), x)
        x_new = ((x // fr) << bi) + (x % fr) + cd
        x = np.where(v, x_new, x)

    states = x.astype(np.uint32)
    # decode consumes words in reverse emission order
    words = [np.asarray(list(reversed(e)), dtype=np.uint16) for e in emitted]
    return states, words


class LaneDecoder:
    """Stateful vectorized decoder: one decode_step per wavefront chunk.

    All lanes advance independently; a step supplies, for each lane, the
    bucket to decode under (or -1 for inactive lanes).
    """

    def __init__(
        self,
        states: np.ndarray,  # [NL] u32
        words: List[np.ndarray],  # per-lane u16, decode order
        freqs: np.ndarray,
        cdfs: np.ndarray,
        scale_bits: np.ndarray,
    ):
        self.nl = states.shape[0]
        self.x = states.astype(np.uint64)
        maxw = max((w.shape[0] for w in words), default=0)
        self.words = np.zeros((self.nl, max(maxw, 1)), dtype=np.uint64)
        for i, w in enumerate(words):
            self.words[i, : w.shape[0]] = w
        self.ptr = np.zeros(self.nl, dtype=np.int64)
        self.freqs = freqs.astype(np.uint64)
        self.cdfs = cdfs.astype(np.uint64)
        self.scale_bits = scale_bits.astype(np.uint64)

    def decode_step(self, buckets: np.ndarray) -> np.ndarray:
        """buckets: [NL] int64, -1 = inactive. Returns symbols [NL] int64
        (undefined where inactive)."""
        active = buckets >= 0
        k = np.where(active, buckets, 0)
        bi = self.scale_bits[k]
        mask = (np.uint64(1) << bi) - np.uint64(1)
        slot = self.x & mask
        # last symbol s with cdf[k, s] <= slot (duplicate-cdf semantics of
        # the reference's linear walk, entropy_coding.rs:246-255)
        cdf_rows = self.cdfs[k]  # [NL, 1024]
        sym = np.sum(cdf_rows <= slot[:, None], axis=1).astype(np.int64) - 1
        fr = self.freqs[k, sym]
        cd = self.cdfs[k, sym]
        x_new = fr * (self.x >> bi) + slot - cd
        need = active & (x_new < RANS_L)
        w = self.words[np.arange(self.nl), np.minimum(self.ptr, self.words.shape[1] - 1)]
        x_new = np.where(need, (x_new << np.uint64(16)) | w, x_new)
        self.ptr = np.where(need, self.ptr + 1, self.ptr)
        self.x = np.where(active, x_new, self.x)
        return sym
