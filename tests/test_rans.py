"""Interleaved-lane rANS round trips over the global decode-order stream."""

import numpy as np
import pytest

from frave_tpu.entropy.tables import context_from_histogram, ALPHABET_SIZE, CONTEXT_AMOUNT
from frave_tpu.ops.rans import (
    RANS_L,
    StreamDecoder,
    build_stream,
    encode_lanes,
)


def _make_contexts(rng):
    freqs, cdfs, bits = [], [], []
    for b in range(CONTEXT_AMOUNT):
        res = np.clip(rng.laplace(0, 2 + 3 * b, 3000).astype(int), -500, 500)
        packed = np.where(res >= 0, 2 * res, -2 * res - 1)
        hist = np.bincount(packed, minlength=ALPHABET_SIZE).astype(np.uint32)[:ALPHABET_SIZE]
        ctx = context_from_histogram(hist, b)
        freqs.append(ctx.freqs)
        cdfs.append(ctx.cdf)
        bits.append(ctx.max_freq_bits)
    return np.stack(freqs), np.stack(cdfs), np.asarray(bits, dtype=np.int32)


def _perm_for_chunks(chunks, nl, C=1):
    """Stream perm for a given decode chunk partition: for each chunk (in
    order), for each channel, for each active lane ASCENDING (the
    decoder's cumsum order — not ascending k when a chunk wraps the lane
    ring), the source index into the row-major [R, C, NL] grid."""
    out = []
    k0 = 0
    for ln in chunks:
        ks = sorted(np.arange(k0, k0 + ln), key=lambda k: k % nl)
        for c in range(C):
            for k in ks:
                r, l = k // nl, k % nl
                out.append((r * C + c) * nl + l)
        k0 += ln
    return np.asarray(out, dtype=np.int32)


def _random_symbols(rng, freqs, k):
    buckets = rng.integers(0, CONTEXT_AMOUNT, size=k)
    syms = np.zeros(k, dtype=np.int64)
    for b in range(CONTEXT_AMOUNT):
        idx = np.nonzero(buckets == b)[0]
        if idx.size:
            p = freqs[b].astype(np.float64) / freqs[b].sum()
            syms[idx] = rng.choice(ALPHABET_SIZE, p=p, size=idx.size)
    return buckets, syms


@pytest.mark.parametrize("nl", [1, 8, 64])
@pytest.mark.parametrize("k", [0, 1, 7, 1000])
def test_rans_roundtrip(nl, k):
    rng = np.random.default_rng(nl * 1000 + k)
    freqs, cdfs, bits = _make_contexts(rng)
    buckets, syms = _random_symbols(rng, freqs, k)
    states, wg, fg = encode_lanes(
        syms.astype(np.uint32), buckets.astype(np.int32), freqs, cdfs, bits, nl
    )
    assert (states.astype(np.uint64) >= RANS_L).all()

    chunks = [min(nl, k - k0) for k0 in range(0, k, nl)]
    perm = _perm_for_chunks(chunks, nl)
    stream = build_stream([wg], [fg], perm)
    dec = StreamDecoder(states[None], stream, freqs[None], cdfs[None], bits[None])
    out = np.zeros(k, dtype=np.int64)
    k0 = 0
    for ln in chunks:
        bk = np.full(nl, -1, dtype=np.int64)
        ks = np.arange(k0, k0 + ln)
        bk[ks % nl] = buckets[ks]
        s = dec.decode_step(0, bk)
        out[ks] = s[ks % nl]
        k0 += ln
    assert np.array_equal(out, syms)


def test_rans_irregular_chunks():
    """Wavefront waves are not lane-aligned; the stream order tracks the
    chunk partition exactly."""
    rng = np.random.default_rng(7)
    freqs, cdfs, bits = _make_contexts(rng)
    k, nl = 500, 16
    buckets, syms = _random_symbols(rng, freqs, k)
    states, wg, fg = encode_lanes(
        syms.astype(np.uint32), buckets.astype(np.int32), freqs, cdfs, bits, nl
    )
    chunks = []
    k0 = 0
    for ln in rng.integers(1, nl + 1, size=1000):
        ln = min(int(ln), k - k0)
        if ln == 0:
            break
        chunks.append(ln)
        k0 += ln
    perm = _perm_for_chunks(chunks, nl)
    stream = build_stream([wg], [fg], perm)
    dec = StreamDecoder(states[None], stream, freqs[None], cdfs[None], bits[None])
    out = np.zeros(k, dtype=np.int64)
    k0 = 0
    for ln in chunks:
        bk = np.full(nl, -1, dtype=np.int64)
        ks = np.arange(k0, k0 + ln)
        bk[ks % nl] = buckets[ks]
        s = dec.decode_step(0, bk)
        out[ks] = s[ks % nl]
        k0 += ln
    assert np.array_equal(out, syms)


def test_rans_two_channels_interleaved():
    """Channels share one stream; within each chunk, channel 0's words
    precede channel 1's."""
    rng = np.random.default_rng(11)
    freqs, cdfs, bits = _make_contexts(rng)
    k, nl = 300, 8
    per_ch = []
    grids = []
    for c in range(2):
        buckets, syms = _random_symbols(rng, freqs, k)
        st, wg, fg = encode_lanes(
            syms.astype(np.uint32), buckets.astype(np.int32), freqs, cdfs, bits, nl
        )
        per_ch.append((buckets, syms, st))
        grids.append((wg, fg))
    chunks = [min(nl, k - k0) for k0 in range(0, k, nl)]
    perm = _perm_for_chunks(chunks, nl, C=2)
    stream = build_stream([g[0] for g in grids], [g[1] for g in grids], perm)
    dec = StreamDecoder(
        np.stack([p[2] for p in per_ch]),
        stream,
        np.stack([freqs] * 2),
        np.stack([cdfs] * 2),
        np.stack([bits] * 2),
    )
    out = np.zeros((2, k), dtype=np.int64)
    k0 = 0
    for ln in chunks:
        ks = np.arange(k0, k0 + ln)
        for c in range(2):
            bk = np.full(nl, -1, dtype=np.int64)
            bk[ks % nl] = per_ch[c][0][ks]
            s = dec.decode_step(c, bk)
            out[c, ks] = s[ks % nl]
        k0 += ln
    for c in range(2):
        assert np.array_equal(out[c], per_ch[c][1])


def test_zero_freq_symbol_raises():
    freqs = np.zeros((CONTEXT_AMOUNT, ALPHABET_SIZE), dtype=np.uint32)
    freqs[:, 0] = 256
    cdfs = np.zeros((CONTEXT_AMOUNT, ALPHABET_SIZE), dtype=np.uint32)
    cdfs[:, 1:] = 256
    bits = np.full(CONTEXT_AMOUNT, 8, dtype=np.int32)
    with pytest.raises(ValueError):
        encode_lanes(
            np.asarray([5], dtype=np.uint32),
            np.asarray([0], dtype=np.int32),
            freqs,
            cdfs,
            bits,
            4,
        )
