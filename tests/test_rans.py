import numpy as np
import pytest

from frave_tpu.entropy.tables import context_from_histogram, ALPHABET_SIZE
from frave_tpu.ops.rans import LaneDecoder, encode_lanes, RANS_L


def _make_contexts(rng):
    freqs, cdfs, bits = [], [], []
    for b in range(10):
        res = np.clip(rng.laplace(0, 2 + 3 * b, 3000).astype(int), -500, 500)
        packed = np.where(res >= 0, 2 * res, -2 * res - 1)
        hist = np.bincount(packed, minlength=ALPHABET_SIZE).astype(np.uint32)[:ALPHABET_SIZE]
        ctx = context_from_histogram(hist, b)
        freqs.append(ctx.freqs)
        cdfs.append(ctx.cdf)
        bits.append(ctx.max_freq_bits)
    return np.stack(freqs), np.stack(cdfs), np.asarray(bits, dtype=np.int32)


@pytest.mark.parametrize("nl", [1, 8, 64])
@pytest.mark.parametrize("k", [0, 1, 7, 1000])
def test_rans_roundtrip(nl, k):
    rng = np.random.default_rng(nl * 1000 + k)
    freqs, cdfs, bits = _make_contexts(rng)
    buckets = rng.integers(0, 10, size=k)
    syms = np.zeros(k, dtype=np.int64)
    for b in range(10):
        idx = np.nonzero(buckets == b)[0]
        if idx.size:
            p = freqs[b].astype(np.float64) / freqs[b].sum()
            syms[idx] = rng.choice(ALPHABET_SIZE, p=p, size=idx.size)
    states, words = encode_lanes(
        syms.astype(np.uint32), buckets.astype(np.int32), freqs, cdfs, bits, nl
    )
    assert (states.astype(np.uint64) >= RANS_L).all()
    dec = LaneDecoder(states, words, freqs, cdfs, bits)
    out = np.zeros(k, dtype=np.int64)
    for k0 in range(0, k, nl):
        ln = min(nl, k - k0)
        bk = np.full(nl, -1, dtype=np.int64)
        ks = np.arange(k0, k0 + ln)
        bk[ks % nl] = buckets[ks]
        s = dec.decode_step(bk)
        out[ks] = s[ks % nl]
    assert np.array_equal(out, syms)


def test_rans_partial_steps():
    # decode in irregular chunk sizes (wavefront waves are not lane-aligned)
    rng = np.random.default_rng(7)
    freqs, cdfs, bits = _make_contexts(rng)
    k, nl = 500, 16
    buckets = rng.integers(0, 10, size=k)
    syms = np.zeros(k, dtype=np.int64)
    for b in range(10):
        idx = np.nonzero(buckets == b)[0]
        if idx.size:
            p = freqs[b].astype(np.float64) / freqs[b].sum()
            syms[idx] = rng.choice(ALPHABET_SIZE, p=p, size=idx.size)
    states, words = encode_lanes(
        syms.astype(np.uint32), buckets.astype(np.int32), freqs, cdfs, bits, nl
    )
    dec = LaneDecoder(states, words, freqs, cdfs, bits)
    out = np.zeros(k, dtype=np.int64)
    k0 = 0
    sizes = rng.integers(1, nl + 1, size=1000)
    for ln in sizes:
        ln = min(int(ln), k - k0)
        if ln == 0:
            break
        bk = np.full(nl, -1, dtype=np.int64)
        ks = np.arange(k0, k0 + ln)
        bk[ks % nl] = buckets[ks]
        s = dec.decode_step(bk)
        out[ks] = s[ks % nl]
        k0 += ln
    assert np.array_equal(out, syms)


def test_zero_freq_symbol_raises():
    freqs = np.zeros((10, ALPHABET_SIZE), dtype=np.uint32)
    freqs[:, 0] = 256
    cdfs = np.zeros((10, ALPHABET_SIZE), dtype=np.uint32)
    cdfs[:, 1:] = 256
    bits = np.full(10, 8, dtype=np.int32)
    with pytest.raises(ValueError):
        encode_lanes(
            np.asarray([5], dtype=np.uint32),
            np.asarray([0], dtype=np.int32),
            freqs,
            cdfs,
            bits,
            4,
        )
