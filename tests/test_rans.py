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


def _bruteforce_lut(cdfs, bits, lut_bits):
    """lut[b, fine] = last symbol with scaled cdf <= fine (the reference
    decoder's duplicate-cdf linear-walk semantics)."""
    B = cdfs.shape[0]
    fine = np.arange(1 << lut_bits, dtype=np.uint64)
    lut = np.zeros((B, 1 << lut_bits), dtype=np.int64)
    for b in range(B):
        cdf_s = cdfs[b].astype(np.uint64) << (lut_bits - int(bits[b]))
        lut[b] = np.searchsorted(cdf_s, fine, side="right") - 1
    return lut


@pytest.mark.parametrize("lut_bits", [12, 14])
def test_merged_decode_table_matches_bruteforce(lut_bits):
    """build_merged_decode_table's prefix-op construction must agree with
    the brute-force searchsorted LUT + direct freq/cdf lookups at every
    fine position a decode step can read."""
    import jax.numpy as jnp

    from frave_tpu.ops.rans_jax import build_merged_decode_table

    rng = np.random.default_rng(42)
    freqs, cdfs, bits = _make_contexts(rng)
    assert bits.max() <= lut_bits
    merged = np.asarray(
        build_merged_decode_table(
            jnp.asarray(freqs.astype(np.int32)),
            jnp.asarray(cdfs.astype(np.int32)),
            jnp.asarray(bits),
            lut_bits,
        )
    )
    lut = _bruteforce_lut(cdfs, bits, lut_bits)
    for b in range(CONTEXT_AMOUNT):
        # every reachable fine position: slot << (lut_bits - bits_b)
        slots = np.arange(1 << int(bits[b]), dtype=np.int64)
        fine = slots << (lut_bits - int(bits[b]))
        sym_ref = lut[b, fine]
        assert np.array_equal(merged[b, fine, 1], sym_ref)
        w0 = merged[b, fine, 0].astype(np.uint64)
        assert np.array_equal(w0 >> 16, freqs[b, sym_ref])
        assert np.array_equal(w0 & 0xFFFF, cdfs[b, sym_ref])


def test_decode_step_merged_matches_stream():
    """decode_step_merged (one-gather fast path) and decode_step_stream
    (split tables) must be bit-identical on random lane states."""
    import jax.numpy as jnp

    from frave_tpu.ops.rans_jax import (
        LUT_BITS,
        RANS_L,
        build_merged_decode_table,
        decode_step_merged,
        decode_step_stream,
    )

    rng = np.random.default_rng(3)
    freqs, cdfs, bits = _make_contexts(rng)
    C, NL = 3, 16
    freqs3 = np.stack([freqs] * C)
    cdfs3 = np.stack([cdfs] * C)
    bits3 = np.stack([bits] * C)
    lut = _bruteforce_lut(
        cdfs3.reshape(-1, ALPHABET_SIZE),
        bits3.reshape(-1),
        LUT_BITS,
    ).reshape(C, CONTEXT_AMOUNT, 1 << LUT_BITS).astype(np.int16)
    merged = build_merged_decode_table(
        jnp.asarray(freqs3.astype(np.int32)),
        jnp.asarray(cdfs3.astype(np.int32)),
        jnp.asarray(bits3),
        LUT_BITS,
    )
    fcd = (jnp.asarray(freqs3.astype(np.uint32)) << jnp.uint32(16)) | jnp.asarray(
        cdfs3.astype(np.uint32)
    )
    for trial in range(5):
        x = jnp.asarray(
            rng.integers(RANS_L, 1 << 32, size=(C, NL), dtype=np.uint64).astype(
                np.uint32
            )
        )
        buckets = jnp.asarray(rng.integers(0, CONTEXT_AMOUNT, (C, NL)).astype(np.int32))
        active = jnp.asarray(rng.random((C, NL)) < 0.8)
        stream = jnp.asarray(
            rng.integers(0, 1 << 16, size=256 + C * NL, dtype=np.uint64).astype(
                np.uint16
            )
        )
        gptr = jnp.int32(rng.integers(0, 200))
        s1, x1, g1 = decode_step_stream(
            x, gptr, buckets, active, stream, jnp.asarray(lut), fcd, jnp.asarray(bits3)
        )
        s2, x2, g2 = decode_step_merged(
            x, gptr, buckets, active, stream, merged, jnp.asarray(bits3), LUT_BITS
        )
        sa, s2a = np.asarray(s1), np.asarray(s2)
        act = np.asarray(active)
        assert np.array_equal(sa[act], s2a[act]), trial
        assert np.array_equal(np.asarray(x1), np.asarray(x2)), trial
        assert int(g1) == int(g2), trial
