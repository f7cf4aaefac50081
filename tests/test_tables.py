import numpy as np

from frave_tpu.entropy.tables import (
    ALPHABET_SIZE,
    assign_bucket,
    context_from_histogram,
    context_from_wire,
    MAX_FREQ_BITS_CAP,
)


def test_assign_bucket_edges():
    # prediction.rs:55-68 half-open ranges
    cases = {0: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 3, 7: 3, 8: 4, 11: 4, 12: 5,
             15: 5, 16: 6, 19: 6, 20: 7, 24: 7, 25: 8, 29: 8, 30: 9, 1000: 9}
    for w, b in cases.items():
        assert int(assign_bucket(float(w))) == b, (w, b)
    # f32 -> u32 Rust cast semantics: trunc, negatives saturate to 0
    assert int(assign_bucket(-3.7)) == 0
    assert int(assign_bucket(2.999)) == 0
    assert int(assign_bucket(float("nan"))) == 0


def test_context_tables_sum_to_target():
    rng = np.random.default_rng(0)
    for bucket in range(10):
        res = np.clip(rng.laplace(0, 3 * (bucket + 1), 4000).astype(int), -500, 500)
        packed = np.where(res >= 0, 2 * res, -2 * res - 1)
        hist = np.bincount(packed, minlength=ALPHABET_SIZE).astype(np.uint32)[:ALPHABET_SIZE]
        ctx = context_from_histogram(hist, bucket)
        assert ctx.freqs.sum() == 1 << ctx.max_freq_bits
        assert ctx.max_freq_bits <= MAX_FREQ_BITS_CAP
        # every data symbol has nonzero frequency (encodability)
        assert (ctx.freqs[hist > 0] > 0).all()
        # cdf is the exclusive prefix sum
        assert np.array_equal(ctx.cdf, np.concatenate([[0], np.cumsum(ctx.freqs)[:-1]]))


def test_wire_regeneration_matches_encoder_side():
    rng = np.random.default_rng(1)
    for bucket in (0, 4, 9):
        res = np.clip(rng.laplace(0, 2 + 4 * bucket, 3000).astype(int), -510, 510)
        packed = np.where(res >= 0, 2 * res, -2 * res - 1)
        hist = np.bincount(packed, minlength=ALPHABET_SIZE).astype(np.uint32)[:ALPHABET_SIZE]
        enc_ctx = context_from_histogram(hist, bucket)
        dec_ctx = context_from_wire(
            bucket, enc_ctx.max_freq_bits, enc_ctx.off_distribution_values.tolist()
        )
        # the decoder must rebuild bit-identical tables from the wire fields
        assert np.array_equal(enc_ctx.freqs, dec_ctx.freqs)
        assert np.array_equal(enc_ctx.cdf, dec_ctx.cdf)
        assert enc_ctx.max_freq_bits == dec_ctx.max_freq_bits


def test_empty_context_does_not_crash():
    # reference hazard: trailing_zeros(0) -> 1<<64 panic (entropy_coding.rs:113)
    hist = np.zeros(ALPHABET_SIZE, dtype=np.uint32)
    ctx = context_from_histogram(hist, 5)
    assert ctx.max_freq_bits == 8
    assert ctx.freqs.sum() == 256


def test_extreme_symbol_1023():
    # reference hazard: u32 wraparound at freqs[1023] (entropy_coding.rs:157)
    hist = np.zeros(ALPHABET_SIZE, dtype=np.uint32)
    hist[1023] = 5  # residual -512
    hist[0] = 100
    ctx = context_from_histogram(hist, 0)
    assert ctx.freqs.sum() == 1 << ctx.max_freq_bits
    assert ctx.freqs[1023] >= 1
