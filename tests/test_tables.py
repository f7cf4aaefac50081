import numpy as np

from frave_tpu.entropy.tables import (
    ALPHABET_SIZE,
    assign_bucket,
    context_from_histogram,
    context_from_wire,
    MAX_FREQ_BITS_CAP,
)


def test_assign_bucket_edges():
    # float half-open ranges over BUCKET_EDGES (narrow buckets added vs
    # the reference's integer edges, prediction.rs:55-68)
    from frave_tpu.entropy.tables import BUCKET_EDGES, CONTEXT_AMOUNT

    assert len(BUCKET_EDGES) == CONTEXT_AMOUNT - 1
    cases = {0.0: 0, 0.2: 0, 0.25: 1, 0.59: 1, 0.6: 2, 1.39: 2, 1.4: 3,
             2.2: 4, 2.999: 4, 3.0: 5, 5.0: 6, 6.0: 7, 8.0: 8, 12.0: 9,
             16.0: 10, 20.0: 11, 25.0: 12, 30.0: 13, 42.0: 14, 1000.0: 14}
    for w, b in cases.items():
        assert int(assign_bucket(w)) == b, (w, b)
    assert int(assign_bucket(-3.7)) == 0
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
            bucket,
            enc_ctx.max_freq_bits,
            enc_ctx.off_distribution_values.tolist(),
            scale_idx=enc_ctx.scale_idx,  # v9: the scale travels in EHD
        )
        # the decoder must rebuild bit-identical tables from the wire fields
        assert np.array_equal(enc_ctx.freqs, dec_ctx.freqs)
        assert np.array_equal(enc_ctx.cdf, dec_ctx.cdf)
        assert enc_ctx.max_freq_bits == dec_ctx.max_freq_bits

        # legacy encoders (adaptive_scale=False) need no scale on the wire
        leg_ctx = context_from_histogram(hist, bucket, adaptive_scale=False)
        assert leg_ctx.scale_idx == bucket
        leg_dec = context_from_wire(
            bucket, leg_ctx.max_freq_bits, leg_ctx.off_distribution_values.tolist()
        )
        assert np.array_equal(leg_ctx.freqs, leg_dec.freqs)


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
