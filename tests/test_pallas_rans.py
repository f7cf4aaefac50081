"""Differential test: the Pallas whole-wave rANS decode kernel
(ops/pallas_rans.py) against the XLA compare-free step chain
(ops/rans_jax.decode_step_comparefree) on identical inputs.

Both implement the same deterministic function of (states, buckets,
activity, stream, tables), so random — not necessarily valid-rANS —
inputs exercise every path: symbol staircase ties, renorm word routing
across block boundaries, inactive lanes, per-bucket bit widths.

The kernel's DMA/roll primitives hang under the Pallas interpreter on
this jax build, so this test runs ONLY on a real TPU (skipped in the
CPU CI — run it with FRAVE_TEST_TPU=1 on a TPU machine, which keeps
the accelerator visible instead of forcing the 8-device CPU mesh); the
CPU suite covers the grid decode end-to-end through its XLA scan body.
The production wiring is codec/grid_decode.py's FRAVE_GRID_PALLAS=1
path, covered on hardware by test_grid_pallas_roundtrip below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frave_tpu.entropy.tables import CONTEXT_AMOUNT


def _random_tables(rng, C):
    """Monotone cdf staircases with runs + zero-freq duplicates, plus
    per-bucket scale bits in [8, 14]."""
    bits = rng.integers(8, 15, size=(C, CONTEXT_AMOUNT)).astype(np.int32)
    cdfs = np.zeros((C, CONTEXT_AMOUNT, 1024), np.int32)
    for c in range(C):
        for b in range(CONTEXT_AMOUNT):
            tot = 1 << bits[c, b]
            n_on = int(rng.integers(3, 60))
            on = np.sort(rng.choice(1024, size=n_on, replace=False))
            w = rng.random(n_on)
            f = np.floor(w / w.sum() * tot).astype(np.int64)
            f[0] += tot - f.sum()
            freqs = np.zeros(1024, np.int64)
            freqs[on] = f
            cdfs[c, b] = np.concatenate([[0], np.cumsum(freqs)[:-1]])
    return cdfs, bits


def _tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.mark.skipif(
    not _tpu_available(), reason="pallas rANS kernel needs a real TPU"
)
@pytest.mark.parametrize("C,NL,R", [(1, 128, 5), (3, 256, 7)])
def test_decode_scan_wave_matches_xla_chain(C, NL, R):
    from frave_tpu.ops.pallas_rans import (
        decode_scan_wave,
        prepare_scan_tables,
        stream_pad_len,
    )
    from frave_tpu.ops.rans_jax import (
        decode_step_comparefree,
        prepare_compare_tables,
    )

    rng = np.random.default_rng(C * 100 + NL)
    cdfs_np, bits_np = _random_tables(rng, C)
    cdfs = jnp.asarray(cdfs_np)
    bits = jnp.asarray(bits_np)

    x0 = jnp.asarray(
        rng.integers(1 << 16, 1 << 32, size=(C, NL), dtype=np.uint64)
        .astype(np.uint32)
    )
    buckets = jnp.asarray(
        rng.integers(0, CONTEXT_AMOUNT, size=(R, C, NL), dtype=np.int64)
        .astype(np.int32)
    )
    active = jnp.asarray(rng.random((R, NL)) < 0.8)
    Wr = R * C * NL
    W = stream_pad_len(C * NL, Wr)
    words = rng.integers(0, 1 << 16, size=Wr, dtype=np.int64)
    stream16 = jnp.asarray(
        np.concatenate([words.astype(np.uint16), np.zeros(W - Wr, np.uint16)])
    )
    stream32 = jnp.asarray(
        np.concatenate([words.astype(np.int32), np.zeros(W - Wr, np.int32)])
    )

    # --- reference: XLA step chain
    tabs_x = prepare_compare_tables(cdfs, bits)
    x = x0
    gptr = jnp.int32(0)
    ref_syms = []
    iota_ca = jnp.arange(CONTEXT_AMOUNT, dtype=jnp.int32)
    for r in range(R):
        oh = jnp.asarray(
            buckets[r][..., None] == iota_ca, dtype=jnp.bfloat16
        )
        sym, x, gptr = decode_step_comparefree(
            x, gptr, oh, active[r], stream16, tabs_x
        )
        ref_syms.append(sym)
    ref_syms = jnp.stack(ref_syms)

    # --- kernel
    tabs_p = prepare_scan_tables(cdfs, bits)
    syms, x_k, gp_k = decode_scan_wave(
        x0, jnp.int32(0), buckets, active, stream32, tabs_p
    )

    np.testing.assert_array_equal(np.asarray(x_k), np.asarray(x))
    assert int(gp_k) == int(gptr)
    # symbols only matter on active lanes (inactive lanes hold garbage
    # in both implementations, but the garbage math may differ)
    act3 = np.broadcast_to(
        np.asarray(active)[:, None, :], (R, C, NL)
    )
    np.testing.assert_array_equal(
        np.asarray(syms)[act3], np.asarray(ref_syms)[act3]
    )


@pytest.mark.skipif(
    not _tpu_available(), reason="pallas rANS kernel needs a real TPU"
)
@pytest.mark.parametrize("c", [1, 3])
def test_grid_pallas_roundtrip(monkeypatch, c):
    """Production wiring: grid-mode decode with FRAVE_GRID_PALLAS=1
    routes every wave's rANS scan through decode_scan_wave
    (codec/grid_decode.py) — lossless round trip on hardware."""
    monkeypatch.setenv("FRAVE_GRID_PALLAS", "1")
    from frave_tpu.codec.decoder import FRIDecoder
    from frave_tpu.codec.encoder import FRIEncoder
    from frave_tpu.codec.grid_decode import pallas_rans_enabled
    from frave_tpu.codec.options import EncoderOptions
    from frave_tpu.images import RasterImage

    assert pallas_rans_enabled(128)
    rng = np.random.default_rng(5 + c)
    h, w = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    base = 127 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 13.0)
    data = np.stack(
        [
            np.clip(base + 8 * i + rng.normal(0, 4, (h, w)), 0, 255)
            for i in range(c)
        ],
        axis=-1,
    ).astype(np.uint8)
    img = RasterImage.from_array(data)
    # num_lanes=128: the kernel needs nl % 128 == 0 (kernel_supported);
    # the default heuristic lane count for this size is smaller
    blob = FRIEncoder(
        EncoderOptions(backend="jax", mode="grid", num_lanes=128)
    ).encode(img)
    out = FRIDecoder(backend="jax").decode(blob)
    np.testing.assert_array_equal(out.data, img.data)
