"""Combinatorial round-trip matrix: mode x quality x colorspace x transform.

Every combination must round-trip (bit-exact at LOSSLESS, bounded error
otherwise) and cross-decode between backends.
"""

import numpy as np
import pytest

from frave_tpu import EncoderOptions, EncoderQuality, RasterImage, ColorSpace
from frave_tpu.codec.decoder import FRIDecoder
from frave_tpu.codec.encoder import FRIEncoder


def _img(c, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:40, 0:48]
    base = 127 + 80 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0)
    arr = np.clip(
        base[..., None] + rng.normal(0, 3, size=(40, 48, c)), 0, 255
    ).astype(np.uint8)
    return RasterImage.from_array(
        arr, ColorSpace.LUMA if c == 1 else ColorSpace.RGB
    )


@pytest.mark.parametrize("mode", ["parallel", "parity"])
@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("ct", ["auto", "none"])
def test_lossless_matrix(mode, c, ct):
    img = _img(c, seed=1)
    blob = FRIEncoder(
        EncoderOptions(backend="numpy", mode=mode, color_transform=ct)
    ).encode(img)
    for backend in ("numpy", "jax"):
        out = FRIDecoder(backend=backend).decode(blob)
        np.testing.assert_array_equal(out.data, img.data)


@pytest.mark.parametrize("mode", ["parallel", "parity"])
@pytest.mark.parametrize("quality", [EncoderQuality.HIGH, EncoderQuality.LOW])
def test_lossy_matrix_rgb(mode, quality):
    img = _img(3, seed=2)
    blob = FRIEncoder(
        EncoderOptions(backend="numpy", mode=mode, quality=quality)
    ).encode(img)
    out_np = FRIDecoder(backend="numpy").decode(blob)
    out_jx = FRIDecoder(backend="jax").decode(blob)
    np.testing.assert_array_equal(out_np.data, out_jx.data)
    err = np.abs(out_np.data.astype(np.int32) - img.data.astype(np.int32))
    assert err.max() < 64


def test_grid_stream_perm_monotone():
    """grid mode's decode word order equals the flat [R, C, NL] grid
    order (packed rows) — the invariant behind the lane-grid reshapes
    and the wave-sequential scans; parallel mode's perm is NOT
    monotone (waves pack densely across lane-row boundaries)."""
    import numpy as np

    from frave_tpu.fractal.schedule import get_stream_perm

    pm = get_stream_perm(64, 96, 64, mode="grid", channels=3)
    assert np.all(np.diff(pm.astype(np.int64)) > 0)


def test_rate_adaptive_lanes():
    from frave_tpu.fractal.schedule import rate_adaptive_lanes

    # tiny payload -> floor 256 (never above the throughput default)
    assert rate_adaptive_lanes(4096, 1300.0, 1) == 256
    # payload large enough: keep the default
    assert rate_adaptive_lanes(4096, 1e7, 1) == 4096
    # scales with channel count (overhead is per lane PER channel)
    assert rate_adaptive_lanes(4096, 140_000.0, 1) == 4096
    assert rate_adaptive_lanes(4096, 140_000.0, 3) < 4096
    # never raises a small default
    assert rate_adaptive_lanes(64, 1e9, 1) == 64
