"""Differential test: vectorized geometry builder vs loop-based definition."""

import numpy as np
import pytest

from frave_tpu.fractal.geometry import build_geometry
from frave_tpu.fractal.geometry_fast import build_geometry_fast


@pytest.mark.parametrize(
    "h,w,depth",
    [
        (32, 32, 9),
        (48, 40, 9),
        (100, 60, 9),
        (1, 1, 9),
        (7, 300, 9),
        (2, 511, 9),
        (64, 64, 7),
        (33, 17, 5),
    ],
)
def test_fast_matches_reference_builder(h, w, depth):
    slow = build_geometry(h, w, depth)
    fast = build_geometry_fast(h, w, depth)
    assert fast.num_tiles == slow.num_tiles
    np.testing.assert_array_equal(fast.centers, slow.centers)
    np.testing.assert_array_equal(fast.pixel_gather, slow.pixel_gather)
    np.testing.assert_array_equal(fast.coef_mask, slow.coef_mask)
    np.testing.assert_array_equal(fast.nbr_idx, slow.nbr_idx)
    np.testing.assert_array_equal(fast.nbr_par, slow.nbr_par)
    np.testing.assert_array_equal(fast.tile_nbr, slow.tile_nbr)
    np.testing.assert_array_equal(fast.level_of_haar, slow.level_of_haar)
    assert len(fast.level_slots) == len(slow.level_slots)
    for a, b in zip(fast.level_slots, slow.level_slots):
        np.testing.assert_array_equal(a, b)


def test_fast_speedup_128():
    import time

    t0 = time.perf_counter()
    build_geometry_fast(128, 128, 9)
    fast_t = time.perf_counter() - t0
    assert fast_t < 2.0  # loop builder takes ~0.5-1s at this size already
