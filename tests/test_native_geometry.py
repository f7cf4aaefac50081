"""Differential test: C++ native geometry builder vs the numpy builders."""

import numpy as np
import pytest

from frave_tpu.native import build_geometry_native, have_native
from frave_tpu.fractal.geometry_fast import build_geometry_fast

pytestmark = pytest.mark.skipif(
    not have_native(), reason="native library not built (make -C csrc)"
)


@pytest.mark.parametrize(
    "h,w,depth",
    [(32, 32, 9), (48, 40, 9), (100, 60, 9), (1, 1, 9), (7, 300, 9), (64, 64, 7)],
)
def test_native_matches_numpy(h, w, depth):
    ref = build_geometry_fast(h, w, depth)
    nat = build_geometry_native(h, w, depth)
    assert nat.num_tiles == ref.num_tiles
    np.testing.assert_array_equal(nat.centers, ref.centers)
    np.testing.assert_array_equal(nat.pixel_gather, ref.pixel_gather)
    np.testing.assert_array_equal(nat.coef_mask, ref.coef_mask)
    np.testing.assert_array_equal(nat.nbr_idx, ref.nbr_idx)
    np.testing.assert_array_equal(nat.nbr_par, ref.nbr_par)
    np.testing.assert_array_equal(nat.tile_nbr, ref.tile_nbr)
    for a, b in zip(nat.level_slots, ref.level_slots):
        np.testing.assert_array_equal(a, b)
