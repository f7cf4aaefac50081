import numpy as np
import pytest

from frave_tpu.fractal.geometry import build_geometry, nearby_vectors
from frave_tpu.fractal.schedule import build_schedule, build_lane_steps

SHAPES = [(8, 8), (16, 16), (17, 23), (32, 32), (40, 56)]


@pytest.fixture(scope="module")
def geos():
    return {s: build_geometry(*s) for s in SHAPES}


def test_pixel_partition(geos):
    # every pixel covered exactly once (coverage invariant; the reference
    # asserts scan coverage at wavelet_transform.rs:701)
    for (h, w), geo in geos.items():
        pg = geo.pixel_gather
        covered = pg[pg >= 0]
        assert covered.size == h * w
        assert np.unique(covered).size == h * w


def test_masks_consistent(geos):
    for _, geo in geos.items():
        m = geo.coef_mask
        # kept tiles always carry DC and root-HF coefficients
        assert m[:, 0].all() and m[:, 1].all()
        # node present iff either child present (try_apply propagation)
        n = geo.nodes_per_tile
        for level in range(1, geo.depth - 1):
            lo, hi = 1 << level, 1 << (level + 1)
            children = m[:, 2 * lo : 2 * hi : 2] | m[:, 2 * lo + 1 : 2 * hi : 2]
            assert np.array_equal(m[:, lo:hi], children)


def test_nearby_vectors_reference_cases():
    # wavelet_transform.rs:71-90 hand-specialized scales
    assert nearby_vectors(1) == [(-1, 1), (-1, -1), (0, -2), (1, -1), (1, 1), (0, 2)]
    assert nearby_vectors(2) == [(-2, 0), (-2, 2), (0, 2), (2, 0), (2, -2), (0, -2)]
    assert nearby_vectors(3) == [(-3, -1), (-2, 2), (1, 3), (3, 1), (2, -2), (-1, -3)]
    # generic scale: zl = LITERALS[9], zmd = LITERALS[10] + zl
    v9 = nearby_vectors(9)
    assert v9[0] == (-31, 3)
    assert v9[5] == (-26, -14)
    # the 6 vectors always sum to zero pairwise (v[k] = -v[(k+3)%6])
    for s in range(1, 10):
        v = nearby_vectors(s)
        for k in range(3):
            assert v[k][0] == -v[k + 3][0] and v[k][1] == -v[k + 3][1]


def test_schedule_causality(geos):
    # every causal neighbour (slots 0..2) of a symbol must be scheduled in
    # a strictly earlier wave of the same phase, or be maskless (constant 0)
    for _, geo in geos.items():
        sched = build_schedule(geo)
        K = sched.num_symbols
        # wave id per schedule position
        wave_of_k = np.repeat(
            np.arange(sched.wave_sizes.shape[0]), sched.wave_sizes
        )
        # map flat coef slot -> schedule k (HF + per-phase LF handled via
        # last-write-wins since DC/root phases use distinct slots)
        slot_to_k = {}
        for k in range(K):
            slot_to_k[int(sched.sched_coef[k])] = k
        flat_mask = geo.coef_mask.reshape(-1)
        for k in range(K):
            for j in range(3):
                s = int(sched.sched_nbr[k, j])
                if s < 0 or not flat_mask[s]:
                    continue
                dep_k = slot_to_k.get(s)
                assert dep_k is not None
                assert wave_of_k[dep_k] < wave_of_k[k], (k, j, s)


def test_schedule_counts(geos):
    for _, geo in geos.items():
        sched = build_schedule(geo)
        expected = 2 * geo.num_tiles + int(geo.coef_mask[:, 2:].sum())
        assert sched.num_symbols == expected
        assert int(sched.wave_sizes.sum()) == expected


def test_lane_steps_alignment(geos):
    geo = geos[(17, 23)]
    sched = build_schedule(geo)
    for nl in (8, 32):
        steps = build_lane_steps(sched, nl)
        seen = np.full(sched.num_symbols, -1, dtype=np.int64)
        for s in range(steps.num_steps):
            slots = steps.step_slot[s]
            valid = slots >= 0
            lanes = np.nonzero(valid)[0]
            ks = slots[valid]
            # lane assignment is k mod nl
            assert np.array_equal(lanes, ks % nl)
            seen[ks] = s
        # every symbol appears exactly once, in nondecreasing step order of k
        assert (seen >= 0).all()
        assert (np.diff(seen) >= 0).all()
