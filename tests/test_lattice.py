"""Lattice-grid layout (fractal/lattice.py) + mode="grid" schedule.

The grids are verified cell-by-cell against the reference-semantics
index tensors at build time (build_lattice_grids raises on any
unexplained divergence; explained divergences — the reference's scale-2
conditional fixups, wavelet_transform.rs:97-177 — become the fixup
list). These tests assert the build invariants and the end-to-end
lossless contract of the grid-mode wire."""

import numpy as np
import pytest

from frave_tpu import EncoderOptions, RasterImage
from frave_tpu.codec.container import deserialize, serialize
from frave_tpu.codec.decoder import FRIDecoder
from frave_tpu.codec.encoder import FRIEncoder
from frave_tpu.fractal.geometry import get_geometry
from frave_tpu.fractal.lattice import build_lattice_grids
from frave_tpu.fractal.schedule import get_schedule


@pytest.mark.parametrize("shape", [(40, 40), (96, 128), (33, 257)])
def test_lattice_build_invariants(shape):
    h, w = shape
    geo = get_geometry(h, w)
    lg = build_lattice_grids(geo)
    assert len(lg.grids) == geo.depth
    total_nodes = 0
    for g in lg.grids:
        assert g.occ.sum() == g.coords.shape[0]
        # every node's slot is recorded exactly once
        slots = g.slot[g.occ]
        assert np.unique(slots).size == slots.size
        if g.level >= 1:
            total_nodes += slots.size
            assert g.parent_map is not None and g.parent_mod in (2, 4)
    # levels 1..depth-1 cover every non-root tree node
    assert total_nodes == geo.num_tiles * (geo.nodes_per_tile - 2)
    # fixups are boundary-proportional, not area-proportional
    assert lg.fixups.shape[0] < 20 * (h + w)


@pytest.mark.parametrize("shape,ch", [((40, 40), 1), ((96, 64), 3)])
def test_grid_mode_schedule_covers_all_symbols(shape, ch):
    h, w = shape
    sched = get_schedule(h, w, mode="grid")
    base = get_schedule(h, w, mode="parallel")
    # same symbol set (each coefficient coded exactly once), new order
    assert sched.num_symbols == base.num_symbols
    assert np.array_equal(
        np.sort(sched.sched_coef), np.sort(base.sched_coef)
    )
    assert sched.cell_pos is not None
    assert sched.cell_pos.shape[0] == sched.num_symbols
    # within a wave, cells are strictly increasing (raster order) and
    # unique within the wave's region
    k = 0
    for wsize, cells in zip(
        sched.wave_sizes.tolist(), sched.wave_cells.tolist()
    ):
        cp = sched.cell_pos[k : k + wsize]
        assert (np.diff(cp) > 0).all()
        assert cp.size == 0 or (cp[0] >= 0 and cp[-1] < cells)
        k += wsize


@pytest.mark.parametrize("backend", ["numpy", "jax"])
@pytest.mark.parametrize("shape,ch", [((40, 40), 1), ((64, 48), 3)])
def test_grid_mode_roundtrip(backend, shape, ch):
    h, w = shape
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    img = RasterImage.from_array(arr)
    blob = FRIEncoder(
        EncoderOptions(backend=backend, mode="grid")
    ).encode(img)
    ci = deserialize(blob)
    assert ci.mode == "grid"
    assert serialize(ci) == blob
    for dec_backend in ("numpy", "jax"):
        out = FRIDecoder(backend=dec_backend).decode(blob)
        np.testing.assert_array_equal(out.data, arr)


def test_grid_mode_photo_rate_sane():
    """Grid mode recodes the same coefficients with the same context
    model — rate must be within a few percent of parallel mode."""
    yy, xx = np.mgrid[0:96, 0:96]
    rng = np.random.default_rng(3)
    arr = (
        np.clip(
            128 + 55 * np.sin(xx / 9.0) + 40 * np.cos(yy / 13.0)
            + rng.normal(0, 4, (96, 96)),
            0,
            255,
        )
        .astype(np.uint8)[:, :, None]
    )
    img = RasterImage.from_array(arr)
    b_par = FRIEncoder(
        EncoderOptions(backend="numpy", mode="parallel")
    ).encode(img)
    b_grid = FRIEncoder(
        EncoderOptions(backend="numpy", mode="grid")
    ).encode(img)
    assert len(b_grid) < 1.06 * len(b_par), (len(b_grid), len(b_par))


@pytest.mark.parametrize("shape", [(40, 40), (64, 48), (96, 128)])
def test_wave_plans_dense_taps(shape):
    """Differential test of the dense (gather-free) tap machinery:
    for random coefficient values, per-wave parent broadcast + grid
    shifts + fixups + tap_valid masking must reproduce the exact tap
    values the schedule's nbr_par index tensors produce."""
    from frave_tpu.fractal.gridplan import apply_plan
    from frave_tpu.fractal.lattice import build_wave_plans, get_lattice_grids

    h, w = shape
    geo = get_geometry(h, w)
    lg = get_lattice_grids(h, w)
    plans = build_wave_plans(geo, lg)
    sched = get_schedule(h, w, mode="grid")

    rng = np.random.default_rng(7)
    n_slots = geo.num_tiles * geo.nodes_per_tile
    vals = rng.integers(-255, 256, size=n_slots + 1, dtype=np.int64)
    vals[n_slots] = 0  # absent-neighbour slot

    def value_grid(slot, occ):
        g = np.zeros(slot.shape, dtype=np.int64)
        g[occ] = vals[slot[occ]]
        return g

    def shift(g, s):
        A, B = g.shape
        out = np.zeros_like(g)
        s0, s1 = int(s[0]), int(s[1])
        i0, i1 = max(0, -s0), min(A, A - s0)
        j0, j1 = max(0, -s1), min(B, B - s1)
        if i1 > i0 and j1 > j0:
            out[i0:i1, j0:j1] = g[i0 + s0 : i1 + s0, j0 + s1 : j1 + s1]
        return out

    tg = lg.grids[0]
    dc_grid = value_grid(tg.slot, tg.occ)
    root_grid = value_grid(np.where(tg.occ, tg.slot + 1, -1), tg.occ)

    k0 = 0
    assert len(plans) == sched.max_wave
    for wp, wsize in zip(plans, sched.wave_sizes.tolist()):
        cells = sched.cell_pos[k0 : k0 + wsize]
        truth_nbr = sched.sched_nbr[k0 : k0 + wsize].astype(np.int64)
        truth_coef = sched.sched_coef[k0 : k0 + wsize].astype(np.int64)
        k0 += wsize

        # active set + slot grid agree with the schedule
        A, B = wp.shape
        assert int(wp.active.sum()) == wsize
        flat_active = np.nonzero(wp.active.reshape(-1))[0]
        assert np.array_equal(flat_active, np.sort(cells))
        order = np.argsort(cells, kind="stable")
        assert np.array_equal(
            wp.slot_grid.reshape(-1)[cells], truth_coef
        )

        if wp.kind == "dcA":
            assert not wp.tap_valid.any()
            continue
        if wp.kind in ("dcB", "root"):
            pv = dc_grid
            parent_flat = None
        else:
            gp = lg.grids[wp.level - 1]
            if wp.level == 1:
                parent_grid = root_grid
            else:
                parent_grid = value_grid(gp.slot, gp.occ)
            parent_flat = parent_grid.reshape(-1)
            # polyphase broadcast: parent value at each level-L cell
            pv = np.zeros((A, B), dtype=np.int64)
            for (r1, r2), _, plan in [
                (c[:2], None, c[2]) for c in wp.classes
            ]:
                pv[r1 :: wp.m, r2 :: wp.m] = apply_plan(
                    plan, parent_grid, np, fill=0
                )

        for k in range(6):
            tap = shift(pv, wp.tap_shift[k])
            if parent_flat is not None:
                sel = wp.fix_tap == k
                tap.reshape(-1)[wp.fix_tgt[sel]] = parent_flat[
                    wp.fix_src[sel]
                ]
            tap = np.where(wp.tap_valid[k], tap, 0)
            truth = np.where(
                truth_nbr[:, k] >= 0,
                vals[np.clip(truth_nbr[:, k], 0, None)],
                0,
            )
            got = tap.reshape(-1)[cells]
            np.testing.assert_array_equal(got, truth, err_msg=f"wave {wp.wave} tap {k}")
