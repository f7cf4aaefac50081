"""Dense gather-free grid-mode decode (round 3; packed rows round 4).

The decode-scan floor of the step-tensor decoders (pipeline_jax
decode_fused / decode_fused_seg) is their loop-carried random access:
each scan step pays a batched-index neighbour gather and a coefficient
scatter (~0.4 ms each on the target TPU regardless of table size —
benchmarks/op_cost_probe.py). With the lattice-grid layout
(fractal/lattice.py) both disappear:

  * coefficients live in dense per-level [A, B] grids; the 6 context
    taps of a whole wave are unit SHIFTS of the parent value grid
    (static pad+slice), after a polyphase parent->child broadcast
    built from gather-free stride plans (fractal/gridplan.py) — a
    per-level interleave of residue-class reads — plus a
    boundary-proportional fixup scatter (the reference's scale-2
    conditional neighbour corrections, wavelet_transform.rs:97-177);
  * the per-row scan body shrinks to the pure rANS state machine
    (ops/rans_jax.decode_step_comparefree — one-hot MXU contractions,
    no table gathers), or optionally the whole-wave Pallas kernel
    (ops/pallas_rans.decode_scan_wave, FRAVE_GRID_PALLAS=1) that keeps
    lane states in VMEM across all of a wave's rows.

Round 4 packs the rANS lanes: rank-within-wave instead of raw grid
cell (fractal/schedule.grid_row_lane). Round 3 made symbols <-> lanes
a pure reshape by rastering each wave's full bounding box, which
padded the scan by ~2.4x rows (647 vs 266 at 2048x2048) and made
grid-mode encode 2.5x slower than mode=parallel (measured,
benchmarks/grid_ab.py) while decode won. Packing keeps every scan row
fully occupied; the grid <-> packed conversion is ONE static bulk
gather (pack taps) plus ONE static bulk scatter (unpack values) per
wave — outside the loop-carried scan, where they cost bulk-parallel
HBM bandwidth instead of per-step latency. This replaces the
symbol-sequential decode recursion of the reference
(entropy_coding.rs:354-449).

Wire-compatible with the step-tensor decoders on mode="grid"
containers: same stream order (schedule.build_stream_perm, rows are
steps), same context math (ops/jax_ops.contexts_static), same tables.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.tables import ALPHABET_SIZE, CONTEXT_AMOUNT
from ..entropy.tables_jax import finalize_contexts_device
from ..fractal.gridplan import apply_plan
from ..ops import jax_ops as J
from ..ops.rans_jax import decode_step_comparefree, prepare_compare_tables


def pallas_rans_enabled(nl: int) -> bool:
    """Whether grid decode routes the per-wave rANS scan through the
    whole-wave Pallas kernel (ops/pallas_rans.decode_scan_wave).
    Off by default — measured slower than the XLA scan body on the
    target chip (see BASELINE.md round-4 grid A/B); FRAVE_GRID_PALLAS=1
    opts in on real TPU backends."""
    if os.environ.get("FRAVE_GRID_PALLAS") != "1":
        return False
    from ..ops.pallas_lifting import pallas_supported
    from ..ops.pallas_rans import kernel_supported

    return kernel_supported(nl) and pallas_supported()


def _shift2(g, s0: int, s1: int, fill):
    """out[..., a, b] = g[..., a + s0, b + s1]; out-of-bounds -> fill.
    Static pad + slice — XLA lowers to contiguous copies, no gather."""
    A, B = g.shape[-2:]
    p0, q0 = max(0, -s0), max(0, -s1)
    pads = [(0, 0)] * (g.ndim - 2) + [
        (p0, max(0, s0)),
        (q0, max(0, s1)),
    ]
    padded = jnp.pad(g, pads, constant_values=fill)
    i0, j0 = s0 + p0, s1 + q0
    return padded[..., i0 : i0 + A, j0 : j0 + B]


def _broadcast_parent(wp, parent_vg, fill, dtype):
    """Polyphase parent->child value broadcast: per residue class
    (a % m, b % m) apply its gather-free GridPlan to the parent value
    grid, then interleave classes by stack+transpose+reshape (pure
    layout ops). Classes absent from the plan (no occupied cells) read
    as fill; tap_valid masking + fixups make that exact
    (tests/test_lattice.py::test_wave_plans_dense_taps)."""
    A, B = wp.shape
    m = wp.m
    Imax, Jmax = -(-A // m), -(-B // m)
    lead = parent_vg.shape[:-2]  # () packed, (C,) per-channel grids

    def one_class(plan):
        ap = lambda a: apply_plan(plan, a, jnp, fill=fill)
        out = jax.vmap(ap)(parent_vg) if lead else ap(parent_vg)
        oi, oj = plan.out_shape
        if (oi, oj) != (Imax, Jmax):
            out = jnp.pad(
                out,
                [(0, 0)] * len(lead)
                + [(0, Imax - oi), (0, Jmax - oj)],
                constant_values=fill,
            )
        return out

    by_class = {
        (r1, r2): one_class(plan) for r1, r2, plan in wp.classes
    }
    blank = None
    outs = []
    for r1 in range(m):
        for r2 in range(m):
            o = by_class.get((r1, r2))
            if o is None:
                if blank is None:
                    blank = jnp.full(
                        lead + (Imax, Jmax), fill, dtype=dtype
                    )
                o = blank
            outs.append(o)
    nd = len(lead)
    pv = (
        jnp.stack(outs)
        .reshape((m, m) + lead + (Imax, Jmax))
        .transpose(
            tuple(range(2, 2 + nd)) + (2 + nd, 0, 3 + nd, 1)
        )
        .reshape(lead + (Imax * m, Jmax * m))[..., :A, :B]
    )
    return pv


class _WaveDev:
    """Device-resident constants for one decode wave (packed rows)."""

    def __init__(self, wp, nl: int, n_slots: int):
        put = jax.device_put
        A, B = wp.shape
        pidx = np.nonzero(wp.active.reshape(-1))[0]
        kw = int(pidx.shape[0])
        rows = -(-kw // nl)  # 0 for empty waves
        self.wp = wp
        self.shape = (A, B)
        self.cells = A * B
        self.kw = kw
        self.rows = rows
        self.kind = wp.kind
        self.group = wp.group
        self.fbkt = wp.fbkt
        self.tap_shift = [
            (int(wp.tap_shift[k, 0]), int(wp.tap_shift[k, 1]))
            for k in range(6)
        ]
        # raster rank within the wave IS the packed lane order
        # (schedule cell_pos is raster-sorted; grid_row_lane packs by
        # rank) — pack/unpack are these static index arrays
        self.pack_idx = put(pidx.astype(np.int32))
        act = np.zeros(max(rows, 1) * nl, dtype=bool)
        act[:kw] = True
        self.active_rows = put(act[: rows * nl].reshape(rows, nl))
        tv = wp.tap_valid.reshape(6, A * B).T[pidx]  # [kw, 6]
        self.tap_valid = put(tv)
        slot = wp.slot_grid.reshape(-1)[pidx]
        assert (slot >= 0).all()
        self.wslot = put(slot.astype(np.int32))
        # fixups split per tap direction (static index arrays, in GRID
        # coordinates — applied to tap planes before packing)
        self.fix = []
        for k in range(6):
            sel = wp.fix_tap == k
            if sel.any():
                self.fix.append(
                    (
                        k,
                        put(wp.fix_tgt[sel].astype(np.int32)),
                        put(wp.fix_src[sel].astype(np.int32)),
                    )
                )


def build_grid_decode(prog, geo, sched, nl: int, C: int):
    """Build the dense decode for a mode="grid" CodecProgram. Returns a
    function with decode_fused's exact signature (the step tensors
    d_coef..d_fbkt are accepted and ignored), so CodecProgram.decode_exec
    drives it unchanged."""
    from ..fractal.lattice import build_wave_plans, get_lattice_grids
    from .pipeline_jax import _PACK_ZERO, _inverse_transform_device, _pack3, _unpack3

    lg = get_lattice_grids(geo.height, geo.width, geo.depth)
    plans = build_wave_plans(geo, lg)
    assert len(plans) == sched.max_wave
    waves: List[_WaveDev] = []
    rows_total = 0
    n_slots = prog.n_slots
    for wp, wsize in zip(plans, sched.wave_sizes.tolist()):
        wd = _WaveDev(wp, nl, n_slots)
        assert wd.kw == wsize
        rows_total += wd.rows
        waves.append(wd)
    assert rows_total == prog.rows

    T, N = geo.num_tiles, geo.nodes_per_tile
    depth = geo.depth
    HW = geo.height * geo.width
    packed = C == 3
    fill = _PACK_ZERO if packed else 0
    gdtype = jnp.uint32 if packed else jnp.int16
    use_pallas = prog.use_pallas
    use_pallas_rans = pallas_rans_enabled(nl)
    iota_ca = jnp.arange(CONTEXT_AMOUNT, dtype=jnp.int32)

    def decode_fused_grid(
        states, stream, wire_bits, offpk, scpk, vparams, wparams,
        qdiv, tid, lap,
        d_coef, d_active, d_nbr, d_lf, d_grp, d_fbkt,
        pix_safe, node_mask, leaf_inb, lut_bits=None, pallas_ok=False,
    ):
        # pallas_ok: static flag from decode_exec — only the UNBATCHED
        # (B=1) call may route through the whole-wave kernel (its
        # manual-DMA stream operand cannot lower under vmap batching)
        use_kernel = use_pallas_rans and pallas_ok
        # --- wire tables (identical to decode_fused / _seg)
        shifts32 = jnp.arange(32, dtype=jnp.uint32)
        off_mask = (
            ((offpk[..., None] >> shifts32) & jnp.uint32(1)) > 0
        ).reshape(C, CONTEXT_AMOUNT, ALPHABET_SIZE)
        zero_hist = jnp.zeros((C, CONTEXT_AMOUNT, ALPHABET_SIZE), jnp.int32)
        bits, _, cdfs_i, _ = finalize_contexts_device(
            zero_hist, lap, bits0=wire_bits, off_mask_in=off_mask,
            scale_idx=scpk,
        )
        if use_kernel:
            from ..ops.pallas_rans import (
                prepare_scan_tables,
                stream_pad_len,
            )

            tabs_p = prepare_scan_tables(cdfs_i, bits)
            Wst = stream.shape[-1]
            need = stream_pad_len(C * nl, Wst)
            stream32 = jnp.pad(
                stream.astype(jnp.int32), (0, max(0, need - Wst))
            )
        else:
            tabs = prepare_compare_tables(cdfs_i, bits)

        x = states
        gptr = jnp.int32(0)
        if packed:
            qpad = jnp.full((n_slots + 1,), _PACK_ZERO, jnp.uint32)
        else:
            qpad = jnp.zeros((C, n_slots + 1), dtype=jnp.int16)

        def scan_wave(wd, buckets, preds, x, gptr):
            """rANS-decode one wave's packed rows; returns the wave's
            packed values [C, kw] and the advanced (x, gptr)."""
            rows, kw = wd.rows, wd.kw
            if rows == 0:
                return jnp.zeros((C, 0), jnp.int32), x, gptr
            pad = rows * nl - kw
            bk = jnp.pad(buckets, ((0, 0), (0, pad))).reshape(
                C, rows, nl
            ).transpose(1, 0, 2)  # [rows, C, NL]

            if use_kernel:
                from ..ops.pallas_rans import decode_scan_wave

                syms, x, gptr = decode_scan_wave(
                    x, gptr, bk, wd.active_rows, stream32, tabs_p
                )
            else:
                def body(carry, xs):
                    x, gptr = carry
                    bk_t, act_t = xs
                    oh = jnp.asarray(
                        bk_t[..., None] == iota_ca, dtype=jnp.bfloat16
                    )
                    sym, x, gptr = decode_step_comparefree(
                        x, gptr, oh, act_t, stream, tabs
                    )
                    return (x, gptr), sym

                (x, gptr), syms = jax.lax.scan(
                    body, (x, gptr), (bk, wd.active_rows)
                )  # syms [rows, C, NL]
            syms = syms.transpose(1, 0, 2).reshape(C, rows * nl)[:, :kw]
            values = J.unpack_signed(syms) + preds  # [C, kw]
            return values, x, gptr

        def to_grid(wd, values, base=None):
            """Scatter packed values onto the wave's dense grid (ONE
            static bulk scatter — outside the scan). base: scatter into
            an existing grid (the DC phase-B merge) instead of fill."""
            if packed:
                flat = (
                    jnp.full((wd.cells,), _PACK_ZERO, jnp.uint32)
                    if base is None
                    else base.reshape(-1)
                )
                return flat.at[wd.pack_idx].set(
                    _pack3(values), unique_indices=True
                ).reshape(wd.shape)
            flat = (
                jnp.zeros((C, wd.cells), jnp.int16)
                if base is None
                else base.reshape(C, -1)
            )
            return flat.at[:, wd.pack_idx].set(
                values.astype(jnp.int16), unique_indices=True
            ).reshape((C,) + wd.shape)

        def taps_from(wd, pv, parent_vg):
            """6 packed tap values from shifts of pv (+fixups from the
            parent grid), masked by tap validity -> [C, kw, 6] i32.
            Shifts/fixups run on the dense grid; ONE static gather
            packs the stacked tap planes to the wave's active cells."""
            taps = []
            fix_by_k = {k: (t, s) for (k, t, s) in wd.fix}
            if parent_vg is not None:
                pflat = (
                    parent_vg.reshape(-1)
                    if packed
                    else parent_vg.reshape(C, -1)
                )
            for k in range(6):
                t = _shift2(pv, *wd.tap_shift[k], fill)
                if k in fix_by_k:
                    tgt, src = fix_by_k[k]
                    if packed:
                        t = t.reshape(-1).at[tgt].set(
                            pflat[src], unique_indices=True
                        ).reshape(wd.shape)
                    else:
                        t = t.reshape(C, -1).at[:, tgt].set(
                            pflat[:, src], unique_indices=True
                        ).reshape((C,) + wd.shape)
                taps.append(t)
            ts = jnp.stack(taps, axis=-1)  # [(C,)A,B,6]
            if packed:
                tsp = ts.reshape(wd.cells, 6)[wd.pack_idx]  # [kw, 6]
                vals = _unpack3(tsp)  # [3, kw, 6]
            else:
                vals = ts.reshape(C, wd.cells, 6)[
                    :, wd.pack_idx
                ].astype(jnp.int32)
            return jnp.where(wd.tap_valid[None], vals, 0)

        def wave_contexts(wd, vals, vparams, wparams):
            vp_row = vparams[:, wd.group].reshape(C, 1, 6)
            wp_row = wparams[:, wd.group].reshape(C, 1, 6)
            buckets, preds = J.contexts_static(vals, vp_row, wp_row, False)
            if wd.fbkt >= 0:
                buckets = jnp.full_like(buckets, wd.fbkt)
            return buckets, preds

        def scatter_coefs(qpad, wd, values):
            if packed:
                return qpad.at[wd.wslot].set(
                    _pack3(values), unique_indices=True
                )
            wval = values.astype(jnp.int16)
            return jax.vmap(
                lambda q, v: q.at[wd.wslot].set(v, unique_indices=True)
            )(qpad, wval)

        # ---- wave 0 (DC phase A: context-free) + wave 1 (phase B) ----
        w0, w1, w2 = waves[0], waves[1], waves[2]
        z = jnp.zeros((C, w0.kw, 6), jnp.int32)
        bk0, pr0 = wave_contexts(w0, z, vparams, wparams)
        v0, x, gptr = scan_wave(w0, bk0, pr0, x, gptr)
        qpad = scatter_coefs(qpad, w0, v0)
        dcA = to_grid(w0, v0)

        vals1 = taps_from(w1, dcA, None)
        bk1, pr1 = wave_contexts(w1, vals1, vparams, wparams)
        v1, x, gptr = scan_wave(w1, bk1, pr1, x, gptr)
        qpad = scatter_coefs(qpad, w1, v1)
        # merge the two disjoint phases into the full DC grid
        dc = to_grid(w1, v1, base=dcA)

        # ---- wave 2 (root-HF: taps = neighbour DC values) ----
        vals2 = taps_from(w2, dc, None)
        bk2, pr2 = wave_contexts(w2, vals2, vparams, wparams)
        v2, x, gptr = scan_wave(w2, bk2, pr2, x, gptr)
        qpad = scatter_coefs(qpad, w2, v2)

        # ---- HF levels: parent broadcast -> shifts -> scan ----
        parent = to_grid(w2, v2)
        for wd in waves[3:]:
            pv = _broadcast_parent(wd.wp, parent, fill, gdtype)
            vals = taps_from(wd, pv, parent)
            bk, pr = wave_contexts(wd, vals, vparams, wparams)
            vv, x, gptr = scan_wave(wd, bk, pr, x, gptr)
            qpad = scatter_coefs(qpad, wd, vv)
            parent = to_grid(wd, vv)

        # ---- inverse lifting + pixel assembly (same as decode_fused) --
        if packed:
            qcoef = _unpack3(qpad[:n_slots]).reshape(C, T, N)
        else:
            qcoef = qpad[:, :n_slots].astype(jnp.int32).reshape(C, T, N)
        if use_pallas:
            from ..ops.pallas_lifting import dequantize_inverse_lift

            qnt = qcoef.transpose(2, 0, 1).reshape(N, C * T)
            nmt = jnp.broadcast_to(
                node_mask.T[:, None, :], (N, C, T)
            ).reshape(N, C * T)
            lmt = jnp.broadcast_to(
                leaf_inb.T[:, None, :], (N, C, T)
            ).reshape(N, C * T)
            leaves = (
                dequantize_inverse_lift(qnt, nmt, lmt, qdiv, depth)
                .reshape(N, C, T)
                .transpose(1, 2, 0)
            )
        else:
            coef = J.dequantize(qcoef, qdiv[None, None, :])
            leaves = J.inverse_lifting(
                coef, depth, node_mask[None], leaf_inb[None]
            )
        out = jnp.zeros((C, HW + 1), dtype=jnp.int32)
        out = out.at[:, pix_safe].set(leaves.reshape(C, -1))
        planes = jnp.clip(out[:, :HW], 0, 255)
        if C == 3:
            planes = _inverse_transform_device(planes, tid)
        return planes.astype(jnp.uint8)

    return decode_fused_grid
