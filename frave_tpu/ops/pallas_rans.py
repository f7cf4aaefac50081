"""ARCHIVED EXPERIMENT (round 5): Pallas TPU kernel running the whole
rANS decode scan of one wave in ONE kernel launch (round 3).

Status — measured loser, kept as a documented negative result (VERDICT
r4 #8 resolution): the hardware A/B (BASELINE.md round 4) has the XLA
scan at 8.92 MP/s vs this kernel's 7.12 at the widths the kernel
compiles at, and it does not practically compile at the production
16384-lane width (>30 min remote Mosaic, twice, plus VMEM stack OOMs).
Round 5 removed the kernel's remaining encode-side targets too: stream
compaction is a per-row u32 sort + offset scan and the histogram rides
MXU one-hots, so no production path waits on a Pallas champion. The
kernel stays importable for its 4 hardware smoke tests
(FRAVE_TEST_TPU=1 tests/test_pallas_rans.py) and as the worked example
of this jax/Mosaic build's miscompile hazards (bf16 dot_general
rounding, negative traced rolls, sublane+lane reshape rejection —
documented inline below); the FRAVE_GRID_PALLAS=1 wiring in
codec/grid_decode.py is an experiment flag, not a production path.

The XLA decode scan (grid mode, ops/rans_jax.decode_step_comparefree)
costs ~0.5 ms per row at [3, 16384] lanes on the target chip — not from
gathers (there are none) but from materializing the per-row one-hot
selection tensors in HBM (~47 MB/row: the [C, NL, CA, 32] window
selector alone) plus per-step loop machinery. Measured isolation
(benchmarks/grid_cost_probe.py): scan floor 0.322 s of a 1.13 s
2048x2048 RGB decode.

This kernel keeps EVERYTHING on-chip:

  * lane states x [C, NL] live in VMEM scratch across all rows (the
    TPU grid is sequential — one program per row — with Pallas
    double-buffering the HBM block reads of buckets/activity and the
    block writes of symbols);
  * the per-symbol (sym, freq, cdf) resolution is the same compare-
    staircase math as decode_step_comparefree, but the one-hot
    selector chunks never leave VMEM and the contractions run in f32
    on the MXU (exact: one-hot rows, staircase values <= 2^14);
  * renorm words are DMA'd from the HBM stream once per row at a
    1024-aligned dynamic offset (Mosaic's i32 slice-tiling contract,
    verified on-device) and routed to needing lanes per 512-lane
    block: the prefix rank is monotone, so each block reads one
    dynamically ROLLED contiguous window (pltpu.roll takes traced
    shifts) and routes within the block by a one-hot matmul.

Mosaic constraints honoured (probed on the target chip): no u16/u32
casts (the stream travels as i32; f32 results convert via i32 and
bitcast), no lax.dynamic_slice on values (dynamic roll instead), DMA
slices 1024-aligned in offset and length.

Same wire semantics as the XLA step (differentially tested,
tests/test_pallas_rans.py): symbols = count of cdf entries <= slot
minus one (duplicate-cdf ties resolve to the last symbol,
entropy_coding.rs:246-255), one u16 word per renorming lane in
channel-major lane-minor order (schedule.build_stream_perm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..entropy.tables import CONTEXT_AMOUNT

W32 = 32  # coarse/fine split of the 1024-symbol alphabet
RANS_L = 1 << 16
WORD_BITS = 16

CHUNK = 256  # lane-chunk of the fine-window one-hot matmul (sized so
# the unrolled chunks' [CHUNK, CA*32] one-hot temporaries fit Mosaic's
# 16MB VMEM stack — the allocator keeps several unrolled regions live
# at once; 1024 OOM'd at C=3, NL=2048: 18.97M > 16M, probed on-device)
RBLK = 512  # renorm word-routing block
ALIGN = 1024  # DMA offset/length tiling for i32 HBM slices


def kernel_supported(nl: int) -> bool:
    return nl % 128 == 0 and nl >= 128


def _win_len(cnl: int) -> int:
    return -(-(cnl + ALIGN + RBLK) // ALIGN) * ALIGN


def stream_pad_len(cnl: int, total_words: int) -> int:
    """Minimum i32 stream buffer length for decode_scan_wave: covers the
    final row's aligned DMA window."""
    need = total_words + _win_len(cnl)
    return -(-need // ALIGN) * ALIGN


def prepare_scan_tables(cdfs, scale_bits):
    """Device tables for the kernel: coarse [C, CA, 128] f32 (entry
    j < 33 = cdf[32j], entry 32 = 2**bits sentinel, zero-padded to a
    full lane tile), fine [C, CA*32, 128] f32 (window j's 33
    overlapping entries; entry 1024 = sentinel), bits [C, CA] i32.
    f32 holds every staircase value exactly (<= 2^14)."""
    c_i = cdfs.astype(jnp.int32)
    C, ca = c_i.shape[0], c_i.shape[1]
    sent = (jnp.int32(1) << scale_bits.astype(jnp.int32))[..., None]
    coarse = jnp.concatenate([c_i[..., ::W32], sent], axis=-1)
    ext = jnp.concatenate([c_i, sent], axis=-1)  # [C, CA, 1025]
    fine = jnp.stack(
        [ext[..., W32 * j : W32 * j + W32 + 1] for j in range(W32)],
        axis=-2,
    )  # [C, CA, 32, 33]
    pad = 128 - (W32 + 1)
    coarse = jnp.pad(coarse, ((0, 0), (0, 0), (0, pad)))
    fine = jnp.pad(
        fine.reshape(C, ca * W32, W32 + 1), ((0, 0), (0, 0), (0, pad))
    )
    return {
        "coarse": coarse.astype(jnp.float32),
        "fine": fine.astype(jnp.float32),
        "bits": scale_bits.astype(jnp.int32),
    }


def _cumsum_lanes(v):
    """Inclusive prefix sum along the lane axis of [rows, W] i32 —
    log-shift doubling (Mosaic has no cumsum primitive)."""
    rows, Wd = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, Wd), 1)
    k = 1
    while k < Wd:
        sh = pltpu.roll(v, k, 1)
        v = v + jnp.where(lane >= k, sh, 0)
        k *= 2
    return v


def _u32(v_i32):
    return pltpu.bitcast(v_i32, jnp.uint32)


def _i32(v_u32):
    return pltpu.bitcast(v_u32, jnp.int32)


def _decode_kernel(
    x0_ref,  # [C, NL] u32 (full)
    gp0_ref,  # [1, 1] i32 (SMEM)
    bk_ref,  # [1, C, NL] i32 row block
    act_ref,  # [1, 1, NL] i32 row block (0/1)
    stream_ref,  # [W] i32 (ANY/HBM — aligned manual DMA; words < 2^16)
    coarse_ref,  # [C, CA, 128] f32
    fine_ref,  # [C, CA*32, 128] f32
    bits_ref,  # [C, CA] i32
    sym_ref,  # [1, C, NL] i32 row block (out)
    xout_ref,  # [C, NL] u32 (out)
    gpout_ref,  # [1, 1] i32 (SMEM out)
    x_s,  # [C, NL] u32 scratch (lane states, live across rows)
    xn_s,  # [C, NL] u32 scratch (post-step states before renorm)
    gp_s,  # [1] i32 SMEM scratch
    win_s,  # [WIN] i32 stream-window scratch
    sem,
    *,
    C: int,
    NL: int,
):
    r = pl.program_id(0)
    R = pl.num_programs(0)
    ca = CONTEXT_AMOUNT
    cnl = C * NL
    chunk = min(CHUNK, NL)
    # renorm block: largest divisor of NL that is <= RBLK (NL is a
    # power of two >= 128, so rblk = min(RBLK, NL)); blocks are static
    # per-row lane slices
    rblk = min(RBLK, NL)
    win = _win_len(cnl)
    # HOST-SIDE (trace-time) guard for the renorm roll below (ADVICE
    # r4): the positive right-roll `win - shift` is only correct while
    # shift = off + base < win, i.e. off_max + cnl < win (off < ALIGN,
    # base <= cnl). A future _win_len change that violates this would
    # reproduce the silent negative-roll miscompile; fail the build
    # loudly instead.
    assert (ALIGN - 1) + cnl < win, (
        f"renorm window too small: off_max+cnl={ALIGN - 1 + cnl} >= "
        f"win={win} — pltpu.roll shift could exceed the window"
    )

    @pl.when(r == 0)
    def _():
        x_s[:] = x0_ref[:]
        gp_s[0] = gp0_ref[0, 0]

    gptr = gp_s[0]
    base = pl.multiple_of((gptr // ALIGN) * ALIGN, ALIGN)
    dma = pltpu.make_async_copy(
        stream_ref.at[pl.ds(base, win)], win_s, sem
    )
    dma.start()
    off = gptr - base  # < ALIGN

    x = x_s[:]  # [C, NL] u32
    bk = bk_ref[0]  # [C, NL] i32
    act = act_ref[0, 0]  # [NL] i32

    # --- per-lane scale bits: masked select over the CA buckets (VPU)
    bi = jnp.zeros((C, NL), jnp.int32)
    for b in range(ca):
        bi = jnp.where(bk == b, bits_ref[:, b][:, None], bi)
    bi_u = _u32(bi)
    slot = _i32(x & ((jnp.uint32(1) << bi_u) - jnp.uint32(1)))  # < 2^14

    for c in range(C):
        # --- coarse stage: one-hot(bucket) @ coarse staircase (MXU)
        bk_c = bk[c].reshape(NL, 1)
        ohb = (
            bk_c == jax.lax.broadcasted_iota(jnp.int32, (NL, ca), 1)
        ).astype(jnp.float32)
        cw = jax.lax.dot_general(
            ohb, coarse_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )[:, : W32 + 1].astype(jnp.int32)  # [NL, 33]
        slot_c = slot[c].reshape(NL, 1)
        le_c = cw <= slot_c
        sym_hi = jnp.clip(
            jnp.sum(le_c.astype(jnp.int32), axis=1, keepdims=True) - 1,
            0,
            W32 - 1,
        )  # [NL, 1]
        nxt_c = jnp.min(
            jnp.where(le_c, jnp.int32(1 << 30), cw), axis=1, keepdims=True
        )  # [NL, 1]

        combo = bk_c * W32 + sym_hi  # [NL, 1] in [0, CA*32)
        for k0 in range(0, NL, chunk):
            # --- fine stage: one-hot(bucket, window) @ fine windows
            cb = combo[k0 : k0 + chunk]  # [chunk, 1]
            ohw = (
                cb
                == jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, ca * W32), 1
                )
            ).astype(jnp.float32)
            fw = jax.lax.dot_general(
                ohw, fine_ref[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )[:, : W32 + 1].astype(jnp.int32)  # [chunk, 33]
            sl = slot_c[k0 : k0 + chunk]
            le = fw <= sl
            lo = jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True) - 1
            cd = jnp.max(jnp.where(le, fw, 0), axis=1, keepdims=True)
            nx = jnp.min(
                jnp.where(le, jnp.int32(1 << 30), fw),
                axis=1,
                keepdims=True,
            )
            nx = jnp.minimum(
                jnp.minimum(nx, nxt_c[k0 : k0 + chunk]),
                jnp.int32(1 << 14),
            )
            freq = _u32(nx - cd)
            sym_ref[0, c, k0 : k0 + chunk] = (
                sym_hi[k0 : k0 + chunk] * W32 + lo
            ).reshape(chunk)
            xc = x[c, k0 : k0 + chunk]
            xn_s[c, k0 : k0 + chunk] = (
                freq.reshape(chunk)
                * (xc >> bi_u[c, k0 : k0 + chunk])
                + _u32(sl - cd).reshape(chunk)
            )

    # --- renorm: global rank among needing lanes; words routed per
    # (row, block) from dynamically rolled windows (rank is monotone,
    # so each block's words are contiguous). Blocks are STATIC slices
    # of the [C, NL] mask — a (C, NL) -> (nblk, rblk) reshape merges
    # sublane+lane dims, which Mosaic's layout inference rejects at
    # production widths ((3,16384)->(96,512) "unsupported shape cast",
    # probed on-device round 4; the small test shapes never hit it).
    x_new = xn_s[:]
    act2 = jnp.broadcast_to((act > 0).reshape(1, NL), (C, NL))
    need = act2 & (x_new < jnp.uint32(RANS_L))
    row_cum = _cumsum_lanes(need.astype(jnp.int32))  # [C, NL] per-row
    dma.wait()
    win2 = win_s[:].reshape(1, win)
    jblk = NL // rblk
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rblk, rblk), 1)
    rows_out = []
    base_c = jnp.zeros((1, 1), jnp.int32)  # needing lanes before row c
    for c in range(C):
        row = row_cum[c : c + 1]  # [1, NL] inclusive within-row prefix
        cols = []
        for j in range(jblk):
            seg = row[:, j * rblk : (j + 1) * rblk]  # [1, rblk]
            pre = (
                row[:, j * rblk - 1 : j * rblk]
                if j
                else jnp.zeros((1, 1), jnp.int32)
            )
            base = base_c + pre  # global exclusive base of this block
            lpos = jnp.clip(seg - pre - 1, 0, rblk - 1)
            shift = off + base[0, 0]
            # roll LEFT by shift, expressed as a positive right-roll:
            # pltpu.roll with a traced NEGATIVE shift is miscompiled on
            # this jax/Mosaic build (off by 2048 lanes — probed
            # on-device, round 4); positive traced shifts are correct.
            # shift < win always (off < ALIGN, base <= cnl,
            # win >= cnl + ALIGN + RBLK).
            wblk = pltpu.roll(win2, win - shift, 1)[:, :rblk].astype(
                jnp.float32
            )
            ohp = (lpos.reshape(rblk, 1) == iota_r).astype(jnp.float32)
            wcol = jax.lax.dot_general(
                ohp, wblk.reshape(rblk, 1), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [rblk, 1]
            cols.append(wcol.astype(jnp.int32).reshape(1, rblk))
        rows_out.append(jnp.concatenate(cols, axis=1))  # [1, NL]
        base_c = base_c + row[:, NL - 1 : NL]
    wv = _u32(jnp.concatenate(rows_out, axis=0))  # [C, NL]
    x_new = jnp.where(need, (x_new << jnp.uint32(WORD_BITS)) | wv, x_new)
    x_s[:] = jnp.where(act2, x_new, x)
    gp_s[0] = gptr + base_c[0, 0]

    @pl.when(r == R - 1)
    def _():
        xout_ref[:] = x_s[:]
        gpout_ref[0, 0] = gp_s[0]


def decode_scan_wave(x, gptr, buckets, active, stream_i32, tabs,
                     interpret=False):
    """Run one wave's rANS decode rows in a single Pallas kernel.

    x [C, NL] u32; gptr scalar i32; buckets [R, C, NL] i32;
    active [R, NL] bool; stream_i32 [W] i32 word stream (each value a
    u16 word), zero-padded to >= stream_pad_len(C*NL, total_words) and
    W % 1024 == 0; tabs from prepare_scan_tables. Returns
    (syms [R, C, NL] i32, x' [C, NL] u32, gptr' scalar i32)."""
    R, C, NL = buckets.shape
    cnl = C * NL
    gp0 = jnp.asarray(gptr, jnp.int32).reshape(1, 1)
    act_i = active.astype(jnp.int32).reshape(R, 1, NL)

    kern = functools.partial(_decode_kernel, C=C, NL=NL)
    ca = CONTEXT_AMOUNT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((C, NL), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, C, NL), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, NL), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (C, ca, 128), lambda r: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, ca * W32, 128),
                lambda r: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, ca), lambda r: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, C, NL), lambda r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((C, NL), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, NL), jnp.uint32),
            pltpu.VMEM((C, NL), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((_win_len(cnl),), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    syms, x_out, gp_out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R, C, NL), jnp.int32),
            jax.ShapeDtypeStruct((C, NL), jnp.uint32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        x.astype(jnp.uint32),
        gp0,
        buckets.astype(jnp.int32),
        act_i,
        stream_i32,
        tabs["coarse"],
        tabs["fine"],
        tabs["bits"],
    )
    return syms, x_out, gp_out[0, 0]
