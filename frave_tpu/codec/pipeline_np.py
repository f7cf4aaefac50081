"""End-to-end numpy codec pipeline (host oracle / CPU fallback backend).

Mirrors the stage flow of the reference drivers (encoder.rs:6-49,
decoder.rs:6-42): channel transform -> wavelet lifting -> quantization ->
prediction/contexts -> entropy coding -> container. The JAX backend
(pipeline_jax.py) implements the same math with identical integer
semantics; both are exercised against each other in tests.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..images import (
    ChannelData,
    CompressedImage,
    RasterImage,
    AnsContextTables,
)
from ..entropy.tables import (
    ALPHABET_SIZE,
    CONTEXT_AMOUNT,
    context_from_histogram,
)
from ..fractal.geometry import get_geometry
from ..fractal.schedule import (
    get_schedule,
    get_lane_steps,
    get_stream_perm,
    default_num_lanes,
    rate_adaptive_lanes,
)
from ..modeling import fit_predictors_np
from ..ops.lifting import (
    forward_lifting_np,
    inverse_lifting_np,
    quantize_np,
    dequantize_np,
)
from ..ops.prediction import contexts_np, gather_neighbour_values
from ..ops.rans import StreamDecoder, build_stream, encode_lanes
from ..metrics import get_metrics
from ..utils import pack_signed, unpack_signed
from .options import EncoderOptions, quantization_matrix


def encode_pipeline_np(image: RasterImage, opts: EncoderOptions) -> CompressedImage:
    from .channel_transform import forward as channel_forward

    image, transform = channel_forward(
        image, opts.color_transform, opts.quality.name == "LOSSLESS"
    )
    meta = image.metadata
    geo = get_geometry(meta.height, meta.width)
    sched = get_schedule(meta.height, meta.width, mode=opts.mode)
    C = meta.num_channels

    pixels = image.data.reshape(-1, C).T.astype(np.int64)  # [C, H*W]
    coef = forward_lifting_np(pixels, geo)  # [C, T, N]
    qm = quantization_matrix(opts.quality)
    qcoef = quantize_np(coef, qm, geo)
    qflat = qcoef.reshape(C, -1).astype(np.int64)

    hf = ~sched.sched_lf
    overrides = opts.prediction_overrides(C)
    channel_data: List[ChannelData] = []
    word_grids: List[np.ndarray] = []
    flag_grids: List[np.ndarray] = []
    # phase 1 (per channel): fits, contexts, symbols, entropy tables —
    # everything BEFORE the lane count has to be fixed
    phase1 = []
    est_bits = 0.0
    for ch in range(C):
        # --- learned predictor fit on HF slots (context_modeling.rs:204-213)
        vals_hf = gather_neighbour_values(qflat[ch], sched.sched_nbr[hf])
        target_hf = qflat[ch][sched.sched_coef[hf].astype(np.int64)]
        vparams, wparams = fit_predictors_np(
            vals_hf,
            target_hf,
            sched.sched_group[hf].astype(np.int64),
            np.ones(int(hf.sum()), dtype=bool),
            ngroups=sched.num_fine,
        )
        if overrides is not None:
            # external injection (EncoderOpts.value_prediction_params,
            # encoder.rs:58-64): pin the serialized parameters verbatim
            # (3-row legacy sets expand to the fine ids; rounded to the
            # f16 wire precision they will travel at)
            vp_ovr, wp_ovr, use_w = overrides
            vparams = sched.expand_params(vp_ovr[ch]).astype(
                np.float16
            ).astype(np.float32)
            if use_w:
                wparams = sched.expand_params(wp_ovr[ch]).astype(
                    np.float16
                ).astype(np.float32)

        # --- contexts for every symbol (prediction.rs:224-298), fully parallel
        vals = gather_neighbour_values(qflat[ch], sched.sched_nbr)
        buckets, preds = contexts_np(
            vals, sched.sched_lf, sched.sched_group.astype(np.int64), vparams, wparams
        )
        fb = sched.sched_fbkt.astype(np.int32)
        buckets = np.where(fb >= 0, fb, buckets)
        values = qflat[ch][sched.sched_coef.astype(np.int64)]
        residuals = values - preds.astype(np.int64)
        symbols = pack_signed(residuals)
        if symbols.max(initial=0) >= ALPHABET_SIZE:
            raise AssertionError("residual symbol out of alphabet range")

        # --- per-bucket histograms + context finalization
        contexts = []
        for b in range(CONTEXT_AMOUNT):
            hist = np.bincount(
                symbols[buckets == b].astype(np.int64), minlength=ALPHABET_SIZE
            ).astype(np.uint32)[:ALPHABET_SIZE]
            contexts.append(context_from_histogram(hist, b))

        freqs = np.stack([c.freqs for c in contexts])
        cdfs = np.stack([c.cdf for c in contexts])
        bits = np.asarray([c.max_freq_bits for c in contexts], dtype=np.int32)

        # exact expected code length under the finalized tables — the
        # rate-adaptive lane choice below compares it to per-lane wire
        # overhead (container.py STT block: 2-4 B/lane/channel)
        p = freqs[buckets, symbols].astype(np.float64) / (
            1 << bits[buckets].astype(np.int64)
        )
        est_bits += float(-np.log2(p).sum())
        phase1.append(
            (symbols, buckets, contexts, freqs, cdfs, bits,
             vparams, wparams, residuals)
        )

    nl = opts.num_lanes or rate_adaptive_lanes(
        default_num_lanes(sched.num_symbols), est_bits / 8.0, C
    )

    # phase 2 (per channel): interleaved rANS over the chosen lane grid
    for ch in range(C):
        (symbols, buckets, contexts, freqs, cdfs, bits,
         vparams, wparams, residuals) = phase1[ch]
        if sched.cell_pos is not None:  # grid mode: lanes = packed grid
            from ..fractal.schedule import grid_row_lane

            grow, glane, gR, _ = grid_row_lane(sched, nl)
            states, word_grid, flag_grid = encode_lanes(
                symbols.astype(np.uint32), buckets.astype(np.int32),
                freqs, cdfs, bits, nl,
                slot_flat=grow * nl + glane, num_rows=gR,
            )
        else:
            states, word_grid, flag_grid = encode_lanes(
                symbols.astype(np.uint32), buckets.astype(np.int32),
                freqs, cdfs, bits, nl,
            )
        word_grids.append(word_grid)
        flag_grids.append(flag_grid)

        # observability (replaces prediction.rs:300 ./mse side files and
        # entropy_coding.rs:337-340 bpp prints; see frave_tpu/metrics.py)
        m = get_metrics()
        m.verbose = m.verbose or opts.verbose
        m.record(f"encode/mean_abs_residual_ch{ch}", float(np.abs(residuals).mean()))
        # per-context entropy (prediction.rs:209-218 get_entropy metric)
        for b in range(CONTEXT_AMOUNT):
            hb = np.bincount(
                symbols[buckets == b].astype(np.int64), minlength=1
            ).astype(np.float64)
            tot = hb.sum()
            if tot > 0:
                p = hb[hb > 0] / tot
                m.record(
                    f"encode/context_entropy_ch{ch}_b{b}",
                    float(-(p * np.log2(p)).sum()),
                )
        m.record(
            f"encode/bpp_ch{ch}",
            16.0 * int(flag_grid.sum()) / (meta.height * meta.width),
        )
        if opts.emit_coefficients:
            for b, ctx in enumerate(contexts):
                m.record_array(
                    f"encode/context_hist_ch{ch}_b{b}",
                    np.bincount(
                        symbols[buckets == b].astype(np.int64),
                        minlength=ALPHABET_SIZE,
                    )[:ALPHABET_SIZE],
                )
        channel_data.append(
            ChannelData(
                ans_contexts=[
                    AnsContextTables(
                        max_freq_bits=c.max_freq_bits,
                        off_distribution_values=c.off_distribution_values,
                        freqs=c.freqs,
                        cdf=c.cdf,
                        scale_idx=c.scale_idx,
                    )
                    for c in contexts
                ],
                lane_states=states,
                value_prediction_parameters=vparams,
                width_prediction_parameters=wparams,
            )
        )

    perm = get_stream_perm(meta.height, meta.width, nl, mode=opts.mode, channels=C)
    stream = build_stream(word_grids, flag_grids, perm)
    return CompressedImage(
        metadata=meta,
        channel_data=list(channel_data) + [None] * (3 - C),
        quality=opts.quality.value,
        num_lanes=nl,
        quantization_matrix=np.asarray(qm, dtype=np.uint16),
        mode=opts.mode,
        stream=stream,
        transform=transform,
    )


def decode_pipeline_np(image: CompressedImage) -> RasterImage:
    meta = image.metadata
    geo = get_geometry(meta.height, meta.width)
    sched = get_schedule(meta.height, meta.width, mode=image.mode)
    steps = get_lane_steps(meta.height, meta.width, image.num_lanes, mode=image.mode)
    C = meta.num_channels
    n_slots = geo.num_coef_slots

    qflat = np.zeros((C, n_slots), dtype=np.int64)
    vparams = []
    wparams = []
    from .container import ensure_tables

    all_freqs, all_cdfs, all_bits = [], [], []
    all_states = []
    for ch in range(C):
        cd = image.channel_data[ch]
        ensure_tables(cd.ans_contexts)
        all_freqs.append(np.stack([c.freqs for c in cd.ans_contexts]))
        all_cdfs.append(np.stack([c.cdf for c in cd.ans_contexts]))
        all_bits.append(
            np.asarray([c.max_freq_bits for c in cd.ans_contexts], dtype=np.int32)
        )
        all_states.append(np.asarray(cd.lane_states, dtype=np.uint32))
        # v7 containers carry 3 coarse rows; expand to the fine ids
        vparams.append(sched.expand_params(cd.value_prediction_parameters))
        wparams.append(sched.expand_params(cd.width_prediction_parameters))

    decoder = StreamDecoder(
        np.stack(all_states),
        np.asarray(image.stream, dtype=np.uint16),
        np.stack(all_freqs),
        np.stack(all_cdfs),
        np.stack(all_bits),
    )

    # Level-synchronous wavefront decode (SURVEY.md section 3.2's
    # wavefront made explicit). Context taps only ever reference
    # symbols from EARLIER waves (the schedule's waves are the decode
    # dependency layers in every mode), so neighbour gathers and
    # context math hoist to ONE bulk call per (wave, channel) — the
    # same structure as the jax grid decoder — while the rANS state
    # machine still advances row by row in the global stream's
    # (step, channel, lane) word order (round 4: ~4x fewer numpy calls
    # than the per-step version).
    wave_of = steps.step_wave.astype(np.int64)
    wstart = np.concatenate(
        [[0], np.cumsum(sched.wave_sizes.astype(np.int64))]
    )
    s = 0
    while s < steps.num_steps:
        wv = int(wave_of[s])
        s1 = s
        while s1 < steps.num_steps and int(wave_of[s1]) == wv:
            s1 += 1
        k0, k1 = int(wstart[wv]), int(wstart[wv + 1])
        nbr_w = sched.sched_nbr[k0:k1].astype(np.int64)
        lf_w = sched.sched_lf[k0:k1]
        grp_w = sched.sched_group[k0:k1].astype(np.int64)
        fb_w = sched.sched_fbkt[k0:k1].astype(np.int64)
        coef_w = sched.sched_coef[k0:k1].astype(np.int64)
        bks, prs = [], []
        for ch in range(C):
            vals = gather_neighbour_values(qflat[ch], nbr_w)
            buckets, preds = contexts_np(
                vals, lf_w, grp_w, vparams[ch], wparams[ch]
            )
            bks.append(np.where(fb_w >= 0, fb_w, buckets.astype(np.int64)))
            prs.append(preds.astype(np.int64))
        for srow in range(s, s1):
            slots = steps.step_slot[srow].astype(np.int64)  # [NL] k | -1
            active = slots >= 0
            ks = np.where(active, slots - k0, 0)
            for ch in range(C):
                bk = np.where(active, bks[ch][ks], -1)
                syms = decoder.decode_step(ch, bk)
                values = unpack_signed(syms) + prs[ch][ks]
                qflat[ch][coef_w[ks[active]]] = values[active]
        s = s1

    qcoef = qflat.reshape(C, geo.num_tiles, geo.nodes_per_tile)
    qm = np.asarray(image.quantization_matrix, dtype=np.int32)
    coef = dequantize_np(qcoef, qm, geo)
    pixels = inverse_lifting_np(coef, geo)  # [C, H*W] uint8
    data = pixels.T.reshape(meta.height, meta.width, C)
    from .channel_transform import inverse as channel_inverse

    return channel_inverse(
        RasterImage(metadata=meta, data=data), image.transform
    )
