"""JAX/XLA codec pipeline — the TPU compute path.

Stage flow mirrors the reference drivers (encoder.rs:6-49, decoder.rs:6-42)
but is organized around XLA's compilation model (SURVEY.md section 7):

  * Geometry + wavefront schedule are host-precomputed index tensors
    (frave_tpu/fractal/) baked into a per-(h, w, depth, lanes, channels)
    `CodecProgram` whose jitted stages are compiled once and cached.
  * `encode_analyze` is ONE fused device program: leaf gather -> lifting ->
    quantization -> Gram-matrix predictor fit (Cholesky solve of the 6x6
    normal equations on device — the TPU-native replacement of the
    reference's dense lstsq, context_modeling.rs:168,185) -> contexts ->
    zig-zag symbols -> per-bucket histograms (scatter-add segment sum).
  * Context tables are finalized on host (tiny integer loops with exact
    reference semantics, frave_tpu/entropy/tables.py) — they are wire
    metadata, not bulk compute.
  * `encode_entropy` runs the vectorized reverse-scan rANS over all lanes;
    the host compacts flagged words into per-lane streams for the mux.
  * `decode_scan` is a single lax.scan over wavefront steps: every step
    gathers causal neighbours, recomputes contexts (identical f32 op
    sequence as encode — the self-consistency contract of
    entropy_coding.rs:205-264), advances all rANS lanes of all channels
    once, and scatters decoded coefficients.

Numerical notes: the predictor fit uses f32 Gram matrices on device (the
numpy oracle uses f64 + SVD lstsq) — fitted parameters differ slightly
between backends, which only shifts bitstream size, never correctness:
the exact f32 parameters used travel in the container (serialize.rs:78-92
analog) and both decoders consume them identically.
"""

from __future__ import annotations

import dataclasses
import threading
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..images import (
    AnsContextTables,
    ChannelData,
    CompressedImage,
    RasterImage,
)
from ..entropy.tables import ALPHABET_SIZE, CONTEXT_AMOUNT, context_from_histogram
from ..fractal.geometry import get_geometry
from ..fractal.schedule import default_num_lanes, get_lane_steps, get_schedule
from ..ops import jax_ops as J
from ..ops.rans_jax import (
    LUT_BITS,
    RANS_L,
    build_decode_lut,
    decode_step_symbols,
    encode_scan,
)
from .options import EncoderOptions, quantization_matrix


def _next_pow2(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def _gram_solve(G: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Regularized Cholesky solve of batched 6x6 normal equations."""
    tr = jnp.trace(G, axis1=-2, axis2=-1)
    eps = tr * 1e-6 / 6.0 + 1e-12
    Greg = G + eps[..., None, None] * jnp.eye(G.shape[-1], dtype=G.dtype)
    L = jnp.linalg.cholesky(Greg)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


@dataclasses.dataclass
class CodecProgram:
    """Compiled codec for one (height, width, depth, num_lanes, channels)."""

    height: int
    width: int
    depth: int
    nl: int
    channels: int
    num_tiles: int
    num_symbols: int
    num_steps: int
    rows: int  # R = ceil(K / NL)
    n_slots: int

    # jitted entry points (built in build_program)
    encode_analyze: callable = None
    encode_entropy: callable = None
    decode_scan: callable = None


_program_cache: Dict[Tuple[int, int, int, int, int], CodecProgram] = {}
_cache_lock = threading.Lock()


def build_program(
    height: int, width: int, depth: int, nl: int, channels: int
) -> CodecProgram:
    geo = get_geometry(height, width, depth)
    sched = get_schedule(height, width, depth)
    steps = get_lane_steps(height, width, nl, depth)

    T, N = geo.num_tiles, geo.nodes_per_tile
    n_slots = T * N
    K = sched.num_symbols
    R = -(-K // nl)
    S = steps.num_steps
    C = channels
    HW = height * width

    # ---- device constants (embedded in the jitted programs) ----
    pg = geo.pixel_gather.astype(np.int32)  # [T, N], -1 OOB
    pix_safe = np.where(pg >= 0, pg, HW).astype(np.int32)  # pad pixel slot
    leaf_mask = pg >= 0
    leaf_safe = np.where(leaf_mask, pg, 0).astype(np.int32)

    sc = sched.sched_coef.astype(np.int32)  # [K]
    snbr = sched.sched_nbr.astype(np.int32)  # [K, 6]
    snbr_safe = np.where(snbr >= 0, snbr, n_slots).astype(np.int32)
    slf = sched.sched_lf.astype(bool)
    sgrp = sched.sched_group.astype(np.int32)

    st_coef = steps.step_coef.astype(np.int32)  # [S, NL]
    st_active = st_coef >= 0
    st_coef_safe = np.where(st_active, st_coef, n_slots).astype(np.int32)
    st_nbr = steps.step_nbr.astype(np.int32)
    st_nbr_safe = np.where(st_nbr >= 0, st_nbr, n_slots).astype(np.int32)
    st_lf = steps.step_lf.astype(bool)
    st_grp = steps.step_group.astype(np.int32)

    prog = CodecProgram(
        height=height,
        width=width,
        depth=depth,
        nl=nl,
        channels=C,
        num_tiles=T,
        num_symbols=K,
        num_steps=S,
        rows=R,
        n_slots=n_slots,
    )

    # ---------------- encode_analyze ----------------
    @jax.jit
    def encode_analyze(pixels: jnp.ndarray, qdiv: jnp.ndarray):
        """pixels [C, H*W] int32, qdiv [N] int32 ->
        (qflat [C, n_slots] i32, vparams [C,3,6] f32, wparams [C,3,6] f32,
         symbols [C, K] i32, buckets [C, K] i32, hist [C, 10, 1024] i32)."""
        leaves = jnp.where(
            jnp.asarray(leaf_mask)[None], pixels[:, jnp.asarray(leaf_safe)], 0
        ).astype(jnp.int32)  # [C, T, N]
        coef = J.forward_lifting(leaves, jnp.asarray(leaf_mask)[None], depth)
        qcoef = J.quantize(coef, qdiv[None, None, :])
        qflat = qcoef.reshape(C, n_slots)
        qpad = jnp.concatenate(
            [qflat, jnp.zeros((C, 1), dtype=jnp.int32)], axis=1
        )  # [C, n_slots + 1]

        vals = qpad[:, jnp.asarray(snbr_safe)]  # [C, K, 6]
        target = qpad[:, jnp.asarray(sc)]  # [C, K]
        lf = jnp.asarray(slf)
        grp = jnp.asarray(sgrp)
        hf = ~lf

        # --- value-predictor fit: per-group f32 Gram + Cholesky solve
        Xf = vals.astype(jnp.float32)
        yf = target.astype(jnp.float32)
        gmask = jnp.stack(
            [(hf & (grp == g)).astype(jnp.float32) for g in range(3)]
        )  # [3, K]
        Xg = Xf[:, None, :, :] * gmask[None, :, :, None]  # [C, 3, K, 6]
        G = jnp.einsum("cgkx,cky->cgxy", Xg, Xf)  # [C, 3, 6, 6]
        bv = jnp.einsum("cgkx,ck->cgx", Xg, yf)  # [C, 3, 6]
        vparams = _gram_solve(G, bv)  # [C, 3, 6]

        # --- width-predictor fit: |residual| on [1, 5 gradient features]
        vp_by_k = vparams[:, grp, :]  # [C, K, 6]
        pred = jnp.sum(Xf * vp_by_k, axis=-1)  # f32 reduction; fit-only
        r = jnp.abs(yf - pred)
        ones = jnp.ones_like(yf)
        F = jnp.stack(
            [
                ones,
                jnp.abs(Xf[..., 0] - Xf[..., 3]),
                jnp.abs(Xf[..., 1] - Xf[..., 2]),
                jnp.abs(Xf[..., 4] - Xf[..., 5]),
                jnp.abs(Xf[..., 1] - Xf[..., 5]),
                jnp.abs(Xf[..., 2] - Xf[..., 4]),
            ],
            axis=-1,
        )  # [C, K, 6]
        Fg = F[:, None, :, :] * gmask[None, :, :, None]
        Gw = jnp.einsum("cgkx,cky->cgxy", Fg, F)
        bw = jnp.einsum("cgkx,ck->cgx", Fg, r)
        wparams = _gram_solve(Gw, bw)

        # --- contexts + symbols (parallel over all K on encode)
        buckets, preds = jax.vmap(
            lambda v, vp, wp: J.contexts(v, lf, grp, vp, wp)
        )(vals, vparams, wparams)
        residuals = target - preds
        symbols = J.pack_signed(residuals)  # [C, K] int32

        ids = (
            jnp.arange(C, dtype=jnp.int32)[:, None] * (CONTEXT_AMOUNT * ALPHABET_SIZE)
            + buckets * ALPHABET_SIZE
            + jnp.clip(symbols, 0, ALPHABET_SIZE - 1)
        )
        hist = (
            jnp.zeros(C * CONTEXT_AMOUNT * ALPHABET_SIZE, dtype=jnp.int32)
            .at[ids.reshape(-1)]
            .add(1)
            .reshape(C, CONTEXT_AMOUNT, ALPHABET_SIZE)
        )
        return qflat, vparams, wparams, symbols, buckets, hist

    # ---------------- encode_entropy ----------------
    @jax.jit
    def encode_entropy(
        symbols: jnp.ndarray,  # [C, K] int32
        buckets: jnp.ndarray,  # [C, K] int32
        freqs: jnp.ndarray,  # [C, 10, 1024] uint32
        cdfs: jnp.ndarray,  # [C, 10, 1024] uint32
        bits: jnp.ndarray,  # [C, 10] int32
    ):
        pad = R * nl - K
        def grid(a, fill):
            a = jnp.concatenate(
                [a, jnp.full((C, pad), fill, dtype=a.dtype)], axis=1
            )
            return a.reshape(C, R, nl).transpose(1, 0, 2)  # [R, C, NL]

        sym_g = grid(symbols, 0)
        bkt_g = grid(buckets, 0)
        val_g = grid(jnp.ones((C, K), dtype=jnp.bool_), False)
        states, words, flags = encode_scan(sym_g, bkt_g, val_g, freqs, cdfs, bits)
        return states, words, flags  # [C, NL], [R, C, NL] u16, [R, C, NL] bool

    # ---------------- decode_scan ----------------
    d_coef = jnp.asarray(st_coef_safe)
    d_active = jnp.asarray(st_active)
    d_nbr = jnp.asarray(st_nbr_safe)
    d_lf = jnp.asarray(st_lf)
    d_grp = jnp.asarray(st_grp)

    @jax.jit
    def decode_scan(
        states: jnp.ndarray,  # [C, NL] uint32
        words: jnp.ndarray,  # [C, NL, W] uint16
        lut: jnp.ndarray,  # [C, 10, 2**LUT_BITS] int16
        freqs: jnp.ndarray,  # [C, 10, 1024] uint32
        cdfs: jnp.ndarray,  # [C, 10, 1024] uint32
        bits: jnp.ndarray,  # [C, 10] int32
        vparams: jnp.ndarray,  # [C, 3, 6] f32
        wparams: jnp.ndarray,  # [C, 3, 6] f32
        qdiv: jnp.ndarray,  # [N] int32
    ):
        qpad0 = jnp.zeros((C, n_slots + 1), dtype=jnp.int32)
        ptr0 = jnp.zeros((C, nl), dtype=jnp.int32)

        def body(carry, xs):
            qpad, x, ptr = carry
            coef_safe, active, nbr_safe, lf, grp = xs
            vals = qpad[:, nbr_safe]  # [C, NL, 6]
            buckets, preds = jax.vmap(
                lambda v, vp, wp: J.contexts(v, lf, grp, vp, wp)
            )(vals, vparams, wparams)
            act = jnp.broadcast_to(active[None], (C, nl))
            sym, x, ptr = decode_step_symbols(
                x, ptr, buckets, act, words, lut, freqs, cdfs, bits
            )
            values = J.unpack_signed(sym) + preds
            wslot = jnp.where(act, coef_safe[None], n_slots)
            wval = jnp.where(act, values, 0)
            qpad = jax.vmap(lambda q, s, v: q.at[s].set(v))(qpad, wslot, wval)
            return (qpad, x, ptr), None

        (qpad, _, _), _ = jax.lax.scan(
            body, (qpad0, states, ptr0), (d_coef, d_active, d_nbr, d_lf, d_grp)
        )
        qflat = qpad[:, :n_slots]

        # dequant + inverse lifting + pixel scatter
        qcoef = qflat.reshape(C, T, N)
        qdiv_full = qdiv[None, None, :]
        coef = J.dequantize(qcoef, qdiv_full)
        leaves = J.inverse_lifting(coef, depth)  # [C, T, N]
        out = jnp.zeros((C, HW + 1), dtype=jnp.int32)
        out = out.at[:, jnp.asarray(pix_safe).reshape(-1)].set(
            leaves.reshape(C, -1)
        )
        pixels = jnp.clip(out[:, :HW], 0, 255).astype(jnp.uint8)
        return pixels

    prog.encode_analyze = encode_analyze
    prog.encode_entropy = encode_entropy
    prog.decode_scan = decode_scan
    return prog


def get_program(height: int, width: int, depth: int, nl: int, channels: int) -> CodecProgram:
    key = (height, width, depth, nl, channels)
    with _cache_lock:
        p = _program_cache.get(key)
    if p is None:
        p = build_program(height, width, depth, nl, channels)
        with _cache_lock:
            _program_cache[key] = p
    return p


def _compact_words(
    words: np.ndarray, flags: np.ndarray
) -> List[List[np.ndarray]]:
    """[R, C, NL] u16 + bool -> per-channel list of per-lane streams in
    decode order (increasing r of flagged rows)."""
    R, C, NL = flags.shape
    out: List[List[np.ndarray]] = []
    for c in range(C):
        lanes = []
        f = flags[:, c, :]
        w = words[:, c, :]
        for l in range(NL):
            lanes.append(w[f[:, l], l].astype(np.uint16))
        out.append(lanes)
    return out


def encode_pipeline_jax(image: RasterImage, opts: EncoderOptions) -> CompressedImage:
    from ..fractal.geometry import BASE_FRAC_DEPTH

    meta = image.metadata
    C = meta.num_channels
    sched = get_schedule(meta.height, meta.width)
    nl = opts.num_lanes or default_num_lanes(sched.num_symbols)
    prog = get_program(meta.height, meta.width, BASE_FRAC_DEPTH, nl, C)

    pixels = jnp.asarray(
        image.data.reshape(-1, C).T.astype(np.int32)
    )  # [C, H*W]
    qm = quantization_matrix(opts.quality)
    qdiv = jnp.asarray(
        np.asarray(qm, dtype=np.int32)[
            np.floor(
                np.log2(np.arange(prog.n_slots // prog.num_tiles) + 1)
            ).astype(np.int32)
        ]
    )

    _, vparams, wparams, symbols, buckets, hist = prog.encode_analyze(
        pixels, qdiv
    )

    hist_np = np.asarray(hist)
    all_contexts: List[List] = []
    freqs = np.zeros((C, CONTEXT_AMOUNT, ALPHABET_SIZE), dtype=np.uint32)
    cdfs = np.zeros_like(freqs)
    bits = np.zeros((C, CONTEXT_AMOUNT), dtype=np.int32)
    for c in range(C):
        ctxs = [
            context_from_histogram(hist_np[c, b].astype(np.uint32), b)
            for b in range(CONTEXT_AMOUNT)
        ]
        all_contexts.append(ctxs)
        for b, t in enumerate(ctxs):
            freqs[c, b] = t.freqs
            cdfs[c, b] = t.cdf
            bits[c, b] = t.max_freq_bits

    states, words, flags = prog.encode_entropy(
        symbols, buckets, jnp.asarray(freqs), jnp.asarray(cdfs), jnp.asarray(bits)
    )
    lane_streams = _compact_words(np.asarray(words), np.asarray(flags))
    states_np = np.asarray(states)
    vparams_np = np.asarray(vparams)
    wparams_np = np.asarray(wparams)

    channel_data: List[Optional[ChannelData]] = []
    for c in range(C):
        channel_data.append(
            ChannelData(
                ans_contexts=[
                    AnsContextTables(
                        max_freq_bits=t.max_freq_bits,
                        off_distribution_values=t.off_distribution_values,
                        freqs=t.freqs,
                        cdf=t.cdf,
                    )
                    for t in all_contexts[c]
                ],
                lane_states=states_np[c].astype(np.uint32),
                lane_words=lane_streams[c],
                value_prediction_parameters=vparams_np[c],
                width_prediction_parameters=wparams_np[c],
            )
        )

    return CompressedImage(
        metadata=meta,
        channel_data=channel_data + [None] * (3 - C),
        quality=opts.quality.value,
        num_lanes=nl,
        quantization_matrix=np.asarray(qm, dtype=np.uint16),
    )


def decode_pipeline_jax(image: CompressedImage) -> RasterImage:
    from ..fractal.geometry import BASE_FRAC_DEPTH

    meta = image.metadata
    C = meta.num_channels
    nl = image.num_lanes
    prog = get_program(meta.height, meta.width, BASE_FRAC_DEPTH, nl, C)

    freqs = np.zeros((C, CONTEXT_AMOUNT, ALPHABET_SIZE), dtype=np.uint32)
    cdfs = np.zeros_like(freqs)
    bits = np.zeros((C, CONTEXT_AMOUNT), dtype=np.int32)
    luts = np.zeros((C, CONTEXT_AMOUNT, 1 << LUT_BITS), dtype=np.int16)
    states = np.zeros((C, nl), dtype=np.uint32)
    vparams = np.zeros((C, 3, 6), dtype=np.float32)
    wparams = np.zeros((C, 3, 6), dtype=np.float32)

    maxw = 1
    for c in range(C):
        cd = image.channel_data[c]
        for w in cd.lane_words:
            maxw = max(maxw, int(w.shape[0]))
    Wpad = _next_pow2(max(64, maxw))

    words = np.zeros((C, nl, Wpad), dtype=np.uint16)
    for c in range(C):
        cd = image.channel_data[c]
        for b, t in enumerate(cd.ans_contexts):
            freqs[c, b] = t.freqs
            cdfs[c, b] = t.cdf
            bits[c, b] = t.max_freq_bits
        luts[c] = build_decode_lut(cdfs[c], bits[c])
        states[c] = np.asarray(cd.lane_states, dtype=np.uint32)
        for l, w in enumerate(cd.lane_words):
            words[c, l, : w.shape[0]] = w
        vparams[c] = np.asarray(cd.value_prediction_parameters, dtype=np.float32)
        wparams[c] = np.asarray(cd.width_prediction_parameters, dtype=np.float32)

    qm = np.asarray(image.quantization_matrix, dtype=np.int32)
    N = 1 << BASE_FRAC_DEPTH
    qdiv = jnp.asarray(
        qm[np.floor(np.log2(np.arange(N) + 1)).astype(np.int32)].astype(np.int32)
    )

    pixels = prog.decode_scan(
        jnp.asarray(states),
        jnp.asarray(words),
        jnp.asarray(luts),
        jnp.asarray(freqs),
        jnp.asarray(cdfs),
        jnp.asarray(bits),
        jnp.asarray(vparams),
        jnp.asarray(wparams),
        qdiv,
    )
    data = np.asarray(pixels).T.reshape(meta.height, meta.width, C)
    return RasterImage(metadata=meta, data=data)
