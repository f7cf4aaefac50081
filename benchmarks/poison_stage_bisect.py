"""Bisect the production encode_fused body for the op that flips this
device into slow-gather mode (see poison_probe.py). Builds the real
CodecProgram (256x256 gray), runs a jitted PREFIX of the encode body cut
at STAGE, then times the reference scan probe.

Usage: python benchmarks/poison_stage_bisect.py STAGE
Stages: upload leaf lift nbr gram ctx hist tables scan compact
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = 4
NSLOT_P, NLP, SP = 65537, 512, 128


def probe_time():
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.integers(0, NSLOT_P, (64, 1, NSLOT_P), np.int32))
    x0 = jnp.asarray(rng.integers(0, NSLOT_P, (64, 1, NLP), np.int32))
    bg = jax.vmap(jax.vmap(lambda tt, ii: tt[ii]))

    def run(x0, t):
        def stp(x, _):
            return (bg(t, x) + x) % NSLOT_P, None

        return jax.lax.scan(stp, x0, None, length=SP)[0]

    rj = jax.jit(run)
    out = rj(x0, tab)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = rj(x0, tab)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / 3 / SP * 1e3, 4)


def main():
    stage = sys.argv[1]
    from frave_tpu.codec.pipeline_jax import (
        get_program,
        _LAPLACE_GRID_ROWS,
    )
    from frave_tpu.entropy.tables import ALPHABET_SIZE, CONTEXT_AMOUNT
    from frave_tpu.entropy.tables_jax import (
        finalize_contexts_device,
        select_scales_device,
    )
    from frave_tpu.fractal.geometry import BASE_FRAC_DEPTH
    from frave_tpu.fractal.schedule import default_num_lanes, get_schedule
    from frave_tpu.ops import jax_ops as J
    from frave_tpu.ops.rans_jax import encode_scan, stream_compact

    h = w = 256
    sched = get_schedule(h, w, BASE_FRAC_DEPTH)
    nl = default_num_lanes(sched.num_symbols)
    prog = get_program(h, w, BASE_FRAC_DEPTH, nl, 1)
    if stage == "upload":
        jax.block_until_ready(prog._enc_args)
        print(json.dumps({"stage": stage, "probe": probe_time()}))
        return

    (
        leaf_safe, leaf_mask, sc, snbr_safe, slf, sgrp, sfbkt,
        lap, glog2, gzero,
    ) = prog._enc_args
    C, T = prog.channels, prog.num_tiles
    N = 1 << prog.depth
    n_slots = prog.n_slots
    K = prog.num_symbols
    R = prog.rows
    depth = prog.depth
    group_ranges = prog._group_ranges
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.integers(0, 255, (B, h * w, C), np.uint8)
    )
    qdiv = jnp.ones((N,), jnp.int32)

    def body(px, qdiv, leaf_safe, leaf_mask, sc, snbr_safe, slf, sgrp,
             sfbkt, lap, glog2, gzero):
        planes = px.T.astype(jnp.int32)
        leaves = jnp.where(
            leaf_mask[None], planes[:, leaf_safe], 0
        ).astype(jnp.int32)
        if stage == "leaf":
            return leaves
        coef = J.forward_lifting(leaves, leaf_mask[None], depth)
        qcoef = J.quantize(coef, qdiv[None, None, :])
        if stage == "lift":
            return qcoef
        qpad = jnp.concatenate(
            [
                qcoef.reshape(C, n_slots).astype(jnp.int16),
                jnp.zeros((C, 1), jnp.int16),
            ],
            axis=1,
        )
        vals = qpad[:, snbr_safe].astype(jnp.int32)
        target = qpad[:, sc].astype(jnp.int32)
        if stage == "nbr":
            return vals.sum() + target.sum()
        _HI = jax.lax.Precision.HIGHEST

        def feats(Xs):
            return jnp.stack(
                [
                    jnp.ones(Xs.shape[:-1], Xs.dtype),
                    jnp.abs(Xs[..., 0] - Xs[..., 3]),
                    jnp.abs(Xs[..., 1] - Xs[..., 2]),
                    jnp.abs(Xs[..., 4] - Xs[..., 5]),
                    jnp.abs(Xs[..., 1] - Xs[..., 5]),
                    jnp.abs(Xs[..., 2] - Xs[..., 4]),
                ],
                axis=-1,
            )

        from frave_tpu.codec.pipeline_jax import _gram_solve

        Gs, bs = [], []
        for (lo, hi) in group_ranges:
            Xs = vals[:, lo:hi].astype(jnp.float32)
            ys = target[:, lo:hi].astype(jnp.float32)
            Gs.append(jnp.einsum("ckx,cky->cxy", Xs, Xs, precision=_HI))
            bs.append(jnp.einsum("ckx,ck->cx", Xs, ys, precision=_HI))
        G = jnp.stack(Gs, axis=1)
        bv = jnp.stack(bs, axis=1)
        vparams = _gram_solve(G, bv)
        vparams = jax.lax.optimization_barrier(J.f16_wire_round(vparams))
        Gws, bws = [], []
        for g, (lo, hi) in enumerate(group_ranges):
            Xs = vals[:, lo:hi].astype(jnp.float32)
            ys = target[:, lo:hi].astype(jnp.float32)
            pred_g = jnp.einsum("ckx,cx->ck", Xs, vparams[:, g], precision=_HI)
            rg = jnp.abs(ys - pred_g)
            Fs = feats(Xs)
            Gws.append(jnp.einsum("ckx,cky->cxy", Fs, Fs, precision=_HI))
            bws.append(jnp.einsum("ckx,ck->cx", Fs, rg, precision=_HI))
        wparams = _gram_solve(jnp.stack(Gws, 1), jnp.stack(bws, 1))
        wparams = jax.lax.optimization_barrier(J.f16_wire_round(wparams))
        if stage == "gram":
            return vparams.sum() + wparams.sum()
        buckets, preds = jax.vmap(
            lambda v, vp, wp: J.contexts(v, slf, sgrp, vp, wp)
        )(vals, vparams, wparams)
        buckets = jnp.where(sfbkt[None] >= 0, sfbkt[None], buckets)
        symbols = J.pack_signed(target - preds)
        if stage == "ctx":
            return buckets.sum() + symbols.sum()
        ids = (
            jnp.arange(C, dtype=jnp.int32)[:, None]
            * (CONTEXT_AMOUNT * ALPHABET_SIZE)
            + buckets * ALPHABET_SIZE
            + jnp.clip(symbols, 0, ALPHABET_SIZE - 1)
        )
        hist = (
            jnp.zeros(C * CONTEXT_AMOUNT * ALPHABET_SIZE, jnp.int32)
            .at[ids.reshape(-1)]
            .add(1)
            .reshape(C, CONTEXT_AMOUNT, ALPHABET_SIZE)
        )
        if stage == "hist":
            return hist
        scales = select_scales_device(hist, glog2, gzero)
        bits, freqs, cdfs, off_mask = finalize_contexts_device(
            hist, lap, scale_idx=scales
        )
        if stage == "tables":
            return bits.sum() + freqs.sum() + cdfs.sum()
        pad = R * nl - K

        def grid(a, fill):
            a = jnp.concatenate(
                [a, jnp.full((C, pad), fill, dtype=a.dtype)], axis=1
            )
            return a.reshape(C, R, nl).transpose(1, 0, 2)

        sym_g = grid(symbols, 0)
        bkt_g = grid(buckets, 0)
        val_g = grid(jnp.ones((C, K), dtype=jnp.bool_), False)
        states, words, flags = encode_scan(
            sym_g, bkt_g, val_g, freqs.astype(jnp.uint32),
            cdfs.astype(jnp.uint32), bits,
        )
        if stage == "scan":
            return states.sum() + flags.sum()
        stream, total = stream_compact(words, flags, prog._perm)
        return stream.sum() + total

    n_static = 11
    fn = jax.jit(jax.vmap(body, in_axes=(0,) + (None,) * n_static))
    out = fn(
        pixels, qdiv, leaf_safe, leaf_mask, sc, snbr_safe, slf, sgrp,
        sfbkt, lap, glog2, gzero,
    )
    jax.block_until_ready(out)
    print(json.dumps({"stage": stage, "probe": probe_time()}))


if __name__ == "__main__":
    main()
