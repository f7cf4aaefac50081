"""SPMD sharded encode: dp (image batch) x tp (tiles / schedule / lanes).

This is the TPU-native replacement for the parallelism the reference never
had (SURVEY.md section 2.3; BASELINE.json configs 3+4). One shard_map
program runs the full analyze step:

  * each tp shard lifts its slice of fractal tiles (embarrassingly
    parallel — per-tile trees are independent, wavelet_transform.rs:179);
  * the quantized coefficient plane is rebuilt with `all_gather` over the
    `tp` axis (cross-tile neighbour context reads — the halo exchange of
    the 6-neighbour lattice, prediction.rs:39-53 — ride ICI);
  * per-image Gram matrices and context histograms are partial sums over
    the local schedule slice, reduced with `psum(axis='tp')` (the shared
    quantization/context tables collective of the north star);
  * the learned 6x6 solves are tiny and computed replicated on every
    shard;
  * rANS lanes are sharded over `tp` for the entropy scan — lanes are
    fully independent streams by construction (frave_tpu/ops/rans.py).

The `dp` axis never communicates: images are independent (per-image
predictor parameters and tables, as in the reference where every encode is
one image).

Decode-side sharding note: the wavefront decode advances one rANS step at
a time; sharding LANES over `tp` would insert one ICI collective per scan
step (an all-gather of each step's decoded coefficients) — hundreds of
latency-bound collectives per image for no bandwidth win, since the
per-step payload is a few KB. The TPU-native answer is `ShardedDecoder`
below: images shard over the mesh (pure dp — zero communication), and
within a chip all lanes/channels of an image decode vectorized. Tile-
sharded decode of a single image remains possible through the same
machinery if a config ever demands it, at the documented latency cost.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..images import (
    AnsContextTables,
    ChannelData,
    CompressedImage,
    ColorSpace,
    ImageMetadata,
)
from ..entropy.tables import ALPHABET_SIZE, CONTEXT_AMOUNT, context_from_histogram
from ..fractal.geometry import BASE_FRAC_DEPTH, get_geometry
from ..fractal.schedule import default_num_lanes, get_schedule, get_stream_perm
from ..ops.rans import build_stream
from ..ops import jax_ops as J
from ..ops.rans_jax import encode_scan
from ..codec.options import EncoderOptions, quantization_matrix
from ..codec.pipeline_jax import _gram_solve


def _pad_to(x: np.ndarray, size: int, fill, axis: int = 0) -> np.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    shape = list(x.shape)
    shape[axis] = pad
    return np.concatenate([x, np.full(shape, fill, dtype=x.dtype)], axis=axis)


@dataclasses.dataclass
class ShardedEncoder:
    """Compiled dp x tp encode for one (height, width, channels, batch)."""

    height: int
    width: int
    channels: int
    batch: int  # global batch B (must divide by mesh dp)
    mesh: Mesh
    depth: int = BASE_FRAC_DEPTH
    num_lanes: Optional[int] = None
    mode: str = "parallel"

    def __post_init__(self):
        h, w, depth, C = self.height, self.width, self.depth, self.channels
        mesh = self.mesh
        dp = mesh.shape["dp"]
        tp = mesh.shape["tp"]
        if self.batch % dp != 0:
            raise ValueError(f"batch {self.batch} not divisible by dp={dp}")

        geo = get_geometry(h, w, depth)
        sched = get_schedule(h, w, depth, mode=self.mode)
        T, N = geo.num_tiles, geo.nodes_per_tile
        K = sched.num_symbols
        HW = h * w

        nl = self.num_lanes or default_num_lanes(K)
        # lanes must split evenly over tp
        nl = max(nl, tp)
        nl = -(-nl // tp) * tp
        self.nl = nl
        R = -(-K // nl)
        Kp = R * nl
        Tp = -(-T // tp) * tp
        n_slots_pad = Tp * N  # zero pad slot lives at this index
        self.rows, self.num_symbols = R, K

        # ---- padded host tensors ----
        pg = geo.pixel_gather.astype(np.int32)
        leaf_mask = _pad_to(pg >= 0, Tp, False)
        leaf_safe = _pad_to(np.where(pg >= 0, pg, 0).astype(np.int32), Tp, 0)

        sc = sched.sched_coef.astype(np.int32)
        snbr = sched.sched_nbr.astype(np.int32)
        svalid = _pad_to(np.ones(K, dtype=bool), Kp, False)
        sc_p = _pad_to(np.where(sc >= 0, sc, n_slots_pad), Kp, n_slots_pad)
        snbr_p = _pad_to(
            np.where(snbr >= 0, snbr, n_slots_pad).astype(np.int32), Kp, n_slots_pad
        )
        slf_p = _pad_to(sched.sched_lf.astype(bool), Kp, False)
        sgrp_p = _pad_to(sched.sched_group.astype(np.int32), Kp, 0)
        sfbkt_p = _pad_to(sched.sched_fbkt.astype(np.int32), Kp, -1)

        qn = np.floor(np.log2(np.arange(N) + 1)).astype(np.int32)

        B = self.batch
        Bl = B // dp

        def analyze_shard(pixels, leaf_safe_l, leaf_mask_l, sc_l, snbr_l,
                          svalid_l, slf_l, sgrp_l, sfbkt_l, qdiv):
            # pixels: [Bl, C, HW]; tile/schedule tensors: local tp slices
            leaves = jnp.where(
                leaf_mask_l[None, None], pixels[:, :, leaf_safe_l], 0
            ).astype(jnp.int32)  # [Bl, C, Tl, N]
            coef = J.forward_lifting(leaves, leaf_mask_l[None, None], depth)
            qc = J.quantize(coef, qdiv[None, None, None, :])
            qflat_l = qc.reshape(Bl, C, -1)
            qflat = jax.lax.all_gather(
                qflat_l, "tp", axis=2, tiled=True
            )  # [Bl, C, Tp*N]
            qpad = jnp.concatenate(
                [qflat, jnp.zeros((Bl, C, 1), jnp.int32)], axis=2
            )

            vals = qpad[:, :, snbr_l]  # [Bl, C, Kl, 6]
            target = qpad[:, :, sc_l]  # [Bl, C, Kl]
            hf = svalid_l & (~slf_l)

            Xf = vals.astype(jnp.float32)
            yf = target.astype(jnp.float32)
            gmask = jnp.stack(
                [(hf & (sgrp_l == g)).astype(jnp.float32) for g in range(3)]
            )  # [3, Kl]
            Xg = Xf[:, :, None] * gmask[None, None, :, :, None]  # [Bl,C,3,Kl,6]
            G = jnp.einsum("bcgkx,bcky->bcgxy", Xg, Xf)
            bv = jnp.einsum("bcgkx,bck->bcgx", Xg, yf)
            G = jax.lax.psum(G, "tp")
            bv = jax.lax.psum(bv, "tp")
            vparams = _gram_solve(G, bv)  # [Bl, C, 3, 6]

            vp_by_k = jnp.take_along_axis(
                vparams,
                sgrp_l[None, None, :, None].astype(jnp.int32).repeat(Bl, 0).repeat(C, 1),
                axis=2,
            )  # [Bl, C, Kl, 6]
            pred_fit = jnp.sum(Xf * vp_by_k, axis=-1)
            r = jnp.abs(yf - pred_fit)
            F = jnp.stack(
                [
                    jnp.ones_like(yf),
                    jnp.abs(Xf[..., 0] - Xf[..., 3]),
                    jnp.abs(Xf[..., 1] - Xf[..., 2]),
                    jnp.abs(Xf[..., 4] - Xf[..., 5]),
                    jnp.abs(Xf[..., 1] - Xf[..., 5]),
                    jnp.abs(Xf[..., 2] - Xf[..., 4]),
                ],
                axis=-1,
            )
            Fg = F[:, :, None] * gmask[None, None, :, :, None]
            Gw = jax.lax.psum(jnp.einsum("bcgkx,bcky->bcgxy", Fg, F), "tp")
            bw = jax.lax.psum(jnp.einsum("bcgkx,bck->bcgx", Fg, r), "tp")
            wparams = _gram_solve(Gw, bw)

            def ctx_one(v, lfm, grp, vp, wp):
                return J.contexts(v, lfm, grp, vp, wp)

            buckets, preds = jax.vmap(
                jax.vmap(ctx_one, in_axes=(0, None, None, 0, 0)),
                in_axes=(0, None, None, 0, 0),
            )(vals, slf_l, sgrp_l, vparams, wparams)
            buckets = jnp.where(sfbkt_l[None, None] >= 0, sfbkt_l[None, None], buckets)
            residuals = target - preds
            symbols = jnp.where(svalid_l[None, None], J.pack_signed(residuals), 0)
            buckets = jnp.where(svalid_l[None, None], buckets, 0)

            ids = (
                jnp.arange(C, dtype=jnp.int32)[None, :, None]
                * (CONTEXT_AMOUNT * ALPHABET_SIZE)
                + buckets * ALPHABET_SIZE
                + jnp.clip(symbols, 0, ALPHABET_SIZE - 1)
            )
            inc = svalid_l[None, None].astype(jnp.int32) * jnp.ones_like(ids)

            def hist_one(idrow, incrow):
                return (
                    jnp.zeros(C * CONTEXT_AMOUNT * ALPHABET_SIZE, jnp.int32)
                    .at[idrow.reshape(-1)]
                    .add(incrow.reshape(-1))
                )

            hist = jax.vmap(hist_one)(ids, inc).reshape(
                Bl, C, CONTEXT_AMOUNT, ALPHABET_SIZE
            )
            hist = jax.lax.psum(hist, "tp")
            return symbols, buckets, hist, vparams, wparams

        specs_in = (
            P("dp"),  # pixels [B, C, HW]
            P("tp"),  # leaf_safe [Tp, N]
            P("tp"),  # leaf_mask
            P("tp"),  # sc [Kp]
            P("tp"),  # snbr [Kp, 6]
            P("tp"),  # svalid
            P("tp"),  # slf
            P("tp"),  # sgrp
            P("tp"),  # sfbkt
            P(),  # qdiv
        )
        specs_out = (
            P("dp", None, "tp"),  # symbols [B, C, Kp]
            P("dp", None, "tp"),  # buckets
            P("dp"),  # hist [B, C, 10, 1024]
            P("dp"),  # vparams
            P("dp"),  # wparams
        )
        self._analyze = jax.jit(
            _shard_map(
                analyze_shard,
                mesh=mesh,
                in_specs=specs_in,
                out_specs=specs_out,
                check_vma=False,
            )
        )

        def entropy_shard(sym_g, bkt_g, val_g, freqs, cdfs, bits):
            # grids: [R, Bl, C, NLl]; tables: [Bl, C, 10, ...]
            return encode_scan(sym_g, bkt_g, val_g, freqs, cdfs, bits)

        self._entropy = jax.jit(
            _shard_map(
                entropy_shard,
                mesh=mesh,
                in_specs=(
                    P(None, "dp", None, "tp"),
                    P(None, "dp", None, "tp"),
                    P(None, "dp", None, "tp"),
                    P("dp"),
                    P("dp"),
                    P("dp"),
                ),
                out_specs=(
                    P("dp", None, "tp"),
                    P(None, "dp", None, "tp"),
                    P(None, "dp", None, "tp"),
                ),
                check_vma=False,
            )
        )

        # device-resident padded constants
        self._consts = tuple(
            jnp.asarray(a)
            for a in (
                leaf_safe, leaf_mask, sc_p, snbr_p, svalid, slf_p, sgrp_p, sfbkt_p,
            )
        )
        self._qn = qn
        self._Kp = Kp

    # ------------------------------------------------------------------
    def encode_batch(
        self, batch: np.ndarray, opts: Optional[EncoderOptions] = None
    ) -> List[bytes]:
        """batch: [B, H, W, C] uint8 -> list of frif containers."""
        from ..codec.container import serialize

        opts = opts or EncoderOptions()
        if opts.mode != self.mode:
            raise ValueError(
                f"encoder built for mode={self.mode!r}, opts request {opts.mode!r}"
            )
        B, C = self.batch, self.channels
        assert batch.shape == (B, self.height, self.width, C)
        qm = quantization_matrix(opts.quality)
        qdiv = jnp.asarray(qm.astype(np.int32)[self._qn])

        cs = ColorSpace.LUMA if C == 1 else ColorSpace.RGB
        if C == 3 and opts.color_transform != "none":
            from ..codec.channel_transform import (
                subtract_green,
                subtract_green_clamped,
            )

            fwd = (
                subtract_green
                if opts.quality.name == "LOSSLESS"
                else subtract_green_clamped
            )
            batch = np.stack([fwd(batch[b]) for b in range(B)])
            cs = ColorSpace.YCBCR
        pixels = jnp.asarray(
            batch.reshape(B, -1, C).transpose(0, 2, 1).astype(np.int32)
        )  # [B, C, HW]
        symbols, buckets, hist, vparams, wparams = self._analyze(
            pixels, *self._consts, qdiv
        )

        hist_np = np.asarray(hist)
        freqs = np.zeros((B, C, CONTEXT_AMOUNT, ALPHABET_SIZE), dtype=np.uint32)
        cdfs = np.zeros_like(freqs)
        bits = np.zeros((B, C, CONTEXT_AMOUNT), dtype=np.int32)
        tables = [[None] * C for _ in range(B)]
        for b in range(B):
            for c in range(C):
                ctxs = [
                    context_from_histogram(hist_np[b, c, k].astype(np.uint32), k)
                    for k in range(CONTEXT_AMOUNT)
                ]
                tables[b][c] = ctxs
                for k, t in enumerate(ctxs):
                    freqs[b, c, k] = t.freqs
                    cdfs[b, c, k] = t.cdf
                    bits[b, c, k] = t.max_freq_bits

        R, nl = self.rows, self.nl
        sym_g = symbols.reshape(B, C, R, nl).transpose(2, 0, 1, 3)
        bkt_g = buckets.reshape(B, C, R, nl).transpose(2, 0, 1, 3)
        valid = jnp.asarray(
            _pad_to(np.ones(self.num_symbols, dtype=bool), self._Kp, False)
        )
        val_g = jnp.broadcast_to(
            valid.reshape(R, nl)[:, None, None, :], (R, B, C, nl)
        )
        states, words, flags = self._entropy(
            sym_g, bkt_g, val_g, jnp.asarray(freqs), jnp.asarray(cdfs), jnp.asarray(bits)
        )

        states_np = np.asarray(states)
        words_np = np.asarray(words)  # [R, B, C, NL]
        flags_np = np.asarray(flags)
        vp_np = np.asarray(vparams)
        wp_np = np.asarray(wparams)
        perm = get_stream_perm(
            self.height, self.width, nl, self.depth, self.mode, C
        )

        meta = ImageMetadata(height=self.height, width=self.width, colorspace=cs)
        out: List[bytes] = []
        for b in range(B):
            stream = build_stream(
                [words_np[:, b, c] for c in range(C)],
                [flags_np[:, b, c] for c in range(C)],
                perm,
            )
            channel_data = []
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
                            for t in tables[b][c]
                        ],
                        lane_states=states_np[b, c].astype(np.uint32),
                        value_prediction_parameters=vp_np[b, c],
                        width_prediction_parameters=wp_np[b, c],
                    )
                )
            out.append(
                serialize(
                    CompressedImage(
                        metadata=meta,
                        channel_data=channel_data + [None] * (3 - C),
                        quality=opts.quality.value,
                        num_lanes=nl,
                        quantization_matrix=np.asarray(qm, dtype=np.uint16),
                        mode=self.mode,
                        stream=stream,
                    )
                )
            )
        return out


@dataclasses.dataclass
class ShardedDecoder:
    """dp-sharded batched decode: images distributed over every device of
    the mesh, one fused decode program per device shard."""

    height: int
    width: int
    channels: int
    mesh: Mesh

    def decode_batch(self, blobs: List[bytes]):
        """Decode same-shape containers, images sharded across the mesh.
        Returns decoded arrays in input order."""
        import jax

        from ..codec.container import deserialize
        from ..codec.pipeline_jax import decode_pipeline_jax_batch

        n_dev = self.mesh.devices.size
        images = [deserialize(b) for b in blobs]
        B = len(images)
        # shard round-robin; each shard decodes its slice with the
        # single-chip fused program placed on its device
        out = [None] * B
        for d in range(min(n_dev, B)):
            idx = list(range(d, B, n_dev))
            dev = self.mesh.devices.reshape(-1)[d]
            with jax.default_device(dev):
                decoded = decode_pipeline_jax_batch([images[i] for i in idx])
            for i, im in zip(idx, decoded):
                out[i] = im
        return out
