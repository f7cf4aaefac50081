"""Honest-mode probe of the proposed gather-free decode step (round 3).

IMPORTANT measurement note (round-3 discovery): on this axon-tunneled
device, jax.block_until_ready does NOT actually synchronize until the
process has performed at least one device->host transfer; timings taken
before the first fetch are fiction. This probe fetches a scalar first to
enter honest mode, as must every benchmark in this repo.

Variants:
  current   production-shaped step: nbr gather + merged-table gather +
            dyn_slice + one-hot distribute + scatter  (all vmapped B=64)
  proposed  gather-free rANS-only step: oh_bkt einsum -> cdf rows,
            compare/reduce sym/freq/cdf, elementwise state update,
            dyn_slice + one-hot distribute (no plane gather/scatter)
  elem      pure elementwise step (floor)

Run: python benchmarks/gatherfree_step_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

B, C, NL = 64, 1, 512
CA, AS = 15, 1024
LUT = 1 << 12
NSLOT = 65537
S = 128
RANS_L = 1 << 16


def honest_mode():
    np.asarray(jnp.ones((1,), jnp.int32))


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / S * 1e3


def main():
    honest_mode()
    rng = np.random.default_rng(0)
    res = {}

    # ---------------- current production shape ----------------
    merged = jnp.asarray(
        rng.integers(0, 1 << 30, (B, C, CA, LUT, 2), np.uint32)
    )
    qpad0 = jnp.asarray(rng.integers(-500, 500, (B, C, NSLOT), np.int16))
    nbr = jnp.asarray(rng.integers(0, NSLOT, (S, NL, 6), np.int32))
    coef = jnp.asarray(rng.integers(0, NSLOT - 1, (S, NL), np.int32))
    x0 = jnp.asarray(
        rng.integers(RANS_L, 1 << 31, (B, C, NL), np.uint32)
    )
    stream = jnp.asarray(
        rng.integers(0, 1 << 16, (B, S * NL + NL), np.uint16)
    )

    def run_current(qpad_b, x0, merged, stream):
        def one(qp, x, mg, st):
            def stp(carry, xs):
                qpad, x, gp = carry
                nb, cf = xs
                vals = qpad[:, nb].astype(jnp.int32)  # plane gather
                bkt = (vals.sum(-1) + x.astype(jnp.int32)) % CA
                fine = (x % LUT).astype(jnp.int32)
                g2 = jax.vmap(lambda t, bk, f: t[bk, f])(mg, bkt, fine)
                sym = g2[..., 1].astype(jnp.int32)
                xn = (g2[..., 0] >> 16) * (x >> 12) + x % LUT
                need = xn < RANS_L
                nf = need.reshape(-1).astype(jnp.int32)
                pos = jnp.cumsum(nf) - 1
                blk = C * NL
                block = jax.lax.dynamic_slice(st, (gp,), (blk,))
                bb = jnp.stack(
                    [block & jnp.uint16(0xFF), block >> jnp.uint16(8)],
                    -1,
                ).astype(jnp.float32)
                ohp = (
                    (pos[:, None] == jnp.arange(blk, dtype=jnp.int32))
                    & (nf[:, None] > 0)
                ).astype(jnp.float32)
                wb = jnp.einsum("nb,bk->nk", ohp, bb).astype(jnp.uint32)
                w = (wb[..., 0] | (wb[..., 1] << 8)).reshape(C, NL)
                xn = jnp.where(need, (xn << 16) | w, xn)
                wv = (sym + vals[..., 0]).astype(jnp.int16)
                qpad = jax.vmap(lambda q, s, v: q.at[s].set(v))(
                    qpad, jnp.broadcast_to(cf[None], (C, NL)), wv
                )
                return (qpad, xn, gp + jnp.sum(nf)), None

            (qp, x, _), _ = jax.lax.scan(
                stp, (qp, x, jnp.int32(0)), (nbr, coef)
            )
            return qp, x

        return jax.vmap(one)(qpad_b, x0, merged, stream)

    res["current"] = timed(
        jax.jit(run_current), qpad0, x0, merged, stream
    )

    # ---------------- proposed gather-free scan ----------------
    # pre-scan bulk products (fed as xs / consts):
    oh_bkt = jnp.asarray(
        rng.integers(0, 2, (S, NL, CA), np.int8), dtype=jnp.float32
    )  # in production: one-hot of data-dependent buckets, built per level
    cdfs = jnp.asarray(
        np.sort(rng.integers(0, 1 << 12, (B, C, CA, AS)), axis=-1).astype(
            np.float32
        )
    )
    bits_tab = jnp.asarray(
        rng.integers(8, 13, (B, C, CA), np.int32).astype(np.float32)
    )

    def run_proposed(x0, cdfs, bits_tab, stream, oh_bkt):
        def one(x, cdfv, bitsv, st):
            def stp(carry, xs):
                x, gp = carry
                oh = xs  # [NL, CA] f32
                _HI = jax.lax.Precision.HIGHEST
                cdf_rows = jnp.einsum(
                    "nk,cka->cna", oh, cdfv, precision=_HI
                )  # [C, NL, AS]
                bi = jnp.einsum(
                    "nk,ck->cn", oh, bitsv, precision=_HI
                ).astype(jnp.uint32)  # [C, NL]
                cdf_i = cdf_rows.astype(jnp.int32)  # [C, NL, AS]
                mask = (jnp.uint32(1) << bi) - 1
                slot = (x & mask).astype(jnp.int32)  # [C, NL]
                is_le = cdf_i <= slot[..., None]  # [C, NL, AS]
                sym = jnp.sum(is_le, axis=-1) - 1
                cdf_sel = jnp.max(
                    jnp.where(is_le, cdf_i, 0), axis=-1
                ).astype(jnp.uint32)
                nxt = jnp.min(
                    jnp.where(is_le, 1 << 14, cdf_i), axis=-1
                ).astype(jnp.uint32)
                freq = nxt - cdf_sel
                xn = freq * (x >> bi) + slot.astype(jnp.uint32) - cdf_sel
                need = xn < RANS_L
                nf = need.reshape(-1).astype(jnp.int32)
                pos = jnp.cumsum(nf) - 1
                blk = C * NL
                block = jax.lax.dynamic_slice(st, (gp,), (blk,))
                bb = jnp.stack(
                    [block & jnp.uint16(0xFF), block >> jnp.uint16(8)],
                    -1,
                ).astype(jnp.float32)
                ohp = (
                    (pos[:, None] == jnp.arange(blk, dtype=jnp.int32))
                    & (nf[:, None] > 0)
                ).astype(jnp.float32)
                wb = jnp.einsum("nb,bk->nk", ohp, bb).astype(jnp.uint32)
                w = (wb[..., 0] | (wb[..., 1] << 8)).reshape(C, NL)
                xn = jnp.where(need, (xn << 16) | w, xn)
                return (xn, gp + jnp.sum(nf)), sym.astype(jnp.int16)

            (x, _), syms = jax.lax.scan(stp, (x, jnp.int32(0)), oh_bkt)
            return x, syms

        return jax.vmap(one, in_axes=(0, 0, 0, 0))(
            x0, cdfs, bits_tab, stream
        )

    res["proposed"] = timed(
        jax.jit(run_proposed), x0, cdfs, bits_tab, stream, oh_bkt
    )

    # ---------------- elementwise floor ----------------
    def run_elem(x0):
        def one(x):
            def stp(x, _):
                return x * jnp.uint32(5) + 1, None

            return jax.lax.scan(stp, x, None, length=S)[0]

        return jax.vmap(one)(x0)

    res["elem"] = timed(jax.jit(run_elem), x0)

    print(json.dumps({k: round(v, 4) for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
