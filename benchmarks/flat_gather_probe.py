"""Decisive probe for the round-3 decode-floor attack: in a lax.scan
whose carry feeds the indices (same dependency structure as the decode
wavefront), compare the production *batched* gather forms (leading
vmap-batch dims on both operand and indices) against the same lookups
expressed as FLAT 1D gathers with the batch folded into the index.

Round-2 scan ablation measured batched-index gathers at ~500-650us/step
at B=64 regardless of table size; isolated flat gathers measured
~1us/step (round-3 session 1). If that transfers into a carry-dependent
scan, rewriting decode_fused's body flat is worth ~10x decode.

Run: python benchmarks/flat_gather_probe.py
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
CA, LUT = 15, 1 << 12
NSLOT = 65536 + 1
S = 128  # steps


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    merged_b = jnp.asarray(
        rng.integers(0, 1 << 30, (B, C, CA, LUT, 2), dtype=np.uint32)
    )
    qpad_b = jnp.asarray(
        rng.integers(-500, 500, (B, C, NSLOT), dtype=np.int16)
    )
    nbr = jnp.asarray(rng.integers(0, NSLOT, (S, NL, 6), dtype=np.int32))
    coef = jnp.asarray(rng.integers(0, NSLOT - 1, (S, NL), dtype=np.int32))
    x0 = jnp.asarray(
        rng.integers(1 << 16, 1 << 30, (B, C, NL), dtype=np.uint32)
    )

    # ---- variant 1: production form (vmap over B; per-image scan whose
    # gathers keep the C dim, then the whole thing batched by vmap —
    # exactly decode_exec's structure, pipeline_jax.py:753)
    def run_batched(qpad_b, x0, merged):
        def one(qp, x, mg):
            def stp(carry, xs):
                qpad, x = carry  # [C, NSLOT] i16, [C, NL] u32
                nb, cf = xs
                vals = qpad[:, nb].astype(jnp.int32)  # [C, NL, 6]
                bkt = (vals.sum(-1) + x.astype(jnp.int32)) % CA
                fine = (x % LUT).astype(jnp.int32)
                g2 = jax.vmap(lambda t, bk, f: t[bk, f])(mg, bkt, fine)
                sym = g2[..., 1].astype(jnp.int32)
                x = x * jnp.uint32(5) + sym.astype(jnp.uint32)
                wv = (sym + vals[..., 0]).astype(jnp.int16)
                qpad = jax.vmap(lambda q, s, v: q.at[s].set(v))(
                    qpad, jnp.broadcast_to(cf[None], (C, NL)), wv
                )
                return (qpad, x), None

            (qp, x), _ = jax.lax.scan(stp, (qp, x), (nbr, coef))
            return qp, x

        return jax.vmap(one)(qpad_b, x0, merged)

    t_b = timed(jax.jit(run_batched), qpad_b, x0, merged_b)

    # ---- variant 2: flat form (batch folded into indices)
    qflat = qpad_b.reshape(B * C * NSLOT)
    mflat = merged_b.reshape(B * C * CA * LUT, 2)
    boff_q = (jnp.arange(B * C, dtype=jnp.int32) * NSLOT)[:, None]
    boff_m = (jnp.arange(B * C, dtype=jnp.int32) * (CA * LUT))[:, None]

    def run_flat(qflat, x0, mflat):
        x0 = x0.reshape(B * C, NL)

        def stp(carry, xs):
            qpad, x = carry  # [B*C*NSLOT], [BC, NL]
            nb, cf = xs  # [NL, 6], [NL]
            idx = (boff_q[:, :, None] + nb[None]).reshape(-1)
            vals = qpad[idx].astype(jnp.int32).reshape(B * C, NL, 6)
            bkt = (vals.sum(-1) + x.astype(jnp.int32)) % CA
            fine = (x % LUT).astype(jnp.int32)
            midx = (boff_m + bkt * LUT + fine).reshape(-1)
            g2 = mflat[midx].reshape(B * C, NL, 2)
            sym = g2[..., 1].astype(jnp.int32)
            x = x * jnp.uint32(5) + sym.astype(jnp.uint32)
            wv = (sym + vals[..., 0]).astype(jnp.int16)
            widx = (boff_q + cf[None]).reshape(-1)
            qpad = qpad.at[widx].set(wv.reshape(-1), unique_indices=True)
            return (qpad, x), None

        (qpad, x), _ = jax.lax.scan(stp, (qflat, x0), (nbr, coef))
        return qpad, x

    t_f = timed(jax.jit(run_flat), qflat, x0, mflat)

    print(
        json.dumps(
            {
                "batched_ms_per_step": round(t_b / S * 1e3, 3),
                "flat_ms_per_step": round(t_f / S * 1e3, 3),
                "batched_total_s": round(t_b, 3),
                "flat_total_s": round(t_f, 3),
                "speedup": round(t_b / t_f, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
