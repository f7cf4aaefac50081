"""Round-3 discovery: executing certain gather forms permanently
degrades ALL subsequent gather-bearing programs in the process by ~50x
on this device (axon-tunneled TPU). This probe measures ONE variant per
process so numbers are clean, and optionally runs a candidate poison
program first.

Usage: python benchmarks/poison_probe.py VARIANT [--poison P]

Variants (all: S=128-step lax.scan, carry-dependent):
  empty, g1 (batched gather), g1_big, g2, g3 (chained batched),
  flat (1D-operand gather, computed idx), flat_static (1D-operand,
  scan-fed static idx), scatter (batched .at[].set), scatter_flat,
  dyn_slice, onehot
Poisons: any variant name — run once before timing VARIANT.
"""

from __future__ import annotations

import argparse
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
NSLOT = 65537
S = 128


def build(variant):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, NSLOT, (B, C, NSLOT), np.int32))
    big = jnp.asarray(rng.integers(0, NSLOT, (B, C, CA * LUT), np.int32))
    x0 = jnp.asarray(rng.integers(0, NSLOT, (B, C, NL), np.int32))
    tflat = tab.reshape(-1)
    boff = (jnp.arange(B * C, dtype=jnp.int32) * NSLOT)[:, None]
    sidx = jnp.asarray(
        rng.integers(0, B * C * NSLOT, (S, B * C * NL), np.int32)
    )

    bg = jax.vmap(jax.vmap(lambda tt, ii: tt[ii]))

    if variant == "empty":
        def run(x0):
            def stp(x, _):
                return (x * 5 + 1) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0,)
    if variant == "g1":
        def run(x0, t):
            def stp(x, _):
                return (bg(t, x) + x) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, tab)
    if variant == "g1_big":
        def run(x0, t):
            def stp(x, _):
                return (bg(t, x % (CA * LUT)) + x) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, big)
    if variant in ("g2", "g3"):
        n = 2 if variant == "g2" else 3
        def run(x0, t):
            def stp(x, _):
                v = x
                for _ in range(n):
                    v = (bg(t, v) + 1) % NSLOT
                return v, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, tab)
    if variant == "flat":
        def run(x0, t):
            def stp(x, _):
                idx = (boff + x.reshape(B * C, NL)).reshape(-1)
                v = t[idx].reshape(B, C, NL)
                return (v + x) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, tflat)
    if variant == "flat_static":
        def run(x0, t, si):
            def stp(x, ix):
                v = t[ix[: NL]].reshape(1, 1, NL)
                return (v + x) % NSLOT, None
            return jax.lax.scan(stp, x0, si)[0]
        return jax.jit(run), (x0, tflat, sidx)
    if variant == "scatter":
        def run(x0, t):
            def stp(carry, _):
                x, t = carry
                v = bg(t, x)
                t = jax.vmap(jax.vmap(lambda tt, ii, vv: tt.at[ii].set(vv)))(
                    t, (x + 7) % NSLOT, v + 1
                )
                return ((v + x) % NSLOT, t), None
            return jax.lax.scan(stp, (x0, t), None, length=S)[0][0]
        return jax.jit(run), (x0, tab)
    if variant == "scatter_flat":
        def run(x0, t):
            def stp(carry, _):
                x, t = carry
                idx = (boff + x.reshape(B * C, NL)).reshape(-1)
                t = t.at[idx].set(idx % 251, unique_indices=False)
                return ((x * 5 + 1) % NSLOT, t), None
            return jax.lax.scan(stp, (x0, t), None, length=S)[0][0]
        return jax.jit(run), (x0, tflat)
    if variant == "dyn_slice":
        def run(x0, t):
            def stp(x, _):
                p = (x[0, 0, 0] % jnp.int32(NSLOT - NL)).astype(jnp.int32)
                v = jax.lax.dynamic_slice(t, (p,), (NL,))
                return (v[None, None] + x) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, tflat)
    if variant == "onehot":
        def run(x0, t):
            blk = t[: 2 * NL].astype(jnp.float32)
            def stp(x, _):
                pos = x[0, 0] % (2 * NL)
                oh = (
                    pos[:, None] == jnp.arange(2 * NL, dtype=jnp.int32)
                ).astype(jnp.float32)
                w = (oh @ blk).astype(jnp.int32)
                return (w[None, None] + x) % NSLOT, None
            return jax.lax.scan(stp, x0, None, length=S)[0]
        return jax.jit(run), (x0, tflat)
    raise SystemExit(f"unknown variant {variant}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--poison", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.poison:
        pf, pa = build(args.poison)
        jax.block_until_ready(pf(*pa))

    fn, fa = build(args.variant)
    out = fn(*fa)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = fn(*fa)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.reps / S * 1e3
    print(
        json.dumps(
            {
                "variant": args.variant,
                "poison": args.poison,
                "ms_per_step": round(ms, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
