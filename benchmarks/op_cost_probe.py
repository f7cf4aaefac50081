"""Honest slope-timed per-op costs inside a carry-dependent scan at the
headline decode shape (B=64, C=1, NL=512). Cancels the ~7ms dispatch
overhead by differencing S=128 and S=640. Each variant adds ONE op class
to an elementwise baseline; the slope delta is that op's per-step cost.

Run: python benchmarks/op_cost_probe.py [variants...]
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
NSLOT = 65537
RANS_L = 1 << 16
_HI = jax.lax.Precision.HIGHEST


def slope(mkrun, args):
    times = {}
    for S in (128, 640):
        f = mkrun(S)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        times[S] = (time.perf_counter() - t0) / 3
    return (times[640] - times[128]) / (640 - 128) * 1e6


def main():
    np.asarray(jnp.ones((1,), jnp.int32))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(RANS_L, 1 << 31, (B, C, NL), np.uint32))
    plane = jnp.asarray(rng.integers(-500, 500, (B, C, NSLOT), np.int16))
    merged = jnp.asarray(
        rng.integers(0, 1 << 30, (B, C, CA, 1 << 12, 2), np.uint32)
    )
    win_tab = jnp.asarray(
        rng.integers(0, 1 << 12, (B, C, CA * 32, 32), np.int32)
    )
    cdfs = jnp.asarray(
        np.sort(rng.integers(0, 1 << 12, (B, C, CA, AS)), -1).astype(
            np.float32
        )
    )
    res = {}
    which = sys.argv[1:] or [
        "elem", "gather_plane", "gather_merged", "gather_win",
        "scatter", "onehot_win32", "onehot_win32_bf16", "compare_full",
    ]

    def scanner(body, extra):
        def mk(S):
            def run(x0, *e):
                def one(x, *ee):
                    def stp(x, _):
                        return body(x, *ee), None

                    return jax.lax.scan(stp, x, None, length=S)[0]

                return jax.vmap(one)(x0, *e)

            return jax.jit(run)

        return slope(mk, (x0,) + extra)

    if "elem" in which:
        res["elem"] = scanner(lambda x: x * jnp.uint32(5) + 1, ())
    if "gather_plane" in which:
        def b(x, p):
            idx = (x % NSLOT).astype(jnp.int32)
            v = jax.vmap(lambda pp, ii: pp[ii])(p, idx)
            return x * 5 + v.astype(jnp.uint32)
        res["gather_plane"] = scanner(b, (plane,))
    if "gather_merged" in which:
        def b(x, m):
            bk = (x % CA).astype(jnp.int32)
            f = (x % (1 << 12)).astype(jnp.int32)
            v = jax.vmap(lambda mm, b2, f2: mm[b2, f2])(m, bk, f)
            return x * 5 + v[..., 0]
        res["gather_merged"] = scanner(b, (merged,))
    if "gather_win" in which:
        def b(x, w):
            idx = (x % (CA * 32)).astype(jnp.int32)
            v = jax.vmap(lambda ww, ii: ww[ii])(w, idx)  # [C, NL, 32]
            return x * 5 + v.sum(-1).astype(jnp.uint32)
        res["gather_win"] = scanner(b, (win_tab,))
    if "scatter" in which:
        def mk(S):
            def run(x0, p):
                def one(x, pp):
                    def stp(carry, _):
                        x, pp = carry
                        idx = (x % NSLOT).astype(jnp.int32)
                        pp = jax.vmap(lambda q, i2, v2: q.at[i2].set(v2))(
                            pp, idx, (x & 255).astype(jnp.int16)
                        )
                        return (x * 5 + 1, pp), None

                    return jax.lax.scan(stp, (x, pp), None, length=S)[0][0]

                return jax.vmap(one)(x0, p)

            return jax.jit(run)
        res["scatter"] = slope(mk, (x0, plane))
    if "onehot_win32" in which or "onehot_win32_bf16" in which:
        cdf_full = cdfs.reshape(B, C, CA, 32, 32)

        def mkb(dt):
            def b(x, cf):
                bk = (x % CA).astype(jnp.int32)[0]  # [NL]
                hi = ((x >> 5) % 32).astype(jnp.int32)  # [C, NL]
                oh = (
                    bk[:, None] == jnp.arange(CA, dtype=jnp.int32)
                ).astype(dt)
                oh_hi = (
                    hi[..., None] == jnp.arange(32, dtype=jnp.int32)
                ).astype(dt)
                Wt = oh[None, :, :, None] * oh_hi[:, :, None, :]
                win = jnp.einsum(
                    "cnkj,ckja->cna", Wt, cf.astype(dt), precision=_HI
                ).astype(jnp.uint32)
                return x * 5 + win.sum(-1)
            return b
        if "onehot_win32" in which:
            res["onehot_win32"] = scanner(mkb(jnp.float32), (cdf_full,))
        if "onehot_win32_bf16" in which:
            res["onehot_win32_bf16"] = scanner(
                mkb(jnp.bfloat16), (cdf_full,)
            )
    if "compare_full" in which:
        def b(x, cd):
            bk = (x % CA).astype(jnp.int32)[0]
            oh = (
                bk[:, None] == jnp.arange(CA, dtype=jnp.int32)
            ).astype(jnp.float32)
            rows = jnp.einsum(
                "nk,cka->cna", oh, cd, precision=_HI
            ).astype(jnp.int32)
            slot = (x % (1 << 12)).astype(jnp.int32)
            le = rows <= slot[..., None]
            sym = jnp.sum(le, -1) - 1
            return x * 5 + sym.astype(jnp.uint32)
        res["compare_full"] = scanner(b, (cdfs,))

    print(json.dumps({k: round(v, 1) for k, v in res.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
