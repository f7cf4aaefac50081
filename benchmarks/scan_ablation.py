"""Decode-scan component ablation on the live device.

The wavefront decode scan is the codec's hot loop. This measures a
synthetic replica of its per-step access pattern with components toggled
so per-step costs can be attributed: table gathers (by table size),
neighbour-plane gathers, the coefficient scatter, and plain ALU renorm.

    python benchmarks/scan_ablation.py [--b 64] [--nl 512] [--steps 170]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--nl", type=int, default=512)
    ap.add_argument("--steps", type=int, default=170)
    ap.add_argument("--slots", type=int, default=87552)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    B, NL, S, NS = args.b, args.nl, args.steps, args.slots
    rng = np.random.default_rng(0)

    # static per-step index tensors (like d_nbr / d_coef)
    nbr = jnp.asarray(rng.integers(0, NS, (S, NL, 6)), dtype=jnp.int32)
    wslot = jnp.asarray(
        rng.permutation(S * NL)[: S * NL].reshape(S, NL) % NS, dtype=jnp.int32
    )
    lut = jnp.asarray(
        rng.integers(0, 1024, (B, 15, 1 << 14)), dtype=jnp.int16
    )
    fcd = jnp.asarray(
        rng.integers(1, 1 << 30, (B, 15, 1024)), dtype=jnp.uint32
    )
    bits = jnp.asarray(rng.integers(8, 15, (B, 15)), dtype=jnp.uint32)
    big = jnp.asarray(
        rng.integers(0, 1 << 30, (B, 15, 1 << 14, 2)), dtype=jnp.uint32
    )

    def run(name, use):
        def body(carry, xs):
            qpad, x = carry
            nb, ws = xs
            acc = x
            if "nbr" in use:
                vals = qpad[:, nb]  # [B, NL, 6] int16
                acc = acc + jnp.sum(vals, axis=-1).astype(jnp.uint32)
            bkt = (acc % 15).astype(jnp.int32)
            if "bits" in use:
                bi = jax.vmap(lambda t, bk: t[bk])(bits, bkt)
                acc = acc + bi
            if "lut" in use:
                fine = (acc & jnp.uint32((1 << 14) - 1)).astype(jnp.int32)
                sym = jax.vmap(lambda t, bk, sl: t[bk, sl])(lut, bkt, fine)
                acc = acc + sym.astype(jnp.uint32)
            if "fcd" in use:
                sm = (acc % 1024).astype(jnp.int32)
                g = jax.vmap(lambda t, bk, s: t[bk, s])(fcd, bkt, sm)
                acc = acc + g
            if "big" in use:
                lo = (acc & jnp.uint32((1 << 14) - 1)).astype(jnp.int32)
                g2 = jax.vmap(lambda t, bk, l: t[bk, l])(big, bkt, lo)
                acc = acc + g2[..., 0] + g2[..., 1]
            if "alu" in use:
                for _ in range(8):
                    acc = acc * jnp.uint32(2654435761) + jnp.uint32(1)
            x = acc
            if "scatter" in use:
                wv = (x & jnp.uint32(0x7FFF)).astype(jnp.int16)
                qpad = jax.vmap(lambda q, s, v: q.at[s].set(v))(
                    qpad, jnp.broadcast_to(ws[None], (B, NL)), wv
                )
            else:
                qpad = qpad + jnp.max(x).astype(jnp.int16)
            return (qpad, x), None

        @jax.jit
        def prog(qpad0, x0):
            (qp, x), _ = jax.lax.scan(body, (qpad0, x0), (nbr, wslot))
            return qp.sum() + x.sum()

        qpad0 = jnp.zeros((B, NS), jnp.int16)
        x0 = jnp.asarray(
            rng.integers(1 << 16, 1 << 31, (B, NL)), dtype=jnp.uint32
        )
        prog(qpad0, x0).block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            prog(qpad0, x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "abl": name,
                    "total_ms": round(1000 * best, 1),
                    "per_step_us": round(1e6 * best / S, 1),
                }
            ),
            flush=True,
        )
        return best

    run("baseline(alu-only)", {"alu"})
    run("+scatter", {"alu", "scatter"})
    run("+nbr", {"alu", "nbr"})
    run("+bits", {"alu", "bits"})
    run("+lut(0.5MB)", {"alu", "lut"})
    run("+fcd(60KB)", {"alu", "fcd"})
    run("+big(2MB)", {"alu", "big"})
    run("split-full", {"alu", "nbr", "bits", "lut", "fcd", "scatter"})
    run("merged-full", {"alu", "nbr", "big", "scatter"})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
