"""Find the exact op form that flips this device/client into the
permanently-slow mode (see poison_probe.py). Runs ONE candidate program
(argv[1]) in a fresh process, then times the reference batched-gather
scan probe. Clean probe = ~0.0008 ms/step; poisoned = ~0.43 ms/step.

Usage: python benchmarks/poison_bisect.py CANDIDATE
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

B, C, NL, NSLOT, S = 64, 1, 512, 65537, 128
T, N, HW, K = 128, 512, 65536, 65536
rng = np.random.default_rng(0)


def probe_time():
    tab = jnp.asarray(rng.integers(0, NSLOT, (B, C, NSLOT), np.int32))
    x0 = jnp.asarray(rng.integers(0, NSLOT, (B, C, NL), np.int32))
    bg = jax.vmap(jax.vmap(lambda tt, ii: tt[ii]))

    def run(x0, t):
        def stp(x, _):
            return (bg(t, x) + x) % NSLOT, None

        return jax.lax.scan(stp, x0, None, length=S)[0]

    rj = jax.jit(run)
    out = rj(x0, tab)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = rj(x0, tab)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / 3 / S * 1e3, 4)


def run_candidate(name):
    pixels = jnp.asarray(rng.integers(0, 255, (B, HW, C), np.uint8))
    leaf_safe = jnp.asarray(rng.integers(0, HW, (T, N), np.int32))
    if name == "none":
        return
    if name == "leaf_vmap":
        f = jax.jit(jax.vmap(lambda p: p.T.astype(jnp.int32)[:, leaf_safe]))
        jax.block_until_ready(f(pixels))
        return
    if name == "leaf_single":
        f = jax.jit(lambda p: p.T.astype(jnp.int32)[:, leaf_safe])
        jax.block_until_ready(f(pixels[0]))
        return
    if name == "leaf_small_idx":
        ls = leaf_safe[:, :8]
        f = jax.jit(jax.vmap(lambda p: p.T.astype(jnp.int32)[:, ls]))
        jax.block_until_ready(f(pixels))
        return
    if name == "elementwise_big":
        f = jax.jit(jax.vmap(lambda p: p.astype(jnp.int32) * 3 + 1))
        jax.block_until_ready(f(pixels))
        return
    if name == "transpose_only":
        f = jax.jit(jax.vmap(lambda p: p.T.astype(jnp.int32) * 2))
        jax.block_until_ready(f(pixels))
        return
    if name == "leaf_take":
        # same gather expressed as jnp.take on flattened last dim
        f = jax.jit(
            jax.vmap(
                lambda p: jnp.take(
                    p.T.astype(jnp.int32), leaf_safe.reshape(-1), axis=1
                ).reshape(C, T, N)
            )
        )
        jax.block_until_ready(f(pixels))
        return
    if name == "leaf_1d":
        # single image, flat 1D operand + flat idx
        f = jax.jit(
            lambda p: p.reshape(-1).astype(jnp.int32)[leaf_safe.reshape(-1)]
        )
        jax.block_until_ready(f(pixels[0, :, 0]))
        return
    if name == "leaf_vmap_u8":
        # gather BEFORE the int32 cast (u8 operand)
        f = jax.jit(jax.vmap(lambda p: p.T[:, leaf_safe].astype(jnp.int32)))
        jax.block_until_ready(f(pixels))
        return
    if name == "leaf_idx32k":
        ls = leaf_safe[:64]  # 32768 indices
        f = jax.jit(jax.vmap(lambda p: p.T.astype(jnp.int32)[:, ls]))
        jax.block_until_ready(f(pixels))
        return
    if name == "leaf_idx16k":
        ls = leaf_safe[:32]  # 16384 indices
        f = jax.jit(jax.vmap(lambda p: p.T.astype(jnp.int32)[:, ls]))
        jax.block_until_ready(f(pixels))
        return
    raise SystemExit(f"unknown candidate {name}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "none"
    run_candidate(name)
    print(json.dumps({"candidate": name, "probe_ms_per_step": probe_time()}))


if __name__ == "__main__":
    main()

# appended candidates (round-3 poison hunt)
