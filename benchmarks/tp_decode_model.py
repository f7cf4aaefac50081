"""TPShardedDecoder performance story (VERDICT r2 #6 / r3 #7).

Two parts, both runnable on the virtual CPU mesh (no TPU needed):

1. COLLECTIVE COUNT — compile the lane-sharded decode on an 8-device
   mesh and count the collectives in the optimized HLO: the design
   claim is ONE small all-gather per scan step (inside the while body,
   so it appears once in the HLO), and NO full-plane collectives.
   Reports the op count and the per-step collective payload bytes.

2. CROSSOVER MODEL — combine the measured single-chip per-step cost
   split (BASELINE.md round 4: at 2048x2048 RGB mode=parallel the
   fused decode costs ~10.0 ms/step, of which the grid-mode A/B
   isolates ~3.2 ms/step as the lane-proportional rANS ALU share and
   ~6.8 ms/step as coefficient-plane gather/scatter + step machinery
   that the TP decoder REPLICATES on every shard) with the ICI
   collective floor (~5 us for a KB-scale all-gather on a v5e slice;
   jax-ml.github.io/scaling-book collective model) to predict the TP
   decode speedup and state the crossover.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python benchmarks/tp_decode_model.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def collective_count():
    import jax.numpy as jnp

    from frave_tpu.codec.container import deserialize
    from frave_tpu.codec.encoder import FRIEncoder
    from frave_tpu.codec.options import EncoderOptions
    from frave_tpu.codec.pipeline_jax import assemble_wire_batch
    from frave_tpu.parallel.mesh import make_mesh
    from frave_tpu.parallel.sharded import TPShardedDecoder

    rng = np.random.default_rng(3)
    h, w = 64, 96
    arr = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="jax", num_lanes=64)).encode(arr)
    ci = deserialize(blob)
    mesh = make_mesh(8, shape=(1, 8))
    dec = TPShardedDecoder(height=h, width=w, channels=1, mesh=mesh)
    out = dec.decode(blob)  # compiles + lossless sanity
    np.testing.assert_array_equal(out.data, arr)

    wire = assemble_wire_batch([ci], ci.num_lanes)
    W = wire[1].shape[-1]
    prog, fn = dec._program(ci.num_lanes, ci.mode, W)
    (
        states, streams, bits, offpk, scales, vparams, wparams, qdiv, tids
    ) = wire
    args = (
        jnp.asarray(states[0]), jnp.asarray(streams[0]),
        jnp.asarray(bits[0]), jnp.asarray(offpk[0]),
        jnp.asarray(scales[0]), jnp.asarray(vparams[0]),
        jnp.asarray(wparams[0]), jnp.asarray(qdiv[0]),
        jnp.asarray(tids[0]), prog._lap, *prog._dec_args,
    )
    hlo = fn.lower(*args).compile().as_text()
    counts = {
        name: len(re.findall(name, hlo))
        for name in ("all-gather", "collective-permute", "all-reduce", "all-to-all")
    }
    # per-step all-gather payload: (value, flag) pairs for the local
    # lanes of every shard — C * NL * 2 i32 lanes gathered to all
    steps = prog.num_steps
    payload = ci.num_lanes * 2 * 4  # bytes gathered per step (C=1)
    return {
        "hlo_collectives": counts,
        "scan_steps": steps,
        "per_step_all_gather_bytes": payload,
    }


def crossover_model():
    """Measured split at 2048x2048 RGB (BASELINE.md round 4):
    ~3.3 ms/step total = ~2.8 ms replicated plane gather/scatter +
    step machinery + ~0.5 ms lane ALU (round-3 scan-floor isolation:
    0.322 s over 647 grid rows)."""
    fixed_ms = 2.8  # replicated per shard: plane gather/scatter + step machinery
    lane_ms = 0.5  # lane-proportional rANS ALU share
    ici_ms = 0.005  # KB-scale all-gather on ICI (scaling-book latency floor)
    single = fixed_ms + lane_ms
    rows = {}
    for n in (2, 4, 8):
        per_step = fixed_ms + lane_ms / n + ici_ms
        rows[str(n)] = {
            "ms_per_step": round(per_step, 2),
            "speedup": round(single / per_step, 3),
        }
    return {
        "model": "per_step = fixed(2.8ms, replicated) + lane(0.5ms)/n + ici(5us)",
        "single_chip_ms_per_step": single,
        "tp": rows,
        "verdict": (
            "mode=parallel TP decode tops out at ~1.2x regardless of n: "
            "the replicated coefficient-plane gather/scatter dominates. "
            "Crossover vs a second INDEPENDENT image decoded on the other "
            "chip (DP, 2.0x) is never reached - use TPShardedDecoder only "
            "when one image exceeds single-chip memory, or with mode=grid "
            "where the gather/scatter floor is gone and TP sharding the "
            "~0.5ms/row lane ALU approaches n-fold on the scan share "
            "before the per-wave bulk ops floor it."
        ),
    }


def main():
    out = {"collectives": collective_count(), "crossover": crossover_model()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
