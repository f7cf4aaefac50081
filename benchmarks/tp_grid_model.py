"""Grid-mode TP-decode cost model (round 5, VERDICT r4 #3).

Replaces tp_decode_model.py's step-tensor analysis for the new
lane-sharded grid path (parallel/sharded.TPShardedDecoder._build_grid):

  * the loop-carried scan body is shard-local rANS ALU -> scales ~1/n
    (measured single-chip scan floor: benchmarks/grid_cost_probe.py);
  * the per-STEP collective is a [n_dev, C] i32 renorm-count
    all_gather (~tens of bytes) — payload independent of the
    coefficient plane, vs the step-tensor path's per-step
    (value, flag) plane gather that capped scaling at ~1.2x
    (tp_decode_model.py);
  * per WAVE one values all_gather (total = K*C i32 over the image)
    feeds the bulk grid machinery; tap planes and the to_grid dense
    -grid build stay replicated, while pack gathers + context math,
    the final pixel gather, the per-context table regeneration
    (flattened over the C*CA contexts), dequant + inverse lifting
    (tile-axis split, one leaves all_gather) and the per-wave
    coefficient scatter (host-partitioned local slot plans) are all
    sharded.

Projection from the measured 2048x2048 RGB single-chip splits
(grid_cost_probe + decode-tail probes, 2026-08-21, this repo):

    scan 0.147 s (sharded) | pack+ctx 0.062 (sharded) |
    pixel gather 0.049 (sharded) | tables 0.047 (sharded) |
    lifting 0.024 (sharded) | tap planes 0.033 (repl) |
    scatters+to_grid 0.047 (repl) | misc 0.03 (repl)

    python benchmarks/tp_grid_model.py
"""

from __future__ import annotations

import json

# measured single-chip splits at 2048x2048 RGB (seconds).
# Round-5 second pass moved three more stages into the sharded set:
# tables (per-context finalize + compare planes, flattened over the
# C*CA contexts, one ~190 KB plane all_gather), dequant+lifting
# (tile-axis split, one [C, T*N] i32 ~63 MB leaves all_gather), and
# the per-wave coefficient scatter (host-partitioned per-shard slot
# plans into the LOCAL tile-slot buffer — no extra collective; the
# to_grid dense-grid build for the next wave's taps stays replicated).
SHARDED = {
    "scan": 0.147,
    "pack_ctx": 0.062,
    "pixels": 0.049,
    "tables": 0.047,
    "lifting": 0.024,
    "scatter": 0.023,
}
REPLICATED = {
    "tap_planes": 0.033,
    "to_grid": 0.024,
    "misc": 0.030,
}
# per-step collective: [n_dev, C] i32 counts, latency-bound (~5 us on
# ICI at these payloads); 266 rows + 11 per-wave value gathers
ROWS = 266
ICI_STEP_S = 5e-6
WAVE_GATHER_S = 11 * 50e-6  # ~4 MB values over ICI per image total
# one-shot gathers of the second pass: compare planes (~190 KB) +
# leaves ([C, T*N] i32 ~63 MB at 45 GB/s effective ICI, conservative)
ONESHOT_GATHER_S = 0.0001 + 0.002


def main() -> int:
    t1 = sum(SHARDED.values()) + sum(REPLICATED.values())
    print(
        json.dumps(
            {
                "t1_model_s": round(t1, 3),
                "sharded_s": round(sum(SHARDED.values()), 3),
                "replicated_s": round(sum(REPLICATED.values()), 3),
            }
        )
    )
    for n in (1, 2, 4, 8):
        tn = (
            sum(SHARDED.values()) / n
            + sum(REPLICATED.values())
            + (
                ROWS * ICI_STEP_S + WAVE_GATHER_S + ONESHOT_GATHER_S
                if n > 1
                else 0.0
            )
        )
        print(
            json.dumps(
                {
                    "n": n,
                    "t_s": round(tn, 3),
                    "speedup": round(t1 / tn, 2),
                }
            )
        )
    print(
        json.dumps(
            {
                "note": "step-tensor TP path capped at ~1.2x "
                "(tp_decode_model.py); the grid path's replicated bulk "
                "ops floor it at ~5x for n -> inf at this shape — "
                "halo-sharding the per-wave tap planes / to_grid dense "
                "grids over the grid row axis is the last headroom"
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys = __import__("sys")
    sys.exit(main())
