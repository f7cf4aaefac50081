"""A/B: mode="grid" (dense lattice-grid decode, codec/grid_decode.py)
vs mode="parallel" (step-tensor decode, pipeline_jax.decode_fused) on
the real chip.

The grid layout exists to break the step-tensor decode floor — the
~per-step neighbour gather + coefficient scatter that is the decode
scan's loop-carried critical path (the TPU-first replacement of the
reference's symbol-sequential decode recursion,
entropy_coding.rs:354-449). This script produces the recorded verdict
VERDICT r3 #1 demands: wall-clock + device-compute, enc/dec split,
lossless-verified, at the headline shape and at config 3.

Usage:
    python benchmarks/grid_ab.py [--shapes 256,2048] [--reps N]
Prints one JSON line per (shape, mode) and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # repo-root bench harness (corpus gen + measured paths)


def run_config(tag, corpus, batch_size, reps):
    out = {"config": tag, "mode": os.environ["FRAVE_BENCH_MODE"]}
    out["wall_rt_mp_s"] = round(
        bench.bench_jax(corpus, reps=reps, batch_size=batch_size), 3
    )
    enc, dec = bench.bench_split(corpus, reps=max(2, reps - 1), batch_size=batch_size)
    out["wall_enc_mp_s"], out["wall_dec_mp_s"] = round(enc, 3), round(dec, 3)
    denc, ddec = bench.bench_device(corpus, reps=reps, batch_size=batch_size)
    out["dev_enc_mp_s"], out["dev_dec_mp_s"] = round(denc, 3), round(ddec, 3)
    out["dev_rt_mp_s"] = round(1.0 / (1.0 / denc + 1.0 / ddec), 3)
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="256,2048")
    ap.add_argument("--modes", default="parallel,grid")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    print(json.dumps({"tunnel": bench.tunnel_health()}), flush=True)

    configs = []
    if "256" in args.shapes:
        configs.append(("256x256 gray B=64", bench.make_corpus(64, 256, 256, 1, seed=7), 64))
    if "2048" in args.shapes:
        configs.append(("2048x2048 RGB", bench.make_corpus(2, 2048, 2048, 3, seed=7), 1))

    results = []
    for mode in args.modes.split(","):
        os.environ["FRAVE_BENCH_MODE"] = mode
        for tag, corpus, bs in configs:
            results.append(run_config(tag, corpus, bs, args.reps))
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
