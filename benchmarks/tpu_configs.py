"""TPU numerators for the per-config ratio table (VERDICT r3 #3).

Measures, at every BASELINE config shape the round-3 C-baseline table
covers (BASELINE.md: 512^2 gray, 1024^2 RGB, 2048^2 RGB, mixed
16-image corpus): wall-clock round trip, encode/decode split,
device-compute split — and the faithful C baseline (csrc/refbase.cpp,
per-image lattice rebuild like the reference CLI,
wavelet_transform.rs:405,392) in the SAME run on the same content, so
every ratio is same-session apples-to-apples. Content matches
benchmarks/refbase_configs.py (big_probe.make_image).

Usage: python benchmarks/tpu_configs.py [--configs 512,1024,2048,mixed]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (repo-root harness: tunnel_health, bench_*)
from benchmarks.big_probe import make_image  # noqa: E402


def refbase_mp_s(imgs, reps=2) -> dict:
    """Faithful C baseline on these images: enc/dec/rt MP/s."""
    from frave_tpu.native import refbase_roundtrip

    if refbase_roundtrip(imgs[0]) is None:
        return {}
    mp = sum(im.shape[0] * im.shape[1] for im in imgs) / 1e6
    te_b = td_b = 1e18
    for _ in range(reps):
        te = td = 0.0
        for im in imgs:
            e, d, _ = refbase_roundtrip(im, cache_geometry=False)
            te += e
            td += d
        te_b, td_b = min(te_b, te), min(td_b, td)
    return {
        "ref_enc_mp_s": round(mp / te_b, 3),
        "ref_dec_mp_s": round(mp / td_b, 3),
        "ref_rt_mp_s": round(mp / (te_b + td_b), 3),
    }


def run_uniform(tag, h, w, c, n, bs, reps):
    corpus = np.stack([make_image(h, w, c, seed=i) for i in range(n)])
    out = {"config": tag, "mode": bench._bench_opts().mode}
    out["wall_rt_mp_s"] = round(bench.bench_jax(corpus, reps=reps, batch_size=bs), 3)
    # device-verified wall: losslessness checked ON CHIP (one scalar
    # fetch per batch instead of the decoded-pixel downlink) — the
    # bench-mode transfer discipline the headline bench.py uses
    out["wall_vrt_mp_s"] = round(
        bench.bench_jax(
            corpus, reps=reps, batch_size=bs, device_verify=True
        ),
        3,
    )
    enc, dec = bench.bench_split(corpus, reps=max(2, reps - 1), batch_size=bs)
    out["wall_enc_mp_s"], out["wall_dec_mp_s"] = round(enc, 3), round(dec, 3)
    denc, ddec = bench.bench_device(corpus, reps=reps, batch_size=bs)
    out["dev_enc_mp_s"], out["dev_dec_mp_s"] = round(denc, 3), round(ddec, 3)
    out["dev_rt_mp_s"] = round(1.0 / (1.0 / denc + 1.0 / ddec), 3)
    out.update(refbase_mp_s([corpus[i] for i in range(min(n, 4))]))
    if "ref_rt_mp_s" in out:
        out["wall_ratio"] = round(out["wall_rt_mp_s"] / out["ref_rt_mp_s"], 2)
        out["wall_verify_ratio"] = round(
            out["wall_vrt_mp_s"] / out["ref_rt_mp_s"], 2
        )
        out["dev_ratio"] = round(out["dev_rt_mp_s"] / out["ref_rt_mp_s"], 2)
    print(json.dumps(out), flush=True)


def run_mixed(reps):
    """Config-4 shape mix (matches refbase_configs RB_MIXED): 16 images
    128..512 px, shape-bucketed stream pipelines."""
    from frave_tpu import RasterImage
    from frave_tpu.codec.pipeline_jax import roundtrip_pipeline_jax_stream

    sizes = [(128, 128), (256, 256), (384, 256), (512, 512)]
    arrays = [make_image(h, w, 1, seed=i) for i, (h, w) in enumerate(sizes * 4)]
    imgs = [RasterImage.from_array(a) for a in arrays]
    mp = sum(a.shape[0] * a.shape[1] for a in arrays) / 1e6
    opts = bench._bench_opts()

    buckets = {}
    for i, a in enumerate(arrays):
        buckets.setdefault(a.shape, []).append(i)

    def run_once():
        outs = [None] * len(imgs)
        for shape, idxs in buckets.items():
            _, dec = roundtrip_pipeline_jax_stream(
                [imgs[i] for i in idxs], opts, batch_size=len(idxs)
            )
            for i, d in zip(idxs, dec):
                outs[i] = d
        return outs

    outs = run_once()  # warm
    for i in range(len(imgs)):
        np.testing.assert_array_equal(outs[i].data, arrays[i])
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        best = max(best, mp / (time.perf_counter() - t0))
    out = {
        "config": f"mixed {len(imgs)} imgs {mp:.2f} MP",
        "mode": opts.mode,
        "wall_rt_mp_s": round(best, 3),
    }
    out.update(refbase_mp_s(arrays, reps=1))
    if "ref_rt_mp_s" in out:
        out["wall_ratio"] = round(best / out["ref_rt_mp_s"], 2)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="512,1024,2048,mixed")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(json.dumps({"tunnel": bench.tunnel_health()}), flush=True)
    want = args.configs.split(",")
    if "512" in want:
        run_uniform("512x512 gray", 512, 512, 1, 16, 16, args.reps)
    if "1024" in want:
        run_uniform("1024x1024 RGB", 1024, 1024, 3, 4, 2, args.reps)
    if "2048" in want:
        run_uniform("2048x2048 RGB", 2048, 2048, 3, 2, 1, args.reps)
    if "mixed" in want:
        run_mixed(args.reps)


if __name__ == "__main__":
    main()
