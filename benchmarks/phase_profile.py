"""Phase-level wall-clock breakdown of the headline bench config.

Times, per 64-image batch of 256x256 gray on the live backend:
  * encode dispatch (device compute, block_until_ready)
  * encode fetch + host unpack (container build)
  * serialize/deserialize host mux
  * decode dispatch (device compute)
  * decode fetch + finish
Prints a JSON dict of medians in ms.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402


def main():
    from frave_tpu import EncoderOptions, RasterImage
    from frave_tpu.codec.container import deserialize, serialize
    from frave_tpu.codec import pipeline_jax as P

    B = 64
    corpus = make_corpus(B, 256, 256, 1, seed=42)
    imgs = [RasterImage.from_array(corpus[i]) for i in range(B)]
    opts = EncoderOptions(backend="jax")

    def once(record):
        t0 = time.perf_counter()
        prog, dev, qm, meta = P._encode_dispatch(imgs, opts)
        import jax

        jax.block_until_ready(dev)
        t1 = time.perf_counter()
        cis = P._encode_finish(prog, dev, qm, meta, opts)
        t2 = time.perf_counter()
        blobs = [serialize(ci) for ci in cis]
        cis2 = [deserialize(b) for b in blobs]
        t3 = time.perf_counter()
        pixels_dev, meta2, C = P.decode_pipeline_jax_batch(cis2, _defer=True)
        jax.block_until_ready(pixels_dev)
        t4 = time.perf_counter()
        outs = P._decode_finish(pixels_dev, meta2, C)
        t5 = time.perf_counter()
        if record is not None:
            record["enc_compute_ms"].append(1e3 * (t1 - t0))
            record["enc_fetch_unpack_ms"].append(1e3 * (t2 - t1))
            record["host_mux_ms"].append(1e3 * (t3 - t2))
            record["dec_compute_ms"].append(1e3 * (t4 - t3))
            record["dec_fetch_finish_ms"].append(1e3 * (t5 - t4))
        return outs

    outs = once(None)  # warmup/compile
    for i in range(B):
        np.testing.assert_array_equal(outs[i].data, corpus[i])

    rec = {
        k: []
        for k in (
            "enc_compute_ms",
            "enc_fetch_unpack_ms",
            "host_mux_ms",
            "dec_compute_ms",
            "dec_fetch_finish_ms",
        )
    }
    for _ in range(5):
        once(rec)
    med = {k: round(float(np.median(v)), 1) for k, v in rec.items()}
    total = sum(med.values())
    med["total_ms"] = round(total, 1)
    med["MP"] = round(B * 256 * 256 / 1e6, 3)
    med["MP/s"] = round(med["MP"] / (total / 1e3), 3)

    from frave_tpu.fractal.schedule import get_lane_steps, get_schedule
    from frave_tpu.fractal.geometry import BASE_FRAC_DEPTH

    sched = get_schedule(256, 256, mode=opts.mode)
    from frave_tpu.fractal.schedule import default_num_lanes

    nl = default_num_lanes(sched.num_symbols)
    steps = get_lane_steps(256, 256, nl, BASE_FRAC_DEPTH, mode=opts.mode)
    med["num_steps"] = int(steps.num_steps)
    med["num_lanes"] = nl
    med["num_symbols"] = int(sched.num_symbols)
    print(json.dumps(med))


if __name__ == "__main__":
    main()
