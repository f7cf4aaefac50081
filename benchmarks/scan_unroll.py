"""Measure lax.scan unroll sensitivity at the headline config (B=64,
256x256 gray). Run once per setting (compiled programs are cached per
process): `FRAVE_SCAN_UNROLL=4 python benchmarks/scan_unroll.py`.

The tunneled device charges a fixed ~0.3-1ms per scan loop trip;
`unroll` amortizes it against compiled-program size. Prints one JSON
line with encode/decode dispatch ms at the active unroll factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402


def main():
    from frave_tpu import EncoderOptions, RasterImage
    from frave_tpu.codec import pipeline_jax as P
    from frave_tpu.ops.rans_jax import SCAN_UNROLL

    B = 64
    corpus = make_corpus(B, 256, 256, 1, seed=42)
    imgs = [RasterImage.from_array(corpus[i]) for i in range(B)]
    opts = EncoderOptions(backend="jax")

    def enc():
        prog, dev, qm, meta = P._encode_dispatch(imgs, opts)
        jax.block_until_ready(dev)
        return prog, dev, qm, meta

    prog, dev, qm, meta = enc()  # compile
    enc_ms = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        enc()
        enc_ms = min(enc_ms, 1e3 * (time.perf_counter() - t0))

    cis = P._encode_finish(prog, dev, qm, meta, opts)

    def dec():
        pix, m2, C = P.decode_pipeline_jax_batch(cis, _defer=True)
        jax.block_until_ready(pix)
        return pix, m2, C

    pix, m2, C = dec()  # compile
    dec_ms = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        dec()
        dec_ms = min(dec_ms, 1e3 * (time.perf_counter() - t0))

    outs = P._decode_finish(pix, m2, C)
    for i in range(B):
        np.testing.assert_array_equal(outs[i].data, corpus[i])

    print(
        json.dumps(
            {
                "unroll": SCAN_UNROLL,
                "enc_dispatch_ms": round(enc_ms, 1),
                "dec_dispatch_ms": round(dec_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
