"""Compare decode variants at a large shape in one process: default
(merged in-scan), FRAVE_COMPAREFREE in-scan, FRAVE_SEG_DECODE segment-
bulk. Variants are re-selected per CodecProgram instance, so we rebuild
the program per variant while sharing geometry/schedule caches."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from benchmarks.big_probe import make_image  # noqa: E402


def run_variant(name, env, img, opts):
    import frave_tpu.codec.pipeline_jax as P

    for k, v in env.items():
        os.environ[k] = v
    # drop cached programs so __post_init__ re-reads the env flags
    P._program_cache.clear()
    from frave_tpu.codec.pipeline_jax import (
        _encode_dispatch,
        _encode_finish,
        decode_pipeline_jax_batch,
    )

    t0 = time.perf_counter()
    prog, dev, qm, m2 = _encode_dispatch([img], opts)
    cis = _encode_finish(prog, dev, qm, m2, opts)
    print(f"[{name}] encode cold: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    out = decode_pipeline_jax_batch(cis)
    print(f"[{name}] decode cold: {time.perf_counter()-t0:.2f}s", flush=True)
    best_e = best_d = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        prog, dev, qm, m2 = _encode_dispatch([img], opts)
        cis = _encode_finish(prog, dev, qm, m2, opts)
        best_e = min(best_e, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = decode_pipeline_jax_batch(cis)
        best_d = min(best_d, time.perf_counter() - t0)
    ok = np.array_equal(out[0].data, img.data)
    mp = img.data.shape[0] * img.data.shape[1] / 1e6
    print(
        f"[{name}] enc {best_e:.3f}s dec {best_d:.3f}s "
        f"rt {best_e+best_d:.3f}s = {mp/(best_e+best_d):.2f} MP/s "
        f"lossless={ok}",
        flush=True,
    )
    for k in env:
        os.environ[k] = "0"


def main():
    h = int(os.environ.get("PROBE_H", "2048"))
    w = int(os.environ.get("PROBE_W", "2048"))
    c = int(os.environ.get("PROBE_C", "3"))
    from frave_tpu import EncoderOptions, RasterImage
    from frave_tpu.images import ColorSpace, ImageMetadata

    meta = ImageMetadata(
        height=h, width=w,
        colorspace=ColorSpace.RGB if c == 3 else ColorSpace.Luma,
    )
    img = RasterImage(metadata=meta, data=make_image(h, w, c))
    opts = EncoderOptions()
    variants = os.environ.get("PROBE_VARIANTS", "default,seg,cmpfree")
    for v in variants.split(","):
        env = {}
        if v == "seg":
            env = {"FRAVE_SEG_DECODE": "1"}
        elif v == "cmpfree":
            env = {"FRAVE_COMPAREFREE": "1"}
        run_variant(v, env, img, opts)


if __name__ == "__main__":
    main()
