"""Zero-run-context pricing probe (round 5, VERDICT r4 #5).

VERDICT r4 priced a zero-run symbol for the zero-dominated bucket at
~9 KB on the screendoc image (7.34x -> ~6.9x PNG). This probe measures
the actual ceiling of that model class on the real data: it captures
the encoder's (symbols, buckets) in schedule order and prices bucket
0's zero runs under (a) iid per-symbol entropy (what the rANS tables
already approach within ~6%), (b) Elias-gamma run lengths + literal
entropy — the zero-run-context model, and (c) a markov-1 zero flag
(the upper bound of any 2-state run model).

Measured 2026-08-20 (screendoc 600x1000 gray crop):
  bucket0: 461,317 symbols, 455,750 zeros; 5,568 runs (mean 82)
  iid entropy     8.3 KB
  run-coded       6.9 KB  (3.8 run lengths + 3.0 literals)
  markov-1 flags  3.4 KB + 3.0 literals = 6.4 KB
so the whole prize of ANY per-symbol/run zero model on this content is
1.4-2 KB (~0.02 bpp of 2.071), not 9 KB — the 1.95 bpp target needs
LZ-class glyph-row matching, confirming the round-4 symbol-cost-bound
verdict. Negative result recorded; format stays v9.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCREENDOC = (
    "/opt/venv/lib/python3.12/site-packages/aqt/jax_legacy/"
    "jax/imagenet/imagenet.png",
    (600, 150, 1600, 750),
)


def main() -> int:
    from PIL import Image

    from frave_tpu.codec.options import EncoderOptions
    from frave_tpu.images import ColorSpace, RasterImage
    import frave_tpu.codec.pipeline_np as PN

    path, crop = SCREENDOC
    img = Image.open(path).convert("L").crop(crop)
    px = np.asarray(img)[..., None]

    captured = {}
    orig = PN.encode_lanes

    def hook(symbols, buckets, *a, **kw):
        captured.setdefault("sb", (symbols.copy(), buckets.copy()))
        return orig(symbols, buckets, *a, **kw)

    PN.encode_lanes = hook
    try:
        PN.encode_pipeline_np(
            RasterImage.from_array(px, ColorSpace.LUMA),
            EncoderOptions(backend="numpy"),
        )
    finally:
        PN.encode_lanes = orig
    sym, bkt = captured["sb"]
    s0 = sym[bkt == 0]
    z = s0 == 0
    n = z.size

    hist = np.bincount(s0, minlength=1024).astype(float)
    p = hist[hist > 0] / n
    iid_kb = -(p * np.log2(p)).sum() * n / 8 / 1024

    runs = []
    cur = 0
    for v in z:
        if v:
            cur += 1
        else:
            runs.append(cur)
            cur = 0
    runs.append(cur)
    runs = np.asarray(runs)
    gamma_kb = (2 * np.floor(np.log2(runs + 1)) + 1).sum() / 8 / 1024

    nz = s0[~z]
    hnz = np.bincount(nz, minlength=1024).astype(float)
    pnz = hnz[hnz > 0] / max(len(nz), 1)
    lit_kb = (
        -(pnz * np.log2(pnz)).sum() * len(nz) / 8 / 1024 if len(nz) else 0.0
    )

    z1, z2 = z[:-1], z[1:]
    hcond = 0.0
    for pz, wgt in (
        ((z1 & z2).sum() / max(z1.sum(), 1), int(z1.sum())),
        (((~z1) & z2).sum() / max((~z1).sum(), 1), int((~z1).sum())),
    ):
        for q in (pz, 1 - pz):
            if 0 < q < 1:
                hcond -= wgt * q * math.log2(q)
    print(
        f"bucket0 n={n} zeros={int(z.sum())} runs={runs.size} "
        f"(mean {runs.mean():.1f})"
    )
    print(f"iid entropy        {iid_kb:6.1f} KB")
    print(
        f"zero-run model     {gamma_kb + lit_kb:6.1f} KB "
        f"({gamma_kb:.1f} run lengths + {lit_kb:.1f} literals)"
    )
    print(f"markov-1 zero flag {hcond / 8 / 1024 + lit_kb:6.1f} KB")
    print(
        f"=> max recoverable ~{iid_kb - min(gamma_kb + lit_kb, hcond / 8 / 1024 + lit_kb):.1f} KB "
        "(vs the ~9 KB priced in VERDICT r4 #5) — negative result, "
        "format stays v9"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
