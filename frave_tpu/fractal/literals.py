"""Tame-twindragon displacement literals and optimal tile centers.

The codec unfolds each tile's binary tree onto the pixel grid by adding a
per-level integer displacement ("literal") — a rounded power of the
tame-twindragon complex base b = (1 + i*sqrt(7)) / 2, |b|^2 = 2.

Reference: /root/reference/crates/libfri/src/fractal.rs:51-86 hardcodes 30
literals (with the float generator left in a comment at fractal.rs:3-23);
CENTERS at fractal.rs:33-49 stores offline-optimized fractal-space centers
per bounding rectangle. We re-derive the generator so depth is not capped
by a fixed table, and keep the same values for the indices the reference
can reach (verified in tests/test_literals.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

Complexi = Tuple[int, int]  # (re, im)


@lru_cache(maxsize=None)
def generate_literals(n: int, d: float = 1.0) -> Tuple[Complexi, ...]:
    """Re-derivation of the commented-out generator (fractal.rs:3-23).

    base = d/2 + i*sqrt(2 - (d/2)^2); literal[k] for k >= 1 is
    (-1)^k * (round(-pow.re / base.re), round(pow.im / base.im)) with
    pow = base^(k-1); literal[0] = i, and entries 1 and 2 are swapped.
    d=1 gives the tame twindragon (|base|^2 = 2). The odd-power sign flip
    is not in the reference's commented-out generator (fractal.rs:3-23)
    but is required to reproduce its actual LITERALS table — verified
    entry-by-entry in tests/test_literals.py.
    """
    import math

    base_re = d / 2.0
    base_im = math.sqrt(2.0 - (d / 2.0) ** 2)
    out: List[Complexi] = [(0, 0)] * n
    pow_re, pow_im = 1.0, 0.0
    for k in range(1, n):
        sign = -1 if k % 2 == 1 else 1
        out[k] = (
            sign * int(round(-pow_re / base_re)),
            sign * int(round(pow_im / base_im)),
        )
        pow_re, pow_im = (
            pow_re * base_re - pow_im * base_im,
            pow_re * base_im + pow_im * base_re,
        )
    out[0] = (0, 1)
    if n > 2:
        out[1], out[2] = out[2], out[1]
    return tuple(out)


# The working set (reference table, fractal.rs:51-86). BASE_FRAC_DEPTH = 9
# only ever touches indices 0..10 (tree unfold uses depth-level-1 <= 8;
# neighbour vectors use [scale] and [scale+1] with scale <= 9+1).
LITERALS: Tuple[Complexi, ...] = generate_literals(30)

# (max_rect(w, h), center(re, im), depth) — optimal fractal-space centers per
# bounding rectangle (reference fractal.rs:33-49, raw data rects.txt). Only
# consumed by calculate_depth_center, which is dead code in the reference
# (wavelet_transform.rs:228-235); kept for API parity and future variable
# depth support.
CENTERS: Tuple[Tuple[Tuple[int, int], Complexi, int], ...] = (
    ((17, 8), (1, 2), 9),
    ((47, 9), (31, 1), 10),
    ((41, 26), (26, 18), 11),
    ((88, 15), (21, 7), 12),
    ((108, 65), (88, 43), 14),
    ((227, 60), (82, 41), 15),
    ((202, 149), (88, 40), 16),
    ((284, 84), (266, 52), 17),
    ((649, 148), (246, 130), 18),
    ((651, 418), (175, 130), 19),
    ((1542, 333), (1120, 130), 20),
    ((997, 458), (449, 421), 21),
    ((1148, 883), (74, 320), 22),
    ((4243, 960), (2869, 215), 23),
    ((3648, 2439), (2375, 1725), 24),
)


def calculate_depth_center(img_w: int, img_h: int) -> Tuple[int, Complexi]:
    """First CENTERS entry whose rectangle covers (img_w, img_h).

    Reference wavelet_transform.rs:228-235 (dead code there; functional
    here for future variable-depth tiling).
    """
    for (w, h), center, depth in CENTERS:
        if w >= img_w and h >= img_h:
            return depth, center
    raise ValueError(f"no precomputed center covers {img_w}x{img_h}")
