"""Channel transform stage.

Reference: crates/libfri/src/stages/channel_transform.rs:3-10 — an identity
placeholder with RGB->YCbCr left as a TODO. Here the stage is functional
and ADAPTIVE (format v7): each image carries an explicit transform id and
the encoder picks the cheapest candidate by a gradient-entropy proxy.

Transforms (all keep every coding plane in [0, 255], so the shared
1024-symbol residual alphabet still covers all residuals):
  0 NONE              identity
  1 SUBGREEN          R' = (R-G) mod 256, B' = (B-G) mod 256 (WebP-style)
  2 SUBGREEN_CLAMPED  lossy-mode variant: clamped difference (a
                      quantization error in G cannot wrap R/B by 256)
  3 YCOCG             YCoCg-R lifting with mod-256 wrap on Y/Co/Cg —
                      exactly invertible, usually decorrelates better
                      than subtract-green

The mod-256 wrap trick sidesteps the chroma range expansion that a plain
reversible YCbCr would need (+-255 chroma -> per-channel alphabet); the
cost is that content with saturated chroma steps can wrap, inflating
gradients — exactly what the adaptive proxy detects, falling back to
NONE/SUBGREEN per image.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..images import ColorSpace, RasterImage

T_NONE = 0
T_SUBGREEN = 1
T_SUBGREEN_CLAMPED = 2
T_YCOCG = 3


def subtract_green(arr: np.ndarray) -> np.ndarray:
    """[h, w, 3] uint8 RGB -> coding planes (G-relative, mod 256)."""
    out = arr.astype(np.int32).copy()
    out[:, :, 0] = (out[:, :, 0] - out[:, :, 1]) & 255
    out[:, :, 2] = (out[:, :, 2] - out[:, :, 1]) & 255
    return out.astype(np.uint8)


def add_green(arr: np.ndarray) -> np.ndarray:
    """Inverse of subtract_green."""
    out = arr.astype(np.int32).copy()
    out[:, :, 0] = (out[:, :, 0] + out[:, :, 1]) & 255
    out[:, :, 2] = (out[:, :, 2] + out[:, :, 1]) & 255
    return out.astype(np.uint8)


def subtract_green_clamped(arr: np.ndarray) -> np.ndarray:
    """Lossy-mode variant: clamped difference instead of mod-256 — a
    quantization error in G cannot wrap R/B by 256 (error stays bounded).
    Slightly lossy itself only where |R-G| or |B-G| > 127 (clamp)."""
    out = arr.astype(np.int32).copy()
    out[:, :, 0] = np.clip(out[:, :, 0] - out[:, :, 1] + 128, 0, 255)
    out[:, :, 2] = np.clip(out[:, :, 2] - out[:, :, 1] + 128, 0, 255)
    return out.astype(np.uint8)


def add_green_clamped(arr: np.ndarray) -> np.ndarray:
    """Inverse of subtract_green_clamped (up to its clamp)."""
    out = arr.astype(np.int32).copy()
    out[:, :, 0] = np.clip(out[:, :, 0] + out[:, :, 1] - 128, 0, 255)
    out[:, :, 2] = np.clip(out[:, :, 2] + out[:, :, 1] - 128, 0, 255)
    return out.astype(np.uint8)


def _signed(x: np.ndarray) -> np.ndarray:
    """Mod-256 value -> signed representative in [-128, 127]."""
    return ((x + 128) & 255) - 128


def ycocg(arr: np.ndarray) -> np.ndarray:
    """YCoCg-R-style lifting computed entirely in Z/256: every lifting
    step wraps mod 256 and half-steps use the SIGNED REPRESENTATIVE of
    the wrapped plane, so each step is a bijection on uint8 and the whole
    transform is exactly invertible without chroma range expansion.
    Behaves identically to true YCoCg-R wherever |R-B| and |G-t| < 128
    (the common case); elsewhere it wraps like subtract-green does."""
    r = arr[:, :, 0].astype(np.int32)
    g = arr[:, :, 1].astype(np.int32)
    b = arr[:, :, 2].astype(np.int32)
    co = (r - b) & 255
    t = (b + (_signed(co) >> 1)) & 255
    cg = (g - t) & 255
    y = (t + (_signed(cg) >> 1)) & 255
    return np.stack([y, co, cg], axis=-1).astype(np.uint8)


def ycocg_inverse(arr: np.ndarray) -> np.ndarray:
    """Exact inverse of ycocg: lifting steps reversed in Z/256."""
    y = arr[:, :, 0].astype(np.int32)
    co = arr[:, :, 1].astype(np.int32)
    cg = arr[:, :, 2].astype(np.int32)
    t = (y - (_signed(cg) >> 1)) & 255
    g = (cg + t) & 255
    b = (t - (_signed(co) >> 1)) & 255
    r = (co + b) & 255
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


_FORWARD = {
    T_NONE: lambda a: a,
    T_SUBGREEN: subtract_green,
    T_SUBGREEN_CLAMPED: subtract_green_clamped,
    T_YCOCG: ycocg,
}
_INVERSE = {
    T_NONE: lambda a: a,
    T_SUBGREEN: add_green,
    T_SUBGREEN_CLAMPED: add_green_clamped,
    T_YCOCG: ycocg_inverse,
}


def _proxy_stride(h: int, w: int) -> int:
    """Subsample stride for the selection proxy: images up to 512x512 use
    every pixel (stride 1 — unchanged behavior), larger ones sample a
    ~512x512 grid. The proxy only picks among 2-3 transforms whose cost
    gap on real content is large (tens of percent), so decimated gradients
    rank them identically while the host work stays O(512^2) instead of
    O(h*w) — the full-image proxy was the single largest host cost of a
    2048x2048 RGB encode (~1.7s, more than the device compute)."""
    return max(1, int(round((h * w / 262144.0) ** 0.5)))


def _proxy_cost(planes: np.ndarray) -> float:
    """Gradient-entropy proxy for coded size: sum of log2(1+|dx|)+
    log2(1+|dy|) over all planes (subsampled for large images, see
    _proxy_stride). Wrap artifacts show up as large gradients, which is
    exactly what makes them expensive to code."""
    s = _proxy_stride(planes.shape[0], planes.shape[1])
    a = planes[::s, ::s].astype(np.int32)
    dx = np.abs(np.diff(a, axis=1))
    dy = np.abs(np.diff(a, axis=0))
    return float(np.log2(1.0 + dx).sum() + np.log2(1.0 + dy).sum())


def select_transform(arr: np.ndarray, lossless: bool) -> int:
    """Adaptive per-image choice by the gradient proxy. Lossless
    candidates: NONE / SUBGREEN / YCOCG (all exactly invertible). Lossy:
    NONE / SUBGREEN_CLAMPED (mod-256 wraps amplify quantization error,
    so wrapping transforms are excluded — see round-1 regression test)."""
    if lossless:
        cands = (T_NONE, T_SUBGREEN, T_YCOCG)
    else:
        cands = (T_NONE, T_SUBGREEN_CLAMPED)
    costs = {t: _proxy_cost(_FORWARD[t](arr)) for t in cands}
    return min(costs, key=costs.get)


def choose_transform(
    arr: np.ndarray, color_transform: str, lossless: bool
) -> int:
    """Resolve an EncoderOptions.color_transform policy name to a concrete
    transform id for one RGB image WITHOUT applying it (the JAX pipeline
    applies transforms on device; the host only decides). Shared by
    forward() so every backend resolves policies identically — the id
    travels in the container's transform byte and any decoder inverts it."""
    if color_transform == "none":
        return T_NONE
    if color_transform == "auto":
        return select_transform(arr, lossless)
    if color_transform == "subtract-green":
        return T_SUBGREEN if lossless else T_SUBGREEN_CLAMPED
    if color_transform == "ycocg":
        if not lossless:
            raise ValueError("ycocg transform is lossless-only; use auto")
        return T_YCOCG
    raise ValueError(f"unknown color transform {color_transform!r}")


def forward(
    image: RasterImage, color_transform: str, lossless: bool = True
) -> Tuple[RasterImage, int]:
    """Encode-side transform into the coding colorspace. Returns the
    transformed image (metadata unchanged — the wire colorspace stays the
    source colorspace; the applied transform travels as the container's
    transform byte, format v7) and the transform id."""
    meta = image.metadata
    if meta.colorspace != ColorSpace.RGB or color_transform == "none":
        return image, T_NONE
    tid = choose_transform(image.data, color_transform, lossless)
    if tid == T_NONE:
        return image, T_NONE
    return (
        RasterImage(metadata=meta, data=_FORWARD[tid](image.data)),
        tid,
    )


def inverse(image: RasterImage, transform: int) -> RasterImage:
    """Decode-side inverse selected by the container's transform byte."""
    if transform == T_NONE:
        return image
    fn = _INVERSE.get(int(transform))
    if fn is None:
        raise ValueError(f"unknown channel transform id {transform}")
    return RasterImage(metadata=image.metadata, data=fn(image.data))
