"""Haar-style lifting over fractal tile trees (numpy host implementation).

Forward (reference extract_coefficients, wavelet_transform.rs:179-225):
bottom-up over the per-tile binary tree,
    coef[p] = L - R            (missing side reads as 0)
    low[p]  = R + coef[p] / 2  (Rust truncated division)
with DC stored at index 0 (coef[0] = low[1]).

Inverse (extract_values, wavelet_transform.rs:358-381): top-down,
    R = low - coef/2 ; L = coef + R.

The Option<i32> missing-value semantics (try_apply,
wavelet_transform.rs:14-26) are carried by geometry masks: a node's
coefficient exists iff any in-bounds leaf lies under it, and a missing
side contributes 0. Values under mask-false nodes are never written to
pixels, so the vectorized inverse can compute them unmasked.

Data layout: coefficients are [..., T, N] with N = 2**depth; node p's
children occupy 2p, 2p+1 so each level is a strided slice — the lifting is
log2(N) vectorized passes with zero gathers.
"""

from __future__ import annotations

import numpy as np

from ..utils import trunc_div
from ..fractal.geometry import FractalGeometry


def forward_lifting_np(pixels: np.ndarray, geo: FractalGeometry) -> np.ndarray:
    """pixels: [C, H*W] integer array. Returns coefficients [C, T, N] int32
    (0 at mask-false slots).

    Mask-aware divergence from the reference (wavelet_transform.rs:179-225,
    where a missing side reads as 0): when exactly one child is present
    the difference is coded as 0 and the low passes the present value
    through. The reference's read-as-0 makes every boundary tile pay
    full-magnitude coefficients at every level (content ~128 against a
    phantom 0) — a perimeter-sized rate tax on every image. Which
    children exist is a static property of the geometry, so the inverse
    reproduces the choice exactly (child_masks below)."""
    n = geo.nodes_per_tile
    depth = geo.depth
    P = geo.pixel_gather.astype(np.int64)  # [T, N]
    inb = P >= 0
    leaves = np.where(inb[None], pixels[:, np.clip(P, 0, None)], 0).astype(np.int64)

    C = pixels.shape[0]
    T = geo.num_tiles
    coef = np.zeros((C, T, n), dtype=np.int64)

    vals = leaves  # children values of the current level
    mask = np.broadcast_to(inb[None], leaves.shape)
    for level in range(depth - 1, -1, -1):
        lo, hi = 1 << level, 1 << (level + 1)
        L = vals[..., 0::2]
        R = vals[..., 1::2]
        Lm = mask[..., 0::2]
        Rm = mask[..., 1::2]
        l0 = np.where(Lm, L, 0)
        r0 = np.where(Rm, R, 0)
        both = Lm & Rm
        c = np.where(both, l0 - r0, 0)
        low = np.where(both, r0 + trunc_div(c, 2), l0 + r0)
        coef[..., lo:hi] = c
        vals = low
        mask = Lm | Rm
    coef[..., 0] = np.where(mask[..., 0], vals[..., 0], 0)
    return coef.astype(np.int32)


def child_masks(geo: FractalGeometry):
    """Per level l in [0, depth): (Lm, Rm) [T, 2**l] bool — presence of the
    left/right child of each node expanded at that level. Children of
    level depth-1 nodes are leaves (pixel in-bounds mask)."""
    depth = geo.depth
    inb = geo.pixel_gather >= 0
    node = geo.coef_mask  # [T, N] node presence
    out = []
    for level in range(depth):
        lo, hi = 1 << level, 1 << (level + 1)
        if level == depth - 1:
            Lm = inb[:, 0::2]
            Rm = inb[:, 1::2]
        else:
            Lm = node[:, 2 * lo : 2 * hi : 2]
            Rm = node[:, 2 * lo + 1 : 2 * hi : 2]
        out.append((Lm, Rm))
    return out


def inverse_lifting_np(coef: np.ndarray, geo: FractalGeometry) -> np.ndarray:
    """coef: [C, T, N] int. Returns pixels [C, H*W] uint8 (values clamped to
    0..255 as RasterImage::set_pixel does, images.rs:109). Mask-aware
    mirror of forward_lifting_np: single-child nodes pass the low through."""
    n = geo.nodes_per_tile
    depth = geo.depth
    coef = coef.astype(np.int64)
    C, T, _ = coef.shape
    cm = child_masks(geo)

    vals = coef[..., 0:1].copy()  # low of node 1
    for level in range(depth):
        lo, hi = 1 << level, 1 << (level + 1)
        c = coef[..., lo:hi]
        Lm, Rm = cm[level]
        both = (Lm & Rm)[None]
        right = np.where(both, vals - trunc_div(c, 2), vals)
        left = np.where(both, c + right, vals)
        nxt = np.empty((C, T, 2 * (hi - lo)), dtype=np.int64)
        nxt[..., 0::2] = left
        nxt[..., 1::2] = right
        vals = nxt

    P = geo.pixel_gather.astype(np.int64)
    inb = P >= 0
    pixels = np.zeros((C, geo.height * geo.width), dtype=np.int64)
    flat_idx = P[inb]
    for ch in range(C):
        pixels[ch, flat_idx] = vals[ch][inb]
    return np.clip(pixels, 0, 255).astype(np.uint8)


def quantize_np(coef: np.ndarray, qmatrix: np.ndarray, geo: FractalGeometry) -> np.ndarray:
    """Per-tree-layer truncated divide (quantization.rs:7-25); layer of haar
    index i is floor(log2(i+1))."""
    n = geo.nodes_per_tile
    layers = np.floor(np.log2(np.arange(n, dtype=np.float64) + 1)).astype(np.int64)
    q = qmatrix.astype(np.int64)[layers]  # [N]
    return trunc_div(coef.astype(np.int64), q[None, None, :]).astype(np.int32)


def dequantize_np(coef: np.ndarray, qmatrix: np.ndarray, geo: FractalGeometry) -> np.ndarray:
    """Inverse: multiply back with midpoint bias toward the bin center.

    The reference's decode-side divides again (quantization.rs:27-45), a
    bug that is harmless only because its matrix is all-ones (SURVEY.md
    section 2.1) — deliberately fixed here. For q=1 this is exact identity,
    preserving lossless round trips.
    """
    n = geo.nodes_per_tile
    layers = np.floor(np.log2(np.arange(n, dtype=np.float64) + 1)).astype(np.int64)
    q = qmatrix.astype(np.int64)[layers][None, None, :]
    c = coef.astype(np.int64)
    bias = np.sign(c) * ((q - 1) // 2)
    return (c * q + bias).astype(np.int32)
