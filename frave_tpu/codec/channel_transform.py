"""Channel transform stage.

Reference: crates/libfri/src/stages/channel_transform.rs:3-10 — an identity
placeholder with RGB->YCbCr left as a TODO. Here the stage is a real
module boundary with the identity transform implemented and the reversible
color transform staged behind a capability check:

A lossless RCT (JPEG2000-style: Y=(R+2G+B)>>2, Cb=B-G, Cr=R-G) expands
chroma residual range to +-765, which overflows the 1024-symbol zig-zag
alphabet shared with the reference (ALPHABET_SIZE, entropy_coding.rs:25).
Supporting it losslessly therefore requires per-channel alphabet sizing in
the container — tracked as a format v4 feature; until then requesting
YCBCR on encode raises instead of silently corrupting.
"""

from __future__ import annotations

from ..images import ColorSpace, RasterImage


def forward(image: RasterImage, target: ColorSpace) -> RasterImage:
    """Encode-side transform into the coding colorspace."""
    src = image.metadata.colorspace
    if target == src:
        return image
    if target == ColorSpace.YCBCR:
        raise NotImplementedError(
            "reversible YCbCr needs per-channel alphabet sizing (format v4); "
            "encode in RGB or LUMA"
        )
    raise ValueError(f"unsupported channel transform {src} -> {target}")


def inverse(image: RasterImage) -> RasterImage:
    """Decode-side transform back to display colorspace (identity for
    LUMA/RGB; YCBCR handled with the v4 format)."""
    if image.metadata.colorspace == ColorSpace.YCBCR:
        raise NotImplementedError("YCBCR containers are a format v4 feature")
    return image
