"""Decoder driver (reference decoder.rs:6-59)."""

from __future__ import annotations

from typing import Optional

from ..images import RasterImage
from .container import deserialize
from .pipeline_np import decode_pipeline_np


class FRIDecoder:
    """Mirror of FRIDecoder (decoder.rs:44-59)."""

    def __init__(self, backend: str = "auto"):
        self.backend = backend

    def _select_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        try:
            import jax  # noqa: F401

            return "jax"
        except Exception:
            return "numpy"

    def decode(self, data: bytes) -> RasterImage:
        backend = self._select_backend()
        if backend == "native":
            # the independent C++ frif implementation (csrc/frif.cpp —
            # the cross-implementation format oracle, round 5); grid
            # containers only
            from ..images import ImageMetadata, ColorSpace
            from ..native import frif_decode_native

            out = frif_decode_native(data)
            if out is None:
                raise RuntimeError(
                    "native library unavailable (make -C csrc)"
                )
            meta = ImageMetadata(
                height=out.shape[0],
                width=out.shape[1],
                colorspace=(
                    ColorSpace.LUMA if out.shape[2] == 1 else ColorSpace.RGB
                ),
            )
            return RasterImage(metadata=meta, data=out)
        compressed = deserialize(data)
        if backend == "jax":
            from .pipeline_jax import decode_pipeline_jax

            return decode_pipeline_jax(compressed)
        return decode_pipeline_np(compressed)


def decode(data: bytes, backend: str = "auto") -> RasterImage:
    return FRIDecoder(backend).decode(data)
