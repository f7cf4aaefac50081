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
        compressed = deserialize(data)
        if self._select_backend() == "jax":
            from .pipeline_jax import decode_pipeline_jax

            return decode_pipeline_jax(compressed)
        return decode_pipeline_np(compressed)


def decode(data: bytes, backend: str = "auto") -> RasterImage:
    return FRIDecoder(backend).decode(data)
