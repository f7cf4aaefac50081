"""Encoder driver: pipeline state machine + public API.

Reference: encoder.rs:6-109 (EncoderStage state machine, FRIEncoder).
The stage graph is fixed, so instead of a runtime enum walk the driver
just calls the selected backend's fused pipeline; the state-machine
stages survive as the module boundaries (channel transform, wavelet,
quantization, prediction, entropy coding, serialize).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..images import ColorSpace, RasterImage
from .container import serialize
from .options import EncoderOptions
from .pipeline_np import encode_pipeline_np


def _select_backend(opts: EncoderOptions) -> str:
    if opts.backend != "auto":
        return opts.backend
    try:
        import jax  # noqa: F401

        return "jax"
    except Exception:
        return "numpy"


class FRIEncoder:
    """Mirror of FRIEncoder (encoder.rs:82-109)."""

    def __init__(self, opts: Optional[EncoderOptions] = None):
        self.opts = opts or EncoderOptions()

    def encode(
        self,
        data: Union[np.ndarray, RasterImage],
        height: Optional[int] = None,
        width: Optional[int] = None,
        colorspace: Optional[ColorSpace] = None,
    ) -> bytes:
        if isinstance(data, RasterImage):
            image = data
        else:
            arr = np.asarray(data, dtype=np.uint8)
            if height is not None and width is not None:
                c = arr.size // (height * width)
                arr = arr.reshape(height, width, c)
            image = RasterImage.from_array(arr, colorspace)

        backend = _select_backend(self.opts)
        if (
            self.opts.color_transform == "trial"
            and image.metadata.colorspace == ColorSpace.RGB
        ):
            return self._encode_trial(image, backend)
        return self._encode_one(image, backend, self.opts)

    def _encode_one(self, image, backend, opts) -> bytes:
        if backend == "native":
            # the independent C++ frif implementation (csrc/frif.cpp —
            # the cross-implementation format oracle, round 5)
            from ..images import ColorSpace
            from ..native import frif_encode_native
            from .channel_transform import choose_transform

            tid = 0
            if image.metadata.colorspace == ColorSpace.RGB:
                ct = opts.color_transform
                tid = choose_transform(
                    image.data,
                    "auto" if ct == "trial" else ct,
                    opts.quality.name == "LOSSLESS",
                )
            blob = frif_encode_native(
                image.data,
                quality=opts.quality.value,
                transform=tid,
                num_lanes=opts.num_lanes or 0,
                mode=opts.mode,
            )
            if blob is None:
                raise RuntimeError(
                    "native library unavailable (make -C csrc)"
                )
            return blob
        if backend == "jax":
            # rate-adaptive lanes for flat content are handled inside
            # the jax pipeline from the device-computed expected code
            # length (pipeline_jax._maybe_reencode_flat — single
            # statistics pass, covers batch/stream/trial too; ADVICE r4)
            from .pipeline_jax import encode_pipeline_jax

            return serialize(encode_pipeline_jax(image, opts))
        return serialize(encode_pipeline_np(image, opts))

    def _encode_trial(self, image, backend) -> bytes:
        """color_transform="trial": encode with every candidate transform
        and keep the smallest container. Exact where the gradient proxy of
        "auto" (channel_transform.select_transform) can misrank — at the
        cost of one encode per candidate; meant for rate-critical offline
        encodes (cli optimize uses it)."""
        import dataclasses

        lossless = self.opts.quality.name == "LOSSLESS"
        cands = ("none", "subtract-green", "ycocg") if lossless else (
            "none",
            "subtract-green",
        )
        best = None
        for ctf in cands:
            opts = dataclasses.replace(self.opts, color_transform=ctf)
            blob = self._encode_one(image, backend, opts)
            if best is None or len(blob) < len(best):
                best = blob
        return best


def encode(
    data: Union[np.ndarray, RasterImage],
    opts: Optional[EncoderOptions] = None,
    **kwargs,
) -> bytes:
    return FRIEncoder(opts).encode(data, **kwargs)
