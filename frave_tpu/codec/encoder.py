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
        if backend == "jax":
            from .pipeline_jax import encode_pipeline_jax

            compressed = encode_pipeline_jax(image, opts)
            blob = serialize(compressed)
            if opts.num_lanes is None and self._lanes_dominate(compressed):
                # flat/graphic content: the jax pipeline's static lane
                # count is throughput-sized and its per-lane wire
                # overhead (~2-4 B/lane/channel) dwarfs the payload —
                # re-encode through the numpy path, which picks a
                # rate-adaptive lane count (schedule.rate_adaptive_lanes)
                # from the exact expected code length. Single-image
                # rate-focused API only; the batch/stream pipelines keep
                # static shapes.
                return serialize(encode_pipeline_np(image, opts))
            return blob
        return serialize(encode_pipeline_np(image, opts))

    @staticmethod
    def _lanes_dominate(compressed) -> bool:
        """Per-lane wire overhead (~3 B/lane/channel: STT states +
        flush rounding) above ~25% of the entropy-coded payload."""
        stream = compressed.stream
        payload = 2 * (int(stream.shape[0]) if stream is not None else 0)
        nch = sum(cd is not None for cd in compressed.channel_data)
        return 12 * nch * compressed.num_lanes > payload

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
