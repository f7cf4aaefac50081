"""Decoder robustness: malformed containers error cleanly, corrupted
payloads decode without crashing or hanging (no integrity check by design,
matching the reference — garbage in, garbage pixels out)."""

import numpy as np
import pytest

from frave_tpu import EncoderOptions, RasterImage
from frave_tpu.codec.container import SerializeError, deserialize, serialize
from frave_tpu.codec.decoder import FRIDecoder
from frave_tpu.codec.encoder import FRIEncoder


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 40, 1), dtype=np.uint8)
    return FRIEncoder(EncoderOptions(backend="numpy")).encode(
        RasterImage.from_array(arr)
    ), arr


def test_truncation_all_prefixes_error_cleanly(blob):
    data, _ = blob
    for cut in (0, 3, 4, 5, 12, 14, len(data) // 2, len(data) - 1):
        try:
            deserialize(data[:cut])
        except (SerializeError, ValueError):
            continue
        pytest.fail(f"truncated container (cut={cut}) parsed unexpectedly")


def test_bit_flips_decode_without_crash(blob):
    data, arr = blob
    dec = FRIDecoder(backend="numpy")
    rng = np.random.default_rng(0)
    crashes = 0
    for _ in range(8):
        b = bytearray(data)
        pos = int(rng.integers(90, len(data)))  # past the fixed header
        b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = dec.decode(bytes(b))
            assert out.data.shape == arr.shape
        except (SerializeError, ValueError, AssertionError):
            crashes += 0  # clean rejection is acceptable
    assert crashes == 0


def test_stream_zeroed_decodes(blob):
    """An all-zero word stream is still a structurally valid container."""
    data, arr = blob
    ci = deserialize(data)
    ci.stream = np.zeros_like(ci.stream)
    out = FRIDecoder(backend="numpy").decode(serialize(ci))
    assert out.data.shape == arr.shape


def test_empty_stream_image():
    """A 1x1 image produces a tiny (possibly empty-stream) container."""
    arr = np.asarray([[[200]]], dtype=np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="numpy")).encode(
        RasterImage.from_array(arr)
    )
    out = FRIDecoder(backend="numpy").decode(blob)
    np.testing.assert_array_equal(out.data, arr)
