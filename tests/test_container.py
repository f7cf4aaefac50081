import numpy as np
import pytest

from frave_tpu import FRIEncoder, EncoderOptions
from frave_tpu.codec.container import deserialize, serialize, SerializeError, MAGIC


def _encode_sample():
    img = (np.arange(16 * 16, dtype=np.uint8).reshape(16, 16, 1) * 3) % 251
    return FRIEncoder(EncoderOptions(backend="numpy")).encode(img)


def test_container_roundtrip_fields():
    data = _encode_sample()
    assert data[:4] == MAGIC
    ci = deserialize(data)
    assert ci.metadata.height == 16 and ci.metadata.width == 16
    assert ci.metadata.num_channels == 1
    assert ci.num_lanes >= 1
    assert serialize(ci) == data  # reserialization is byte-identical


def test_bad_magic_rejected():
    data = bytearray(_encode_sample())
    data[0] = ord("x")
    with pytest.raises(SerializeError):
        deserialize(bytes(data))


def test_truncated_stream_rejected():
    data = _encode_sample()
    with pytest.raises(SerializeError):
        deserialize(data[: len(data) // 2])


def test_bad_version_rejected():
    data = bytearray(_encode_sample())
    data[4] = 99
    with pytest.raises(SerializeError):
        deserialize(bytes(data))
