"""Decoder robustness: malformed containers error cleanly, corrupted
payloads decode without crashing or hanging (no integrity check by design,
matching the reference — garbage in, garbage pixels out)."""

from struct import error as struct_error

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


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_bit_flips_decode_without_crash(blob, backend):
    """Every single-bit corruption must end in exactly one of two clean
    outcomes: a correctly-shaped (garbage) image, or a typed rejection.
    Any other exception type is a decoder crash and fails the test.
    Runs on BOTH backends: the jax scan path's clamped gather /
    dynamic_slice contracts are exactly where garbage rANS states would
    bite (round-2 verdict gap)."""
    data, arr = blob
    dec = FRIDecoder(backend=backend)
    rng = np.random.default_rng(0)
    trials = 24 if backend == "numpy" else 12
    decoded = rejected = 0
    for t in range(trials):
        b = bytearray(data)
        pos = int(rng.integers(90, len(data)))  # past the fixed header
        b[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = dec.decode(bytes(b))
            assert out.data.shape == arr.shape, (
                f"trial {t}: corrupted decode changed shape to {out.data.shape}"
            )
            decoded += 1
        except (SerializeError, ValueError) as e:
            assert str(e), f"trial {t}: rejection without message"
            rejected += 1
        except Exception as e:  # noqa: BLE001 - the point of the test
            pytest.fail(
                f"trial {t} (byte {pos}): decoder crashed with "
                f"{type(e).__name__}: {e}"
            )
    assert decoded + rejected == trials
    # the payload region dominates the container, so most flips must
    # still decode (garbage in, garbage pixels out — the design contract)
    assert decoded >= trials // 2, (decoded, rejected)


def test_stream_zeroed_decodes(blob):
    """An all-zero word stream is still a structurally valid container."""
    data, arr = blob
    ci = deserialize(data)
    ci.stream = np.zeros_like(ci.stream)
    out = FRIDecoder(backend="numpy").decode(serialize(ci))
    assert out.data.shape == arr.shape


def _expect_clean(data: bytes, shape, backend: str, what: str):
    """Corrupted container must either decode to the right shape or raise
    a typed error — never crash with an unexpected exception type."""
    try:
        out = FRIDecoder(backend=backend).decode(data)
        assert out.data.shape == shape, (what, out.data.shape)
    except (SerializeError, ValueError):
        pass
    except Exception as e:  # noqa: BLE001
        pytest.fail(f"{what} [{backend}]: {type(e).__name__}: {e}")


@pytest.mark.parametrize("backend", ["numpy", "jax"])
def test_fuzz_container_fields(blob, backend):
    """Structured fuzz of the semantic container fields (lane count, mode
    and quality bytes, context bits, off-lists, quantization matrix,
    stream length) against both decoders."""
    data, arr = blob
    base = deserialize(data)
    shape = arr.shape

    # mode byte: offset = magic(4) + ver(1) + h/w(8) + mdat(1) + quality(1)
    mode_off = 4 + 1 + 8 + 1 + 1
    for v in (1, 2, 7, 255):
        b = bytearray(data)
        b[mode_off] = v
        _expect_clean(bytes(b), shape, backend, f"mode byte {v}")

    # quality byte
    for v in (0, 3, 9, 255):
        b = bytearray(data)
        b[mode_off - 1] = v
        _expect_clean(bytes(b), shape, backend, f"quality byte {v}")

    # lane count u16 (offset right after mode byte)
    for v in (0, 1, 7, base.num_lanes * 2, 0xFFFF):
        b = bytearray(data)
        b[mode_off + 1 : mode_off + 3] = int(v).to_bytes(2, "little")
        _expect_clean(bytes(b), shape, backend, f"lane count {v}")

    # context max_freq_bits: mutate via the parsed object (re-serialize)
    for v in (0, 1, 15, 31, 255):
        ci = deserialize(data)
        ci.channel_data[0].ans_contexts[3].max_freq_bits = v
        try:
            reblob = serialize(ci)
        except (SerializeError, ValueError, struct_error):
            continue
        _expect_clean(reblob, shape, backend, f"max_freq_bits {v}")

    # off-list: out-of-alphabet symbols and absurd lengths
    for off in ([1023], [1024 % 1024, 1023], list(range(60))):
        ci = deserialize(data)
        ci.channel_data[0].ans_contexts[2].off_distribution_values = np.asarray(
            off, dtype=np.uint16
        )
        _expect_clean(serialize(ci), shape, backend, f"off-list {off[:3]}")

    # v9 Laplace-grid scale index: any in-grid value must decode cleanly
    # (wrong pixels are fine — no integrity check by design); out-of-grid
    # values must be rejected as SerializeError at deserialize
    from frave_tpu.entropy.tables import NUM_SCALES

    for v in (0, 14, NUM_SCALES - 1, NUM_SCALES, 200, 255):
        ci = deserialize(data)
        ci.channel_data[0].ans_contexts[5].scale_idx = v
        try:
            reblob = serialize(ci)
        except (SerializeError, ValueError, struct_error):
            continue
        _expect_clean(reblob, shape, backend, f"scale_idx {v}")

    # quantization matrix: zeros would divide-by-zero a naive decoder
    for fill in (0, 1, 9, 65535):
        ci = deserialize(data)
        ci.quantization_matrix = np.full(32, fill, dtype=np.uint16)
        _expect_clean(serialize(ci), shape, backend, f"qm fill {fill}")

    # stream truncated / extended
    for n in (0, 1, len(base.stream) // 2):
        ci = deserialize(data)
        ci.stream = ci.stream[:n]
        _expect_clean(serialize(ci), shape, backend, f"stream len {n}")


def test_empty_stream_image():
    """A 1x1 image produces a tiny (possibly empty-stream) container."""
    arr = np.asarray([[[200]]], dtype=np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="numpy")).encode(
        RasterImage.from_array(arr)
    )
    out = FRIDecoder(backend="numpy").decode(blob)
    np.testing.assert_array_equal(out.data, arr)
