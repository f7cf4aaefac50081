"""dp x tp sharded encode tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from frave_tpu import EncoderOptions, EncoderQuality
from frave_tpu.codec.decoder import FRIDecoder
from frave_tpu.codec.encoder import FRIEncoder
from frave_tpu.parallel import ShardedEncoder, make_mesh


def _batch(b, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(b, h, w, c), dtype=np.uint8)


def test_sharded_encode_roundtrip_2x4():
    mesh = make_mesh(8)  # dp=2, tp=4
    batch = _batch(4, 32, 32, 1)
    enc = ShardedEncoder(height=32, width=32, channels=1, batch=4, mesh=mesh)
    blobs = enc.encode_batch(batch)
    assert len(blobs) == 4
    dec = FRIDecoder(backend="numpy")
    for i, blob in enumerate(blobs):
        out = dec.decode(blob)
        np.testing.assert_array_equal(out.data, batch[i])


def test_sharded_matches_single_chip_bitstream():
    """The sharded encoder must produce the same decoded pixels as the
    single-chip jax encoder; bitstreams may differ (f32 psum reduction
    order changes fitted params slightly) but decode must be lossless
    either way."""
    mesh = make_mesh(8)
    batch = _batch(2, 24, 40, 3, seed=3)
    enc = ShardedEncoder(height=24, width=40, channels=3, batch=2, mesh=mesh)
    blobs = enc.encode_batch(batch)
    single = FRIEncoder(EncoderOptions(backend="jax"))
    dec = FRIDecoder(backend="jax")
    for i, blob in enumerate(blobs):
        np.testing.assert_array_equal(dec.decode(blob).data, batch[i])
        blob1 = single.encode(batch[i])
        np.testing.assert_array_equal(dec.decode(blob1).data, batch[i])


def test_sharded_lossy():
    mesh = make_mesh(8)
    batch = _batch(2, 32, 32, 1, seed=5)
    enc = ShardedEncoder(height=32, width=32, channels=1, batch=2, mesh=mesh)
    blobs = enc.encode_batch(batch, EncoderOptions(quality=EncoderQuality.HIGH))
    dec = FRIDecoder(backend="numpy")
    for i, blob in enumerate(blobs):
        out = dec.decode(blob)
        mse = float(np.mean((out.data.astype(np.float64) - batch[i]) ** 2))
        assert mse < 1500.0  # random noise at HIGH stays bounded


def test_mesh_factorization():
    from frave_tpu.parallel import mesh_factorization

    assert mesh_factorization(1) == (1, 1)
    assert mesh_factorization(2) == (1, 2)
    assert mesh_factorization(8) == (2, 4)
    assert mesh_factorization(16) == (4, 4)
    assert mesh_factorization(64) == (8, 8)


def test_sharded_tp_heavy():
    """Pure tensor-parallel mesh (dp=1, tp=8): all collectives exercised."""
    from frave_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, shape=(1, 8))
    batch = _batch(2, 40, 24, 1, seed=9)
    enc = ShardedEncoder(height=40, width=24, channels=1, batch=2, mesh=mesh)
    blobs = enc.encode_batch(batch)
    dec = FRIDecoder(backend="numpy")
    for i, blob in enumerate(blobs):
        np.testing.assert_array_equal(dec.decode(blob).data, batch[i])


def test_sharded_decoder_dp():
    from frave_tpu.parallel.sharded import ShardedDecoder

    mesh = make_mesh(8)
    batch = _batch(4, 32, 32, 1, seed=11)
    enc = ShardedEncoder(height=32, width=32, channels=1, batch=4, mesh=mesh)
    blobs = enc.encode_batch(batch)
    dec = ShardedDecoder(height=32, width=32, channels=1, mesh=mesh)
    outs = dec.decode_batch(blobs)
    for i in range(4):
        np.testing.assert_array_equal(outs[i].data, batch[i])
