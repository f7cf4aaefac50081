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


def test_sharded_decoder_uneven_and_mixed_quality():
    """SPMD decode pads the batch to the device count and honours
    per-image quantization (round-1 advisor high fix)."""
    from frave_tpu.codec.container import deserialize
    from frave_tpu.codec.pipeline_jax import decode_pipeline_jax_batch
    from frave_tpu.parallel.sharded import ShardedDecoder

    mesh = make_mesh(8)
    batch = _batch(3, 32, 32, 1, seed=13)  # 3 images on 8 devices
    from frave_tpu.codec.encoder import FRIEncoder

    qualities = [EncoderQuality.LOSSLESS, EncoderQuality.LOW, EncoderQuality.HIGH]
    blobs = [
        FRIEncoder(EncoderOptions(backend="jax", quality=q)).encode(batch[i])
        for i, q in enumerate(qualities)
    ]
    dec = ShardedDecoder(height=32, width=32, channels=1, mesh=mesh)
    outs = dec.decode_batch(blobs)
    solo = decode_pipeline_jax_batch([deserialize(b) for b in blobs])
    assert len(outs) == 3
    np.testing.assert_array_equal(outs[0].data, batch[0])
    for s, o in zip(solo, outs):
        np.testing.assert_array_equal(s.data, o.data)


def test_tp_sharded_decode_single_image():
    """Lane-sharded SPMD decode of one image (config 3 decode): lossless
    on both mesh shapes, with the per-step all_gather in the HLO."""
    from frave_tpu.codec.encoder import FRIEncoder
    from frave_tpu.parallel.mesh import make_mesh as mm
    from frave_tpu.parallel.sharded import TPShardedDecoder

    rng = np.random.default_rng(19)
    h, w = 64, 96
    arr = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="jax", num_lanes=64)).encode(arr)
    for shape in ((1, 8), (2, 4)):
        mesh = mm(8, shape=shape)
        dec = TPShardedDecoder(height=h, width=w, channels=1, mesh=mesh)
        out = dec.decode(blob)
        np.testing.assert_array_equal(out.data, arr)


def test_tp_sharded_decode_rgb():
    """RGB exercises the packed-u32 coefficient plane inside the
    lane-sharded scan (3 channels per word — pipeline_jax._pack3)."""
    from frave_tpu.codec.encoder import FRIEncoder
    from frave_tpu.parallel.mesh import make_mesh as mm
    from frave_tpu.parallel.sharded import TPShardedDecoder

    rng = np.random.default_rng(23)
    h, w = 48, 64
    base = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    arr = np.stack(
        [base, np.roll(base, 3, 0), rng.integers(0, 256, (h, w))], axis=-1
    ).astype(np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="jax", num_lanes=64)).encode(arr)
    mesh = mm(8, shape=(2, 4))
    dec = TPShardedDecoder(height=h, width=w, channels=3, mesh=mesh)
    out = dec.decode(blob)
    np.testing.assert_array_equal(out.data, arr)


def test_halo_exchange_is_ppermute():
    """The tile-halo exchange must be a boundary-residue ppermute ring
    (SURVEY section 2.3 config 5), not a full-plane all_gather: the plan is
    active, its total halo is far smaller than the coefficient plane, the
    compiled HLO contains collective-permute and no all-gather, and the
    bitstreams decode losslessly."""
    import jax.numpy as jnp

    from frave_tpu.parallel.mesh import make_mesh as mm

    mesh = mm(8, shape=(1, 8))
    h = w = 96
    enc = ShardedEncoder(height=h, width=w, channels=1, batch=2, mesh=mesh)
    assert enc.halo_enabled
    deltas, sizes, _ = enc._halo
    geo_plane = enc._consts[0].shape[0] * enc._consts[0].shape[1]  # Tp*N
    assert sum(sizes) * 8 < geo_plane  # halo << plane
    # inspect the lowered program
    batch = _batch(2, h, w, 1, seed=7)
    pixels = jnp.asarray(
        batch.reshape(2, -1, 1).transpose(0, 2, 1).astype(np.int32)
    )
    qdiv = jnp.ones((512,), jnp.int32)
    lowered = enc._analyze.lower(
        pixels, *enc._consts, qdiv, *enc._halo_consts
    )
    hlo = lowered.as_text()
    assert "collective_permute" in hlo or "collective-permute" in hlo
    assert "all_gather" not in hlo and "all-gather" not in hlo
    blobs = enc.encode_batch(batch)
    dec = FRIDecoder(backend="numpy")
    for i, b in enumerate(blobs):
        np.testing.assert_array_equal(dec.decode(b).data, batch[i])


def test_sharded_grid_mode_roundtrip():
    """mode=grid through the dp x tp SPMD paths (VERDICT r3 #9): the
    ShardedEncoder emits grid-wire containers, the dp ShardedDecoder
    and the lane-sharded TPShardedDecoder both decode them lossless."""
    from frave_tpu.codec.container import deserialize
    from frave_tpu.parallel.sharded import ShardedDecoder, TPShardedDecoder

    mesh = make_mesh(8)
    batch = _batch(2, 32, 48, 1, seed=31)
    enc = ShardedEncoder(
        height=32, width=48, channels=1, batch=2, mesh=mesh, mode="grid"
    )
    blobs = enc.encode_batch(batch, EncoderOptions(mode="grid"))
    assert deserialize(blobs[0]).mode == "grid"
    dec = ShardedDecoder(height=32, width=48, channels=1, mesh=mesh)
    outs = dec.decode_batch(blobs)
    for i in range(2):
        np.testing.assert_array_equal(outs[i].data, batch[i])
    # lane-sharded single-image decode of the same grid containers
    blob = FRIEncoder(
        EncoderOptions(backend="jax", mode="grid", num_lanes=64)
    ).encode(batch[0])
    tpd = TPShardedDecoder(height=32, width=48, channels=1, mesh=mesh)
    np.testing.assert_array_equal(tpd.decode(blob).data, batch[0])
    # RGB: exercises the PACKED (u32-triple) variants of the sharded
    # table build (Kc=45 contexts padded to 48 over 8 shards) and the
    # tile-axis dequant+lifting split
    rgb = _batch(1, 32, 48, 3, seed=32)[0]
    blob3 = FRIEncoder(
        EncoderOptions(backend="jax", mode="grid", num_lanes=64)
    ).encode(rgb)
    tpd3 = TPShardedDecoder(height=32, width=48, channels=3, mesh=mesh)
    np.testing.assert_array_equal(tpd3.decode(blob3).data, rgb)


def test_tp_grid_decode_step_collective_is_counts_only():
    """Round 5 (VERDICT r4 #3): the grid-mode TP decode's loop-carried
    collective must carry only renorm COUNTS ([n_dev, C] i32), never a
    coefficient-plane-sized payload. Inspect the optimized HLO: every
    all-gather inside a while body stays under 1 KB; the per-wave
    values all-gathers live OUTSIDE the loops."""
    import re

    from frave_tpu.codec.encoder import FRIEncoder
    from frave_tpu.codec.container import deserialize
    from frave_tpu.codec.pipeline_jax import assemble_wire_batch
    from frave_tpu.parallel.mesh import make_mesh as mm
    from frave_tpu.parallel.sharded import TPShardedDecoder

    rng = np.random.default_rng(41)
    h, w = 64, 96
    arr = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
    blob = FRIEncoder(EncoderOptions(backend="jax", num_lanes=64)).encode(arr)
    im = deserialize(blob)
    assert im.mode == "grid"
    mesh = mm(8, shape=(1, 8))
    dec = TPShardedDecoder(height=h, width=w, channels=1, mesh=mesh)
    wire = assemble_wire_batch([im], im.num_lanes)
    prog, fn = dec._program(im.num_lanes, im.mode, wire[1].shape[-1])
    assert getattr(prog, "_grid_dense", False)
    import jax.numpy as jnp

    args = [jnp.asarray(a[0]) for a in wire] + [prog._lap]
    hlo = fn.lower(*args).compile().as_text()

    def inst_bytes(line):
        shp = re.search(r"= ?((?:\w+\[[\d,]*\])+)", line)
        if not shp:
            return 0
        total = 0
        for t, dims in re.findall(r"(\w+)\[([\d,]*)\]", shp.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bytes_per = 4 if t in ("s32", "u32", "f32") else (
                2 if t in ("s16", "u16", "bf16", "f16") else 1
            )
            total += n * bytes_per
        return total

    # split the HLO into computations; find the while BODY computations
    comps = {}
    cur = None
    for line in hlo.splitlines():
        if line.rstrip().endswith("{") and " = " not in line:
            name = line.strip().split(" ", 1)[0].lstrip("%")
            if name in ("ENTRY", ""):
                name = line.strip().split(" ", 2)[1].lstrip("%")
            cur = name
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)
    bodies = set(re.findall(r"body=%?([\w\.\-]+)", hlo))
    assert bodies, "expected while loops in the TP decode HLO"
    loop_ag = []
    for b in bodies:
        for line in comps.get(b, []):
            if "all-gather" in line:
                loop_ag.append((inst_bytes(line), line.strip()[:90]))
    assert loop_ag, "expected the per-step count all-gather in a while body"
    # loop-carried collectives must be COUNTS ([n_dev, C] i32-scale),
    # never plane- or lane-proportional payloads
    for total, line in loop_ag:
        assert total <= 1024, (total, line)
