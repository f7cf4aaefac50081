"""Multi-chip dry run: one fully-sharded encode step on tiny shapes.

Used by __graft_entry__.dryrun_multichip — the driver executes this on an
n-device virtual CPU mesh to validate that the dp x tp shardings compile
and run without real chips (SURVEY.md section 4, distributed test plan).
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    # This container's sitecustomize may pin a 1-chip TPU platform before
    # any env var can take effect; prefer forcing CPU pre-init, fall back
    # to an explicit CPU client (works even after TPU init).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    if len(devs) < n_devices:
        raise RuntimeError(
            f"dryrun wants {n_devices} devices, jax sees {len(devs)}"
        )

    from ..codec.decoder import FRIDecoder
    from ..codec.options import EncoderOptions
    from .mesh import make_mesh
    from .sharded import ShardedEncoder

    mesh = make_mesh(n_devices, devices=devs)
    dp = mesh.shape["dp"]

    h = w = 32
    C = 1
    B = dp * 2  # two images per dp shard
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(B, h, w, C), dtype=np.uint8)

    enc = ShardedEncoder(height=h, width=w, channels=C, batch=B, mesh=mesh)
    blobs = enc.encode_batch(batch, EncoderOptions())
    assert len(blobs) == B

    # verify the lossless contract on the host decoder (the multichip
    # validation target is the sharded encode compile+run itself)
    out = FRIDecoder(backend="numpy").decode(blobs[0])
    np.testing.assert_array_equal(out.data, batch[0])
