"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count (SURVEY.md section 4 test plan).

Set FRAVE_TEST_TPU=1 to keep the real accelerator visible instead, so
hardware-gated tests (tests/test_pallas_rans.py, test_pallas_lifting's
TPU paths) actually run on a TPU-equipped machine:
  FRAVE_TEST_TPU=1 python -m pytest tests/test_pallas_rans.py -q
The CPU mesh is the default because the full suite's sharding tests
need 8 devices and the single tunneled chip makes compile-heavy tests
minutes-slow.

Note: this container's sitecustomize imports jax and registers a TPU
plugin at interpreter startup, so env vars alone are too late — the
platform must be forced via jax.config, which works any time before
backend initialization.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

if os.environ.get("FRAVE_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
