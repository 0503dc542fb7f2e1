"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI, so all sharding tests execute
against 8 virtual CPU devices; numerics are integer-dominated and identical
across backends by construction.

Set FASTANI_TPU_TESTS=1 to keep the real TPU platform active instead, then
run the `tpu`-marked suite (tests/test_tpu_smoke.py) to exercise the real
Mosaic lowering of the Pallas kernels:

    FASTANI_TPU_TESTS=1 python -m pytest tests -m tpu -q
"""

import os

if os.environ.get("FASTANI_TPU_TESTS") != "1":
    # The session environment exports JAX_PLATFORMS=axon (TPU tunnel); the
    # env var alone does not displace the plugin — jax.config.update does.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
