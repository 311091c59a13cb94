"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``); real-TPU paths are exercised
by bench.py / the driver instead.
"""

import os

# hard-set (not setdefault): the ambient environment exports
# JAX_PLATFORMS=axon (the real TPU), but unit tests must run on the
# virtual CPU mesh, with x64 available for the f64 parity tests.
# WN_TPU_TESTS=1 keeps the real backend so tests/test_tpu_hardware.py
# can exercise the chip (scripts/tpu_learning_smoke.sh sets it).
if os.environ.get("WN_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "true"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    # jax may already be imported by a pytest plugin before this conftest
    # runs, in which case the env vars were read too late — force via config
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    def pytest_ignore_collect(collection_path, config):
        # under WN_TPU_TESTS=1 the CPU-suite assumptions (x64, 8 virtual
        # devices) don't hold — collect ONLY the hardware tests so a bare
        # `WN_TPU_TESTS=1 pytest tests/` does the right thing
        return (collection_path.name.startswith("test_")
                and collection_path.name != "test_tpu_hardware.py")
