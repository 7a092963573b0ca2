import os

# Force a virtual 8-device CPU mesh before any backend initializes, so
# sharding tests run without TPU hardware.  XLA_FLAGS is read at backend
# init; jax_platforms via config.update works even if jax was already
# imported by a pytest plugin (only backend *initialization* must not have
# happened yet).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Oracle-parity tests compare against float64 numpy; run all test matmuls at
# full f32 precision (production keeps the fast default — bf16 passes on MXU).
jax.config.update("jax_default_matmul_precision", "float32")
