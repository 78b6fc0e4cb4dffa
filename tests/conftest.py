import os

# Tests run on a virtual 8-device CPU mesh; f64 enabled for parity with the
# reference's Float64 defaults (benchmarks run f32/bf16 on the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"  # the outer env pins axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
