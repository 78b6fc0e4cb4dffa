import os

# float32 CI tier: the benchmark dtype (reference tests both Float32 and
# Float64, test/dependencies_for_runtests.jl:55). x64 stays DISABLED so
# every array is genuinely float32.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
