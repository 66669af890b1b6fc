import os

# Tests run on a virtual 8-device CPU mesh regardless of attached hardware
# (the environment may pin JAX_PLATFORMS=axon for the real TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # TPU plugins may ignore the env var
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: MG/projection graphs take ~10-30s to compile on
# CPU; cache them across test processes.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
