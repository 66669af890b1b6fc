import os

# Tests run on a virtual 8-device CPU mesh regardless of attached hardware
# (the environment may pin JAX_PLATFORMS=axon for the real TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# CI tiering: `pytest -m "not slow"` is the quick tier (~3 min warm-cache on
# one CPU); the full suite (~20 min) runs the end-to-end goldens, the fused
# Pallas kernel equivalences and the 8-device sharding checks. Measured
# per-test durations, round 4.
SLOW_FILES = {
    "test_golden.py", "test_golden_fused.py", "test_sharding.py",
    "test_pallas_godunov.py", "test_ml_io.py", "test_amr.py",
    "test_multipatch.py",
}
SLOW_TESTS = {
    "test_bubble_3d_viscous", "test_bubble2d_viscous_runs",
    "test_namelist_run_short", "test_bubble2d_backward_euler",
    "test_checkpoint_restart_bitwise", "test_vortextube_3d",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        if (it.fspath.basename in SLOW_FILES
                or it.name.split("[")[0] in SLOW_TESTS):
            it.add_marker(pytest.mark.slow)

jax.config.update("jax_platforms", "cpu")  # TPU plugins may ignore the env var
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: MG/projection graphs take ~10-30s to compile on
# CPU; cache them across test processes.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
