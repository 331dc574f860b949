"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's approach of testing distributed code without hardware
(reference: mindmap/tests/test_distributed_sampling.py uses gloo on localhost);
here we use XLA's host-platform device-count override so sharding/pjit paths
compile and execute with 8 logical devices on CPU.

Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) via
sitecustomize, so we must override through jax.config, not just the env var.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall-clock is dominated by CPU
# XLA compiles of model-sized programs; repeat runs (local iteration, CI
# retries) hit the cache and run several-fold faster. Keyed on jaxlib
# version + flags, so it never serves stale executables.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_TEST_CACHE_DIR",
        # Per-user path: a world-shared fixed /tmp dir would hit permission
        # errors on multi-user hosts and load executables other users wrote.
        f"/tmp/jax_test_compilation_cache_{os.getuid()}",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


import pytest  # noqa: E402


@pytest.fixture
def fast_tmp_path(tmp_path):
    """RAM-backed scratch dir for tests that write model-sized files: this
    host's /tmp disk writes at ~10 MB/s, so a 100 MB checkpoint costs ~10 s
    per write; /dev/shm is tmpfs. Falls back to tmp_path when absent."""
    import pathlib
    import shutil
    import tempfile

    if os.path.isdir("/dev/shm"):
        d = tempfile.mkdtemp(prefix="mindmap_test_", dir="/dev/shm")
        yield pathlib.Path(d)
        shutil.rmtree(d, ignore_errors=True)
    else:
        yield tmp_path


def pytest_addoption(parser):
    # Regenerate stored regression baselines (reference:
    # tests/conftest.py --generate_baseline).
    parser.addoption(
        "--generate_baseline",
        action="store_true",
        default=False,
        help="regenerate regression baselines instead of comparing",
    )
