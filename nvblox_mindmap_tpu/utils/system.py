"""System monitoring helpers (reference: mindmap/common_utils/system.py)."""
from __future__ import annotations

import os

XLA_COMPILE_CACHE_DIR = "/tmp/jax_compilation_cache"


def enable_compilation_cache(cache_dir: str = XLA_COMPILE_CACHE_DIR) -> None:
    """Persistent XLA compilation cache shared by bench.py and the
    experiment scripts: repeat runs skip the minutes-long first compile of
    the flagship programs through the TPU tunnel. Must run before the first
    jit compilation; a no-op if jax refuses the config (old versions)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def get_shmem_usage_mb(path: str = "/dev/shm") -> float:
    """Shared-memory usage in MB (loader-queue monitoring)."""
    try:
        total = 0
        for root, _, files in os.walk(path):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
        return total / 1e6
    except OSError:
        return 0.0


def get_process_memory_mb() -> float:
    """Resident memory of this process in MB."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1e3
    except OSError:
        pass
    return 0.0
