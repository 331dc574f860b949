"""Hierarchical named timers (host-side).

TPU-native replacement for the reference's nvblox_torch C++ timer registry
(reference: nvblox_torch.timer used throughout run_training.py). Timers are
named with '/'-separated paths ("step/train/compute_losses"); the registry
accumulates count/total/last and renders an aligned status report.

For device-side profiling use jax.profiler traces; these timers measure host
wall-clock, so wrap device work with block_until_ready where the number
should reflect completion.
"""
from __future__ import annotations

import time
from typing import Dict, List


class _TimerRecord:
    __slots__ = ("count", "total", "last", "max")

    def __init__(self):
        self.count = 0
        self.total = 0.0
        self.last = 0.0
        self.max = 0.0

    def update(self, dt: float):
        self.count += 1
        self.total += dt
        self.last = dt
        self.max = max(self.max, dt)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


_REGISTRY: Dict[str, _TimerRecord] = {}


class Timer:
    """Context manager / manual timer recording into the global registry."""

    def __init__(self, name: str):
        self.name = name
        self._start = time.perf_counter()
        self._stopped = False

    def __enter__(self) -> "Timer":
        self._start = time.perf_counter()
        self._stopped = False
        return self

    def stop(self):
        if self._stopped:
            return
        dt = time.perf_counter() - self._start
        _REGISTRY.setdefault(self.name, _TimerRecord()).update(dt)
        self._stopped = True

    def __exit__(self, *exc):
        self.stop()
        return False


def get_last_time(name: str) -> float:
    rec = _REGISTRY.get(name)
    return rec.last if rec else 0.0


def get_mean_time(name: str) -> float:
    rec = _REGISTRY.get(name)
    return rec.mean if rec else 0.0


def get_total_time(name: str) -> float:
    rec = _REGISTRY.get(name)
    return rec.total if rec else 0.0


def timer_names() -> List[str]:
    return sorted(_REGISTRY)


def reset_timers():
    _REGISTRY.clear()


def timer_status_string() -> str:
    lines = ["timer name\tcount\ttotal(s)\tmean(s)\tlast(s)\tmax(s)"]
    for name in timer_names():
        rec = _REGISTRY[name]
        lines.append(
            f"{name}\t{rec.count}\t{rec.total:.4f}\t{rec.mean:.4f}"
            f"\t{rec.last:.4f}\t{rec.max:.4f}"
        )
    return "\n".join(lines)


def print_timers():
    print(timer_status_string())


class ProfilerTrace:
    """jax.profiler trace context for device-side timelines.

    Host timers above measure wall clock; this captures the XLA/TPU trace
    (viewable in TensorBoard / Perfetto). Usage:

        with ProfilerTrace("/tmp/trace"):
            train_step(...)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
