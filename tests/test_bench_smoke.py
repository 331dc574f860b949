"""Pin the driver contract: ``bench.py`` prints ONE parseable JSON line.

Round 4 shipped an empty BENCH artifact because the bench orchestration
could exceed the driver's timeout and only printed at the very end — the
contract broke silently. These tests make any future bench refactor that
breaks (a) the one-JSON-line shape, (b) the budget/skip logic, or (c) the
kill-safe state file fail the fast suite instead of the round.
"""
import importlib.util
import json
import os
import subprocess
import sys

import pytest

BENCH_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)

HEADLINE_KEYS = ("metric", "value", "unit", "vs_baseline")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load_bench()


def test_smoke_prints_one_json_line_with_headline_keys():
    """`bench.py --smoke` is the CI-checkable stand-in for the driver run:
    tiny shapes, CPU, in-process — same assembly code, same line shape."""
    out = subprocess.run(
        [sys.executable, BENCH_PATH, "--smoke"],
        capture_output=True, text=True, timeout=120,
        cwd=os.path.dirname(BENCH_PATH),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, f"expected exactly one stdout line: {lines}"
    d = json.loads(lines[0])
    for key in HEADLINE_KEYS:
        assert key in d, f"missing headline key {key}"
    assert d["metric"] == "keypose_prediction_latency_p50"
    assert d["unit"] == "ms"
    assert d["value"] > 0
    assert d["vs_baseline"] == pytest.approx(100.0 / d["value"], rel=1e-3)
    assert d["smoke"] is True


def test_assemble_partial_keeps_headline_shape(bench):
    """A run that measured ONLY the headline still emits the full key set
    (ride-alongs null) — a driver kill mid-chain can't lose the line."""
    d = bench._assemble(
        {"keypose": [71.7, 39.8, 48.2, 16.0, 164.3]},
        reused=[], skipped=["fusion", "train_flagship"], wall_s=400.0,
    )
    assert d["value"] == 71.7
    assert d["vs_baseline"] == pytest.approx(100.0 / 71.7, rel=1e-3)
    assert d["serving_ddim10_b8_keyposes_per_s"] == pytest.approx(
        8000.0 / 164.3, abs=0.1
    )
    assert d["fusion_hz"] is None
    assert d["train_step_ms_b32_flagship"] is None
    assert d["skipped_for_budget"] == ["fusion", "train_flagship"]
    json.dumps(d)  # the line must be JSON-serializable as-is


def test_assemble_derived_train_keys(bench):
    d = bench._assemble(
        {
            "keypose": [70.0, 40.0, 48.0, 16.0, 160.0],
            "train_flagship": [500.0, 14000.0],
            "train_e2e": [60.0, 20.0, 120.0],
            "train_b64": [900.0, 28000.0],
            "loader": [32.0],
        },
        reused=["train_flagship"], skipped=[], wall_s=1000.0,
    )
    assert d["train_step_ms_b32_flagship"] == 500.0
    assert d["train_samples_per_s"] == pytest.approx(64.0)
    assert d["train_step_tflops_per_s"] == pytest.approx(28.0)
    # MFU vs v5e bf16 peak (197 TFLOP/s)
    assert d["train_mfu_pct_vs_v5e_bf16_peak"] == pytest.approx(
        100 * 28.0 / 197.0, abs=0.01
    )
    assert d["train_batch_scaling"]["64"]["samples_per_s"] == pytest.approx(
        64 * 1000.0 / 900.0, abs=0.1
    )
    assert d["train_e2e_vs_device_only"] == pytest.approx(60.0 / 64.0, abs=1e-3)
    assert d["reused_from_state"] == ["train_flagship"]


def test_state_file_roundtrip_and_fingerprint_guard(bench, tmp_path,
                                                    monkeypatch):
    monkeypatch.setattr(
        bench, "_state_path", lambda fp: str(tmp_path / f"state_{fp}.json")
    )
    bench._save_measurement("abc", "fusion", [5724.7], wall_s=61.0)
    state = bench._load_state("abc")
    assert state["measurements"]["fusion"]["values"] == [5724.7]
    # A different source fingerprint must NOT serve the saved values.
    assert bench._load_state("def") == {}
    # BENCH_FORCE=1 ignores saved state entirely.
    monkeypatch.setenv("BENCH_FORCE", "1")
    assert bench._load_state("abc") == {}


def test_collect_budget_skips_and_reuses(bench, tmp_path, monkeypatch):
    """The budget loop: saved ride-alongs are reused (free), the headline is
    re-measured fresh, and specs whose estimate exceeds the remaining budget
    are skipped — never run unbounded."""
    monkeypatch.setattr(
        bench, "_state_path", lambda fp: str(tmp_path / f"state_{fp}.json")
    )
    monkeypatch.setattr(bench, "_source_fingerprint", lambda: "fp0")
    # Pre-populate state: keypose (stale fallback) + fusion (reusable).
    bench._save_measurement("fp0", "keypose", [99.0, 50, 50, 20, 200], 400)
    bench._save_measurement("fp0", "fusion", [5000.0], 60)
    calls = []
    clock = [0.0]
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock[0])

    def fake_run(what, retries=0, timeout_s=600.0, warm=False):
        calls.append((what, timeout_s))
        assert timeout_s is not None and 0 < timeout_s
        clock[0] += 200.0  # each measurement costs 200 fake seconds
        n = {"keypose": 5, "fusion": 1, "fusion_backbone": 1}.get(
            what.split(":")[0], 2
        )
        if what == "train_e2e":
            n = 3
        return [float(i + 1) for i in range(n)]

    monkeypatch.setattr(bench, "_run_in_subprocess", fake_run)
    # Budget covers the fresh headline (est 420, costs 200) + the reused
    # fusion (free) + fusion_backbone (est 90, costs 200); after t=400 only
    # 120 s remain — under every later spec's estimate.
    results, reused, skipped = bench._collect(budget_s=520.0)
    ran = [w for w, _ in calls]
    assert ran == ["keypose", "fusion_backbone"]
    assert results["keypose"] == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert "fusion" in reused and results["fusion"] == [5000.0]
    # Everything estimated past the budget is skipped, not run.
    assert "train_flagship" in skipped and "loader" in skipped


def test_collect_headline_failure_falls_back_to_state(bench, tmp_path,
                                                      monkeypatch):
    monkeypatch.setattr(
        bench, "_state_path", lambda fp: str(tmp_path / f"state_{fp}.json")
    )
    monkeypatch.setattr(bench, "_source_fingerprint", lambda: "fp1")
    bench._save_measurement(
        "fp1", "keypose", [73.9, 39.0, 48.3, 16.1, 164.6], 400
    )

    def fail(what, retries=0, timeout_s=600.0, warm=False):
        raise RuntimeError("tunnel down")

    monkeypatch.setattr(bench, "_run_in_subprocess", fail)
    results, reused, skipped = bench._collect(budget_s=10_000.0)
    assert results["keypose"][0] == 73.9, (
        "a failed fresh headline must fall back to the saved measurement"
    )
    assert "keypose" in reused
