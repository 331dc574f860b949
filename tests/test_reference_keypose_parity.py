"""Keypose-detection parity vs the reference's estimator base module.

The reference's keypose_estimation_base.py is standalone (numpy + torch);
this pins grasp-event detection, openness hysteresis, extra-keypose
placement, highest-z-of-vertical-motion segmentation, and the index helpers
against it on synthetic trajectories. Skipped when the checkout is absent.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = (
    "/root/reference/mindmap/embodiments/keypose_estimation_base.py"
)
pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")

from nvblox_mindmap_tpu.data import keyposes as kp


@pytest.fixture(scope="module")
def ref():
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_kp", REFERENCE)
    module = importlib.util.module_from_spec(spec)
    sys.modules["ref_kp"] = module
    spec.loader.exec_module(module)
    return module


def make_jaw_trajectory():
    """Open -> close (frames 20-30) -> hold -> open (frames 60-70)."""
    n = 100
    jaws = np.full((n, 2), 0.04, dtype=np.float32)
    jaws[20:30] = np.linspace(0.04, 0.0, 10)[:, None]
    jaws[30:60] = 0.0
    jaws[60:70] = np.linspace(0.0, 0.04, 10)[:, None]
    jaws[70:] = 0.04
    return jaws


def is_open(row) -> bool:
    return float(np.sum(np.asarray(row))) > 0.04


def test_grasp_events_match_reference(ref):
    jaws = make_jaw_trajectory()
    ref_intervals, ref_open = ref.get_grasp_events(
        torch.from_numpy(jaws), 1e-3, is_open
    )
    ours_intervals, ours_open = kp.get_grasp_events(jaws, 1e-3, is_open)
    assert [tuple(map(int, i)) for i in ours_intervals] == [
        tuple(map(int, i)) for i in ref_intervals
    ]
    np.testing.assert_array_equal(ours_open, ref_open)
    # Sanity: two events (grasp + release), openness flips between them.
    assert len(ours_intervals) == 2
    assert ours_open[0] == 1 and ours_open[45] == 0 and ours_open[-1] == 1


def test_extra_keyposes_around_intervals_match_reference(ref):
    intervals = [(20, 30), (60, 70)]
    for extras in ([5], [3, 25], [40]):
        ref_idx = ref.get_extra_keypose_indices_around_intervals(
            intervals, extras, 100
        )
        ours = kp.get_extra_keypose_indices_around_intervals(
            intervals, extras, 100
        )
        assert list(map(int, ours)) == list(map(int, ref_idx))


def make_eef_trajectory():
    """Approach, vertical lift between grasps, descend, retreat."""
    rng = np.random.default_rng(0)
    n = 200
    pos = np.zeros((n, 3))
    pos[:, 0] = np.linspace(0, 1.0, n)  # steady x motion
    z = np.zeros(n)
    z[60:90] = np.linspace(0, 0.3, 30)  # lift
    z[90:120] = 0.3
    z[120:150] = np.linspace(0.3, 0.0, 30)  # descend
    pos[:, 2] = z
    pos[:, 1] = 0.002 * rng.standard_normal(n)
    return pos


def test_highest_z_of_vertical_motion_matches_reference(ref):
    eef = make_eef_trajectory()
    intervals = [(30, 40), (160, 170)]
    ref_idx, ref_mask = ref.get_highest_z_of_vertical_motion(
        intervals, torch.from_numpy(eef)
    )
    ours_idx, ours_mask = kp.get_highest_z_of_vertical_motion(intervals, eef)
    assert list(map(int, ours_idx)) == list(map(int, ref_idx))
    np.testing.assert_array_equal(ours_mask, np.asarray(ref_mask))
    assert len(ours_idx) > 0  # the lift/descend must be detected


def test_index_helpers_match_reference(ref):
    intervals = [(20, 30), (60, 70)]
    idx = [5, 25, 45, 65, 95]
    assert kp.select_indices_between_grasps(idx, intervals) == (
        ref.select_indices_between_grasps(idx, intervals)
    )
    for fractions in ([0.5], [0.25, 0.75]):
        ours = kp.get_extra_keyposes_between_indices([30, 60, 80, 95], 10,
                                                     fractions)
        theirs = ref.get_extra_keyposes_between_indices([30, 60, 80, 95], 10,
                                                        fractions)
        assert list(map(int, ours)) == list(map(int, theirs))
    assert kp.get_previous_keypose([3, 10, 40], 25) == (
        ref.get_previous_keypose([3, 10, 40], 25)
    )
    np.testing.assert_array_equal(
        kp.intervals_to_indices(intervals),
        np.asarray(ref.intervals_to_indices(intervals)),
    )
    np.testing.assert_array_equal(
        kp.combine_indices([5, 3], [3, 9]),
        np.asarray(ref.combine_indices([5, 3], [3, 9])),
    )


def test_first_last_frames_match_reference(ref):
    for idx in ([], [5, 20], [0, 99], [99]):
        ours = kp.ensure_first_and_last_frames_are_keyposes(
            np.asarray(idx, dtype=np.int64), 100
        )
        theirs = ref.ensure_first_and_last_frames_are_keyposes(
            np.asarray(idx, dtype=np.int64), 100
        )
        assert list(map(int, ours)) == list(map(int, theirs))


def test_delay_based_estimator_matches_reference():
    """Step-for-step identical state sequence on random command streams."""
    import importlib.util

    path = "/root/reference/mindmap/embodiments/delay_based_estimator.py"
    spec = importlib.util.spec_from_file_location("ref_delay", path)
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from nvblox_mindmap_tpu.embodiments.base import (
        DelayBasedGripperStateEstimator,
    )

    rng = np.random.default_rng(0)
    for initial in (False, True):
        for delay in (1, 3, 10):
            ref = ref_mod.DelayBasedGripperStateEstimator(initial, delay)
            ours = DelayBasedGripperStateEstimator(initial, delay)
            # Piecewise-constant command stream with noise and None gaps,
            # including the 0.5 boundary.
            commands = []
            level = 0.0
            for _ in range(120):
                if rng.random() < 0.08:
                    level = rng.choice([0.0, 0.4, 0.5, 0.6, 1.0])
                commands.append(None if rng.random() < 0.1 else level)
            for i, c in enumerate(commands):
                ref.update(c)
                ours.update(c)
                assert ours.get_state() == ref.get_state(), (
                    f"diverged at step {i} (initial={initial}, delay={delay})"
                )
