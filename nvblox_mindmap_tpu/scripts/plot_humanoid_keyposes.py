"""Analyze + plot humanoid keypose detection over recorded demos.

(reference: mindmap/scripts/plot_humanoid_keyposes.py) Loads the 37-d robot
states of each demo, runs the humanoid keypose estimator, and writes a
per-demo figure: eef heights, hand closedness, head yaw, with detected
keyposes marked. Headless (matplotlib Agg); prints the indices either way.

    python -m nvblox_mindmap_tpu.scripts.plot_humanoid_keyposes \
        --demo_path dataset/ --output_dir plots/
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.embodiments.humanoid import HumanoidEmbodiment


def load_robot_states(demo_path: str) -> np.ndarray:
    from nvblox_mindmap_tpu.data.dataset import DemoDataset

    return DemoDataset.load_robot_states(demo_path)


def analyze_demo(demo_path: str, output_dir: str = None,
                 mode: KeyposeDetectionMode =
                 KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION_AND_HEAD_TURN,
                 plot: bool = True) -> np.ndarray:
    embodiment = HumanoidEmbodiment()
    robot_states = load_robot_states(demo_path)
    keyposes = embodiment.extract_keypose_indices(
        robot_states, extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=mode,
    )
    print(f"{demo_path}: {len(keyposes)} keyposes at {list(keyposes)}")

    if plot and output_dir:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        policy_states = embodiment.policy_states_from_robot_states(robot_states)
        t = np.arange(len(robot_states))
        fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        axes[0].plot(t, robot_states[:, 2], label="left eef z")
        axes[0].plot(t, robot_states[:, 20], label="right eef z")
        axes[0].set_ylabel("height [m]")
        axes[1].plot(t, policy_states[:, 7], label="left closed")
        axes[1].plot(t, policy_states[:, 15], label="right closed")
        axes[1].set_ylabel("closedness")
        axes[2].plot(t, robot_states[:, 36], label="head yaw")
        axes[2].set_ylabel("yaw [rad]")
        axes[2].set_xlabel("frame")
        for ax in axes:
            for k in keyposes:
                ax.axvline(k, color="r", alpha=0.3, linewidth=0.8)
            ax.legend(loc="upper right")
        os.makedirs(output_dir, exist_ok=True)
        out = os.path.join(
            output_dir, f"{os.path.basename(demo_path)}_keyposes.png"
        )
        fig.savefig(out, dpi=100)
        plt.close(fig)
        print(f"wrote {out}")
    return keyposes


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--demo_path", required=True,
                        help="one demo dir or a dataset root of demo_*")
    parser.add_argument("--output_dir", default=None,
                        help="write plots here (omit for indices only)")
    parser.add_argument(
        "--keypose_detection_mode",
        type=KeyposeDetectionMode,
        default=KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION_AND_HEAD_TURN,
    )
    args = parser.parse_args(argv)

    if "demo" in os.path.basename(os.path.normpath(args.demo_path)):
        demo_paths = [args.demo_path]
    else:
        demo_paths = sorted(glob.glob(os.path.join(args.demo_path, "demo_*")))
        if not demo_paths:
            raise ValueError(f"no demos found in {args.demo_path}")
    for demo_path in demo_paths:
        analyze_demo(demo_path, args.output_dir,
                     mode=args.keypose_detection_mode)


if __name__ == "__main__":
    main()
