"""Datagen app: fuse recorded RGB-D episodes into per-frame feature meshes.

(reference: mindmap/run_isaaclab_datagen.py) The reference replays HDF5 demos
inside Isaac Lab and fuses nvblox maps as it goes. The simulator is an
external CUDA application; this framework's datagen boundary is the recorded
frame stream (<idx>.<cam>_{rgb.png,depth.png,pose.npy,intrinsics.npy} +
robot_state.npy, produced by the sim-side writer). This app runs the fusion
half: per frame decay -> feature extraction -> TSDF/feature integration ->
``<idx>.nvblox_vertex_features.zst`` export, matching the training dataset
format bit-for-bit.
"""
from __future__ import annotations

import logging
import os

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import (
    ReplayEnvironment,
    dynamic_mask_from_segmentation,
)
from nvblox_mindmap_tpu.geometry.np_rotations import pose7_to_matrix
from nvblox_mindmap_tpu.data.dataset import get_demo_paths
from nvblox_mindmap_tpu.embodiments.base import EmbodimentType
from nvblox_mindmap_tpu.embodiments.registry import make_embodiment_for_task
from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
from nvblox_mindmap_tpu.mapping.mapper import (
    Mapper,
    nvblox_integrate,
    save_feature_mesh_to_disk,
)
from nvblox_mindmap_tpu.models.feature_extractors import get_feature_dim
from nvblox_mindmap_tpu.utils.config import DataGenAppArgs, parse_args
from nvblox_mindmap_tpu.utils.timers import Timer, timer_status_string

logger = logging.getLogger("nvblox_mindmap_tpu.run_datagen")


def process_demo(
    demo_path: str,
    embodiment,
    mapping_config: MappingConfig,
    feature_fn,
    save_serialized_map: bool = False,
    max_num_steps: int = -1,
    include_dynamic: bool = False,
    add_depth_noise: bool = False,
    noise_rng: "np.random.Generator" = None,
):
    """Fuse one demo's frames; write per-frame feature meshes."""
    prefixes = (
        ["wrist"] if embodiment.embodiment_type == EmbodimentType.ARM else ["pov"]
    )
    env = ReplayEnvironment(demo_path, embodiment, prefixes)
    # The dynamic mapper's feature pool is only allocated when needed.
    mapper = (
        Mapper.dual(mapping_config)
        if include_dynamic
        else Mapper({MapperId.STATIC: mapping_config})
    )
    n = env.num_frames if max_num_steps < 0 else min(env.num_frames, max_num_steps)
    env.reset()
    for t in range(n):
        env.t = t
        with Timer("datagen/decay"):
            mapper.decay()
        for frame in env.get_cameras().values():
            depth = frame.depth
            if add_depth_noise:
                # Sensor-like robustness augmentation (reference:
                # run_isaaclab_datagen --add_depth_noise).
                from nvblox_mindmap_tpu.image.conversions import (
                    add_depth_noise as add_noise,
                )

                depth = add_noise(depth, noise_rng)
            with Timer("datagen/compute_features"):
                features = np.asarray(feature_fn(frame.rgb))
            dynamic_mask = dynamic_mask_from_segmentation(
                frame.segmentation,
                env.semantic_id_to_class,
                mapping_config.dynamic_class_labels,
            )
            with Timer("datagen/integrate"):
                nvblox_integrate(
                    mapper,
                    mapping_config,
                    depth,
                    features,
                    frame.intrinsics,
                    pose7_to_matrix(frame.pose7),
                    frame.rgb,
                    dynamic_mask=dynamic_mask,
                    include_dynamic=include_dynamic,
                )
        with Timer("datagen/export_mesh"):
            save_feature_mesh_to_disk(
                mapper,
                os.path.join(demo_path, f"{t}.nvblox_vertex_features.zst"),
                include_dynamic=include_dynamic,
            )
    if save_serialized_map:
        # Reference naming (*.nvblox_map_static.nvblx) so downstream tooling
        # (scripts/convert_maps_usd.py default pattern) finds them; one map
        # per demo (end state) rather than per frame - the per-frame history
        # is already captured by the vertex-feature meshes.
        mapper.save_map(
            os.path.join(demo_path, "nvblox_map_static.nvblx"),
            MapperId.STATIC,
        )
        if include_dynamic:
            mapper.save_map(
                os.path.join(demo_path, "nvblox_map_dynamic.nvblx"),
                MapperId.DYNAMIC,
            )
    # Mark success if no outcome file exists yet.
    from nvblox_mindmap_tpu.data.dataset import DemoOutcome

    outcome_path = os.path.join(demo_path, "demo_successful.npy")
    if not os.path.exists(outcome_path):
        np.save(outcome_path, np.asarray(DemoOutcome.SUCCESS.value))
    logger.info("Fused %d frames for %s", n, demo_path)


def make_mapping_feature_fn(feature_type, upscaled_size,
                            backbone_weights=None,
                            feature_image_size=(32, 32)):
    """Jitted (H, W, 3) [0,1] -> upscaled (Hf, Wf, F) feature extractor.

    Non-RGB extractors require a converted pretrained checkpoint
    (models/pretrained.py); running them randomly initialized is refused.
    """
    from nvblox_mindmap_tpu.models.pretrained import make_feature_fn

    return make_feature_fn(
        feature_type,
        output_size=upscaled_size,
        backbone_weights=backbone_weights,
        feature_image_size=feature_image_size,
    )


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    args = parse_args(DataGenAppArgs, argv)
    assert args.task is not None
    dataset = args.output_dir or args.dataset
    assert dataset is not None, "--output_dir or --dataset required"

    embodiment = make_embodiment_for_task(args.task)
    mapping_config = MappingConfig.for_task(
        args.task,
        feature_dim=get_feature_dim(args.feature_type),
        voxel_size_m=args.voxel_size_m,
        projective_appearance_integrator_measurement_weight=(
            args.projective_appearance_integrator_measurement_weight
        ),
    ).scaled_for_image_size(tuple(args.image_size))
    if args.max_num_attempts != 5:
        logger.warning(
            "--max_num_attempts has no effect: replay datagen is "
            "deterministic (sim-side retries happen on the Isaac host)"
        )
    feature_fn = make_mapping_feature_fn(
        args.feature_type,
        mapping_config.upscaled_feature_image_size,
        backbone_weights=args.backbone_weights,
        feature_image_size=tuple(args.feature_image_size),
    )
    noise_rng = np.random.default_rng(args.seed)
    for demo_path in get_demo_paths(dataset, args.demos_datagen):
        process_demo(
            demo_path,
            embodiment,
            mapping_config,
            feature_fn,
            save_serialized_map=args.save_serialized_nvblox_map_to_disk,
            max_num_steps=args.max_num_steps,
            include_dynamic=args.include_dynamic,
            add_depth_noise=args.add_depth_noise,
            noise_rng=noise_rng,
        )
    if args.validate_demos_with_gt_poses:
        # GT-keypose validation pass (reference run_isaaclab_datagen
        # validate_demos_with_gt_poses): demos whose extracted keyposes
        # cannot be executed are marked FAILED_GT_EVAL and excluded from
        # training by the dataset's success filter.
        from nvblox_mindmap_tpu.apps.run_validate_demos import main as validate

        validate(
            argv=[], task=args.task, dataset=dataset,
            demos=args.demos_datagen,
        )
    logger.info("\n%s", timer_status_string())


if __name__ == "__main__":
    main()
