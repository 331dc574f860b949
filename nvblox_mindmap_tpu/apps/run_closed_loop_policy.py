"""Closed-loop policy app (reference: mindmap/run_closed_loop_policy.py).

Runs the trained policy (or the GT policy) against an environment. Without an
Isaac Lab bridge, the built-in environments are:

- ``replay``: replay a recorded demo (the policy's map updates and goal
  requests run against real recorded observations; no physics).
- ``kinematic``: a kinematic world seeded from the demo's first robot state,
  with the GT keyposes as success waypoints - the policy must actually reach
  them (physics-free success evaluation).

An external simulator can plug in by implementing EnvironmentBase.
"""
from __future__ import annotations

import logging
import os

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import (
    KinematicEnvironment,
    ReplayEnvironment,
)
from nvblox_mindmap_tpu.closed_loop.policies import (
    GroundTruthPolicy,
    NvbloxDiffuserActorPolicy,
)
from nvblox_mindmap_tpu.closed_loop.runner import (
    ClosedLoopConfig,
    run_closed_loop_policy,
)
from nvblox_mindmap_tpu.data.dataset import get_demo_paths, get_indices_from_range_str
from nvblox_mindmap_tpu.embodiments.base import EmbodimentType
from nvblox_mindmap_tpu.embodiments.registry import make_embodiment_for_task
from nvblox_mindmap_tpu.mapping.constants import MappingConfig, get_workspace_bounds
from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActor
from nvblox_mindmap_tpu.models.feature_extractors import get_feature_dim
from nvblox_mindmap_tpu.utils.config import (
    ClosedLoopAppArgs,
    model_config_from_args,
    parse_args,
    update_model_args_from_checkpoint,
)

logger = logging.getLogger("nvblox_mindmap_tpu.run_closed_loop_policy")


def main(argv=None, environment: str = "kinematic"):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    cli_args = parse_args(ClosedLoopAppArgs, argv)
    args = update_model_args_from_checkpoint(cli_args)
    assert args.task is not None and args.dataset is not None

    from nvblox_mindmap_tpu.apps.run_training import resolve_keypose_params

    embodiment = make_embodiment_for_task(args.task)
    extra, mode = resolve_keypose_params(args)
    bounds = get_workspace_bounds(args.task)
    cfg = model_config_from_args(args)
    model = DiffuserActor(cfg)
    mapping_config = MappingConfig.for_task(
        args.task, feature_dim=get_feature_dim(args.feature_type),
        voxel_size_m=args.voxel_size_m,
    ).scaled_for_image_size(tuple(args.image_size))

    demo_paths = get_demo_paths(args.dataset, args.demos_closed_loop)
    use_gt_policy = args.demo_mode in ("execute_gt_goals", "gt")

    # Live mapping runs the feature extractor every sim step; a non-RGB
    # extractor needs converted pretrained weights.
    feature_fn = None
    if not use_gt_policy and args.data_type in ("mesh", "rgbd_and_mesh"):
        from nvblox_mindmap_tpu.models.pretrained import make_feature_fn

        # make_feature_fn fails fast when a non-RGB extractor has no weights.
        feature_fn = make_feature_fn(
            args.feature_type,
            output_size=mapping_config.upscaled_feature_image_size,
            backbone_weights=args.backbone_weights,
            feature_image_size=tuple(args.feature_image_size),
        )

    params = None
    if not use_gt_policy:
        from nvblox_mindmap_tpu.training.trainer import (
            Trainer,
            TrainerConfig,
            make_train_batch_template,
        )

        trainer = Trainer(cfg, TrainerConfig(batch_size=1, save_checkpoint=False),
                          bounds)
        template = make_train_batch_template(
            cfg,
            batch_size=1,
            n_vertices=args.num_vertices_to_sample,
            feature_dim=get_feature_dim(args.feature_type),
            image_size=args.image_size[0],
            ncam=2 if args.add_external_cam else 1,
        )
        if args.checkpoint:
            params, _, _, _ = trainer.load_checkpoint(str(args.checkpoint), template)
        else:
            logger.warning("No checkpoint; running a random-init policy.")
            params, _ = trainer.init_state(template)

    if not use_gt_policy:
        logger.info(
            "serving sampler: %s, %s inference steps",
            args.serving_scheduler,
            args.serving_num_inference_steps or cfg.diffusion_timesteps,
        )

    def gt_goals_for(demo_path):
        return GroundTruthPolicy.from_demo(demo_path, embodiment, extra, mode)

    def make_env(demo_path):
        if environment == "replay":
            prefixes = (
                ["wrist"] if embodiment.embodiment_type == EmbodimentType.ARM
                else ["pov"]
            )
            return ReplayEnvironment(demo_path, embodiment, prefixes)
        if environment in ("scene", "kinematic"):
            # Demos recorded in the hermetic scene world carry a scene.json;
            # rebuilding that world gives real cameras + object physics, so
            # the task evaluator judges actual task semantics.
            from nvblox_mindmap_tpu.closed_loop.scripted import env_from_scene_json

            scene_env = env_from_scene_json(demo_path)
            if scene_env is not None:
                return scene_env
            if environment == "scene":
                raise FileNotFoundError(
                    f"environment='scene' requires {demo_path}/scene.json "
                    "(demos recorded via closed_loop/scripted.py)"
                )
        gt = gt_goals_for(demo_path)
        initial = gt.goals[0]
        waypoints = [g[:3] for g in gt.goals[1:]]
        return KinematicEnvironment(embodiment, initial, waypoints)

    def make_policy(demo_path):
        if use_gt_policy:
            return gt_goals_for(demo_path)
        return NvbloxDiffuserActorPolicy(
            model,
            params,
            embodiment,
            mapping_config,
            bounds,
            num_vertices_to_sample=args.num_vertices_to_sample,
            vertex_sampling_method=args.vertex_sampling_method,
            num_history=args.num_history,
            seed=args.seed,
            include_dynamic=args.include_dynamic,
            feature_fn=feature_fn,
            num_prediction_samples=args.prediction_samples,
            num_inference_steps=args.serving_num_inference_steps,
            scheduler_kind=args.serving_scheduler,
            timestep_spacing=args.serving_timestep_spacing,
            # DDIM serves deterministic (eta=0, the benchmarked production
            # config); DDPM keeps the reference's stochastic sampling.
            stochastic_sampling=(args.serving_scheduler == "ddpm"),
        )

    # Task-semantics evaluator when the environment exposes object poses
    # (e.g. a sim adapter through the remote bridge); otherwise the env's own
    # success term (reference: closed_loop_policy.py:43-48 evaluator map).
    from nvblox_mindmap_tpu.closed_loop.evaluators import make_evaluator_for_task

    # The probe env is reused for the first attempt (the runner resets each
    # episode anyway) instead of being constructed and thrown away.
    probe_cache = {}
    if demo_paths:
        probe_cache[demo_paths[0]] = make_env(demo_paths[0])
    has_object_state = bool(
        demo_paths and probe_cache[demo_paths[0]].get_object_poses()
    )
    inner_make_env = make_env

    def make_env(demo_path):  # noqa: F811 - wrap to serve the probe once
        cached = probe_cache.pop(demo_path, None)
        return cached if cached is not None else inner_make_env(demo_path)
    # Scene-world demos may use different object counts/sizes than the Isaac
    # task defaults; parameterize the evaluator from the actual scene.
    task_params = {}
    probe = probe_cache.get(demo_paths[0]) if demo_paths else None
    if probe is not None and hasattr(probe, "object_half"):
        names = [n for n in probe.get_object_poses() if n.startswith("cube_")]
        if names:
            task_params = {
                "num_cubes": len(names),
                "cube_side_length": 2.0 * probe.object_half,
            }
    evaluator = make_evaluator_for_task(
        args.task, eval_file_path=args.eval_file_path,
        env_has_object_state=has_object_state,
        task_params=task_params,
    )
    config = ClosedLoopConfig(
        max_num_steps_to_goal=args.max_num_steps_to_goal,
        num_retries=args.num_retries,
        max_intermediate_distance_m=args.max_intermediate_distance_m,
        terminate_after_n_steps=args.terminate_after_n_steps,
    )
    summary = run_closed_loop_policy(
        make_env,
        make_policy,
        embodiment,
        evaluator,
        demo_names=demo_paths,
        config=config,
        eval_file_path=args.eval_file_path,
    )
    if summary["success_rate"] == 1.0:
        # Sentinel scanned by e2e harnesses (reference
        # run_closed_loop_policy.py:129-131).
        print("CLOSED_LOOP_POLICY: ALL DEMOS SUCCESSFUL")
    return summary


if __name__ == "__main__":
    main()
