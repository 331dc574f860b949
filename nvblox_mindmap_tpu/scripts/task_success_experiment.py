"""Trained-policy task success in the hermetic scene world, end to end.

The full capability chain the reference runs across three apps (reference:
run_isaaclab_datagen.py -> run_training.py -> closed_loop_policy.py:242-317),
executed hermetically for ANY of the four tasks: scripted expert demos in
the scene world -> datagen fusion -> run_training app ->
NvbloxDiffuserActorPolicy with live mapping -> the task's object-state
evaluator judging success.

Stages are resumable (artifacts persist under --out):
    gen        record + fuse N scripted demos for --task
               (+ --recovery_demos slip-and-recover expert demos)
    dagger     roll out the TRAINED policy on fresh scenes, expert takes
               over mid-episode; harvest + fuse --dagger_demos on-policy
               corrective demos (run after an initial 'train')
    train      train the diffusion policy with the production task defaults
               (include appended demos via --recovery_demos/--dagger_demos)
    openloop   per-keypose open-loop error against the TRAINING keypose set
    closedloop closed-loop rollout + task-evaluator summary (JSON to stdout
               and <out>/closed_loop_summary.json)
    heldout    closed-loop on freshly randomized scenes (disjoint seed) —
               the generalization protocol behind
               docs/data/generalization_heldout_*.json
    all        everything except heldout

Training notes (measured on this chain):
  - The keypose set is part of the learning problem; open-loop eval uses the
    same per-task defaults the training app resolves
    (embodiments/registry.py) - see docs/pages/open_loop_evaluation.md.
  - sampling_weighting_type=gripper_state_change (reference cli/args.py:262
    option) balances the grasp/release flip samples; with uniform sampling
    at this data scale the release-keypose openness stays undertrained and
    the closed-loop policy stacks but never lets go.

Run: python -m nvblox_mindmap_tpu.scripts.task_success_experiment all
     [--task cube_stacking] [--out /tmp/task_success] [--num_demos 8]
     [--train_iters 8000]

Artifacts land under <out>/<task>/ (appended automatically), so switching
--task never resumes from another task's demos or checkpoint.
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
from typing import Dict, List, Tuple

import numpy as np

CUBE_HALF = 0.04
N_VERTICES = 512
EMB = 72
TIMESTEPS = 100
FPS_SUBSAMPLING = 4
DEFAULT_TASK = "cube_stacking"


def _enable_compilation_cache():
    from nvblox_mindmap_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()


def _generator_for_task(task: str):
    from nvblox_mindmap_tpu.closed_loop import scripted

    return {
        "cube_stacking": lambda ds, n, seed: scripted.generate_cube_stacking_demos(
            ds, num_demos=n, seed=seed, cube_half=CUBE_HALF
        ),
        "mug_in_drawer": lambda ds, n, seed: scripted.generate_mug_in_drawer_demos(
            ds, num_demos=n, seed=seed
        ),
        "drill_in_box": lambda ds, n, seed: scripted.generate_drill_in_box_demos(
            ds, num_demos=n, seed=seed
        ),
        "stick_in_bin": lambda ds, n, seed: scripted.generate_stick_in_bin_demos(
            ds, num_demos=n, seed=seed
        ),
    }[task]


def _embodiment_for_task(task: str):
    from nvblox_mindmap_tpu.embodiments.registry import (
        Tasks,
        make_embodiment_for_task,
    )

    return make_embodiment_for_task(Tasks(task))


def _evaluator_for_task(task: str):
    from nvblox_mindmap_tpu.closed_loop.evaluators import (
        make_evaluator_for_task,
    )
    from nvblox_mindmap_tpu.embodiments.registry import Tasks

    task_params = None
    if task == "cube_stacking":
        task_params = {"num_cubes": 2, "cube_side_length": 2 * CUBE_HALF}
    return make_evaluator_for_task(Tasks(task), task_params=task_params)


def gen_and_fuse(out: str, num_demos: int, seed: int,
                 task: str = DEFAULT_TASK,
                 recovery_demos: int = 0) -> List[str]:
    from nvblox_mindmap_tpu.apps.run_datagen import (
        make_mapping_feature_fn,
        process_demo,
    )

    if recovery_demos:
        # Recovery scenes draw from their own seed range; keep it disjoint
        # from both the standard training scenes and the held-out eval
        # scenes (a --seed near HELDOUT_SEED-1000 would otherwise record
        # correctives on the exact scenes heldout_eval measures on).
        _assert_disjoint_seed_ranges(
            (seed, num_demos), (seed + 1000, recovery_demos),
            (HELDOUT_SEED, num_demos),
        )
    ds = os.path.join(out, "ds")
    total = num_demos + recovery_demos
    # Resume: generation + fusion are deterministic in (seed, N); skip when
    # every demo already carries a scene.json and fused meshes.
    expected = [os.path.join(ds, f"demo_{d:05d}") for d in range(total)]
    if all(
        os.path.exists(os.path.join(d, "scene.json"))
        and glob.glob(os.path.join(d, "*.nvblox_vertex_features.zst"))
        for d in expected
    ):
        return expected
    demos = _generator_for_task(task)(ds, num_demos, seed)
    if recovery_demos:
        # Slip-and-recover demos appended after the standard set, on scenes
        # disjoint from it (seed offset): (off-nominal state -> corrective
        # expert action) coverage — see
        # closed_loop/scripted.generate_cube_stacking_recovery_demos.
        assert task == "cube_stacking", (
            "recovery demos are implemented for cube_stacking"
        )
        from nvblox_mindmap_tpu.closed_loop.scripted import (
            generate_cube_stacking_recovery_demos,
        )

        demos += generate_cube_stacking_recovery_demos(
            ds, recovery_demos, seed=seed + 1000, cube_half=CUBE_HALF,
            start_index=num_demos,
        )
    cfg = mapping_config(task)
    feature_fn = make_mapping_feature_fn(
        "rgb", cfg.upscaled_feature_image_size
    )
    embodiment = _embodiment_for_task(task)
    for d in demos:
        process_demo(d, embodiment, cfg, feature_fn)
    return demos


def mapping_config(task: str = DEFAULT_TASK):
    """The closed-loop app's config for 64x64 scene-world cameras."""
    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    cfg = MappingConfig.for_task(
        Tasks(task), feature_dim=3, voxel_size_m=0.02,
        max_feature_pages=512,
    ).scaled_for_image_size((64, 64))
    return cfg


DAGGER_SEED_OFFSET = 5000  # harvest scenes disjoint from train AND heldout


def dagger_gen(out: str, num_demos: int, checkpoint: str,
               dagger_demos: int, seed: int,
               task: str = DEFAULT_TASK,
               recovery_demos: int = 0) -> List[str]:
    """Harvest on-policy corrective demos (the trained policy drives, the
    scripted expert takes over) and fuse them into the dataset.

    Demos land at indices [num_demos + recovery_demos, ... + dagger_demos)
    so a subsequent ``train --dagger_demos N`` picks them up via the widened
    --demos_train range. Rollout scenes use seed + DAGGER_SEED_OFFSET —
    disjoint from the training scenes (the policy must drift on states IT
    visits, not memorize the eval scenes) and from HELDOUT_SEED.
    """
    assert task == "cube_stacking", (
        "dagger harvesting is implemented for cube_stacking (the one task "
        "below the pack; docs/pages/benchmarks.md diagnosis)"
    )
    from nvblox_mindmap_tpu.apps.run_datagen import (
        make_mapping_feature_fn,
        process_demo,
    )
    from nvblox_mindmap_tpu.closed_loop.policies import (
        NvbloxDiffuserActorPolicy,
    )
    from nvblox_mindmap_tpu.closed_loop.scripted import (
        generate_cube_stacking_dagger_demos,
    )

    ds = os.path.join(out, "ds")
    start = num_demos + recovery_demos
    expected = [
        os.path.join(ds, f"demo_{start + i:05d}")
        for i in range(dagger_demos)
    ]

    def _fused(d: str) -> bool:
        return bool(
            os.path.exists(os.path.join(d, "scene.json"))
            and glob.glob(os.path.join(d, "*.nvblox_vertex_features.zst"))
        )

    # Multi-round aggregation (the DAgger loop): demos already harvested by
    # earlier rounds are kept, and only the missing TAIL is rolled out — with
    # the CURRENT checkpoint, so each round's correctives target the states
    # the latest policy actually drifts to. Fresh scene seeds advance past
    # the existing demos (scenes are seeded harvest_seed + i inside the
    # generator).
    fused_flags = [_fused(d) for d in expected]
    n_existing = next(
        (i for i, f in enumerate(fused_flags) if not f), dagger_demos
    )
    assert not any(fused_flags[n_existing:]), (
        f"non-contiguous dagger demos under {ds}: {fused_flags} — remove the "
        "partial tail and re-run"
    )
    harvest_seed = seed + DAGGER_SEED_OFFSET + n_existing
    _assert_disjoint_seed_ranges(
        (seed, num_demos), (HELDOUT_SEED, num_demos),
        (harvest_seed, dagger_demos - n_existing),
    )
    if n_existing == dagger_demos:
        return expected
    model, params, _, bounds = load_model(checkpoint, task)
    embodiment = _embodiment_for_task(task)
    cfg = mapping_config(task)

    def make_policy():
        return NvbloxDiffuserActorPolicy(
            model, params, embodiment, cfg, np.asarray(bounds),
            num_vertices_to_sample=N_VERTICES, seed=7,
        )

    demos, stats = generate_cube_stacking_dagger_demos(
        ds, dagger_demos - n_existing, make_policy, seed=harvest_seed,
        cube_half=CUBE_HALF, start_index=start + n_existing,
    )
    stats_path = os.path.join(out, "dagger_rollout_stats.json")
    if n_existing and os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f) + stats  # aggregate across rounds
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
    feature_fn = make_mapping_feature_fn(
        "rgb", cfg.upscaled_feature_image_size
    )
    for d in demos:
        process_demo(d, embodiment, cfg, feature_fn)
    return demos


def _assert_disjoint_seed_ranges(*ranges: Tuple[int, int]) -> None:
    """Each (start, n) scene-seed range must not overlap any other — an
    overlap silently evaluates on training (or harvest) scenes and inflates
    the generalization metric."""
    spans = [(s, s + max(n, 1)) for s, n in ranges]
    for i, (a0, a1) in enumerate(spans):
        for b0, b1 in spans[i + 1:]:
            assert a1 <= b0 or b1 <= a0, (
                f"scene-seed ranges overlap: {spans} — pick a --seed so "
                f"train/heldout/dagger scene seeds are disjoint"
            )


def train(out: str, num_demos: int, iters: int,
          task: str = DEFAULT_TASK,
          apply_geometry_noise: bool = False,
          pos_noise_stddev_m: float = 0.01,
          rot_noise_stddev_deg: float = 0.01,
          extra_demos: int = 0,
          balance_sources: bool = False,
          apply_random_transforms: bool = False) -> str:
    """``extra_demos``: appended recovery/dagger demos (indices >= num_demos)
    to include in --demos_train — the mixed expert+corrective dataset.
    ``balance_sources``: give the expert demos and the corrective demos equal
    total sampling mass (data/loader.py balance_demo_groups) — N correctives
    otherwise dilute the nominal data N:num_demos and nominal-scene behavior
    regresses (measured round 4, docs/pages/benchmarks.md).
    ``apply_random_transforms``: the reference's train-time SE(2) scene
    augmentation (cli/args.py:80-83; ±0.1 m xy translation + ±90° z yaw
    applied consistently to vertices, history, and targets) — defeats
    absolute-position memorization, the place-grounding failure measured by
    scripts/place_grounding_probe.py."""
    from nvblox_mindmap_tpu.apps.run_training import main as train_main

    log_dir = os.path.join(out, "logs")
    noise_args = []
    if apply_random_transforms:
        noise_args += ["--apply_random_transforms", "1"]
    if balance_sources:
        assert extra_demos > 0, "--balance_sources needs corrective demos"
        noise_args += [
            "--balance_demo_groups",
            f"0-{num_demos - 1},{num_demos}-{num_demos + extra_demos - 1}",
        ]
    if apply_geometry_noise:
        # DART-style robustification (reference cli/args.py:84-90): Gaussian
        # SE3 noise on the gripper HISTORY + mesh vertices, clean GT targets
        # (data/loader.py:93-101) — trains the policy to correct back toward
        # the expert when its own rollout history drifts off-distribution,
        # the diagnosed cube_stacking closed-loop failure mode
        # (docs/pages/benchmarks.md, consensus-sampling paragraph).
        noise_args += [
            "--apply_geometry_noise", "1",
            "--pos_noise_stddev_m", str(pos_noise_stddev_m),
            "--rot_noise_stddev_deg", str(rot_noise_stddev_deg),
        ]
    train_main(noise_args + [
        "--dataset", os.path.join(out, "ds"),
        "--task", task,
        "--data_type", "mesh",
        "--feature_type", "rgb",
        "--demos_train", f"0-{num_demos + extra_demos - 1}",
        "--demos_valset", "0",
        "--embedding_dim", str(EMB),
        "--diffusion_timesteps", str(TIMESTEPS),
        "--fps_subsampling_factor", str(FPS_SUBSAMPLING),
        "--num_vertices_to_sample", str(N_VERTICES),
        "--batch_size", "16",
        "--batch_size_val", "4",
        "--train_iters", str(iters),
        "--val_freq", "1000",
        "--num_batches_per_test_eval", "1",
        "--skip_train_val", "1",
        "--sampling_weighting_type", "gripper_state_change",
        "--base_log_dir", log_dir,
        "--seed", "0",
    ])
    return latest_checkpoint(out)


def latest_checkpoint(out: str) -> str:
    ckpts = sorted({os.path.realpath(p) for p in glob.glob(
        os.path.join(out, "logs", "checkpoints", "*", "last.ckpt"))})
    assert ckpts, f"no checkpoint under {out}/logs"
    return ckpts[-1]


def load_model(checkpoint: str, task: str = DEFAULT_TASK) -> Tuple:
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.embodiments.base import EmbodimentType
    from nvblox_mindmap_tpu.mapping.constants import get_workspace_bounds
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor, DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import (
        FeatureExtractorType,
    )
    from nvblox_mindmap_tpu.training.trainer import (
        Trainer, TrainerConfig, make_train_batch_template,
    )

    embodiment = _embodiment_for_task(task)
    cfg = DiffuserActorConfig(
        embedding_dim=EMB, num_attn_heads=8, data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=TIMESTEPS,
        fps_subsampling_factor=FPS_SUBSAMPLING,
        ngrippers=embodiment.num_grippers,
        predict_head_yaw=(
            embodiment.embodiment_type == EmbodimentType.HUMANOID
        ),
    )
    model = DiffuserActor(cfg)
    bounds = np.asarray(get_workspace_bounds(task))
    trainer = Trainer(
        cfg, TrainerConfig(batch_size=1, save_checkpoint=False), bounds
    )
    template = make_train_batch_template(
        cfg, batch_size=1, n_vertices=N_VERTICES, feature_dim=3
    )
    params, _, _, _ = trainer.load_checkpoint(checkpoint, template)
    return model, params, cfg, jnp.asarray(bounds)


def open_loop_eval(out: str, num_demos: int, checkpoint: str,
                   task: str = DEFAULT_TASK) -> Dict:
    """Per-keypose open-loop error against the TRAINING keypose set."""
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.apps.run_open_loop_policy import make_infer_fn
    from nvblox_mindmap_tpu.apps.run_training import resolve_keypose_params
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod
    from nvblox_mindmap_tpu.utils.config import TrainingAppArgs

    model, params, cfg, bounds = load_model(checkpoint, task)
    infer = make_infer_fn(model, bounds)
    args = TrainingAppArgs(task=task)
    extra, mode = resolve_keypose_params(args)
    loader, _ = get_data_loader_by_data_type(
        embodiment=_embodiment_for_task(task),
        dataset_path=os.path.join(out, "ds"),
        demos=f"0-{num_demos - 1}",
        num_workers=0, batch_size=1, use_keyposes=True, data_type="mesh",
        only_sample_keyposes=True,
        extra_keyposes_around_grasp_events=extra,
        keypose_detection_mode=mode,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3, prediction_horizon=1,
        num_vertices_to_sample=N_VERTICES,
        vertex_sampling_method=(
            VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT
        ),
        seed=0, drop_last=False,
    )
    errors, openness_correct = [], []
    for i, batch in enumerate(loader):
        db = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None, batch,
            is_leaf=lambda x: x is None,
        )
        # (horizon, num_grippers, 8): mean over grippers of the 3-seed-mean
        # position error; openness accuracy over every gripper slot.
        preds = [
            np.asarray(infer(params, db, jax.random.PRNGKey(97 * s + i))[0])
            [0, 0] for s in range(3)
        ]
        pred = np.mean(preds, axis=0)
        gt = np.asarray(batch["gt_gripper_pred"])[0, 0]
        errors.append(float(np.mean(
            np.linalg.norm(pred[:, :3] - gt[:, :3], axis=-1)
        )))
        openness_correct.extend(
            (pred[:, 7] >= 0.5) == (gt[:, 7] >= 0.5)
        )
    result = {
        "task": task,
        "mean_keypose_error_m": float(np.mean(errors)),
        "median_keypose_error_m": float(np.median(errors)),
        "openness_accuracy": float(np.mean(openness_correct)),
        "num_keyposes": len(errors),
    }
    print(json.dumps(result, indent=2))
    return result


def closed_loop(out: str, num_demos: int, checkpoint: str,
                demos_subset: List[int] | None = None,
                task: str = DEFAULT_TASK,
                prediction_samples: int = 1,
                ds_subdir: str = "ds",
                summary_name: str = "closed_loop_summary.json",
                num_inference_steps: int | None = None,
                scheduler: str = "ddpm",
                timestep_spacing: str = "leading",
                clip_sample: bool | None = None) -> Dict:
    """``scheduler``/``num_inference_steps`` select the reverse-diffusion
    sampler: defaults reproduce the reference's closed-loop protocol (full
    stochastic DDPM at the training timestep count); ``--scheduler ddim
    --num_inference_steps 10`` is the production serving mode the reference
    ships DDPM->DDIM conversion for (reference diffuser_actor/converter.py:51+)
    and must be validated closed-loop, not just on latency."""
    from nvblox_mindmap_tpu.closed_loop.policies import (
        NvbloxDiffuserActorPolicy,
    )
    from nvblox_mindmap_tpu.closed_loop.runner import (
        ClosedLoopConfig, run_closed_loop_policy,
    )
    from nvblox_mindmap_tpu.closed_loop.scripted import env_from_scene_json

    model, params, cfg, bounds = load_model(checkpoint, task)
    embodiment = _embodiment_for_task(task)
    ds = os.path.join(out, ds_subdir)
    indices = demos_subset or list(range(num_demos))
    demos = [os.path.join(ds, f"demo_{i:05d}") for i in indices]

    def make_env(demo_path):
        env = env_from_scene_json(demo_path)
        assert env is not None, f"{demo_path} has no scene.json"
        return env

    def make_policy(demo_path):
        return NvbloxDiffuserActorPolicy(
            model, params, embodiment, mapping_config(task),
            np.asarray(bounds),
            num_vertices_to_sample=N_VERTICES, seed=3,
            num_prediction_samples=prediction_samples,
            num_inference_steps=num_inference_steps,
            scheduler_kind=scheduler,
            timestep_spacing=timestep_spacing,
            clip_sample=clip_sample,
            # DDIM's deterministic (eta=0) variant is the serving config
            # benchmarked in bench.py; DDPM keeps the reference's
            # stochastic sampling.
            stochastic_sampling=(scheduler == "ddpm"),
        )

    evaluator = _evaluator_for_task(task)
    # Step budgets: 220 suffices for the arm tasks (measured); the humanoid
    # demos are longer (two-handed reach + head turns) and their GT chains
    # validate at 500 (tests/test_humanoid_tasks.py).
    from nvblox_mindmap_tpu.embodiments.base import EmbodimentType

    max_steps = (
        500 if embodiment.embodiment_type == EmbodimentType.HUMANOID else 220
    )
    summary = run_closed_loop_policy(
        make_env, make_policy, embodiment, evaluator, demo_names=demos,
        config=ClosedLoopConfig(
            max_num_steps=max_steps, max_num_steps_to_goal=30, num_retries=2
        ),
    )
    summary = {"task": task, **summary}
    print(json.dumps(summary, indent=2, default=str))
    with open(os.path.join(out, summary_name), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


HELDOUT_SEED = 1234  # disjoint from the training-scene seed (21)


def heldout_eval(out: str, num_demos: int, checkpoint: str,
                 task: str = DEFAULT_TASK,
                 prediction_samples: int = 1,
                 train_seed: int = 21,
                 num_inference_steps: int | None = None,
                 scheduler: str = "ddpm",
                 timestep_spacing: str = "leading") -> Dict:
    """Closed-loop success on FRESHLY RANDOMIZED scenes (generalization).

    The reference's closed-loop protocol replays the training demos' initial
    states (closed_loop_policy.py:242-317); this stage instead draws object
    placements with a disjoint generator seed and judges with the same
    object-state evaluator and retry budget — the protocol behind the
    docs/pages/benchmarks.md generalization table
    (docs/data/generalization_heldout_*.json).

    Scene generation reuses the scripted-expert generator (which also writes
    an expert demo we ignore); only scene.json is needed to reset the
    hermetic env, so the fusion pass is skipped.
    """
    _assert_disjoint_seed_ranges(
        (train_seed, num_demos), (HELDOUT_SEED, num_demos)
    )
    hds = os.path.join(out, "heldout_ds")
    expected = [
        os.path.join(hds, f"demo_{d:05d}") for d in range(num_demos)
    ]
    if not all(
        os.path.exists(os.path.join(d, "scene.json")) for d in expected
    ):
        _generator_for_task(task)(hds, num_demos, HELDOUT_SEED)
    suffix = "" if scheduler == "ddpm" else f"_{scheduler}"
    return closed_loop(
        out, num_demos, checkpoint, task=task,
        prediction_samples=prediction_samples, ds_subdir="heldout_ds",
        summary_name=f"heldout_closed_loop_summary{suffix}.json",
        num_inference_steps=num_inference_steps, scheduler=scheduler,
        timestep_spacing=timestep_spacing,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("stage", choices=[
        "gen", "dagger", "train", "openloop", "closedloop", "heldout",
        "all"])
    p.add_argument("--task", default=DEFAULT_TASK, choices=[
        "cube_stacking", "mug_in_drawer", "drill_in_box", "stick_in_bin"])
    p.add_argument("--out", default="/tmp/task_success")
    p.add_argument("--num_demos", type=int, default=8)
    p.add_argument("--train_iters", type=int, default=8000)
    p.add_argument("--seed", type=int, default=21)
    p.add_argument(
        "--apply_geometry_noise", type=int, default=0,
        help="Train with Gaussian SE3 noise on gripper history + vertices "
        "(GT targets stay clean) — the reference's apply_geometry_noise "
        "(cli/args.py:84-90); counters closed-loop exposure drift",
    )
    p.add_argument("--pos_noise_stddev_m", type=float, default=0.01)
    p.add_argument("--rot_noise_stddev_deg", type=float, default=0.01)
    p.add_argument(
        "--apply_random_transforms", type=int, default=0,
        help="Train with the reference's SE(2) scene augmentation "
        "(cli/args.py:80-83): a shared random ±0.1 m xy shift + ±90° z yaw "
        "per sample, applied consistently to vertices/history/targets — "
        "defeats absolute-position memorization (place-grounding probe)",
    )
    p.add_argument(
        "--prediction_samples", type=int, default=1,
        help="K>1 enables consensus goal prediction (one batched device "
        "program per goal; policies.aggregate_trajectory_samples)",
    )
    p.add_argument(
        "--recovery_demos", type=int, default=0,
        help="slip-and-recover expert demos appended after the standard set "
        "(gen stage) and included in training (train stage) — "
        "scripted.generate_cube_stacking_recovery_demos",
    )
    p.add_argument(
        "--dagger_demos", type=int, default=0,
        help="on-policy corrective demos harvested by the 'dagger' stage "
        "(trained policy drives, expert takes over; "
        "scripted.generate_cube_stacking_dagger_demos) and included in "
        "training by the 'train' stage",
    )
    p.add_argument(
        "--balance_sources", type=int, default=0,
        help="1 = equal total sampling mass for the expert demos vs the "
        "recovery/dagger correctives during 'train' (loader "
        "balance_demo_groups); without it N correctives dilute nominal "
        "data N:num_demos",
    )
    p.add_argument(
        "--scheduler", default="ddpm", choices=["ddpm", "ddim"],
        help="reverse-diffusion sampler for closedloop/heldout: ddpm "
        "(reference protocol, stochastic, training timestep count) or ddim "
        "(production serving mode; pair with --num_inference_steps 10)",
    )
    p.add_argument(
        "--num_inference_steps", type=int, default=0,
        help="denoising steps for closedloop/heldout (0 = the training "
        "timestep count); the serving config is --scheduler ddim "
        "--num_inference_steps 10",
    )
    p.add_argument(
        "--timestep_spacing", default="leading",
        choices=["leading", "trailing"],
        help="few-step timestep spacing for closedloop/heldout: leading "
        "(diffusers/reference parity) or trailing (starts the chain at "
        "t=T-1 where the init really is pure noise; "
        "ops/schedulers.DiffusionSchedule.timesteps)",
    )
    args = p.parse_args(argv)
    _enable_compilation_cache()
    # Namespace all artifacts by task: the gen-stage resume check and
    # latest_checkpoint() would otherwise silently reuse a previous task's
    # demos/checkpoint when --task changes under the same --out.
    if os.path.basename(os.path.normpath(args.out)) != args.task:
        args.out = os.path.join(args.out, args.task)
    os.makedirs(args.out, exist_ok=True)
    if args.stage in ("gen", "all"):
        gen_and_fuse(args.out, args.num_demos, args.seed, args.task,
                     recovery_demos=args.recovery_demos)
    if args.stage == "dagger":
        # Harvest with the CURRENT checkpoint (the pre-dagger policy) before
        # any mixed retrain overwrites latest_checkpoint's pick.
        dagger_gen(args.out, args.num_demos, latest_checkpoint(args.out),
                   args.dagger_demos, args.seed, task=args.task,
                   recovery_demos=args.recovery_demos)
    if args.stage in ("train", "all"):
        train(args.out, args.num_demos, args.train_iters, args.task,
              apply_geometry_noise=bool(args.apply_geometry_noise),
              pos_noise_stddev_m=args.pos_noise_stddev_m,
              rot_noise_stddev_deg=args.rot_noise_stddev_deg,
              extra_demos=args.recovery_demos + args.dagger_demos,
              balance_sources=bool(args.balance_sources),
              apply_random_transforms=bool(args.apply_random_transforms))
    if args.stage in ("openloop", "all"):
        open_loop_eval(
            args.out, args.num_demos, latest_checkpoint(args.out), args.task
        )
    steps = args.num_inference_steps or None
    if args.stage in ("closedloop", "all"):
        suffix = "" if args.scheduler == "ddpm" else f"_{args.scheduler}"
        closed_loop(
            args.out, args.num_demos, latest_checkpoint(args.out),
            task=args.task, prediction_samples=args.prediction_samples,
            summary_name=f"closed_loop_summary{suffix}.json",
            num_inference_steps=steps, scheduler=args.scheduler,
            timestep_spacing=args.timestep_spacing,
        )
    if args.stage == "heldout":
        heldout_eval(
            args.out, args.num_demos, latest_checkpoint(args.out),
            task=args.task, prediction_samples=args.prediction_samples,
            train_seed=args.seed,
            num_inference_steps=steps, scheduler=args.scheduler,
            timestep_spacing=args.timestep_spacing,
        )


if __name__ == "__main__":
    main()
