"""Training app: args -> loaders -> pjit Trainer (reference: run_training.py).

Usage:
    python -m nvblox_mindmap_tpu.apps.run_training \
        --dataset <path> --task drill_in_box --data_type mesh \
        --feature_type rgb --demos_train "0-9" --train_iters 1000
"""
from __future__ import annotations

import logging
import os
import sys
from datetime import datetime

import numpy as np

from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
from nvblox_mindmap_tpu.embodiments.registry import (
    TASK_TO_EXTRA_KEYPOSES_AROUND_GRASP_EVENTS,
    TASK_TO_KEYPOSE_DETECTION_MODE,
    make_embodiment_for_task,
)
from nvblox_mindmap_tpu.mapping.constants import get_workspace_bounds
from nvblox_mindmap_tpu.training.trainer import Trainer, TrainerConfig
from nvblox_mindmap_tpu.utils.config import (
    TrainingAppArgs,
    args_to_dict,
    model_config_from_args,
    parse_args,
    update_model_args_from_checkpoint,
)

logger = logging.getLogger("nvblox_mindmap_tpu.run_training")


def resolve_keypose_params(args):
    extra = args.extra_keyposes_around_grasp_events
    if extra is None:
        extra = TASK_TO_EXTRA_KEYPOSES_AROUND_GRASP_EVENTS[args.task]
    mode = args.keypose_detection_mode
    if mode is None:
        mode = TASK_TO_KEYPOSE_DETECTION_MODE[args.task]
    return extra, mode


def build_loaders(args, embodiment, num_shards: int = 1, shard_index: int = 0,
                  skip_train: bool = False, skip_val: bool = False):
    """``skip_train``: build only the validation loader (train_loader and
    train_sampler come back None) — the packed-dataset mode replaces the
    streaming train feed, so scanning/keypose-detecting the train demos
    twice would waste host minutes on large datasets. ``skip_val``:
    symmetric (pack_dataset never evaluates)."""
    extra, mode = resolve_keypose_params(args)
    weighting = SamplingWeightingType(args.sampling_weighting_type.lower())
    common = dict(
        embodiment=embodiment,
        dataset_path=args.dataset,
        num_workers=args.num_workers,
        use_keyposes=bool(args.use_keyposes),
        data_type=args.data_type,
        only_sample_keyposes=bool(args.only_sample_keyposes),
        extra_keyposes_around_grasp_events=extra,
        keypose_detection_mode=mode,
        include_failed_demos=args.include_failed_demos,
        num_history=args.num_history,
        prediction_horizon=args.prediction_horizon,
        add_external_cam=args.add_external_cam,
        num_vertices_to_sample=args.num_vertices_to_sample,
        vertex_sampling_method=args.vertex_sampling_method,
        rgbd_min_depth_threshold=args.rgbd_min_depth_threshold,
        num_shards=num_shards,
        shard_index=shard_index,
        seed=args.seed,
    )
    train_loader = train_sampler = None
    if not skip_train:
        train_loader, train_sampler = get_data_loader_by_data_type(
            demos=args.demos_train,
            batch_size=args.batch_size,
            sampling_weighting_type=weighting,
            balance_demo_groups=getattr(args, "balance_demo_groups", None),
            apply_random_transforms=bool(args.apply_random_transforms),
            apply_geometry_noise=bool(args.apply_geometry_noise),
            pos_noise_stddev_m=args.pos_noise_stddev_m,
            rot_noise_stddev_deg=args.rot_noise_stddev_deg,
            random_translation_range_m=args.random_translation_range_m,
            random_rpy_range_deg=args.random_rpy_range_deg,
            **common,
        )
    val_loader = None
    if not skip_val:
        val_loader, _ = get_data_loader_by_data_type(
            demos=args.demos_valset or args.demos_train,
            batch_size=args.batch_size_val,
            sampling_weighting_type=SamplingWeightingType.UNIFORM,
            # Keep the tail partial batch: a val set smaller than
            # batch_size_val would otherwise evaluate nothing (the tail
            # shape costs one extra eval-step compile, paid once).
            drop_last=False,
            **common,
        )
    return train_loader, train_sampler, val_loader


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    # Multi-host init MUST precede any other jax call in the process (no-op
    # without JAX_COORDINATOR_ADDRESS; reference: MultiProcessGroup enter).
    from nvblox_mindmap_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    cli_args = parse_args(TrainingAppArgs, argv)
    args = update_model_args_from_checkpoint(cli_args)
    assert args.task is not None, "--task is required"
    assert args.dataset is not None, "--dataset is required"

    embodiment = make_embodiment_for_task(args.task)
    model_config = model_config_from_args(args)
    bounds = get_workspace_bounds(args.task)

    checkpoint_dir = os.path.join(
        args.base_log_dir, "checkpoints", datetime.today().strftime("%Y.%m.%d-%H.%M.%S")
    )
    os.makedirs(checkpoint_dir, exist_ok=True)
    trainer_config = TrainerConfig(
        train_iters=args.train_iters,
        batch_size=args.batch_size,
        initial_learning_rate=args.initial_learning_rate,
        learning_rate_end_factor=args.learning_rate_end_factor,
        learning_rate_convergence_percentage=args.learning_rate_convergence_percentage,
        accumulate_grad_batches=args.accumulate_grad_batches,
        val_freq=args.val_freq,
        num_batches_per_train_eval=args.num_batches_per_train_eval,
        num_batches_per_test_eval=args.num_batches_per_test_eval,
        eval_num_inference_steps=(
            args.eval_num_inference_steps
            if args.eval_num_inference_steps > 0 else None
        ),
        eval_scheduler=args.eval_scheduler,
        skip_train_val=args.skip_train_val,
        print_timers_freq=args.print_timers_freq,
        print_progress_freq=args.print_progress_freq,
        save_checkpoint=args.save_checkpoint,
        checkpoint_dir=checkpoint_dir,
        checkpoint_backend=args.checkpoint_backend,
        seed=args.seed,
        remat_policy=args.remat_policy,
    )

    from nvblox_mindmap_tpu.utils.config import args_to_dict as _to_dict
    from nvblox_mindmap_tpu.utils.logging_utils import MetricLogger

    metric_logger = MetricLogger(
        use_wandb=args.wandb_mode != "disabled",
        wandb_project=args.exp_name,
        wandb_name=args.wandb_name,
        wandb_entity=args.wandb_entity,
        wandb_mode=args.wandb_mode,
        config=_to_dict(args),
        artifact_dir=checkpoint_dir,
    )
    # A non-RGB extractor inside the model (rgbd data types) must start from
    # pretrained weights unless resuming a (self-contained) checkpoint.
    if args.data_type in ("rgbd", "rgbd_and_mesh") and not args.checkpoint:
        from nvblox_mindmap_tpu.models.pretrained import require_backbone_weights

        require_backbone_weights(
            args.feature_type, args.backbone_weights, "training from scratch"
        )

    train_loader, _, val_loader = build_loaders(
        args, embodiment, skip_train=bool(args.packed_dataset)
    )
    trainer = Trainer(
        model_config, trainer_config, bounds, metric_logger=metric_logger,
        backbone_weights=args.backbone_weights,
    )
    if args.packed_dataset:
        from nvblox_mindmap_tpu.data.packed import PackedDeviceLoader

        # Train-time sampling/augmentation happens at pack time; flags on
        # THIS invocation cannot affect the frozen batches, so refuse them
        # loudly instead of silently no-op'ing.
        ignored = [
            name for name, active in (
                ("apply_random_transforms", args.apply_random_transforms),
                ("apply_geometry_noise", args.apply_geometry_noise),
                ("balance_demo_groups", args.balance_demo_groups),
                ("sampling_weighting_type",
                 args.sampling_weighting_type != "uniform"),
            ) if active
        ]
        if ignored:
            raise ValueError(
                f"--packed_dataset replays frozen batches; {ignored} have "
                "no effect here — pass them to pack_dataset instead"
            )
        # Chip-fed mode: the train feed is a device-staged packed epoch
        # (one upload, then per-step HBM slices) sharded over the trainer's
        # data mesh; validation keeps the streaming loader (it runs rarely
        # and needs drop_last=False).
        train_loader = PackedDeviceLoader(
            args.packed_dataset, mesh=trainer.mesh, seed=args.seed
        )
        logger.info(
            "packed train feed: %d batches staged on device from %s",
            len(train_loader), args.packed_dataset,
        )

    params = opt_state = None
    start_iter, best_loss = 0, None
    if args.checkpoint:
        template = next(iter(val_loader))
        params, opt_state, start_iter, best_loss = trainer.load_checkpoint(
            str(args.checkpoint), template
        )
        logger.info("Resumed from %s at iter %d", args.checkpoint, start_iter)

    if args.eval_only:
        if params is None:
            first = next(iter(val_loader))
            params, opt_state = trainer.init_state(first)
        trainer.evaluate_nsteps(params, val_loader, 0, -1, split="val-only")
        return

    trainer.run_training(
        train_loader,
        val_loader,
        params=params,
        opt_state=opt_state,
        start_iter=start_iter,
        best_loss=best_loss,
        args_dict=args_to_dict(args),
    )

    # Stable handle for chained workflows (train -> eval handoff): repoint
    # checkpoints/latest AFTER a successful run so a crashed/mid-flight run
    # never leaves the symlink dangling while an older best.ckpt exists
    # (workflows/submit.py points at checkpoints/latest/best.ckpt).
    if args.save_checkpoint and (
        os.path.exists(os.path.join(checkpoint_dir, "last.ckpt"))
        or os.path.isdir(os.path.join(checkpoint_dir, "last"))
    ):
        latest = os.path.join(args.base_log_dir, "checkpoints", "latest")
        try:
            if os.path.islink(latest) or os.path.exists(latest):
                os.unlink(latest)
            os.symlink(os.path.basename(checkpoint_dir), latest)
        except OSError:
            pass  # no symlinks on this FS: pass explicit checkpoint paths


if __name__ == "__main__":
    main()
