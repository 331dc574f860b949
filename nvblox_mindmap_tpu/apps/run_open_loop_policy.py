"""Open-loop policy app: step the trained policy over a recorded dataset.

(reference: mindmap/run_open_loop_policy.py) Loads a demo dataset, runs
inference per keypose sample, and reports the evaluation metrics (distance
error, rotation geodesic error, openness L1).
"""
from __future__ import annotations

import json
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
from nvblox_mindmap_tpu.embodiments.registry import make_embodiment_for_task
from nvblox_mindmap_tpu.mapping.constants import get_workspace_bounds
from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.loss import compute_metrics
from nvblox_mindmap_tpu.utils.config import (
    OpenLoopAppArgs,
    model_config_from_args,
    parse_args,
    update_model_args_from_checkpoint,
)

logger = logging.getLogger("nvblox_mindmap_tpu.run_open_loop_policy")


def make_infer_fn(model, bounds):
    """Build the jitted inference function ONCE (compile caches per shape)."""
    cfg = model.config

    @jax.jit
    def infer(params, batch, key):
        prepared = prepare_inputs(batch, bounds, cfg)
        traj, head_yaw, weights = sample_trajectory(
            model, {"params": params}, prepared, key, bounds
        )
        return traj, head_yaw, weights

    return infer


def run_inference(infer, model, params, batch: Dict, bounds, key
                  ) -> Dict[str, np.ndarray]:
    """One inference call + metrics vs the GT keypose."""
    cfg = model.config
    traj, head_yaw, weights = infer(params, batch, key)
    # None under the flash-attention inference swap (no weights materialized).
    result_weights = None if weights is None else np.asarray(weights)
    gt = batch["gt_gripper_pred"]
    metrics = compute_metrics(
        traj,
        head_yaw,
        gt,
        batch.get("gt_head_yaw"),
        predict_head_yaw=cfg.predict_head_yaw,
        rotation_form="quaternion",
    )
    return {
        "trajectory": np.asarray(traj),
        "attention_weights": result_weights,
        "metrics": {k: np.asarray(v) for k, v in jax.device_get(metrics).items()},
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    cli_args = parse_args(OpenLoopAppArgs, argv)
    args = update_model_args_from_checkpoint(cli_args)
    assert args.task is not None and args.dataset is not None

    from nvblox_mindmap_tpu.apps.run_training import resolve_keypose_params
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type

    embodiment = make_embodiment_for_task(args.task)
    extra, mode = resolve_keypose_params(args)
    loader, _ = get_data_loader_by_data_type(
        embodiment=embodiment,
        dataset_path=args.dataset,
        demos=args.demos_open_loop,
        num_workers=0,
        batch_size=1,
        use_keyposes=bool(args.use_keyposes),
        data_type=args.data_type,
        only_sample_keyposes=bool(args.only_sample_keyposes),
        extra_keyposes_around_grasp_events=extra,
        keypose_detection_mode=mode,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=args.num_history,
        prediction_horizon=args.prediction_horizon,
        add_external_cam=args.add_external_cam,
        num_vertices_to_sample=args.num_vertices_to_sample,
        vertex_sampling_method=args.vertex_sampling_method,
        rgbd_min_depth_threshold=args.rgbd_min_depth_threshold,
        seed=args.seed,
    )

    cfg = model_config_from_args(args)
    model = DiffuserActor(cfg)
    bounds = jnp.asarray(get_workspace_bounds(args.task))

    # Initialize / load params.
    from nvblox_mindmap_tpu.training.trainer import Trainer, TrainerConfig

    trainer = Trainer(cfg, TrainerConfig(save_checkpoint=False), np.asarray(bounds))
    first = next(iter(loader))
    if args.checkpoint:
        params, _, _, _ = trainer.load_checkpoint(str(args.checkpoint), first)
    else:
        logger.warning("No checkpoint given; evaluating a random-init model.")
        params, _ = trainer.init_state(first)

    metric_sums: Dict[str, np.ndarray] = {}
    count = 0
    infer = make_infer_fn(model, bounds)
    pca_projection = None
    for i, batch in enumerate(loader):
        result = run_inference(
            infer, model, params, _to_device(batch), bounds, jax.random.PRNGKey(i)
        )
        if args.ply_output_dir and batch.get("vertices") is not None:
            pca_projection = _export_sample_ply(
                args.ply_output_dir, i, batch, result, pca_projection
            )
        for k, v in result["metrics"].items():
            metric_sums[k] = metric_sums.get(k, 0.0) + v
        count += 1
    means = {k: (v / count).tolist() for k, v in metric_sums.items()}

    # Strict JSON: NaN tokens (e.g. from degenerate metrics) are not valid
    # JSON - downstream parsers choke on them. Vector metrics (.tolist()
    # lists) sanitize recursively.
    def _no_nan(v):
        if isinstance(v, float) and v != v:
            return None
        if isinstance(v, list):
            return [_no_nan(x) for x in v]
        return v

    means = {k: _no_nan(v) for k, v in means.items()}
    logger.info("Open-loop metrics over %d samples:\n%s", count,
                json.dumps(means, indent=2, default=str))
    return means


def _export_sample_ply(output_dir, idx, batch, result, pca_projection):
    """Write feature-PCA and attention-colored context clouds + prediction."""
    import os

    from nvblox_mindmap_tpu.visualization.visualizer import (
        attention_to_colors,
        save_feature_pointcloud_ply,
        save_pointcloud_ply,
    )

    os.makedirs(output_dir, exist_ok=True)
    vertices = np.asarray(batch["vertices"][0])
    features = np.asarray(batch["vertex_features"][0])
    pca_projection = save_feature_pointcloud_ply(
        os.path.join(output_dir, f"sample_{idx:04d}_features.ply"),
        vertices,
        features,
        pca_projection,
    )
    if result["attention_weights"] is not None:
        weights = np.asarray(result["attention_weights"])[0].mean(axis=0)
        # Attention weights cover the context tokens; for mesh mode that's
        # the vertex set.
        n = min(len(weights), len(vertices))
        save_pointcloud_ply(
            os.path.join(output_dir, f"sample_{idx:04d}_attention.ply"),
            vertices[:n],
            attention_to_colors(weights[:n]),
        )
    pred = np.asarray(result["trajectory"])[0, :, :, :3].reshape(-1, 3)
    save_pointcloud_ply(
        os.path.join(output_dir, f"sample_{idx:04d}_prediction.ply"), pred
    )
    return pca_projection


def _to_device(batch):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None,
        batch,
        is_leaf=lambda x: x is None,
    )


if __name__ == "__main__":
    main()
