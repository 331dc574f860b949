"""Config system: CLI parsing, JSON roundtrip, checkpoint args overlay."""
import os

import numpy as np

from nvblox_mindmap_tpu.data.data_types import DataType
from nvblox_mindmap_tpu.embodiments.registry import Tasks
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from nvblox_mindmap_tpu.utils.config import (
    ModelArgs,
    TrainingAppArgs,
    args_to_dict,
    model_config_from_args,
    parse_args,
    parse_two_3d_bounds,
    save_args,
    update_model_args_from_checkpoint,
)


def test_parse_two_3d_bounds():
    lo, hi = parse_two_3d_bounds("[[-0.1, -0.1, 0.0], [0.1, 0.1, 0.0]]")
    assert lo == [-0.1, -0.1, 0.0] and hi == [0.1, 0.1, 0.0]


def test_parse_args_defaults_and_overrides():
    args = parse_args(
        TrainingAppArgs,
        [
            "--task", "drill_in_box",
            "--embedding_dim", "64",
            "--data_type", "mesh",
            "--feature_type", "rgb",
            "--batch_size", "8",
            "--use_keyposes", "1",
        ],
    )
    assert args.task == Tasks.DRILL_IN_BOX
    assert args.embedding_dim == 64
    assert args.data_type == DataType.MESH
    assert args.feature_type == FeatureExtractorType.RGB
    assert args.batch_size == 8
    assert args.train_iters == 100000  # default preserved


def test_json_roundtrip(tmp_path):
    args = parse_args(TrainingAppArgs, ["--task", "cube_stacking"])
    path = str(tmp_path / "training_args.json")
    save_args(args, path)
    import json

    loaded = json.load(open(path))
    assert loaded["task"] == "cube_stacking"
    assert loaded["embedding_dim"] == 120


def test_checkpoint_overlay_only_model_args(tmp_path):
    # Save args with a different embedding dim + train_iters.
    trained = parse_args(
        TrainingAppArgs,
        ["--embedding_dim", "48", "--train_iters", "7", "--task", "cube_stacking"],
    )
    ckpt_dir = tmp_path / "ckpt"
    os.makedirs(ckpt_dir)
    save_args(trained, str(ckpt_dir / "training_args.json"))

    cli = parse_args(
        TrainingAppArgs,
        [
            "--checkpoint", str(ckpt_dir / "best.ckpt"),
            "--embedding_dim", "999",
            "--train_iters", "123",
        ],
    )
    updated = update_model_args_from_checkpoint(cli)
    # ModelArgs field overridden by the frozen value.
    assert updated.embedding_dim == 48
    assert updated.task == Tasks.CUBE_STACKING
    # Non-model field stays from CLI.
    assert updated.train_iters == 123


def test_model_config_from_args_humanoid():
    args = parse_args(
        TrainingAppArgs, ["--task", "drill_in_box", "--data_type", "mesh"]
    )
    cfg = model_config_from_args(args)
    assert cfg.ngrippers == 2
    assert cfg.predict_head_yaw
    assert cfg.rotation_parametrization == "6D"
    assert cfg.data_type == "mesh"


def test_model_config_from_args_arm():
    args = parse_args(TrainingAppArgs, ["--task", "cube_stacking"])
    cfg = model_config_from_args(args)
    assert cfg.ngrippers == 1
    assert not cfg.predict_head_yaw


def test_analog_gripper_mode_is_rejected_loudly():
    import pytest

    from nvblox_mindmap_tpu.utils.config import OpenLoopAppArgs, parse_args

    with pytest.raises(NotImplementedError, match="analog"):
        parse_args(OpenLoopAppArgs, ["--gripper_encoding_mode", "analog"])


def test_closed_loop_serving_scheduler_flags():
    """The production closed-loop app exposes the DDIM serving mode
    (reference ships DDPM->DDIM conversion for deployment,
    diffuser_actor/converter.py:51+); defaults keep reference parity
    (stochastic DDPM at the training timestep count)."""
    from nvblox_mindmap_tpu.utils.config import ClosedLoopAppArgs

    args = parse_args(ClosedLoopAppArgs, ["--task", "cube_stacking"])
    assert args.serving_scheduler == "ddpm"
    assert args.serving_num_inference_steps is None

    args = parse_args(
        ClosedLoopAppArgs,
        ["--task", "cube_stacking", "--serving_scheduler", "ddim",
         "--serving_num_inference_steps", "10"],
    )
    assert args.serving_scheduler == "ddim"
    assert args.serving_num_inference_steps == 10
