"""Packed epoch staging (data/packed.py): materialize -> mmap -> device.

The chip-fed training mode: the production loader's batches are written
once to mmap-able .npy files, staged into device memory whole, and sliced
per step on device (measured rationale: a 1-core host feeds ~8-15
samples/s and per-step re-upload through a remote-dispatch tunnel costs
seconds — docs/pages/benchmarks.md)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvblox_mindmap_tpu.data.packed import (
    PackedDeviceLoader,
    PackedEpoch,
    device_batch,
    materialize_packed_epoch,
    stage_to_device,
)


def _synthetic_batches(n=5, B=4):
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        rgb_u8 = rng.integers(0, 256, (B, 1, 8, 8, 3), dtype=np.uint8)
        out.append({
            "gripper_history": rng.normal(size=(B, 3, 1, 8)).astype(np.float32),
            "rgbs": rgb_u8.astype(np.float32) / 255.0,  # RgbTransformer output
            "pcds": rng.uniform(-1, 1, (B, 1, 8, 8, 3)).astype(np.float32),
            "pcd_valid_mask": rng.integers(0, 2, (B, 1, 8, 8)).astype(bool),
            "vertex_features": rng.normal(size=(B, 16, 8)).astype(np.float16),
            "vertices": rng.uniform(-1, 1, (B, 16, 3)).astype(np.float32),
            "instruction": None,
            "gt_head_yaw": None,
        })
    return out


def test_materialize_roundtrip_exact(tmp_path):
    batches = _synthetic_batches()
    meta = materialize_packed_epoch(batches, str(tmp_path))
    assert meta["num_batches"] == 5
    # RGB detected as exact uint8/255 and re-packed losslessly.
    assert meta["keys"]["rgbs"]["rgb_uint8"] is True
    assert meta["keys"]["rgbs"]["dtype"] == "uint8"
    assert meta["keys"]["vertex_features"]["dtype"] == "float16"
    assert sorted(meta["none_keys"]) == ["gt_head_yaw", "instruction"]

    packed = PackedEpoch(str(tmp_path))
    assert len(packed) == 5
    for i, orig in enumerate(batches):
        got = packed.batch(i)
        assert got["instruction"] is None and got["gt_head_yaw"] is None
        for k, v in orig.items():
            if v is None:
                continue
            np.testing.assert_array_equal(got[k], v), k
    # The mmap view is zero-copy (memmap-backed).
    assert isinstance(packed.arrays["pcds"], np.memmap)


def test_materialize_num_batches_cap_and_shape_guard(tmp_path):
    batches = _synthetic_batches(n=5)
    meta = materialize_packed_epoch(batches, str(tmp_path / "a"), num_batches=3)
    assert meta["num_batches"] == 3
    bad = _synthetic_batches(n=2)
    bad[1]["vertices"] = bad[1]["vertices"][:, :7]
    with pytest.raises(AssertionError, match="shape"):
        materialize_packed_epoch(bad, str(tmp_path / "b"))


def test_non_uint8_rgb_keeps_float(tmp_path):
    """RGB that is NOT an exact uint8/255 grid (e.g. post-augmentation)
    must stay float32 — quantizing it would silently corrupt data."""
    batches = _synthetic_batches(n=2)
    for b in batches:
        b["rgbs"] = b["rgbs"] * 0.7 + 0.001
    meta = materialize_packed_epoch(batches, str(tmp_path))
    assert meta["keys"]["rgbs"]["rgb_uint8"] is False
    got = PackedEpoch(str(tmp_path)).batch(0)
    np.testing.assert_array_equal(got["rgbs"], batches[0]["rgbs"])


def test_mixed_uint8_exact_then_inexact_rgb_raises(tmp_path):
    """The uint8 decision is made on batch 0; a later off-grid batch must
    fail loudly (quantizing 1.2 would wrap to 50 as uint8)."""
    batches = _synthetic_batches(n=3)
    batches[2]["rgbs"] = batches[2]["rgbs"] * 0.7 + 0.001
    with pytest.raises(ValueError, match="uint8/255"):
        materialize_packed_epoch(batches, str(tmp_path))


def test_packed_loader_set_epoch_resumes_stream(tmp_path):
    """set_epoch(k) pins the shuffle stream: a loader resumed at epoch k
    yields exactly the orders the uninterrupted run produced."""
    materialize_packed_epoch(_synthetic_batches(n=5), str(tmp_path))
    a = PackedDeviceLoader(str(tmp_path), shuffle=True, seed=7)
    orders_a = [
        [np.asarray(b["vertices"]).tobytes() for b in a] for _ in range(3)
    ]
    b = PackedDeviceLoader(str(tmp_path), shuffle=True, seed=7)
    b.set_epoch(2)  # fresh process resuming mid-run
    orders_b2 = [np.asarray(x["vertices"]).tobytes() for x in b]
    assert orders_b2 == orders_a[2]
    assert orders_a[0] != orders_a[2]  # epochs genuinely reshuffle


def test_stage_and_device_batch_match_host(tmp_path):
    batches = _synthetic_batches(n=3)
    materialize_packed_epoch(batches, str(tmp_path))
    packed = PackedEpoch(str(tmp_path))
    staged = stage_to_device(packed)
    # uint8 rgb stays uint8 through HBM (4x less residency).
    assert staged["rgbs"].dtype == jnp.uint8
    for i in range(3):
        db = device_batch(staged, i)
        assert db["instruction"] is None
        np.testing.assert_array_equal(np.asarray(db["pcds"]), batches[i]["pcds"])
        np.testing.assert_array_equal(
            np.asarray(db["rgbs"]).astype(np.float32) / 255.0,
            batches[i]["rgbs"],
        )
    # Cycling: step n wraps to batch n % N.
    np.testing.assert_array_equal(
        np.asarray(device_batch(staged, 4)["vertices"]),
        batches[1]["vertices"],
    )


def test_prepare_inputs_uint8_rgb_equals_float():
    """The device-side /255 upcast in prepare_inputs is the exact inverse
    of the packing quantization: uint8 and float feeds produce identical
    prepared batches."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActorConfig,
        prepare_inputs,
    )

    rng = np.random.default_rng(1)
    bounds = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="rgbd",
        diffusion_timesteps=5, fps_subsampling_factor=4,
    )
    u8 = rng.integers(0, 256, (2, 1, 8, 8, 3), dtype=np.uint8)
    base = {
        "gripper_history": rng.normal(size=(2, 3, 1, 8)).astype(np.float32),
        "pcds": rng.uniform(-1, 1, (2, 1, 8, 8, 3)).astype(np.float32),
        "pcd_valid_mask": np.ones((2, 1, 8, 8), bool),
    }
    a = prepare_inputs({**base, "rgbs": jnp.asarray(u8)}, bounds, cfg)
    b = prepare_inputs(
        {**base, "rgbs": jnp.asarray(u8.astype(np.float32) / 255.0)},
        bounds, cfg,
    )
    np.testing.assert_array_equal(np.asarray(a["rgbs"]), np.asarray(b["rgbs"]))


def _pack_tiny_dataset(tmp_path):
    from nvblox_mindmap_tpu.scripts.pack_dataset import main as pack_main
    from tests.test_data_pipeline import write_arm_demo

    ds = tmp_path / "ds"
    write_arm_demo(str(ds / "demo_00000"), seed=0)
    write_arm_demo(str(ds / "demo_00001"), seed=1)
    out = str(tmp_path / "packed")
    argv = [
        "--dataset", str(ds), "--task", "cube_stacking",
        "--data_type", "mesh", "--feature_type", "rgb",
        "--demos_train", "0-1", "--batch_size", "4",
        "--num_vertices_to_sample", "32", "--fps_subsampling_factor", "4",
        "--embedding_dim", "24", "--diffusion_timesteps", "5",
        "--packed_out", out,
    ]
    return ds, out, argv


def test_run_training_packed_mode_app_wiring(tmp_path):
    """The training APP in --packed_dataset mode: trains from the packed
    feed (checkpoint produced), and REFUSES train-time sampling flags that
    cannot affect frozen batches (silent no-op guard)."""
    import glob as _glob

    from nvblox_mindmap_tpu.apps.run_training import main as train_main
    from nvblox_mindmap_tpu.scripts.pack_dataset import main as pack_main

    ds, out, argv = _pack_tiny_dataset(tmp_path)
    pack_main(argv)

    log_dir = str(tmp_path / "logs")
    train_argv = [
        "--dataset", str(ds), "--task", "cube_stacking",
        "--data_type", "mesh", "--feature_type", "rgb",
        "--demos_train", "0-1", "--batch_size", "4",
        "--batch_size_val", "4", "--embedding_dim", "24",
        "--diffusion_timesteps", "5", "--fps_subsampling_factor", "4",
        "--num_vertices_to_sample", "32", "--train_iters", "2",
        "--val_freq", "2", "--num_batches_per_test_eval", "1",
        "--skip_train_val", "1", "--base_log_dir", log_dir,
        "--seed", "0", "--packed_dataset", out,
    ]
    with pytest.raises(ValueError, match="no effect"):
        train_main(train_argv + ["--apply_geometry_noise", "1"])

    train_main(train_argv)
    ckpts = {os.path.realpath(p) for p in _glob.glob(
        os.path.join(log_dir, "checkpoints", "*", "last.ckpt"))}
    assert len(ckpts) == 1


def test_packed_device_loader_feeds_trainer_identically(tmp_path):
    """End-to-end: pack the REAL loader's epoch (pack_dataset CLI main),
    then a train step fed by the PackedDeviceLoader produces EXACTLY the
    loss of the same step fed by the streaming loader — the packed mode
    changes where bytes live, not what the model sees."""
    from nvblox_mindmap_tpu.apps.run_training import build_loaders
    from nvblox_mindmap_tpu.embodiments.registry import (
        make_embodiment_for_task,
    )
    from nvblox_mindmap_tpu.scripts.pack_dataset import (
        PackDatasetArgs, main as pack_main,
    )
    from nvblox_mindmap_tpu.training.trainer import Trainer, TrainerConfig
    from nvblox_mindmap_tpu.utils.config import parse_args
    from tests.test_data_pipeline import write_arm_demo

    ds = tmp_path / "ds"
    write_arm_demo(str(ds / "demo_00000"), seed=0)
    write_arm_demo(str(ds / "demo_00001"), seed=1)
    out = str(tmp_path / "packed")
    argv = [
        "--dataset", str(ds), "--task", "cube_stacking",
        "--data_type", "mesh", "--feature_type", "rgb",
        "--demos_train", "0-1", "--batch_size", "4",
        "--num_vertices_to_sample", "32", "--fps_subsampling_factor", "4",
        "--embedding_dim", "24", "--diffusion_timesteps", "5",
        "--packed_out", out,
    ]
    meta = pack_main(argv)
    assert meta["num_batches"] >= 2

    args = parse_args(PackDatasetArgs, argv)
    embodiment = make_embodiment_for_task(args.task)
    stream_loader, _, _ = build_loaders(args, embodiment)
    stream_batches = list(stream_loader)

    from nvblox_mindmap_tpu.models.feature_extractors import (
        FeatureExtractorType,
    )
    from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActorConfig

    model_cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="mesh",
        feature_type=FeatureExtractorType.RGB, diffusion_timesteps=5,
        fps_subsampling_factor=4,
    )
    bounds = np.asarray([[-0.5, -1.0, -0.2], [1.5, 1.0, 2.0]])
    trainer = Trainer(
        model_cfg,
        TrainerConfig(train_iters=1, batch_size=4, save_checkpoint=False),
        bounds,
    )
    params, opt_state = trainer.init_state(stream_batches[0])

    packed_loader = PackedDeviceLoader(out, shuffle=False)
    assert len(packed_loader) == len(stream_batches)
    packed_batches = list(iter(packed_loader))
    losses = []
    clone = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.array(x) if x is not None else None, t,
        is_leaf=lambda x: x is None,
    )
    for batch in (stream_batches[0], packed_batches[0]):
        # The compiled step donates (params, opt_state); clone per call so
        # both runs start from identical, live buffers.
        _, _, step_losses = trainer.train_one_step(
            clone(params), clone(opt_state), batch, 0
        )
        losses.append(float(jax.device_get(step_losses["total"])))
    assert losses[0] == losses[1]
    # Shuffled epochs permute batch ORDER only, deterministically by epoch.
    shuffled = PackedDeviceLoader(out, shuffle=True, seed=3)
    e0 = [np.asarray(b["vertices"]) for b in shuffled]
    e1 = [np.asarray(b["vertices"]) for b in shuffled]
    key = lambda arrs: sorted(a.tobytes() for a in arrs)
    assert key(e0) == key(e1)
