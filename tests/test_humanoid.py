"""Humanoid (GR1T2) path: codecs, grasp/head-turn keyposes, pipeline, model."""
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.data.dataset import DemoDataset, pickle_zst
from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.embodiments.humanoid import (
    NUM_HAND_JOINTS,
    PROXIMAL_JOINT_INDICES,
    HumanoidEmbodiment,
)
from tests.jit_helpers import jit_sample

N_FRAMES = 160


def make_humanoid_robot_states(n_frames=N_FRAMES):
    """Synthesize a bimanual pick sequence with a head turn."""
    t = np.linspace(0, 1, n_frames)
    left_pos = np.stack([0.2 + 0.3 * t, 0.2 * np.ones_like(t),
                         0.2 + 0.3 * np.sin(np.pi * t)], axis=1)
    right_pos = left_pos + np.asarray([0.0, -0.4, 0.0])
    quat = np.tile([1.0, 0, 0, 0], (n_frames, 1))

    left_joints = np.zeros((n_frames, NUM_HAND_JOINTS))
    right_joints = np.zeros((n_frames, NUM_HAND_JOINTS))
    # Right hand closes around frame 50 (proximal joints to -1.2) and opens
    # around frame 110.
    for i in range(50, 56):
        right_joints[i, PROXIMAL_JOINT_INDICES] = -(i - 49) * 0.2
    right_joints[56:110, PROXIMAL_JOINT_INDICES] = -1.2
    for i in range(110, 116):
        right_joints[i, PROXIMAL_JOINT_INDICES] = -1.2 + (i - 109) * 0.2

    head_yaw = np.zeros((n_frames, 1))
    # Head turns right then back around frame 80 (> 45 deg swing).
    head_yaw[60:80, 0] = np.linspace(0, 1.2, 20)
    head_yaw[80:100, 0] = np.linspace(1.14, 0, 20)

    return np.concatenate(
        [left_pos, quat, left_joints, right_pos, quat, right_joints, head_yaw],
        axis=1,
    ).astype(np.float32)


def write_humanoid_demo(demo_dir, n_frames=N_FRAMES, seed=0):
    import imageio.v2 as imageio

    os.makedirs(demo_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    states = make_humanoid_robot_states(n_frames)
    np.save(os.path.join(demo_dir, "demo_successful.npy"), np.asarray(1))
    for i in range(n_frames):
        np.save(os.path.join(demo_dir, f"{i}.robot_state.npy"), states[i])
        rgb = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(demo_dir, f"{i}.pov_rgb.png"), rgb)
        depth = (rng.uniform(0.5, 2.0, size=(32, 32)) * 1000).astype(np.uint16)
        imageio.imwrite(os.path.join(demo_dir, f"{i}.pov_depth.png"), depth)
        np.save(os.path.join(demo_dir, f"{i}.pov_pose.npy"),
                np.asarray([0.5, 0, 0.8, 1, 0, 0, 0], dtype=np.float32))
        np.save(os.path.join(demo_dir, f"{i}.pov_intrinsics.npy"),
                np.asarray([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]],
                           dtype=np.float32))
        vertices = rng.uniform(0, 0.8, size=(100, 3)).astype(np.float16)
        features = rng.normal(size=(100, 8)).astype(np.float16)
        pickle_zst(
            {"vertices": vertices, "features": features, "channel_length": 8},
            os.path.join(demo_dir, f"{i}.nvblox_vertex_features.zst"),
        )
    return states


def test_humanoid_state_codecs():
    emb = HumanoidEmbodiment()
    states = make_humanoid_robot_states()
    assert states.shape == (N_FRAMES, 37)
    policy = emb.policy_states_from_robot_states(states, use_keyposes=False)
    assert policy.shape == (N_FRAMES, 17)
    # Left hand never closes; right hand closed mid-sequence.
    assert policy[:, 7].max() == 0.0
    assert policy[60, 15] == 1.0 and policy[5, 15] == 0.0
    # Head yaw passes through.
    np.testing.assert_allclose(policy[:, 16], states[:, 36])

    split = emb.split_gripper_tensor(policy[None, :3])
    assert split.shape == (1, 3, 2, 8)
    head = emb.split_head_yaw_tensor(policy[None, :3])
    assert head.shape == (1, 3, 1)


def test_humanoid_grasp_events_and_keyposes():
    emb = HumanoidEmbodiment()
    states = make_humanoid_robot_states()
    (left_iv, _), (right_iv, right_open) = emb.get_grasp_events(states)
    assert len(left_iv) == 0  # left hand never moves
    assert len(right_iv) == 2  # close + open events
    # Closed between the events.
    assert right_open[80] == 0 and right_open[5] == 1

    keyposes = emb.extract_keypose_indices(
        states, [5], KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION_AND_HEAD_TURN
    )
    assert keyposes[0] == 0 and keyposes[-1] == N_FRAMES - 1
    # Grasp event boundaries are keyposes.
    flat = set(int(k) for k in keyposes)
    for start, end in right_iv:
        assert start in flat and end in flat


def test_humanoid_head_turn_detection():
    emb = HumanoidEmbodiment()
    states = make_humanoid_robot_states()
    turns = emb.get_head_turn_events(states[:, 36], [0])
    # The reversal at ~frame 80 is detected.
    assert any(70 <= t <= 90 for t in turns)


def test_humanoid_dataset_pipeline(tmp_path):
    from nvblox_mindmap_tpu.data.data_types import DataType
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod

    demo = str(tmp_path / "demo_00000")
    write_humanoid_demo(demo)
    emb = HumanoidEmbodiment()
    loader, _ = get_data_loader_by_data_type(
        embodiment=emb,
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
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=64,
        vertex_sampling_method=VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        seed=0,
    )
    batch = next(iter(loader))
    assert batch["gripper_history"].shape == (2, 3, 2, 8)
    assert batch["gt_gripper_pred"].shape == (2, 1, 2, 8)
    assert batch["gt_head_yaw"].shape == (2, 1, 1)


@pytest.mark.slow
def test_humanoid_model_train_and_sample(tmp_path):
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
        diffusion_train_loss,
        prepare_inputs,
        sample_trajectory,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        ngrippers=2,
        predict_head_yaw=True,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=4,
        fps_subsampling_factor=4,
    )
    model = DiffuserActor(cfg)
    bounds = jnp.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]])
    rng = np.random.default_rng(0)

    def pose8(shape):
        pos = rng.uniform([-0.4, -0.9, 0.1], [1.4, 0.9, 1.9], size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(float)
        return jnp.asarray(np.concatenate([pos, quat, close], -1), jnp.float32)

    batch = {
        "gripper_history": pose8((2, 3, 2)),
        "gt_gripper_pred": pose8((2, 1, 2)),
        "gt_head_yaw": jnp.asarray(
            rng.uniform(-1, 1, size=(2, 1, 1)), jnp.float32
        ),
        "vertices": jnp.asarray(rng.uniform(0, 1, (2, 32, 3)), jnp.float32),
        "vertex_features": jnp.asarray(rng.normal(size=(2, 32, 8)), jnp.float32),
        "vertices_valid_mask": jnp.ones((2, 32), dtype=bool),
    }
    prepared = prepare_inputs(batch, bounds, cfg)
    noisy = jnp.zeros((2, 1, 2, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)
    losses = diffusion_train_loss(model, variables, prepared, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["total"]))
    assert "head_yaw" in losses

    traj, head_yaw, _ = jit_sample(
        model, variables, prepared, jax.random.PRNGKey(2), bounds
    )
    assert traj.shape == (2, 1, 2, 8)
    assert head_yaw.shape == (2, 1, 1)
    assert float(jnp.max(jnp.abs(head_yaw))) <= np.pi


# --- sim-side machinery: joint indices / hand retargeting / action codec ----


def test_humanoid_action_roundtrip():
    from nvblox_mindmap_tpu.embodiments.humanoid_hand import (
        HumanoidAction,
        HumanoidController,
        NUM_HAND_JOINTS,
    )

    rng = np.random.default_rng(0)
    action = HumanoidAction(
        W_t_W_LeftEef=rng.normal(size=3),
        q_wxyz_W_LeftEef=[1, 0, 0, 0],
        left_hand_joint_states=rng.normal(size=NUM_HAND_JOINTS),
        W_t_W_RightEef=rng.normal(size=3),
        q_wxyz_W_RightEef=[0, 1, 0, 0],
        right_hand_joint_states=rng.normal(size=NUM_HAND_JOINTS),
        head_yaw_rad=[0.3],
    )
    tensor = action.to_tensor(include_head_yaw=True)
    assert tensor.shape == (37,)
    back = HumanoidAction.from_tensor(tensor)
    np.testing.assert_array_equal(back.left_hand_joint_states,
                                  action.left_hand_joint_states)
    np.testing.assert_array_equal(back.right_hand_joint_states,
                                  action.right_hand_joint_states)
    np.testing.assert_array_equal(back.W_t_W_RightEef, action.W_t_W_RightEef)
    np.testing.assert_array_equal(back.head_yaw_rad, action.head_yaw_rad)
    # Without head yaw: 36-d.
    assert action.to_tensor(include_head_yaw=False).shape == (36,)


def test_humanoid_controller_retargets_closedness():
    from nvblox_mindmap_tpu.embodiments.humanoid_hand import (
        CLOSED_HAND_JOINT_STATES,
        OPEN_HAND_JOINT_STATES,
        HumanoidController,
    )

    ctrl = HumanoidController()
    state = np.zeros(17, dtype=np.float32)
    state[3] = 1.0  # L quat w
    state[11] = 1.0  # R quat w
    state[7] = 1.0  # left closed
    state[15] = 0.0  # right open
    state[16] = -0.5  # head yaw
    action = ctrl(state)
    np.testing.assert_allclose(
        action.left_hand_joint_states,
        np.asarray(list(CLOSED_HAND_JOINT_STATES.values()), np.float32),
    )
    np.testing.assert_allclose(
        action.right_hand_joint_states,
        np.asarray(list(OPEN_HAND_JOINT_STATES.values()), np.float32),
    )
    assert action.head_yaw_rad[0] == np.float32(-0.5)


def test_proximal_joint_selection_and_closedness():
    from nvblox_mindmap_tpu.embodiments.humanoid_hand import (
        NUM_HAND_JOINTS,
        get_tensor_of_proximal_joints,
        is_hand_closed_instantaneous_from_proximal_joint_states,
        is_hand_open_instantaneous_from_proximal_joint_states,
    )

    joints = np.zeros((2, NUM_HAND_JOINTS), np.float32)
    prox, names = get_tensor_of_proximal_joints(joints)
    assert names == ["middle_proximal_joint", "pinky_proximal_joint",
                     "ring_proximal_joint"]
    assert prox.shape == (2, 3)
    assert is_hand_open_instantaneous_from_proximal_joint_states(prox[0])
    joints[1, 1] = -1.5  # middle proximal fully closed
    prox, _ = get_tensor_of_proximal_joints(joints)
    assert is_hand_closed_instantaneous_from_proximal_joint_states(prox[1])


def test_humanoid_joint_maps_match_reference():
    """Index layouts pin bit-for-bit against the reference's joint tables."""
    import sys

    if not os.path.isdir("/root/reference/mindmap"):
        pytest.skip("reference not available")
    sys.path.insert(0, "/root/reference")
    try:
        from mindmap.embodiments.humanoid.joint_indices import (
            HumanoidJointIndices as RefIndices,
        )
    except Exception as e:  # torch-free import may still fail in some envs
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove("/root/reference")
    from nvblox_mindmap_tpu.embodiments.humanoid_hand import HumanoidJointIndices

    assert RefIndices.joint_names_dict == HumanoidJointIndices.joint_names_dict
    assert (RefIndices.left_joints_in_combined_hands_tensor_indices
            == HumanoidJointIndices.left_joints_in_combined_hands_tensor_indices)
    assert (RefIndices.right_joints_in_combined_hands_tensor_indices
            == HumanoidJointIndices.right_joints_in_combined_hands_tensor_indices)
    assert (list(RefIndices.within_hand_joint_name_to_idx_map)
            == list(HumanoidJointIndices.within_hand_joint_name_to_idx_map))


def test_humanoid_action_matches_reference_to_tensor():
    """to_tensor packing matches the reference's torch implementation."""
    import sys

    if not os.path.isdir("/root/reference/mindmap"):
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from mindmap.embodiments.humanoid.action import (
            HumanoidEmbodimentAction as RefAction,
        )
        from mindmap.embodiments.humanoid.controller import (
            HumanoidEmbodimentController as RefController,
        )
    except Exception as e:
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove("/root/reference")
    from nvblox_mindmap_tpu.embodiments.humanoid_hand import (
        HumanoidAction,
        HumanoidController,
    )

    rng = np.random.default_rng(1)
    kwargs = dict(
        W_t_W_LeftEef=rng.normal(size=3).astype(np.float32),
        q_wxyz_W_LeftEef=np.asarray([1, 0, 0, 0], np.float32),
        left_hand_joint_states=rng.normal(size=11).astype(np.float32),
        W_t_W_RightEef=rng.normal(size=3).astype(np.float32),
        q_wxyz_W_RightEef=np.asarray([0, 0, 1, 0], np.float32),
        right_hand_joint_states=rng.normal(size=11).astype(np.float32),
        head_yaw_rad=np.asarray([0.7], np.float32),
    )
    ours = HumanoidAction(**kwargs).to_tensor(include_head_yaw=True)
    ref = RefAction(
        **{k: torch.from_numpy(np.asarray(v)) for k, v in kwargs.items()}
    ).to_tensor(include_head_yaw=True)
    np.testing.assert_allclose(ours, ref.numpy())

    # Controller retargeting matches the reference's joint targets.
    ref_ctrl = RefController()
    ctrl = HumanoidController()
    np.testing.assert_allclose(
        ctrl.get_hand_joint_states(1.0), ref_ctrl.closed_hand_joint_states.numpy()
    )
    np.testing.assert_allclose(
        ctrl.get_hand_joint_states(0.0), ref_ctrl.open_hand_joint_states.numpy()
    )
