"""Closed-loop policies (reference: mindmap/closed_loop/policies/*).

- ``NvbloxDiffuserActorPolicy``: the live policy - per sim step it decays the
  mapper and fuses the current cameras (TSDF + deep features); on goal
  request it assembles model inputs (mesh vertices / RGB-D point clouds +
  gripper history) and runs the jitted reverse-diffusion sampler.
- ``GroundTruthPolicy``: replays GT keyposes from a recorded demo (demo
  validation / EXECUTE_GT_GOALS mode).
"""
from __future__ import annotations

import collections
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import (
    EnvironmentBase,
    dynamic_mask_from_segmentation,
)
from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
from nvblox_mindmap_tpu.data.vertex_sampling import (
    VertexSamplingMethod,
    sample_to_n_vertices,
)
from nvblox_mindmap_tpu.embodiments.base import EmbodimentBase, EmbodimentType
from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
from nvblox_mindmap_tpu.mapping.mapper import (
    Mapper,
    get_vertices_and_features,
    nvblox_integrate,
)
from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.geometry.np_rotations import pose7_to_matrix
from nvblox_mindmap_tpu.ops.backprojection import get_camera_pointcloud


class PolicyBase:
    def step(self, env: EnvironmentBase) -> None:
        """Called every sim step (e.g. map update)."""

    def get_new_goal(self, env: EnvironmentBase) -> List[np.ndarray]:
        """Return the next goal policy state(s)."""
        raise NotImplementedError


class GroundTruthPolicy(PolicyBase):
    """Serves recorded keypose policy states in order."""

    def __init__(self, keypose_policy_states: np.ndarray):
        self.goals = list(np.asarray(keypose_policy_states))
        self._next = 0

    @classmethod
    def from_demo(
        cls,
        demo_path: str,
        embodiment: EmbodimentBase,
        extra_keyposes_around_grasp_events,
        keypose_detection_mode: KeyposeDetectionMode,
    ) -> "GroundTruthPolicy":
        from nvblox_mindmap_tpu.data.dataset import DemoDataset

        robot_states = DemoDataset.load_robot_states(demo_path)
        keyposes = embodiment.extract_keypose_indices(
            robot_states, extra_keyposes_around_grasp_events, keypose_detection_mode
        )
        policy_states = embodiment.policy_states_from_robot_states(
            robot_states, use_keyposes=True
        )
        return cls(policy_states[keyposes])

    @property
    def exhausted(self) -> bool:
        return self._next >= len(self.goals)

    def get_new_goal(self, env: EnvironmentBase) -> List[np.ndarray]:
        if self.exhausted:
            return []
        goal = self.goals[self._next]
        self._next += 1
        return [goal]


class GoalPolicy(PolicyBase):
    """Executes a hardcoded sequence of goal policy states
    (reference: closed_loop/policies/goal_policy.py:24-71).

    Args:
        goal_states: list of flat policy-state arrays (embodiment codec).
        repeat: cycle the sequence when exhausted; otherwise emit [] once done
            (the reference returns [None]; our runner treats [] as no-goal).
    """

    def __init__(self, goal_states: List[np.ndarray], repeat: bool = True):
        self.goal_states = [np.asarray(g, np.float32) for g in goal_states]
        self.repeat = repeat
        self.reset()

    def get_new_goal(self, env: EnvironmentBase) -> List[np.ndarray]:
        if not self.goal_states:
            return []
        if self.current_goal_idx == len(self.goal_states):
            if not self.repeat:
                return []
            self.current_goal_idx = 0
        goal = self.goal_states[self.current_goal_idx]
        self.current_goal_idx += 1
        return [goal]

    def reset(self) -> None:
        self.current_goal_idx = 0


def get_dummy_policy_for_embodiment(embodiment_type) -> GoalPolicy:
    """Test policy with the reference's hardcoded goal sequences
    (goal_policy.py:74-139): the arm oscillates along y in front of the
    robot; the humanoid moves both hands up/down while turning the head.
    Policy states use the flat embodiment codecs
    (arm: pos3+quat4+closedness; humanoid: left 8 + right 8 + head yaw)."""
    if embodiment_type == EmbodimentType.ARM:
        goals = [
            np.asarray([0.6, 0.25, 0.25, 0, 1, 0, 0, 0.0], np.float32),
            np.asarray([0.6, 0.05, 0.25, 0, 1, 0, 0, 0.0], np.float32),
        ]
    elif embodiment_type == EmbodimentType.HUMANOID:
        left = [-0.2236, 0.2580, 1.0964, 0.5039, 0.4955, -0.5064, 0.4941]
        right = [0.0605, 0.2517, 1.1063, 0.4773, 0.5318, -0.4857, 0.5034]
        up = np.asarray([0, 0, 0.2, 0, 0, 0, 0], np.float64)
        fwd_up = np.asarray([0.3, 0, 0.2, 0, 0, 0, 0], np.float64)
        goals = [
            np.concatenate([left, [1.0], right, [0.0], [-1.57]]).astype(
                np.float32
            ),
            np.concatenate(
                [np.add(left, up), [0.0], np.add(right, fwd_up), [1.0], [1.57]]
            ).astype(np.float32),
        ]
    else:
        raise ValueError(f"Invalid embodiment type: {embodiment_type}")
    return GoalPolicy(goal_states=goals)


class NvbloxDiffuserActorPolicy(PolicyBase):
    """Live mapping + diffusion policy (reference:
    closed_loop/policies/nvblox_diffuser_actor_policy.py)."""

    def __init__(
        self,
        model: DiffuserActor,
        params,
        embodiment: EmbodimentBase,
        mapping_config: MappingConfig,
        workspace_bounds: np.ndarray,
        num_vertices_to_sample: int = 2048,
        vertex_sampling_method: VertexSamplingMethod = (
            VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT
        ),
        feature_fn=None,
        num_history: int = 3,
        seed: int = 0,
        include_dynamic: bool = False,
        num_inference_steps: Optional[int] = None,
        scheduler_kind: str = "ddpm",
        stochastic_sampling: bool = True,
        num_prediction_samples: int = 1,
        timestep_spacing: str = "leading",
        clip_sample: Optional[bool] = None,
    ):
        """``num_inference_steps``/``scheduler_kind``/``stochastic_sampling``
        select the reverse-diffusion sampler. Defaults match the reference
        closed-loop policy (full stochastic DDPM at the training timestep
        count, diffuser_actor.py:353-395); DDIM-10 deterministic is the
        low-latency serving mode benchmarked in bench.py.

        ``num_prediction_samples`` > 1 enables consensus goal prediction, a
        deliberate improvement over the reference's single stochastic DDPM
        draw (nvblox_diffuser_actor_policy.py:237-247): K i.i.d. samples run
        as ONE batched device program (the model inputs are tiled K ways, so
        the per-goal device cost is the amortized batched-serving cost, not
        K sequential predictions) and are fused by
        ``aggregate_trajectory_samples`` - median positions, medoid
        rotations, majority-vote openness. Measured effect (cube_stacking
        fixture, 8 demos, 8k iters, single attempt per scene): K=5 smooths
        the per-goal scatter visibly but leaves task success unchanged
        within noise (4/8 vs 5/8 at K=1) - per-goal traces show the failing
        scenes' place keyposes are CONSISTENTLY ~0.1-0.2 m off target, i.e.
        model bias from the tiny demo count, which no amount of sampling
        can fix. Use K>1 when single-draw variance is the failure mode
        (well-trained policies, borderline tolerances), not as a substitute
        for demonstrations (docs/pages/benchmarks.md)."""
        self.model = model
        self.num_inference_steps = num_inference_steps
        self.scheduler_kind = scheduler_kind
        # "trailing" starts the few-step chain at t=T-1 where the init is
        # actually pure noise (schedulers.DiffusionSchedule.timesteps);
        # measurably the better DDIM-10 serving config on the scene-world
        # policies (docs/pages/benchmarks.md, DDIM serving section).
        self.timestep_spacing = timestep_spacing
        # None keeps the schedule's default (True, training parity); False
        # disables the per-step x0 clamp (models/diffuser_actor.py:425-429).
        self.clip_sample = clip_sample
        self.stochastic_sampling = stochastic_sampling
        assert num_prediction_samples >= 1, num_prediction_samples
        self.num_prediction_samples = num_prediction_samples
        self.params = params
        self.embodiment = embodiment
        self.config = model.config
        self.mapping_config = mapping_config
        self.bounds = jnp.asarray(workspace_bounds, dtype=jnp.float32)
        self.num_vertices_to_sample = num_vertices_to_sample
        # Live surface-extraction budget; grows (powers of two) whenever the
        # scene produces more zero-crossings, up to the datagen default.
        self._mesh_budget = max(num_vertices_to_sample, 4096)
        self.vertex_sampling_method = vertex_sampling_method
        self.num_history = num_history
        self.include_dynamic = include_dynamic
        # The dynamic mapper's feature pool is only allocated when needed.
        self.mapper = (
            Mapper.dual(mapping_config)
            if include_dynamic
            else Mapper({MapperId.STATIC: mapping_config})
        )
        self.history: collections.deque = collections.deque(maxlen=num_history)
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._infer = None
        # Feature extractor for mapping: (H, W, 3) [0,1] -> (h, w, F).
        if feature_fn is None:
            upscaled = mapping_config.upscaled_feature_image_size

            def rgb_passthrough(rgb):
                return jax.image.resize(
                    jnp.asarray(rgb)[None], (1, *upscaled, 3), method="bilinear"
                )[0]

            feature_fn = jax.jit(rgb_passthrough)
        self.feature_fn = feature_fn
        # Fail loudly on feature-dim mismatch: the checkpoint's reconstruction
        # encoder input width must equal the live mapper's feature dim, or
        # inference dies later with an opaque flax shape error.
        trained_dim = None
        for enc_name in ("reconstruction_encoder", "image_feature_encoder"):
            # use_shared_feature_encoder routes mesh features through the
            # image encoder instead (models/encoder.py) - check either.
            try:
                trained_dim = int(
                    params["encoder"][enc_name]["kernel"].shape[0]
                )
                break
            except (KeyError, TypeError):
                continue
        if trained_dim is not None and trained_dim != mapping_config.feature_dim:
            raise ValueError(
                f"checkpoint was trained on {trained_dim}-d vertex features "
                f"but the mapper is configured for "
                f"{mapping_config.feature_dim}-d (feature_type mismatch "
                "between training data and the live mapping feature "
                "extractor - check --feature_type / --backbone_weights)"
            )

    # --- per-sim-step map update ---------------------------------------------
    def step(self, env: EnvironmentBase) -> None:
        # Map updates only when the model consumes the reconstruction
        # (reference nvblox_diffuser_actor_policy.py:77-83 includes_nvblox
        # guard) - rgbd mode reads cameras directly at inference time.
        if self.config.data_type not in ("mesh", "rgbd_and_mesh"):
            return
        self.mapper.decay()
        for frame in env.get_cameras().values():
            features = self.feature_fn(frame.rgb)
            T_WC = pose7_to_matrix(frame.pose7)
            dynamic_mask = dynamic_mask_from_segmentation(
                frame.segmentation,
                env.semantic_id_to_class,
                self.mapping_config.dynamic_class_labels,
            )
            nvblox_integrate(
                self.mapper,
                self.mapping_config,
                frame.depth,
                features,
                frame.intrinsics,
                T_WC,
                frame.rgb,
                dynamic_mask=dynamic_mask,
                include_dynamic=self.include_dynamic,
            )

    def _update_history(self, env: EnvironmentBase) -> None:
        """Record the policy state once per INFERENCE, not per sim step.

        Training history is keypose/inference-spaced; the reference appends
        to the deque only inside get_new_goal and seeds the whole deque with
        the current state on first use
        (nvblox_diffuser_actor_policy.py:249-259). Appending every sim step
        would hand the model ~num_history near-identical current poses -
        out-of-distribution vs the checkpoint.
        """
        state = np.asarray(env.get_policy_state(), dtype=np.float32)
        if not self.history:
            self.history.extend([state] * self.num_history)
        else:
            self.history.append(state)

    # --- inference -----------------------------------------------------------
    def _extract_mesh_growing(self, mapper_id: int) -> None:
        """update_feature_mesh with an adaptive vertex budget.

        nvblox's mesh grows without a cap; the XLA extraction pass needs a
        static size, so a fixed budget would TRUNCATE big scenes - and the
        truncation is by voxel linear index, i.e. it silently drops one side
        of the workspace that the training meshes (datagen default 65536,
        mapper.py save_feature_mesh_to_disk) still contain. Doubling the
        budget until the crossing count fits keeps the compiled-program set
        small (one program per power of two) and the live input distribution
        equal to training. The budget persists across steps: scene surface
        area only shrinks via decay, so regrowth is rare.
        """
        cap = 65536  # datagen extraction default: train/serve parity bound
        self.mapper.update_feature_mesh(
            mapper_id, max_vertices=self._mesh_budget
        )
        while (self.mapper.last_crossing_count > self._mesh_budget
               and self._mesh_budget < cap):
            self._mesh_budget = min(2 * self._mesh_budget, cap)
            self.mapper.update_feature_mesh(
                mapper_id, max_vertices=self._mesh_budget
            )

    def _model_inputs(self, env: EnvironmentBase) -> Dict:
        batch: Dict = {
            "gt_gripper_pred": None,
            "gt_head_yaw": None,
            "instruction": None,
            "rgbs": None,
            "pcds": None,
            "pcd_valid_mask": None,
            "vertices": None,
            "vertex_features": None,
            "vertices_valid_mask": None,
        }
        # Gripper history (seeded on first inference; see _update_history).
        hist = list(self.history)
        hist_arr = np.stack(hist[-self.num_history :])[None]  # (1, nhist, P)
        batch["gripper_history"] = self.embodiment.split_gripper_tensor(hist_arr)

        if self.config.data_type in ("mesh", "rgbd_and_mesh"):
            self._extract_mesh_growing(MapperId.STATIC)
            # remove_zero_features=True matches the reference live policy
            # (nvblox_diffuser_actor_policy.py:208-210).
            vertices, features = get_vertices_and_features(
                self.mapper, MapperId.STATIC, remove_zero_features=True
            )
            if self.include_dynamic:
                # Training data was exported with static+dynamic combined
                # (save_feature_mesh_to_disk include_dynamic); the live policy
                # must see the same - the manipulated object lives in the
                # DYNAMIC mapper and is masked out of the static map.
                self._extract_mesh_growing(MapperId.DYNAMIC)
                dyn_v, dyn_f = get_vertices_and_features(
                    self.mapper, MapperId.DYNAMIC, remove_zero_features=True
                )
                vertices = np.concatenate([vertices, dyn_v], axis=0)
                features = np.concatenate([features, dyn_f], axis=0)
            vertices, features, valid = sample_to_n_vertices(
                vertices,
                features,
                self.num_vertices_to_sample,
                self.vertex_sampling_method,
                self._rng,
            )
            batch["vertices"] = vertices[None].astype(np.float32)
            batch["vertex_features"] = features[None].astype(np.float32)
            batch["vertices_valid_mask"] = valid[None]

        if self.config.data_type in ("rgbd", "rgbd_and_mesh"):
            rgbs, pcds, valids = [], [], []
            for frame in env.get_cameras().values():
                rgbs.append(frame.rgb)
                pcd = np.asarray(
                    get_camera_pointcloud(
                        jnp.asarray(frame.intrinsics),
                        jnp.asarray(frame.depth),
                        jnp.asarray(frame.pose7[:3]),
                        jnp.asarray(frame.pose7[3:]),
                    )
                )
                pcds.append(pcd)
                valids.append(frame.depth > 0)
            batch["rgbs"] = np.stack(rgbs)[None]
            batch["pcds"] = np.stack(pcds)[None]
            batch["pcd_valid_mask"] = np.stack(valids)[None]
        return batch

    def get_new_goal(self, env: EnvironmentBase) -> List[np.ndarray]:
        self._update_history(env)
        batch = self._model_inputs(env)
        if self._infer is None:
            model, bounds = self.model, self.bounds
            cfg = self.config
            n_steps = self.num_inference_steps
            kind = self.scheduler_kind
            stochastic = self.stochastic_sampling
            spacing = self.timestep_spacing
            clip = self.clip_sample

            @jax.jit
            def infer(params, batch, key):
                prepared = prepare_inputs(batch, bounds, cfg)
                return sample_trajectory(
                    model, {"params": params}, prepared, key, bounds,
                    num_inference_steps=n_steps, scheduler_kind=kind,
                    stochastic=stochastic, timestep_spacing=spacing,
                    clip_sample=clip,
                )

            self._infer = infer
        self._key, key = jax.random.split(self._key)
        K = self.num_prediction_samples
        device_batch = jax.tree_util.tree_map(
            lambda x: (
                jnp.broadcast_to(jnp.asarray(x), (K,) + np.shape(x)[1:])
                if x is not None else None
            ),
            batch,
            is_leaf=lambda x: x is None,
        )
        traj, head_yaw, _ = jax.device_get(
            self._infer(self.params, device_batch, key)
        )
        traj = np.asarray(traj)
        head_yaw = None if head_yaw is None else np.asarray(head_yaw)
        if K > 1:
            traj, head_yaw = aggregate_trajectory_samples(traj, head_yaw)
        return trajectory_to_policy_states(
            traj, head_yaw, self.embodiment,
        )


def aggregate_trajectory_samples(
    traj: np.ndarray, head_yaw: Optional[np.ndarray]
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Fuse K i.i.d. diffusion samples into one consensus trajectory.

    ``traj`` is (K, L, G, 8) = pos3 + quat4 + openness; ``head_yaw`` is
    (K, L, 1) or None. Returns ((1, L, G, 8), (1, L, 1) | None).

    - positions: per-coordinate MEDIAN over K - robust to the occasional
      off-target draw that a mean would be dragged by;
    - rotations: the quaternions of the MEDOID sample (closest to the median
      positions over the whole trajectory) - averaging quaternions across
      samples can leave the rotation manifold and mix distinct modes;
    - openness / head yaw: mean probability (majority vote once binarized)
      and median respectively.
    """
    med_pos = np.median(traj[..., :3], axis=0)  # (L, G, 3)
    dists = np.linalg.norm(traj[..., :3] - med_pos[None], axis=-1)  # (K, L, G)
    medoid = int(np.argmin(dists.sum(axis=(1, 2))))
    out = traj[medoid].copy()  # (L, G, 8)
    out[..., :3] = med_pos
    out[..., 7] = traj[..., 7].mean(axis=0)
    out_yaw = None if head_yaw is None else np.median(
        head_yaw, axis=0, keepdims=False
    )
    return out[None], (None if out_yaw is None else out_yaw[None])


def trajectory_to_policy_states(
    traj: np.ndarray, head_yaw: Optional[np.ndarray], embodiment: EmbodimentBase
) -> List[np.ndarray]:
    """(1, L, G, 8) model output [+ head yaw] -> list of policy-state vectors.

    Openness probability is binarized at 0.5 (the policy commands binary
    grippers).
    """
    L = traj.shape[1]
    goals = []
    for i in range(L):
        step = traj[0, i]  # (G, 8)
        step = step.copy()
        step[..., 7] = (step[..., 7] >= 0.5).astype(step.dtype)
        if embodiment.embodiment_type == EmbodimentType.ARM:
            goals.append(step[0])
        else:
            hy = 0.0 if head_yaw is None else float(head_yaw[0, i, 0])
            goals.append(
                np.concatenate([step[0], step[1], [hy]]).astype(np.float32)
            )
    return goals



