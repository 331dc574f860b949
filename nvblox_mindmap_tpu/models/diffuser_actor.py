"""DiffuserActor: 3D denoising-diffusion keypose policy (flax + pure JAX).

TPU-native re-design of the reference model
(mindmap/diffuser_actor/diffuser_actor.py). Architecture parity:

- normalize inputs to workspace bounds, quaternions -> continuous 6D
- Encoder: image / mesh-vertex feature tokens, openness-conditioned gripper
  history queries, feature-space FPS subsampling
- DiffusionHead: AdaLN-conditioned rotary-attention denoiser
- two DDPM schedules (scaled_linear position, squaredcos_cap_v2 rotation),
  epsilon prediction, 100 steps; DDIM-convertible.

TPU-first structure: the flax module holds only parameterized compute
(``encode`` and ``denoise``); preprocessing (``prepare_inputs``) is a pure
function of data, and the inference sampler (``sample_trajectory``) is a
``lax.scan`` over the bound denoiser, so the whole 100-step loop compiles to a
single XLA program with zero host round-trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.diffusion_head import DiffusionHead
from nvblox_mindmap_tpu.models.encoder import Encoder
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from nvblox_mindmap_tpu.models.loss import LossWeights, compute_loss
from nvblox_mindmap_tpu.models.normalization import (
    normalize_pointcloud,
    normalize_pos,
    normalize_trajectory,
    unnormalize_trajectory,
)
from nvblox_mindmap_tpu.ops.schedulers import DiffusionSchedule, make_schedule


@dataclasses.dataclass(frozen=True)
class DiffuserActorConfig:
    """Static model configuration (mirrors the reference's ModelArgs subset)."""

    embedding_dim: int = 120
    num_attn_heads: int = 8
    num_vis_ins_attn_layers: int = 2
    nhist: int = 3
    ngrippers: int = 1
    prediction_horizon: int = 1
    data_type: str = "rgbd_and_mesh"  # "rgbd" | "mesh" | "rgbd_and_mesh"
    feature_type: FeatureExtractorType = FeatureExtractorType.RGB
    feature_image_size: Tuple[int, int] = (32, 32)
    # CLS/register token count of the ViT backbone (None = hub default).
    feature_num_prefix_tokens: Optional[int] = None
    # Frozen-backbone forward in chunks of N images (memory lever for large
    # train batches; see Encoder.backbone_chunk_images). None = full width.
    backbone_chunk_images: Optional[int] = None
    fps_subsampling_factor: int = 5
    use_fps: bool = True
    use_instruction: bool = False
    lang_enhanced: bool = False
    encode_openness: bool = True
    use_shared_feature_encoder: bool = False
    rotation_parametrization: str = "6D"
    quaternion_format: str = "wxyz"
    diffusion_timesteps: int = 100
    relative: bool = False
    predict_head_yaw: bool = False
    encoder_dropout: float = 0.0
    diffusion_dropout: float = 0.0
    predictor_dropout: float = 0.0
    loss_weights: LossWeights = LossWeights()

    def __post_init__(self):
        if "6D" not in self.rotation_parametrization:
            # The denoiser, losses and samplers are built around the 9-dim
            # (pos3 + 6D) trajectory layout; a quaternion head would need a
            # 7-dim pipeline end to end. Fail here, not deep in tracing.
            # (The reference's production configs are 6D-only too.)
            raise NotImplementedError(
                "rotation_parametrization must contain '6D' (got "
                f"{self.rotation_parametrization!r}); quaternion-space "
                "diffusion is not implemented"
            )
        if self.use_shared_feature_encoder and self.data_type == "mesh":
            # The shared encoder routes mesh features through the image
            # feature encoder, which only exists when images are encoded.
            raise ValueError(
                "use_shared_feature_encoder requires image inputs "
                "(data_type 'rgbd' or 'rgbd_and_mesh'); with data_type "
                "'mesh' there is no image encoder to share"
            )

    def schedules(self, kind: str = "ddpm") -> Tuple[DiffusionSchedule, DiffusionSchedule]:
        """(position, rotation) noise schedules."""
        return (
            make_schedule("scaled_linear", self.diffusion_timesteps, kind=kind),
            make_schedule("squaredcos_cap_v2", self.diffusion_timesteps, kind=kind),
        )


class DiffuserActor(nn.Module):
    config: DiffuserActorConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(
            embedding_dim=cfg.embedding_dim,
            nhist=cfg.nhist,
            ngrippers=cfg.ngrippers,
            num_attn_heads=cfg.num_attn_heads,
            num_vis_ins_attn_layers=cfg.num_vis_ins_attn_layers,
            fps_subsampling_factor=cfg.fps_subsampling_factor,
            data_type=cfg.data_type,
            encode_openness=cfg.encode_openness,
            feature_type=cfg.feature_type,
            feature_image_size=cfg.feature_image_size,
            feature_num_prefix_tokens=cfg.feature_num_prefix_tokens,
            use_shared_feature_encoder=cfg.use_shared_feature_encoder,
            dropout=cfg.encoder_dropout,
            backbone_chunk_images=cfg.backbone_chunk_images,
        )
        self.head = DiffusionHead(
            embedding_dim=cfg.embedding_dim,
            num_attn_heads=cfg.num_attn_heads,
            use_instruction=cfg.use_instruction,
            lang_enhanced=cfg.lang_enhanced,
            rotation_dim=6 if "6D" in cfg.rotation_parametrization else 4,
            nhist=cfg.nhist,
            prediction_horizon=cfg.prediction_horizon,
            ngrippers=cfg.ngrippers,
            predict_head_yaw=cfg.predict_head_yaw,
            diffusion_dropout=cfg.diffusion_dropout,
            predictor_dropout=cfg.predictor_dropout,
        )

    def encode(
        self,
        rgb_obs: Optional[jnp.ndarray],
        pcd_obs: Optional[jnp.ndarray],
        pcd_valid_mask: Optional[jnp.ndarray],
        vertex_features: Optional[jnp.ndarray],
        vertices: Optional[jnp.ndarray],
        vertices_valid_mask: Optional[jnp.ndarray],
        instruction: Optional[jnp.ndarray],
        gripper_history: jnp.ndarray,
        curr_closedness: jnp.ndarray,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Encode vision + gripper + language into fixed denoiser inputs.

        Shapes (channel-last): rgb_obs (B, ncam, H, W, 3); pcd_obs likewise;
        vertex_features (B, Nv, C); vertices (B, Nv, 3); gripper_history
        (B, nhist, G, 9); curr_closedness (B, nhist, G, 1).
        """
        cfg = self.config
        parts_feats, parts_pos, parts_mask = [], [], []
        if cfg.data_type in ("rgbd", "rgbd_and_mesh"):
            feats, pos, mask = self.encoder.encode_images(
                rgb_obs, pcd_obs, valid_mask=pcd_valid_mask
            )
            if mask is None:
                mask = jnp.ones(feats.shape[:2], dtype=bool)
            parts_feats.append(feats)
            parts_pos.append(pos)
            parts_mask.append(mask)
        if cfg.data_type in ("mesh", "rgbd_and_mesh"):
            feats, pos = self.encoder.encode_feature_pointcloud(
                vertex_features, vertices
            )
            mask = (
                vertices_valid_mask
                if vertices_valid_mask is not None
                else jnp.ones(feats.shape[:2], dtype=bool)
            )
            parts_feats.append(feats)
            parts_pos.append(pos)
            parts_mask.append(mask)

        context_feats = jnp.concatenate(parts_feats, axis=1)
        context = jnp.concatenate(parts_pos, axis=1)
        context_mask = jnp.concatenate(parts_mask, axis=1)

        instr_feats = None
        if cfg.use_instruction:
            instr_feats, _ = self.encoder.encode_instruction(instruction)
            context_feats = self.encoder.vision_language_attention(
                context_feats, instr_feats, deterministic=deterministic
            )

        adaln_gripper_feats, _, gripper_attn_weights = (
            self.encoder.encode_gripper_history(
                gripper_history, context_feats, context, curr_closedness,
                deterministic=deterministic,
            )
        )

        if cfg.use_fps:
            fps_feats, fps_pos, fps_mask = self.encoder.run_fps(
                context_feats, self.encoder.relative_pe(context), context_mask
            )
        else:
            fps_feats = context_feats
            fps_pos = self.encoder.relative_pe(context)
            fps_mask = context_mask

        return {
            "context_feats": context_feats,
            "context": context,
            "context_mask": context_mask,
            "instr_feats": instr_feats,
            "adaln_gripper_feats": adaln_gripper_feats,
            "fps_feats": fps_feats,
            "fps_pos": fps_pos,
            "fps_mask": fps_mask,
            "gripper_attn_weights": gripper_attn_weights,
        }

    def denoise(
        self,
        trajectory: jnp.ndarray,
        timestep: jnp.ndarray,
        fixed_inputs: Dict[str, Any],
        deterministic: bool = True,
    ):
        """One denoiser pass: (B, L, G, 9) noisy traj -> (B, L, G, 10) eps+open."""
        return self.head(
            trajectory,
            timestep,
            context_feats=fixed_inputs["context_feats"],
            context=fixed_inputs["context"],
            context_mask=fixed_inputs["context_mask"],
            adaln_gripper_feats=fixed_inputs["adaln_gripper_feats"],
            fps_feats=fixed_inputs["fps_feats"],
            fps_pos=fixed_inputs["fps_pos"],
            fps_mask=fixed_inputs["fps_mask"],
            instr_feats=fixed_inputs["instr_feats"],
            deterministic=deterministic,
        )

    def __call__(self, prepared: Dict[str, Any], noisy_trajectory, timesteps,
                 deterministic: bool = True):
        """Training-shaped forward (used for init and the train step)."""
        fixed = self.encode(
            prepared.get("rgbs"),
            prepared.get("pcds"),
            prepared.get("pcd_valid_mask"),
            prepared.get("vertex_features"),
            prepared.get("vertices"),
            prepared.get("vertices_valid_mask"),
            prepared.get("instruction"),
            prepared["gripper_history"],
            prepared["curr_closedness"],
            deterministic=deterministic,
        )
        return self.denoise(noisy_trajectory, timesteps, fixed, deterministic)


def prepare_inputs(
    batch: Dict[str, Any],
    workspace_bounds: jnp.ndarray,
    config: DiffuserActorConfig,
) -> Dict[str, Any]:
    """Pure-data preprocessing shared by training and inference.

    Mirrors DiffuserActor.forward's pre-encode block (reference
    diffuser_actor.py:548-599): split closedness from the history, trim the
    history to 7-d poses, normalize positions/pointclouds/vertices to the
    workspace, convert rotations to 6D.

    Expects batch keys (channel-last): "gripper_history" (B, nhist, G, 8),
    optional "gt_gripper_pred" (B, L, G, 8), "rgbs", "pcds" (B, ncam, H, W, 3),
    "pcd_valid_mask", "vertex_features", "vertices", "vertices_valid_mask",
    "gt_head_yaw", "instruction".
    """
    from nvblox_mindmap_tpu.geometry.rotations import (
        quaternion_invert,
        quaternion_multiply,
    )

    out: Dict[str, Any] = {}
    gripper_history = batch["gripper_history"]
    out["curr_closedness"] = gripper_history[..., 7:8]
    gripper_history = gripper_history[..., :7]
    out["current_pose"] = gripper_history[:, -1]  # (B, G, 7)
    pcds = batch.get("pcds")
    gt = batch.get("gt_gripper_pred")

    if config.relative:
        # Translate history/pcd by the current pose; translate+rotate the GT
        # trajectory (reference model_utils/relative_conversions.py).
        # Reference-parity notes (diffuser_actor.py:557-585): mesh vertices
        # deliberately stay absolute (the reference asserts RGBD-only for
        # pcd relativization and never shifts vertices), and the shifted
        # pcds are still bounds-checked against the absolute workspace AABB
        # (same in the reference - relative mode presumes bounds containing
        # the origin-centered cloud).
        current_pos = out["current_pose"][..., :3]  # (B, G, 3)
        current_quat = out["current_pose"][..., 3:7]
        gripper_history = jnp.concatenate(
            [gripper_history[..., :3] - current_pos[:, None], gripper_history[..., 3:]],
            axis=-1,
        )
        if pcds is not None:
            # RGBD mode has a single gripper; pcds are (B, ncam, H, W, 3).
            pcds = pcds - current_pos[:, 0][:, None, None, None, :]
        if gt is not None:
            rel_pos = gt[..., :3] - current_pos[:, None]
            rel_quat = quaternion_multiply(
                quaternion_invert(current_quat)[:, None], gt[..., 3:7]
            )
            gt = jnp.concatenate([rel_pos, rel_quat, gt[..., 7:]], axis=-1)

    out["gripper_history"] = normalize_trajectory(
        gripper_history,
        workspace_bounds,
        config.rotation_parametrization,
        config.quaternion_format,
    )

    if pcds is not None:
        pcds, in_bounds = normalize_pointcloud(pcds, workspace_bounds)
        out["pcds"] = pcds
        valid = batch.get("pcd_valid_mask")
        out["pcd_valid_mask"] = in_bounds if valid is None else (valid & in_bounds)
        rgbs = batch.get("rgbs")
        if rgbs is not None and rgbs.dtype == jnp.uint8:
            # Packed-epoch feeds keep rgb uint8 through HBM staging
            # (data/packed.py) - 4x less transfer/residency; the /255
            # upcast runs device-side inside the compiled step (the exact
            # inverse of the loader's RgbTransformer quantization).
            rgbs = rgbs.astype(jnp.float32) / 255.0
        out["rgbs"] = rgbs

    if batch.get("vertices") is not None:
        out["vertices"], _ = normalize_pos(batch["vertices"], workspace_bounds)
        out["vertex_features"] = batch["vertex_features"]
        out["vertices_valid_mask"] = batch.get("vertices_valid_mask")

    if gt is not None:
        assert gt.shape[-1] == 8
        out["gt_openness"] = gt[..., 7:]
        out["gt_gripper_pred"] = normalize_trajectory(
            gt[..., :7],
            workspace_bounds,
            config.rotation_parametrization,
            config.quaternion_format,
        )
    out["gt_head_yaw"] = batch.get("gt_head_yaw")
    out["instruction"] = batch.get("instruction")
    return out


def diffusion_train_loss(
    model: DiffuserActor,
    variables,
    prepared: Dict[str, Any],
    rng: jax.Array,
    deterministic: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Training objective: epsilon-prediction loss at a random timestep.

    (reference diffuser_actor.py:637-687)
    """
    cfg = model.config
    pos_sched, rot_sched = cfg.schedules()
    gt = prepared["gt_gripper_pred"]  # (B, L, G, 9)
    B = gt.shape[0]
    noise_key, t_key, dropout_key = jax.random.split(rng, 3)
    noise = jax.random.normal(noise_key, gt.shape, dtype=gt.dtype)
    timesteps = jax.random.randint(t_key, (B,), 0, cfg.diffusion_timesteps)

    pos = pos_sched.add_noise(gt[..., :3], noise[..., :3], timesteps)
    rot = rot_sched.add_noise(gt[..., 3:9], noise[..., 3:9], timesteps)
    noisy = jnp.concatenate([pos, rot], axis=-1)

    traj_pred, head_yaw_pred, _ = model.apply(
        variables,
        prepared,
        noisy,
        timesteps,
        deterministic=deterministic,
        rngs=None if deterministic else {"dropout": dropout_key},
    )
    return compute_loss(
        traj_pred,
        head_yaw_pred,
        noise,
        prepared.get("gt_openness"),
        prepared.get("gt_head_yaw"),
        loss_weights=cfg.loss_weights,
        predict_head_yaw=cfg.predict_head_yaw,
        rotation_form="6D",
    )


def sample_trajectory(
    model: DiffuserActor,
    variables,
    prepared: Dict[str, Any],
    rng: jax.Array,
    workspace_bounds: jnp.ndarray,
    num_inference_steps: Optional[int] = None,
    scheduler_kind: str = "ddpm",
    stochastic: bool = True,
    normalized: bool = False,
    timestep_spacing: str = "leading",
    clip_sample: Optional[bool] = None,
):
    """Full reverse-diffusion sampling as one lax.scan.

    Returns (trajectory (B, L, G, 8: pos+quat+openness prob),
             head_yaw (B, L, 1) or None,
             mean cross-attention weights (B, L*G, N)).
    With ``normalized=True`` the trajectory is returned in normalized space
    (B, L, G, 10: pos3+6D+openness logit) without unnormalize/relative
    restore - the trainer's eval path computes losses there.
    ``timestep_spacing``/``clip_sample`` expose the serving-mode sampler
    knobs (schedulers.DiffusionSchedule.timesteps docstring; clip_sample
    None keeps the schedule's default, True in training parity).
    """
    cfg = model.config
    pos_sched, rot_sched = cfg.schedules(kind=scheduler_kind)
    if clip_sample is not None:
        import dataclasses as _dc

        pos_sched = _dc.replace(pos_sched, clip_sample=clip_sample)
        rot_sched = _dc.replace(rot_sched, clip_sample=clip_sample)
    fixed = model.apply(
        variables,
        prepared.get("rgbs"),
        prepared.get("pcds"),
        prepared.get("pcd_valid_mask"),
        prepared.get("vertex_features"),
        prepared.get("vertices"),
        prepared.get("vertices_valid_mask"),
        prepared.get("instruction"),
        prepared["gripper_history"],
        prepared["curr_closedness"],
        method=DiffuserActor.encode,
    )

    B = prepared["gripper_history"].shape[0]
    L, G = cfg.prediction_horizon, cfg.ngrippers
    timesteps = pos_sched.timesteps(
        num_inference_steps, spacing=timestep_spacing
    )  # (T,) descending
    T = timesteps.shape[0]
    step_ratio = cfg.diffusion_timesteps // T

    all_keys = jax.random.split(rng, T + 1)
    init_key, step_keys = all_keys[0], all_keys[1:]
    trajectory = jax.random.normal(init_key, (B, L, G, 9), dtype=jnp.float32)

    def step_fn(traj, inputs):
        t, key = inputs
        t_batch = jnp.full((B,), t, dtype=jnp.int32)
        pred, head_yaw, weights = model.apply(
            variables, traj, t_batch, fixed, method=DiffuserActor.denoise
        )
        pk, rk = jax.random.split(key)
        prev_t = t - step_ratio
        pos = pos_sched.step(
            pred[..., :3], t, traj[..., :3],
            key=pk if stochastic else None, prev_t=prev_t,
        )
        rot = rot_sched.step(
            pred[..., 3:9], t, traj[..., 3:9],
            key=rk if stochastic else None, prev_t=prev_t,
        )
        new_traj = jnp.concatenate([pos, rot], axis=-1)
        return new_traj, (pred[..., 9:], head_yaw, weights)

    # unroll amortizes per-step XLA loop overhead (~10% latency on TPU).
    trajectory, (openness_seq, head_yaw_seq, weights_seq) = jax.lax.scan(
        step_fn, trajectory, (timesteps, step_keys), unroll=min(5, T)
    )
    # Openness / head yaw come from the final denoiser call; attention
    # weights are averaged over all steps (reference diffuser_actor.py:386-404).
    openness = openness_seq[-1]
    head_yaw = None if head_yaw_seq is None else head_yaw_seq[-1]
    # None when the flash-attention swap is active (no weights materialized).
    mean_weights = None if weights_seq is None else jnp.mean(weights_seq, axis=0)

    trajectory = jnp.concatenate([trajectory, openness], axis=-1)
    if normalized:
        # Eval path (trainer): loss is computed in normalized space.
        return trajectory, head_yaw, mean_weights
    trajectory = unnormalize_trajectory(
        trajectory,
        workspace_bounds,
        cfg.rotation_parametrization,
        cfg.quaternion_format,
    )
    if cfg.relative:
        from nvblox_mindmap_tpu.geometry.rotations import quaternion_multiply

        current_pos = prepared["current_pose"][..., :3]
        current_quat = prepared["current_pose"][..., 3:7]
        abs_pos = trajectory[..., :3] + current_pos[:, None]
        abs_quat = quaternion_multiply(current_quat[:, None], trajectory[..., 3:7])
        trajectory = jnp.concatenate(
            [abs_pos, abs_quat, trajectory[..., 7:]], axis=-1
        )
    if cfg.predict_head_yaw and head_yaw is not None:
        head_yaw = jnp.clip(head_yaw, -jnp.pi, jnp.pi - 1e-6)
    return trajectory, head_yaw, mean_weights
