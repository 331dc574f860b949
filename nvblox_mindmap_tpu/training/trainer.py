"""Data-parallel trainer (pjit over a 1-D device mesh).

TPU-native re-design of the reference training app (reference:
mindmap/run_training.py). Differences by design:

- DDP gradient allreduce -> batch-sharded jit; XLA inserts the psum over ICI.
- The whole step (preprocess -> encode -> denoise -> loss -> grad -> AdamW
  update) is one compiled program with donated params/opt_state, so steady
  state runs with zero host round-trips besides the input feed.
- Evaluation runs the full reverse-diffusion sampler and the 18-metric suite
  as a second compiled program.

Parity kept: iteration-based loop, epoch-seeded weighted sampling
(set_epoch every 5 epochs), grad accumulation, LinearLR, best/last
checkpoints + frozen training args, hierarchical timers.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nvblox_mindmap_tpu.data.loader import DataLoader
from nvblox_mindmap_tpu.models.diffuser_actor import (
    DiffuserActor,
    DiffuserActorConfig,
    diffusion_train_loss,
    prepare_inputs,
    sample_trajectory,
)
from nvblox_mindmap_tpu.models.loss import compute_loss, compute_metrics
from nvblox_mindmap_tpu.models.normalization import unnormalize_trajectory
from nvblox_mindmap_tpu.parallel.mesh import (
    make_data_mesh,
    replicate,
    shard_batch,
)
from nvblox_mindmap_tpu.training.checkpoint import (
    load_checkpoint_file,
    save_checkpoint,
    save_training_args,
)
from nvblox_mindmap_tpu.training.optimizer import make_optimizer
from nvblox_mindmap_tpu.utils.timers import Timer, timer_status_string

logger = logging.getLogger("nvblox_mindmap_tpu.trainer")


@dataclasses.dataclass
class TrainerConfig:
    train_iters: int = 100_000
    batch_size: int = 32
    initial_learning_rate: float = 1e-4
    learning_rate_end_factor: float = 0.5
    learning_rate_convergence_percentage: float = 0.75
    weight_decay: float = 5e-4
    accumulate_grad_batches: int = 1
    val_freq: int = 100
    num_batches_per_train_eval: int = 10
    num_batches_per_test_eval: int = -1
    skip_train_val: bool = False
    print_timers_freq: int = 1000
    print_progress_freq: int = 100
    save_checkpoint: bool = True
    # Validation-sampler cost knobs: DDIM-10 by default (None = full DDPM).
    eval_num_inference_steps: Optional[int] = 10
    eval_scheduler: str = "ddim"
    checkpoint_dir: str = "checkpoints"
    # "msgpack" (single portable file) or "orbax" (async, sharded-array-aware).
    checkpoint_backend: str = "msgpack"
    seed: int = 0
    set_epoch_every: int = 5
    # Activation rematerialization for the policy forward inside the train
    # step: "none" stores every residual (fastest when it fits); any other
    # value wraps the loss in jax.checkpoint so the backward pass recomputes
    # activations instead of holding them across the whole forward.
    # "dots_no_batch" (jax.checkpoint_policies.dots_with_no_batch_dims_
    # saveable) is the standard transformer policy - weight matmuls are kept,
    # batched intermediates (attention probs, per-token residuals) are
    # recomputed; it is what lets flagship batches > 32 fit one chip's
    # 16 GB HBM (measured: b64 rgbd_and_mesh OOMs without it). "dots" keeps
    # every matmul output; "nothing" recomputes everything.
    remat_policy: str = "none"


def make_train_batch_template(
    config: DiffuserActorConfig,
    batch_size: int = 2,
    n_vertices: int = 32,
    feature_dim: int = 8,
    image_size: int = 32,
    ncam: int = 1,
) -> Dict[str, Any]:
    """A zero batch with the right structure, for model init / AOT compile."""
    L, G, H = config.prediction_horizon, config.ngrippers, config.nhist
    batch: Dict[str, Any] = {
        "gripper_history": np.zeros((batch_size, H, G, 8), np.float32),
        "gt_gripper_pred": np.zeros((batch_size, L, G, 8), np.float32),
        "gt_head_yaw": (
            np.zeros((batch_size, L, 1), np.float32) if config.predict_head_yaw else None
        ),
        "instruction": None,
        "rgbs": None,
        "pcds": None,
        "pcd_valid_mask": None,
        "vertices": None,
        "vertex_features": None,
        "vertices_valid_mask": None,
        "is_keypose": None,
    }
    batch["gripper_history"][..., 3] = 1.0  # unit quaternions
    batch["gt_gripper_pred"][..., 3] = 1.0
    if config.data_type in ("mesh", "rgbd_and_mesh"):
        batch["vertices"] = np.zeros((batch_size, n_vertices, 3), np.float32)
        batch["vertex_features"] = np.zeros(
            (batch_size, n_vertices, feature_dim), np.float16
        )
        batch["vertices_valid_mask"] = np.ones((batch_size, n_vertices), bool)
    if config.data_type in ("rgbd", "rgbd_and_mesh"):
        batch["rgbs"] = np.zeros((batch_size, ncam, image_size, image_size, 3),
                                 np.float32)
        batch["pcds"] = np.zeros((batch_size, ncam, image_size, image_size, 3),
                                 np.float32)
        batch["pcd_valid_mask"] = np.ones((batch_size, ncam, image_size, image_size),
                                          bool)
    return batch


class Trainer:
    def __init__(
        self,
        model_config: DiffuserActorConfig,
        trainer_config: TrainerConfig,
        workspace_bounds: np.ndarray,
        mesh=None,
        metric_logger=None,
        backbone_weights: Optional[str] = None,
    ):
        self.metric_logger = metric_logger
        self.backbone_weights = backbone_weights
        self.model_config = model_config
        self.config = trainer_config
        if trainer_config.checkpoint_backend not in ("msgpack", "orbax"):
            raise ValueError(
                f"Unknown checkpoint_backend "
                f"{trainer_config.checkpoint_backend!r}; "
                "expected 'msgpack' or 'orbax'"
            )
        self.workspace_bounds = jnp.asarray(workspace_bounds, dtype=jnp.float32)
        self.model = DiffuserActor(model_config)
        if mesh is None:
            # Use the largest device count that divides the batch size so the
            # leading-axis sharding is always valid.
            n = len(jax.devices())
            while n > 1 and trainer_config.batch_size % n != 0:
                n -= 1
            mesh = make_data_mesh(jax.devices()[:n])
        self.mesh = mesh
        self._train_step = None
        self._eval_step = None
        self._orbax = None

    # --- setup ---------------------------------------------------------------
    def init_state(self, batch_template: Dict[str, Any], rng: Optional[jax.Array] = None):
        """Initialize (params, opt_state) from a structural batch template."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.config.seed)
        prepared = prepare_inputs(
            _to_jnp(batch_template), self.workspace_bounds, self.model_config
        )
        L, G = self.model_config.prediction_horizon, self.model_config.ngrippers
        B = batch_template["gripper_history"].shape[0]
        noisy = jnp.zeros((B, L, G, 9))
        ts = jnp.zeros((B,), dtype=jnp.int32)
        # jit the init: eager flax init dispatches thousands of tiny ops
        # (minutes through the TPU tunnel, ~40 s on one CPU core); compiled
        # init runs in seconds and hits the persistent compile cache.
        variables = jax.jit(self.model.init)(rng, prepared, noisy, ts)
        params = variables["params"]
        if self.backbone_weights and self.model_config.data_type in (
            "rgbd", "rgbd_and_mesh",
        ):
            from nvblox_mindmap_tpu.models.pretrained import (
                graft_backbone_into_model_params,
            )

            params = graft_backbone_into_model_params(
                params, self.model_config.feature_type, self.backbone_weights
            )
        tx = self._make_tx(params)
        opt_state = tx.init(params)
        params = replicate(params, self.mesh)
        opt_state = replicate(opt_state, self.mesh)
        return params, opt_state

    def _make_tx(self, params):
        from nvblox_mindmap_tpu.training.optimizer import (
            frozen_feature_extractor_mask,
        )

        # Freeze the vision backbone (reference semantics): extractor params
        # never update, except a trainable CLIP FPN.
        trainable_mask = frozen_feature_extractor_mask(params, fpn_trainable=True)
        return make_optimizer(
            params,
            initial_learning_rate=self.config.initial_learning_rate,
            weight_decay=self.config.weight_decay,
            end_factor=self.config.learning_rate_end_factor,
            total_iters=self.config.train_iters,
            convergence_percentage=self.config.learning_rate_convergence_percentage,
            accumulate_grad_batches=self.config.accumulate_grad_batches,
            trainable_mask=trainable_mask,
        )

    # --- compiled steps ------------------------------------------------------
    def _build_train_step(self, params):
        tx = self._make_tx(params)
        model = self.model
        cfg = self.model_config
        bounds = self.workspace_bounds
        dropout = (
            cfg.encoder_dropout > 0
            or cfg.diffusion_dropout > 0
            or cfg.predictor_dropout > 0
        )

        remat = self.config.remat_policy
        if remat not in ("none", "dots", "dots_no_batch", "nothing"):
            raise ValueError(f"unknown remat_policy {remat!r}")

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            prepared = prepare_inputs(batch, bounds, cfg)

            def loss_fn(p):
                losses = diffusion_train_loss(
                    model, {"params": p}, prepared, rng, deterministic=not dropout
                )
                return losses["total"], losses

            if remat != "none":
                policy = {
                    "dots": jax.checkpoint_policies.checkpoint_dots,
                    "dots_no_batch": (
                        jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                    ),
                    "nothing": jax.checkpoint_policies.nothing_saveable,
                }[remat]
                loss_fn = jax.checkpoint(loss_fn, policy=policy)
            grads, losses = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        return train_step

    def _build_eval_step(self):
        model = self.model
        cfg = self.model_config
        bounds = self.workspace_bounds
        # Train-val sampling runs the cheap DDIM path by default (10 steps vs
        # the 100-step DDPM production sampler): ~10x faster val iterations,
        # same metric ranking (the reference evaluates losses even more
        # cheaply, run_training.py:249-378). Set eval_num_inference_steps=None
        # for full-fidelity eval sampling.
        n_steps = self.config.eval_num_inference_steps
        if n_steps is not None:
            # Tiny-model configs can train with fewer than 10 diffusion
            # timesteps; the sampler cannot take more inference steps than
            # the training schedule has.
            n_steps = min(n_steps, cfg.diffusion_timesteps)
        kind = self.config.eval_scheduler

        @jax.jit
        def eval_step(params, batch, rng):
            prepared = prepare_inputs(batch, bounds, cfg)
            traj_pred_9, head_yaw, _ = _sample_normalized(
                model, {"params": params}, prepared, rng, cfg,
                num_inference_steps=n_steps, scheduler_kind=kind,
            )
            # Loss against the normalized GT trajectory (reference
            # evaluate_nsteps computes loss on the sampled trajectory).
            losses = compute_loss(
                traj_pred_9,
                head_yaw,
                prepared["gt_gripper_pred"],
                prepared.get("gt_openness"),
                prepared.get("gt_head_yaw"),
                loss_weights=cfg.loss_weights,
                predict_head_yaw=cfg.predict_head_yaw,
                rotation_form="6D",
            )
            # Metrics on unnormalized quaternion actions.
            pred_unnorm = unnormalize_trajectory(
                traj_pred_9, bounds, cfg.rotation_parametrization, cfg.quaternion_format
            )
            gt = jnp.concatenate(
                [
                    unnormalize_trajectory(
                        prepared["gt_gripper_pred"],
                        bounds,
                        cfg.rotation_parametrization,
                        cfg.quaternion_format,
                    ),
                    prepared["gt_openness"],
                ],
                axis=-1,
            )
            metrics = compute_metrics(
                pred_unnorm,
                head_yaw,
                gt,
                prepared.get("gt_head_yaw"),
                predict_head_yaw=cfg.predict_head_yaw,
                rotation_form="quaternion",
            )
            # Positions (B, L, G, 3) ride along for the per-eval trajectory
            # figure (reference run_training.py:370-372); they stay on device
            # unless the caller fetches them (first batch only).
            return losses, metrics, pred_unnorm[..., :3], gt[..., :3]

        return eval_step

    # --- public API ----------------------------------------------------------
    def train_one_step(self, params, opt_state, batch, step: int,
                       on_device: bool = False):
        if self._train_step is None:
            self._train_step = self._build_train_step(params)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.config.seed), step)
        if on_device:
            device_batch = batch
        else:
            with Timer("step/train/shard_batch"):
                device_batch = shard_batch(batch, self.mesh)
        with Timer("step/train/compute"):
            params, opt_state, losses = self._train_step(
                params, opt_state, device_batch, rng
            )
        return params, opt_state, losses

    def evaluate_nsteps(
        self, params, loader: DataLoader, step: int, num_batches: int, split: str
    ) -> Tuple[float, Dict[str, float]]:
        """Run eval batches; returns (mean total loss, mean metrics)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        n = len(loader) if num_batches == -1 else min(num_batches, len(loader))
        loss_sum = 0.0
        metric_sums: Dict[str, np.ndarray] = {}
        count = 0
        figure_logged = False
        n_devices = 1 if self.mesh is None else self.mesh.size
        for i, batch in enumerate(loader):
            if i >= n:
                break
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.config.seed + 17), step * 1000 + i
            )
            # Eval loaders keep partial tail batches (drop_last=False); a
            # batch-sharded mesh needs divisible leading dims, so trim the
            # remainder (< mesh size samples) instead of crashing the run.
            bsz = batch["gripper_history"].shape[0]
            if bsz % n_devices != 0:
                keep = (bsz // n_devices) * n_devices
                if keep == 0:
                    logger.warning(
                        "eval batch of %d samples < mesh size %d; skipped",
                        bsz, n_devices,
                    )
                    continue
                logger.warning(
                    "eval batch of %d samples trimmed to %d (mesh size %d): "
                    "%d tail samples dropped from the weighted val loss",
                    bsz, keep, n_devices, bsz - keep,
                )
                batch = jax.tree_util.tree_map(
                    lambda x: x[:keep] if hasattr(x, "shape")
                    and getattr(x, "ndim", 0) > 0 and x.shape[0] == bsz else x,
                    batch,
                    is_leaf=lambda x: x is None,
                )
            device_batch = shard_batch(batch, self.mesh)
            with Timer("step/eval/inference"):
                losses, metrics, pred_pos, gt_pos = self._eval_step(
                    params, device_batch, rng
                )
                losses, metrics = jax.device_get((losses, metrics))
            if (
                not figure_logged
                and self.metric_logger is not None
                and jax.process_index() == 0
            ):
                # GT-vs-pred scatter on the 1st EVALUATED batch (reference
                # run_training.py:370-372); a flag, not `i == 0`, because the
                # mesh-divisibility skip above can drop batch 0 entirely.
                figure_logged = True
                try:
                    self.metric_logger.log_trajectory_figure(
                        jax.device_get(pred_pos), jax.device_get(gt_pos),
                        step, split=split,
                    )
                except Exception as e:  # viz must never kill training
                    logger.warning("trajectory figure failed: %s", e)
            # Weight per-batch means by batch size: drop_last=False tail
            # batches would otherwise give their few samples a full batch's
            # weight in the val loss that drives best-checkpoint selection.
            bsz_eff = batch["gripper_history"].shape[0]
            loss_sum += float(losses["total"]) * bsz_eff
            for k, v in metrics.items():
                metric_sums[k] = (
                    metric_sums.get(k, 0.0) + np.asarray(v) * bsz_eff
                )
            count += bsz_eff
        if count == 0:
            return float("inf"), {}
        mean_metrics = {k: v / count for k, v in metric_sums.items()}
        # Cross-process reduction (no-op single-process).
        from nvblox_mindmap_tpu.parallel.multihost import (
            mean_metrics_across_processes,
        )

        mean_metrics = mean_metrics_across_processes(mean_metrics)
        mean_loss = loss_sum / count
        if self.metric_logger is not None and jax.process_index() == 0:
            self.metric_logger.log(mean_metrics, step, prefix=f"{split}/")
            self.metric_logger.log({"loss": mean_loss}, step, prefix=f"{split}/")
        logger.info(
            "[%s] step %d: loss %.4f, distance %.4f m, rot err %.2f deg",
            split,
            step,
            mean_loss,
            float(np.asarray(mean_metrics.get("distance_m", np.nan))),
            float(np.asarray(mean_metrics.get("rot_error_deg", np.nan))),
        )
        return mean_loss, mean_metrics

    def run_training(
        self,
        train_loader: DataLoader,
        validation_loader: DataLoader,
        params=None,
        opt_state=None,
        start_iter: int = 0,
        best_loss: Optional[float] = None,
        args_dict: Optional[Dict] = None,
    ):
        """Iteration-based training loop (reference run_training.py:497-789)."""
        cfg = self.config
        if params is None:
            first = next(iter(train_loader))
            params, opt_state = self.init_state(first)

        train_epoch_length = len(train_loader)
        assert train_epoch_length > 0, "Train loader contains less than one batch."
        train_iter = None
        next_device_batch = None
        step = start_iter
        while step < cfg.train_iters:
            epoch_idx = step // train_epoch_length
            if step % train_epoch_length == 0 or train_iter is None:
                if train_loader.sampler is not None:
                    # The stream reseeds once per set_epoch_every block
                    # (reference run_training.py:686-689). Setting the
                    # block's base epoch unconditionally also restores the
                    # right stream when RESUMING mid-block (the old modulo
                    # guard left a resumed run on the epoch-0 stream).
                    train_loader.sampler.set_epoch(
                        (epoch_idx // cfg.set_epoch_every)
                        * cfg.set_epoch_every
                    )
                elif hasattr(train_loader, "set_epoch"):
                    # PackedDeviceLoader: pin the per-epoch shuffle stream to
                    # the absolute epoch so resume continues the same orders.
                    train_loader.set_epoch(epoch_idx)
                train_iter = iter(train_loader)
                next_device_batch = None
            step_timer = Timer("step")
            with Timer("step/load_batch"):
                # One-batch-ahead device prefetch: device_put is async, so
                # the host->device transfer of the NEXT batch overlaps this
                # step's compute.
                if next_device_batch is None:
                    try:
                        next_device_batch = shard_batch(next(train_iter), self.mesh)
                    except StopIteration:
                        train_iter = iter(train_loader)
                        next_device_batch = shard_batch(next(train_iter), self.mesh)
                device_batch = next_device_batch
                try:
                    next_device_batch = shard_batch(next(train_iter), self.mesh)
                except StopIteration:
                    next_device_batch = None
            with Timer("step/train"):
                params, opt_state, losses = self.train_one_step(
                    params, opt_state, device_batch, step, on_device=True
                )
            if (step + 1) % cfg.val_freq == 0 and self.metric_logger is not None:
                if jax.process_index() == 0:
                    host = jax.device_get(losses)
                    self.metric_logger.log(
                        {f"train-loss/{k}": v for k, v in host.items()}, step
                    )
            if step % cfg.print_progress_freq == 0:
                host_losses = jax.device_get(losses)
                logger.info(
                    "step %d/%d (epoch %d): total %.4f pos %.4f rot %.4f grip %.4f",
                    step,
                    cfg.train_iters,
                    epoch_idx,
                    float(host_losses["total"]),
                    float(host_losses["pos"]),
                    float(host_losses["rot"]),
                    float(host_losses["gripper"]),
                )
            if (step + 1) % cfg.val_freq == 0:
                if not cfg.skip_train_val:
                    self.evaluate_nsteps(
                        params,
                        train_loader,
                        step,
                        cfg.num_batches_per_train_eval,
                        split="train-val",
                    )
                new_loss, _ = self.evaluate_nsteps(
                    params,
                    validation_loader,
                    step,
                    cfg.num_batches_per_test_eval,
                    split="val",
                )
                if cfg.save_checkpoint:
                    # Orbax save is a COLLECTIVE (all hosts must enter -
                    # it opens with a cross-process barrier); only the
                    # single-file msgpack writer is rank-0-only.
                    if (cfg.checkpoint_backend == "orbax"
                            or jax.process_index() == 0):
                        best_loss = self._save_best_and_last(
                            cfg, params, opt_state, step, new_loss, best_loss
                        )
                    if args_dict is not None and jax.process_index() == 0:
                        save_training_args(cfg.checkpoint_dir, args_dict)
            step_timer.stop()
            if step % cfg.print_timers_freq == 0 and step > 0:
                logger.info("\n%s", timer_status_string())
            step += 1
        if self._orbax is not None:
            self._orbax.wait()
        return params, opt_state, best_loss

    def _save_best_and_last(self, cfg, params, opt_state, step, new_loss,
                            best_loss):
        """Write best/last via the configured backend (msgpack or orbax)."""
        if cfg.checkpoint_backend == "orbax":
            if self._orbax is None:
                from nvblox_mindmap_tpu.training.orbax_checkpoint import (
                    OrbaxCheckpointer,
                )
                self._orbax = OrbaxCheckpointer(cfg.checkpoint_dir)
            return self._orbax.save_best_and_last(
                jax.device_get(params), jax.device_get(opt_state),
                step, new_loss, best_loss,
            )
        return save_checkpoint(
            cfg.checkpoint_dir, params, opt_state, step, new_loss, best_loss
        )

    def load_checkpoint(self, path: str, batch_template: Dict[str, Any]):
        params, opt_state = self.init_state(batch_template)
        params_t, opt_t = jax.device_get((params, opt_state))
        if os.path.isdir(path):
            # Orbax checkpoints are directories; route to that backend so
            # orbax-trained runs can resume/evaluate like msgpack ones.
            from nvblox_mindmap_tpu.training.orbax_checkpoint import (
                OrbaxCheckpointer,
            )

            ckptr = OrbaxCheckpointer(os.path.dirname(path.rstrip("/")),
                                      async_write=False)
            params, opt_state, step, best_loss = ckptr.restore(
                os.path.basename(path.rstrip("/")), params_t, opt_t
            )
        else:
            params, opt_state, step, best_loss = load_checkpoint_file(
                path, params_t, opt_t
            )
        params = replicate(params, self.mesh)
        opt_state = replicate(opt_state, self.mesh)
        return params, opt_state, step, best_loss


def _to_jnp(batch: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None,
        batch,
        is_leaf=lambda x: x is None,
    )


def _sample_normalized(model, variables, prepared, rng, cfg,
                       num_inference_steps=None, scheduler_kind="ddpm"):
    """Sampler in normalized space (no unnormalize), for eval losses.

    Thin wrapper over the production sampler (sample_trajectory
    normalized=True) so the eval path can never drift from it again (a
    previous copy here missed the reduced-schedule prev_t jump AND the
    flash-attention None-weights guard).
    """
    from nvblox_mindmap_tpu.models.diffuser_actor import sample_trajectory

    return sample_trajectory(
        model, variables, prepared, rng,
        workspace_bounds=None,  # unused in normalized mode
        num_inference_steps=num_inference_steps,
        scheduler_kind=scheduler_kind,
        stochastic=(scheduler_kind == "ddpm"),
        normalized=True,
    )
