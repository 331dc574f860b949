"""Trainer: sharded train step on the 8-device CPU mesh, checkpoint roundtrip."""
import numpy as np

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActorConfig
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
from nvblox_mindmap_tpu.parallel.mesh import make_data_mesh, shard_batch
from nvblox_mindmap_tpu.training.optimizer import _decay_mask, linear_lr_schedule
from nvblox_mindmap_tpu.training.trainer import (
    Trainer,
    TrainerConfig,
    make_train_batch_template,
)
from tests.jit_helpers import jit_sample

BOUNDS = np.asarray([[-0.5, -1.0, 0.0], [1.5, 1.0, 2.0]])


def small_configs(tmp_path, diffusion_timesteps=5):
    model_cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=diffusion_timesteps,
        fps_subsampling_factor=4,
    )
    trainer_cfg = TrainerConfig(
        train_iters=4,
        batch_size=8,
        val_freq=1000,
        checkpoint_dir=str(tmp_path / "ckpt"),
        print_progress_freq=1000,
    )
    return model_cfg, trainer_cfg


def random_batch(rng, batch_size=8, n_vertices=32):
    def pose8(shape):
        pos = rng.uniform([-0.4, -0.9, 0.1], [1.4, 0.9, 1.9], size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return np.concatenate([pos, quat, close], -1).astype(np.float32)

    return {
        "gripper_history": pose8((batch_size, 3, 1)),
        "gt_gripper_pred": pose8((batch_size, 1, 1)),
        "gt_head_yaw": None,
        "instruction": None,
        "rgbs": None,
        "pcds": None,
        "pcd_valid_mask": None,
        "vertices": rng.uniform(-0.4, 0.9, size=(batch_size, n_vertices, 3)).astype(
            np.float32
        ),
        "vertex_features": rng.normal(size=(batch_size, n_vertices, 8)).astype(
            np.float32
        ),
        "vertices_valid_mask": np.ones((batch_size, n_vertices), bool),
        "is_keypose": None,
    }


def test_train_step_runs_on_8_device_mesh(tmp_path):
    assert jax.device_count() == 8
    model_cfg, trainer_cfg = small_configs(tmp_path)
    mesh = make_data_mesh()
    trainer = Trainer(model_cfg, trainer_cfg, BOUNDS, mesh=mesh)
    template = make_train_batch_template(model_cfg, batch_size=8)
    params, opt_state = trainer.init_state(template)

    rng = np.random.default_rng(0)
    losses_seq = []
    for step in range(3):
        batch = random_batch(rng)
        params, opt_state, losses = trainer.train_one_step(
            params, opt_state, batch, step
        )
        losses_seq.append(float(jax.device_get(losses["total"])))
    assert all(np.isfinite(l) for l in losses_seq)
    # Params are replicated across all devices.
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_batch_sharding_splits_leading_axis():
    mesh = make_data_mesh()
    batch = {"x": np.ones((8, 4), np.float32), "y": None}
    sharded = shard_batch(batch, mesh)
    assert sharded["y"] is None
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (1, 4)


def test_checkpoint_roundtrip(tmp_path):
    model_cfg, trainer_cfg = small_configs(tmp_path)
    trainer = Trainer(model_cfg, trainer_cfg, BOUNDS)
    template = make_train_batch_template(model_cfg, batch_size=8)
    params, opt_state = trainer.init_state(template)
    from nvblox_mindmap_tpu.training.checkpoint import save_checkpoint

    best = save_checkpoint(trainer_cfg.checkpoint_dir, params, opt_state, 7, 0.5, None)
    assert best == 0.5
    params2, opt2, step, best_loss = trainer.load_checkpoint(
        trainer_cfg.checkpoint_dir + "/best.ckpt", template
    )
    assert step == 7 and best_loss == 0.5
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))


def test_linear_lr_schedule():
    sched = linear_lr_schedule(1e-4, 0.5, total_iters=100, convergence_percentage=0.75)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(75)), 0.5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 0.5e-4, rtol=1e-5)


def test_decay_mask_excludes_norms_and_biases():
    params = {
        "Dense_0": {"kernel": np.ones((2, 2)), "bias": np.ones(2)},
        "LayerNorm_0": {"scale": np.ones(2), "bias": np.ones(2)},
    }
    mask = _decay_mask(params)
    assert mask["Dense_0"]["kernel"] is True
    assert mask["Dense_0"]["bias"] is False
    assert mask["LayerNorm_0"]["scale"] is False
    assert mask["LayerNorm_0"]["bias"] is False


def test_feature_extractor_frozen_in_training(tmp_path, monkeypatch):
    """The vision backbone's params must not change during training."""
    from nvblox_mindmap_tpu.models import encoder as encoder_mod
    from nvblox_mindmap_tpu.models.feature_extractors import (
        FeatureExtractorType,
        VitFeatureExtractor,
    )

    # Freezing keys off the 'feature_extractor' param path, not the backbone
    # size - swap in a tiny ViT so the test doesn't compile a full DINOv2.
    monkeypatch.setattr(
        encoder_mod,
        "make_feature_extractor",
        lambda t, size, **kw: VitFeatureExtractor(
            patch_size=4, width=16, depth=2, num_heads=2,
            feature_image_size=size, num_prefix_tokens=1,
        ),
    )

    model_cfg = DiffuserActorConfig(
        embedding_dim=24,
        num_attn_heads=4,
        data_type="rgbd",
        feature_type=FeatureExtractorType.DINO_V2_VITS14,
        feature_image_size=(2, 2),
        diffusion_timesteps=4,
        fps_subsampling_factor=4,
    )
    trainer_cfg = TrainerConfig(
        train_iters=2, batch_size=4, val_freq=1000,
        checkpoint_dir=str(tmp_path / "c"), print_progress_freq=1000,
    )
    trainer = Trainer(model_cfg, trainer_cfg, BOUNDS)
    template = make_train_batch_template(
        model_cfg, batch_size=4, image_size=28, ncam=1
    )
    params, opt_state = trainer.init_state(template)
    before = jax.device_get(params["encoder"]["feature_extractor"])
    rng = np.random.default_rng(0)
    batch = dict(template)
    batch["rgbs"] = rng.uniform(0, 1, size=template["rgbs"].shape).astype(
        np.float32
    )
    batch["pcds"] = rng.uniform(-0.4, 0.9, size=template["pcds"].shape).astype(
        np.float32
    )
    params, opt_state, _ = trainer.train_one_step(params, opt_state, batch, 0)
    after = jax.device_get(params["encoder"]["feature_extractor"])
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
    ):
        np.testing.assert_array_equal(a, b)
    # Non-frozen params did change.
    head_before = jax.device_get(
        jax.tree_util.tree_leaves(params["head"])[0]
    )
    assert np.isfinite(head_before).all()


def test_frozen_backbone_backward_pass_is_pruned():
    """The frozen backbone contributes ZERO gradient — not just masked
    updates: stop_gradient at the extractor output (ViT) / trunk-FPN
    boundary (CLIP) prunes the backward pass from the compiled step, the
    XLA equivalent of the reference's torch.no_grad() extractor
    (reference feature_extraction.py). The CLIP FPN must keep training."""
    from nvblox_mindmap_tpu.models.clip_resnet_fpn import ClipResNet50Fpn
    from nvblox_mindmap_tpu.models.feature_extractors import (
        VitFeatureExtractor,
    )

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)

    vit = VitFeatureExtractor(
        patch_size=4, width=16, depth=1, num_heads=2,
        feature_image_size=(4, 4), num_prefix_tokens=1,
    )
    params = jax.jit(vit.init)(jax.random.PRNGKey(0), rgb)["params"]
    grads = jax.grad(
        lambda p: jnp.sum(vit.apply({"params": p}, rgb) ** 2)
    )(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)

    # feature size 4 -> 32x32 trunk input, so the deepest ResNet level
    # (stride 32) is still 1x1 and the FPN has no empty pyramid level.
    clip = ClipResNet50Fpn(feature_image_size=(4, 4), out_channels=8)
    params = jax.jit(clip.init)(jax.random.PRNGKey(0), rgb)["params"]
    grads = jax.grad(
        lambda p: jnp.sum(clip.apply({"params": p}, rgb) ** 2)
    )(params)
    for leaf in jax.tree_util.tree_leaves(grads["backbone"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    fpn_norms = [
        float(jnp.abs(leaf).sum())
        for leaf in jax.tree_util.tree_leaves(grads["fpn"])
    ]
    assert sum(fpn_norms) > 0.0, "FPN must stay trainable"


def test_frozen_mask_shapes():
    from nvblox_mindmap_tpu.training.optimizer import (
        frozen_feature_extractor_mask,
    )

    params = {
        "encoder": {
            "feature_extractor": {"backbone": {"kernel": np.ones(2)},
                                  "fpn": {"kernel": np.ones(2)}},
            "other": {"kernel": np.ones(2)},
        }
    }
    mask = frozen_feature_extractor_mask(params, fpn_trainable=True)
    assert mask["encoder"]["feature_extractor"]["backbone"]["kernel"] is False
    assert mask["encoder"]["feature_extractor"]["fpn"]["kernel"] is True
    assert mask["encoder"]["other"]["kernel"] is True


def test_trainer_orbax_backend(tmp_path):
    """checkpoint_backend='orbax' writes best/last via _save_best_and_last."""
    import os

    from nvblox_mindmap_tpu.training.orbax_checkpoint import OrbaxCheckpointer

    model_cfg, trainer_cfg = small_configs(tmp_path)
    trainer_cfg.checkpoint_backend = "orbax"
    trainer = Trainer(model_cfg, trainer_cfg, BOUNDS)
    template = make_train_batch_template(model_cfg, batch_size=8)
    params, opt_state = trainer.init_state(template)

    best = trainer._save_best_and_last(
        trainer_cfg, params, opt_state, 3, 0.7, None
    )
    assert best == 0.7
    trainer._orbax.wait()
    assert os.path.isdir(os.path.join(trainer_cfg.checkpoint_dir, "best"))
    assert os.path.isdir(os.path.join(trainer_cfg.checkpoint_dir, "last"))

    ckptr = OrbaxCheckpointer(trainer_cfg.checkpoint_dir, async_write=False)
    p_t, o_t = jax.device_get((params, opt_state))
    params2, _, step, best_loss = ckptr.restore("best", p_t, o_t)
    assert step == 3 and best_loss == 0.7
    for a, b in zip(
        jax.tree_util.tree_leaves(p_t), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(a, b)


def test_eval_sampler_reduced_schedule_fully_denoises(tmp_path):
    """Regression: the DDIM-10 val sampler must jump t -> t - step_ratio
    like the production sampler (models/diffuser_actor.py:397-417). With the
    t -> t-1 bug, 10 steps only remove 10% of the schedule and the output is
    ~init noise (correlation > 0.9)."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        prepare_inputs,
    )
    from nvblox_mindmap_tpu.training.trainer import _sample_normalized

    model_cfg, _ = small_configs(tmp_path, diffusion_timesteps=50)
    model = DiffuserActor(model_cfg)
    rng = np.random.default_rng(0)
    batch = random_batch(rng, batch_size=2)
    bounds = np.asarray([[-0.4, -0.9, 0.1], [1.4, 0.9, 1.9]], np.float32)
    prepared = prepare_inputs(
        jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if x is not None else None,
            batch, is_leaf=lambda x: x is None,
        ),
        jnp.asarray(bounds),
        model_cfg,
    )
    noisy = jnp.zeros((2, 1, 1, 9))
    ts = jnp.zeros((2,), dtype=jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), prepared, noisy, ts)

    key = jax.random.PRNGKey(7)
    traj10, _, _ = _sample_normalized(
        model, variables, prepared, key, model_cfg,
        num_inference_steps=5, scheduler_kind="ddim",
    )
    # The eval sampler and the production sampler share the key-derivation
    # scheme and (for deterministic DDIM) must produce the SAME trajectory;
    # the t -> t-1 bug made them diverge wildly on reduced schedules.
    from nvblox_mindmap_tpu.models.diffuser_actor import sample_trajectory
    from nvblox_mindmap_tpu.models.normalization import unnormalize_trajectory

    prod_traj, _, _ = jit_sample(
        model, variables, prepared, key, jnp.asarray(bounds),
        num_inference_steps=5, scheduler_kind="ddim", stochastic=False,
    )
    eval_unnorm = unnormalize_trajectory(
        traj10, jnp.asarray(bounds),
        model_cfg.rotation_parametrization, model_cfg.quaternion_format,
    )
    np.testing.assert_allclose(
        np.asarray(eval_unnorm), np.asarray(prod_traj), atol=1e-4
    )


def test_eval_trims_non_divisible_batches_on_mesh(tmp_path):
    """drop_last=False val batches whose size isn't divisible by the device
    mesh are trimmed (not crashed on) during evaluation; the first eval batch
    also emits the GT-vs-pred trajectory figure (reference
    run_training.py:370-372)."""
    from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActor  # noqa
    from nvblox_mindmap_tpu.utils.logging_utils import MetricLogger

    model_cfg, trainer_cfg = small_configs(tmp_path)
    mesh = make_data_mesh(jax.devices("cpu")[:8])
    metric_logger = MetricLogger(artifact_dir=str(tmp_path / "artifacts"))
    trainer = Trainer(
        model_cfg, trainer_cfg,
        np.asarray([[-0.4, -0.9, 0.1], [1.4, 0.9, 1.9]], np.float32),
        mesh=mesh,
        metric_logger=metric_logger,
    )
    rng = np.random.default_rng(0)
    template = random_batch(rng, batch_size=8)
    params, _ = trainer.init_state(template)

    class OneOddBatchLoader:
        def __len__(self):
            return 1

        def __iter__(self):
            yield random_batch(np.random.default_rng(1), batch_size=11)

    loss, metrics = trainer.evaluate_nsteps(
        params, OneOddBatchLoader(), step=0, num_batches=1, split="val"
    )
    assert np.isfinite(loss)
    assert "distance_m" in metrics
    figs = list((tmp_path / "artifacts" / "figures").glob("val_trajectory_*.png"))
    assert len(figs) == 1, "per-eval trajectory PNG missing"
    assert figs[0].stat().st_size > 1000


def test_dp_equivalence_1_vs_8_devices(tmp_path):
    """Data parallelism is an implementation detail, not a semantics change:
    the SAME global batch + rng on a 1-device vs 8-device mesh must produce
    the same loss and the same GRADIENTS (the psum over the mesh equals the
    serial batch mean, up to float reassociation). Reference anchor: DDP
    allreduce semantics (run_training.py:608-613). Updated params are NOT
    compared: Adam's first-step update is +-lr*sign(m/sqrt(v)), so a 1e-12
    reassociation difference on a near-zero gradient legitimately flips an
    update's sign."""
    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        diffusion_train_loss,
        prepare_inputs,
    )
    from nvblox_mindmap_tpu.parallel.mesh import replicate

    model_cfg, trainer_cfg = small_configs(tmp_path)
    model = DiffuserActor(model_cfg)
    batch = random_batch(np.random.default_rng(0), batch_size=8)
    bounds = jnp.asarray(BOUNDS, jnp.float32)
    rng = jax.random.PRNGKey(7)

    trainer = Trainer(
        model_cfg, trainer_cfg, BOUNDS,
        mesh=make_data_mesh(jax.devices("cpu")[:1]),
    )
    params_host = jax.device_get(trainer.init_state(batch)[0])

    @jax.jit
    def loss_and_grads(params, device_batch):
        prepared = prepare_inputs(device_batch, bounds, model_cfg)

        def loss_fn(p):
            losses = diffusion_train_loss(
                model, {"params": p}, prepared, rng, deterministic=True
            )
            return losses["total"]

        return jax.value_and_grad(loss_fn)(params)

    results = {}
    for n in (1, 8):
        mesh = make_data_mesh(jax.devices("cpu")[:n])
        loss, grads = loss_and_grads(
            replicate(params_host, mesh), shard_batch(batch, mesh)
        )
        results[n] = (float(jax.device_get(loss)), jax.device_get(grads))

    loss1, g1 = results[1]
    loss8, g8 = results[8]
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat8 = jax.tree_util.tree_leaves(g8)
    assert len(flat1) == len(flat8) > 50
    for (path, a), b in zip(flat1, flat8):
        # atol covers reassociation noise on near-cancelled elements sitting
        # next to O(10) gradients; any real divergence is orders above it.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5,
            err_msg=f"gradient diverged between meshes: {path}",
        )


def test_cli_rejects_unknown_flags():
    """Misspelled flags must error (Tap parity), not silently use defaults."""
    import pytest

    from nvblox_mindmap_tpu.utils.config import TrainingAppArgs, parse_args

    with pytest.raises(SystemExit):
        parse_args(TrainingAppArgs, ["--learning_rate", "1e-5"])


def test_last_checkpoint_records_running_best(tmp_path):
    """last.ckpt stores the RUNNING best loss (reference checkpoint.py:42-50):
    resuming after a bad eval must not let a mediocre later eval overwrite
    best.ckpt."""
    from nvblox_mindmap_tpu.training.checkpoint import (
        load_checkpoint_file,
        save_checkpoint,
    )

    params = {"w": np.ones(3, np.float32)}
    best = save_checkpoint(str(tmp_path), params, None, 1, 0.3, None)
    assert best == 0.3
    # Loss spikes: best stays 0.3 and last must record 0.3, not 0.9.
    best = save_checkpoint(str(tmp_path), params, None, 2, 0.9, best)
    assert best == 0.3
    _, _, step, stored_best = load_checkpoint_file(
        str(tmp_path / "last.ckpt"), params
    )
    assert step == 2 and stored_best == 0.3


def test_orbax_checkpoint_loads_through_trainer(tmp_path):
    """Orbax-trained checkpoints (directories) must load through the same
    Trainer.load_checkpoint path the apps use."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    model_cfg, trainer_cfg = small_configs(tmp_path)
    trainer_cfg.checkpoint_backend = "orbax"
    trainer = Trainer(model_cfg, trainer_cfg, BOUNDS)
    template = make_train_batch_template(model_cfg, batch_size=4)
    params, opt_state = trainer.init_state(template)

    from nvblox_mindmap_tpu.training.orbax_checkpoint import OrbaxCheckpointer

    ckptr = OrbaxCheckpointer(trainer_cfg.checkpoint_dir, async_write=False)
    ckptr.save_best_and_last(
        jax.device_get(params), jax.device_get(opt_state), 5, 0.4, None
    )
    p2, o2, step, best = trainer.load_checkpoint(
        str(tmp_path / "ckpt" / "best"), template
    )
    assert step == 5 and best == 0.4
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))


def test_weighted_sampler_len_matches_iteration():
    """replacement=False clamps num_samples to the dataset size so len()
    equals what iteration yields (epoch accounting depends on it)."""
    from nvblox_mindmap_tpu.data.sampler import WeightedEpochSampler

    s = WeightedEpochSampler(
        np.ones(10), num_samples=15, replacement=False, num_shards=2,
        shard_index=0,
    )
    assert len(s) == len(list(iter(s)))
