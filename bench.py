"""Benchmark: keypose-prediction latency + RGB-D fusion rate on one TPU chip.

1. Keypose prediction p50 at the reference's DEFAULT flagship configuration
   (reference cli/args.py:72: data_type=RGBD_AND_MESH, RADIO ViT-B/16
   features): 2048 mesh vertices x 768-d features PLUS 2 cameras x 512x512
   RGB-D with the frozen backbone forward INSIDE the policy
   (encoder.encode_images runs FeatureExtractor.compute, reference
   encoder.py:246-300), then 100 DDPM denoising steps at embedding dim 120.
   Target (BASELINE.md): < 100 ms per keypose. A mesh-only p50 rides along
   as a secondary key (the lighter config earlier rounds reported).
2. Fusion rate: one full mapper step (decay + TSDF depth integration +
   768-d feature integration) from a 512x512 RGB-D frame (the reference's
   camera resolution, model_overview.md:67), drill_in_box AABB at 1 cm
   voxels. Target: >= 30 Hz.

Primary metric = keypose latency; vs_baseline = 100ms / p50 (>1 is faster
than target). The fusion rate rides along in the same JSON line. Backbone
weights are random-initialized - values don't affect timing.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np




def _enable_compilation_cache():
    from nvblox_mindmap_tpu.utils.system import enable_compilation_cache

    enable_compilation_cache()

def main(data_type: str = "rgbd_and_mesh"):
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
        prepare_inputs,
        sample_trajectory,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    uses_rgb = data_type in ("rgbd", "rgbd_and_mesh")
    cfg = DiffuserActorConfig(
        embedding_dim=120,
        num_attn_heads=8,
        data_type=data_type,
        # Reference default: RADIO ViT-B/16 forward inside the policy
        # (cli/args.py:74); mesh-only carries precomputed 768-d features.
        feature_type=(FeatureExtractorType.RADIO_V25_B if uses_rgb
                      else FeatureExtractorType.RGB),
        diffusion_timesteps=100,
        fps_subsampling_factor=5,
    )
    model = DiffuserActor(cfg)
    bounds = jnp.asarray(
        [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=jnp.float32
    )

    rng = np.random.default_rng(0)
    B, NV, FD = 1, 2048, 768
    NCAM, IMG = 2, 512  # arm default: wrist + table cams at 512x512

    def pose8(shape):
        pos = rng.uniform(-0.3, 0.6, size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return np.concatenate([pos, quat, close], -1).astype(np.float32)

    batch = {
        "gripper_history": jnp.asarray(pose8((B, 3, 1))),
        "vertices": jnp.asarray(
            rng.uniform(-0.3, 0.6, size=(B, NV, 3)), dtype=jnp.float32
        ),
        "vertex_features": jnp.asarray(
            rng.normal(size=(B, NV, FD)), dtype=jnp.float32
        ),
        "vertices_valid_mask": jnp.ones((B, NV), dtype=bool),
    }
    if uses_rgb:
        batch["rgbs"] = jnp.asarray(
            rng.uniform(0, 1, size=(B, NCAM, IMG, IMG, 3)), dtype=jnp.float32
        )
        batch["pcds"] = jnp.asarray(
            rng.uniform(-0.3, 0.6, size=(B, NCAM, IMG, IMG, 3)),
            dtype=jnp.float32,
        )
        batch["pcd_valid_mask"] = jnp.ones((B, NCAM, IMG, IMG), dtype=bool)
    noisy = jnp.zeros((B, 1, 1, 9))
    ts = jnp.zeros((B,), dtype=jnp.int32)

    @jax.jit
    def init_fn(key, raw_batch):
        prepared = prepare_inputs(raw_batch, bounds, cfg)
        return model.init(key, prepared, noisy, ts)

    variables = init_fn(jax.random.PRNGKey(0), batch)

    @jax.jit
    def predict(params, batch, key):
        prepared = prepare_inputs(batch, bounds, cfg)
        traj, _, _ = sample_trajectory(
            model, {"params": params}, prepared, key, bounds
        )
        return traj

    @jax.jit
    def predict_ddim(params, batch, key):
        # Serving mode: DDIM, 10 steps (reference converter.py parity).
        prepared = prepare_inputs(batch, bounds, cfg)
        traj, _, _ = sample_trajectory(
            model, {"params": params}, prepared, key, bounds,
            num_inference_steps=10, scheduler_kind="ddim", stochastic=False,
        )
        return traj

    params = variables["params"]

    # The TPU tunnel's throughput varies several-fold with transient load;
    # repeat every measurement pass and keep the best (standard
    # interference-robust benchmarking - min latency, max rate).
    def measure(fn, n=20, reps=3):
        jax.block_until_ready(fn(params, batch, jax.random.PRNGKey(0)))
        best = float("inf")
        for _ in range(reps):
            times = []
            for i in range(n):
                key = jax.random.PRNGKey(i)
                t0 = time.perf_counter()
                jax.block_until_ready(fn(params, batch, key))
                times.append(time.perf_counter() - t0)
            best = min(best, float(np.percentile(times, 50) * 1000))
        return best

    def measure_throughput(fn, b=None, n=20, reps=3):
        # Pipelined (async-dispatch) per-call time: the pure device cost,
        # without the per-call host sync round trip.
        b = batch if b is None else b
        jax.block_until_ready(fn(params, b, jax.random.PRNGKey(0)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(params, b, jax.random.PRNGKey(i)) for i in range(n)]
            jax.block_until_ready(outs)
            best = min(best, (time.perf_counter() - t0) / n * 1000)
        return best

    # Batched serving throughput: DDIM-10 over an 8-request batch (the
    # parallel/serving.py pattern on one chip) - per-request device cost
    # amortizes the fixed encode/dispatch work.
    B8 = 8
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B8,) + x.shape[1:]) if x is not None
        else None,
        batch,
        is_leaf=lambda x: x is None,
    )

    @jax.jit
    def predict_ddim_b8(params, b, key):
        prepared = prepare_inputs(b, bounds, cfg)
        traj, _, _ = sample_trajectory(
            model, {"params": params}, prepared, key, bounds,
            num_inference_steps=10, scheduler_kind="ddim", stochastic=False,
        )
        return traj

    return (
        measure(predict),
        measure(predict_ddim),
        measure_throughput(predict),
        measure_throughput(predict_ddim),
        measure_throughput(predict_ddim_b8, b=batch8),
    )


def _bench_fusion_hz() -> float:
    """Full mapper fusion step rate (decay + depth + 768-d features)."""
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping import voxel_grid as vg
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    cfg = MappingConfig.for_task(
        Tasks.DRILL_IN_BOX, feature_dim=768, max_feature_pages=1024
    )
    state = vg.create_state(cfg)
    rng = np.random.default_rng(0)
    H = W = 512  # the reference fuses 512x512 frames (model_overview.md:67)
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (H, W)), dtype=jnp.float32)
    T = jnp.eye(4)
    K = jnp.asarray([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]])
    feat = jnp.asarray(rng.normal(size=(512, 512, 768)), dtype=jnp.float16)
    fK = jnp.asarray([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]])

    def fuse(state):
        # Production path: one fused XLA program per frame.
        return vg.fuse_frame(state, cfg, depth, feat, T, K, fK)

    state = fuse(state)  # warmup/compile
    jax.block_until_ready(state.tsdf)
    best = 0.0
    for _ in range(3):  # best-of-3: tunnel load varies several-fold
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state = fuse(state)
        jax.block_until_ready(state.tsdf)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def _bench_fusion_hz_with_backbone() -> float:
    """Fusion rate with the REAL extractor inside the loop.

    Apples-to-apples with the reference's fused-frame timer, which includes
    feature_extractor.compute() (nvblox_mapping_helpers.py:123): one jitted
    program per frame runs RADIO-sized ViT-B/16 forward (512x512 input, 1024
    patch tokens + CLS) -> bilinear upscale to 512x512x768 -> decay + TSDF +
    feature integration. Weight values don't affect timing; random init.
    """
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping import voxel_grid as vg
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig
    from nvblox_mindmap_tpu.models.feature_extractors import (
        FeatureExtractorType,
        make_feature_extractor,
    )

    cfg = MappingConfig.for_task(
        Tasks.DRILL_IN_BOX, feature_dim=768, max_feature_pages=1024
    )
    state = vg.create_state(cfg)
    rng = np.random.default_rng(0)
    H = W = 512  # the reference fuses 512x512 frames (model_overview.md:67)
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (H, W)), dtype=jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), dtype=jnp.float32)
    T = jnp.eye(4)
    K = jnp.asarray([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]])
    fK = jnp.asarray([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]])

    module = make_feature_extractor(
        FeatureExtractorType.RADIO_V25_B, feature_image_size=(32, 32)
    )
    params = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3))
    )["params"]

    @jax.jit
    def extract(params, rgb):
        feats = module.apply({"params": params}, rgb[None])
        return jax.image.resize(
            feats, (1, 512, 512, 768), method="bilinear"
        )[0].astype(jnp.float16)

    def fuse_with_backbone(state, params, rgb):
        # NOTE: fuse_frame must stay OUTSIDE any extra jit wrapper - nesting
        # would inline it and drop its donate_argnums, copying the ~800 MB
        # feature pool every frame instead of updating it in place.
        return vg.fuse_frame(state, cfg, depth, extract(params, rgb), T, K, fK)

    state = fuse_with_backbone(state, params, rgb)  # warmup/compile
    jax.block_until_ready(state.tsdf)
    best = 0.0
    for _ in range(3):  # best-of-3: tunnel load varies several-fold
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            state = fuse_with_backbone(state, params, rgb)
        jax.block_until_ready(state.tsdf)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def _bench_train_step(
    data_type: str = "rgbd_and_mesh", batch_size: int = 32
) -> tuple:
    """Full training-step time at the flagship configuration.

    The DEFAULT is the reference's training default: data_type=RGBD_AND_MESH
    with the frozen RADIO backbone forward INSIDE the train step
    (reference cli/args.py:72, diffuser_actor/encoder.py:246-300 runs
    feature extraction in encode_inputs at train time). data_type="mesh"
    rides along as the lighter secondary config earlier rounds reported.

    One compiled program: preprocess -> (frozen ViT forward, rgbd configs)
    -> encode -> DDPM noise -> denoise -> loss -> grad -> AdamW update, with
    donated params/opt_state (the production trainer path,
    training/trainer.py). Steps chain on the donated state, so the loop is
    naturally pipelined.

    Returns (step_ms, step_gflops): gflops from XLA's cost analysis of the
    compiled program, for the roofline/MFU estimate in the summary JSON.
    """
    import jax

    from nvblox_mindmap_tpu.training.trainer import Trainer, TrainerConfig
    from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActorConfig
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    uses_rgb = data_type in ("rgbd", "rgbd_and_mesh")
    cfg = DiffuserActorConfig(
        embedding_dim=120,
        num_attn_heads=8,
        data_type=data_type,
        feature_type=(FeatureExtractorType.RADIO_V25_B if uses_rgb
                      else FeatureExtractorType.RGB),
        diffusion_timesteps=100,
        fps_subsampling_factor=5,
    )
    B, NV, FD = batch_size, 2048, 768
    NCAM, IMG = 2, 512  # arm default: wrist + table cams at 512x512
    bounds = np.asarray(
        [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=np.float32
    )
    trainer = Trainer(
        cfg, TrainerConfig(train_iters=1, batch_size=B, save_checkpoint=False),
        bounds,
    )
    rng = np.random.default_rng(0)

    def pose8(shape):
        pos = rng.uniform(-0.3, 0.6, size=shape + (3,))
        quat = rng.normal(size=shape + (4,))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        close = rng.integers(0, 2, size=shape + (1,)).astype(np.float64)
        return np.concatenate([pos, quat, close], -1).astype(np.float32)

    batch = {
        "gripper_history": pose8((B, 3, 1)),
        "gt_gripper_pred": pose8((B, 1, 1)),
        "gt_head_yaw": None,
        "instruction": None,
        "rgbs": (
            rng.uniform(0, 1, size=(B, NCAM, IMG, IMG, 3)).astype(np.float32)
            if uses_rgb else None
        ),
        "pcds": (
            rng.uniform(-0.3, 0.6, size=(B, NCAM, IMG, IMG, 3)).astype(
                np.float32)
            if uses_rgb else None
        ),
        "pcd_valid_mask": (
            np.ones((B, NCAM, IMG, IMG), bool) if uses_rgb else None
        ),
        "vertices": rng.uniform(-0.3, 0.6, size=(B, NV, 3)).astype(np.float32),
        "vertex_features": rng.normal(size=(B, NV, FD)).astype(np.float32),
        "vertices_valid_mask": np.ones((B, NV), bool),
        "is_keypose": None,
    }
    params, opt_state = trainer.init_state(batch)
    # Pre-stage the batch on device (on_device=True): the production trainer
    # overlaps the host->device batch upload with compute via one-batch-ahead
    # prefetch (training/trainer.py), so steady-state step time is the
    # compute time, not compute + a serial 200 MB upload.
    device_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)) if x is not None else None,
        batch,
        is_leaf=lambda x: x is None,
    )
    params, opt_state, losses = trainer.train_one_step(
        params, opt_state, device_batch, 0, on_device=True
    )  # warmup/compile
    jax.block_until_ready(losses["total"])
    best = float("inf")
    for _ in range(3):  # best-of-3: tunnel load varies several-fold
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, losses = trainer.train_one_step(
                params, opt_state, device_batch, i + 1, on_device=True
            )
        jax.block_until_ready(losses["total"])
        best = min(best, (time.perf_counter() - t0) / n * 1000)

    # FLOP count of the compiled step (XLA cost analysis; re-lowering hits
    # the trace/compile caches).
    gflops = None
    try:
        rng_key = jax.random.PRNGKey(0)
        ca = trainer._train_step.lower(
            params, opt_state, device_batch, rng_key
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        gflops = float(ca.get("flops", 0.0)) / 1e9
    except Exception:
        pass
    return best, (gflops if gflops else -1.0)


LOADER_BENCH_WORKERS = 4


def _write_synthetic_flagship_dataset(root: str, n_demos: int = 2,
                                      n_frames: int = 48) -> None:
    """An on-disk dataset shaped like production captures: 512x512 RGB (PNG)
    + 512x512 uint16 depth (PNG) + 768-d fp16 feature meshes with realistic
    low-rank structure (zstd-compressible, like real backbone features)."""
    import imageio.v2 as imageio

    from nvblox_mindmap_tpu.data.dataset import pickle_zst

    rng = np.random.default_rng(0)
    NV, FD = 6000, 768
    H = W = 512
    # Shared photographic-ish content; per-frame noise defeats any
    # content-dedup caching between frames.
    yy, xx = np.mgrid[0:H, 0:W]
    base_rgb = np.stack(
        [xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 37.0)], axis=-1
    )
    lowrank_a = rng.normal(size=(NV, 16)).astype(np.float16)
    for d in range(n_demos):
        demo = os.path.join(root, f"demo_{d:05d}")
        os.makedirs(demo)
        np.save(os.path.join(demo, "demo_successful.npy"), np.asarray(1))
        t = np.linspace(0, 1, n_frames)
        pos = np.stack(
            [0.3 + 0.3 * t, 0.1 * np.sin(2 * np.pi * t),
             0.2 + 0.2 * np.sin(np.pi * t)], axis=1)
        jaws = np.full((n_frames, 2), 0.04)
        jaws[n_frames // 3: 2 * n_frames // 3] = 0.01
        for i in range(n_frames):
            state = np.concatenate(
                [pos[i], [1, 0, 0, 0], jaws[i]]).astype(np.float32)
            np.save(os.path.join(demo, f"{i}.robot_state.npy"), state)
            rgb = np.clip(
                base_rgb + rng.normal(0, 0.02, (H, W, 3)), 0, 1)
            imageio.imwrite(
                os.path.join(demo, f"{i}.wrist_rgb.png"),
                (rgb * 255).astype(np.uint8))
            depth = (1000 * (0.8 + 0.2 * np.sin(xx / 53.0 + i))).astype(
                np.uint16)
            imageio.imwrite(
                os.path.join(demo, f"{i}.wrist_depth.png"), depth)
            np.save(os.path.join(demo, f"{i}.wrist_pose.npy"),
                    np.asarray([0.3, 0, 0.9, 0, 1, 0, 0], np.float32))
            np.save(os.path.join(demo, f"{i}.wrist_intrinsics.npy"),
                    np.asarray([[400.0, 0, 256], [0, 400.0, 256],
                                [0, 0, 1]], np.float32))
            feats = (
                lowrank_a @ rng.normal(size=(16, FD)).astype(np.float16)
                + rng.normal(0, 0.05, (NV, FD))
            ).astype(np.float16)
            pickle_zst(
                {"vertices": rng.uniform(-0.2, 0.9, (NV, 3)).astype(
                    np.float16),
                 "features": feats, "channel_length": FD},
                os.path.join(demo, f"{i}.nvblox_vertex_features.zst"),
            )


def _make_flagship_loader(root: str, num_workers: int = LOADER_BENCH_WORKERS,
                          demos: str = "0-1", drop_last: bool = False):
    from nvblox_mindmap_tpu.data.dataset import SamplingWeightingType
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.data.loader import get_data_loader_by_data_type
    from nvblox_mindmap_tpu.data.vertex_sampling import VertexSamplingMethod
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment

    loader, _ = get_data_loader_by_data_type(
        embodiment=ArmEmbodiment(),
        dataset_path=root,
        demos=demos,
        num_workers=num_workers,
        batch_size=32,
        use_keyposes=True,
        data_type="rgbd_and_mesh",
        only_sample_keyposes=False,
        extra_keyposes_around_grasp_events=[],
        keypose_detection_mode=(
            KeyposeDetectionMode.HIGHEST_Z_OF_VERTICAL_MOTION
        ),
        include_failed_demos=False,
        sampling_weighting_type=SamplingWeightingType.NONE,
        num_history=3,
        prediction_horizon=1,
        num_vertices_to_sample=2048,
        vertex_sampling_method=(
            VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT
        ),
        seed=0,
        drop_last=drop_last,
    )
    return loader


def _bench_loader_samples_per_s() -> float:
    """Input-pipeline throughput at flagship-like shapes (host-only).

    Synthesizes an on-disk dataset shaped like production captures - 512x512
    RGB (PNG) + 512x512 uint16 depth (PNG) + 768-d fp16 feature meshes with
    realistic low-rank structure (zstd-compressible, like real backbone
    features) - then times the production DataLoader (native zstd/png decode
    + prefetch threads + keypose windowing + backprojection) delivering
    batch-32 rgbd_and_mesh training batches. Compare against
    train_samples_per_s: loader >> train means the feed keeps the chip busy.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")  # host pipeline: no TPU needed
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        _write_synthetic_flagship_dataset(root)
        loader = _make_flagship_loader(root)
        best = 0.0
        for _ in range(3):  # first epoch warms page cache / decoder state
            n_samples = 0
            t0 = time.perf_counter()
            for batch in loader:
                n_samples += batch["gripper_history"].shape[0]
            best = max(best, n_samples / (time.perf_counter() - t0))
        return best
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_train_e2e(num_steps: int = 500, num_packed: int = 4) -> tuple:
    """Sustained chip-fed training from a packed epoch (the full contract).

    The real data path materializes once (production DataLoader over a
    synthetic flagship-shape dataset -> data/packed.py), stages into HBM,
    and a {num_steps}-step flagship train run slices batches ON DEVICE.
    Returns (e2e_samples_per_s, stage_upload_s, materialize_s): e2e should
    sit within ~20% of the device-only step rate — the point of the design;
    staging/materialization are the one-time costs it amortizes.
    """
    import shutil
    import tempfile

    import jax

    from nvblox_mindmap_tpu.data.packed import (
        PackedEpoch,
        device_batch,
        materialize_packed_epoch,
        stage_to_device,
    )
    from nvblox_mindmap_tpu.models.diffuser_actor import DiffuserActorConfig
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType
    from nvblox_mindmap_tpu.training.trainer import Trainer, TrainerConfig

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    packed_dir = os.path.join(root, "packed")
    try:
        # 3 demos x 48 frames -> 144 samples -> 4 full b32 batches.
        _write_synthetic_flagship_dataset(root, n_demos=3)
        t0 = time.perf_counter()
        loader = _make_flagship_loader(root, demos="0-2", drop_last=True)
        materialize_packed_epoch(loader, packed_dir, num_batches=num_packed)
        materialize_s = time.perf_counter() - t0

        cfg = DiffuserActorConfig(
            embedding_dim=120,
            num_attn_heads=8,
            data_type="rgbd_and_mesh",
            feature_type=FeatureExtractorType.RADIO_V25_B,
            diffusion_timesteps=100,
            fps_subsampling_factor=5,
        )
        B = 32
        bounds = np.asarray(
            [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=np.float32
        )
        trainer = Trainer(
            cfg,
            TrainerConfig(train_iters=1, batch_size=B, save_checkpoint=False),
            bounds,
        )
        t0 = time.perf_counter()
        staged = stage_to_device(PackedEpoch(packed_dir))
        jax.block_until_ready([v for v in staged.values()
                               if v is not None and hasattr(v, "dtype")])
        stage_upload_s = time.perf_counter() - t0

        params, opt_state = trainer.init_state(device_batch(staged, 0))
        params, opt_state, losses = trainer.train_one_step(
            params, opt_state, device_batch(staged, 0), 0, on_device=True
        )  # warmup/compile
        jax.block_until_ready(losses["total"])
        t0 = time.perf_counter()
        for step in range(1, num_steps + 1):
            params, opt_state, losses = trainer.train_one_step(
                params, opt_state, device_batch(staged, step), step,
                on_device=True,
            )
        jax.block_until_ready(losses["total"])
        e2e = num_steps * B / (time.perf_counter() - t0)
        assert np.isfinite(float(jax.device_get(losses["total"])))
        return e2e, stage_upload_s, materialize_s
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _run_in_subprocess(
    what: str, retries: int = 2, timeout_s: Optional[float] = None
) -> list:
    """Run one measurement in a clean process (device state isolation).

    The TPU tunnel occasionally degrades/fails transiently; retry fresh.
    """
    import subprocess
    import sys

    last_err = None
    for _ in range(retries + 1):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--measure", what],
                capture_output=True,
                text=True,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired as e:
            last_err = e
            continue
        if out.returncode == 0:
            try:
                return [
                    float(v) for v in out.stdout.strip().splitlines()[-1].split()
                ]
            except (ValueError, IndexError) as e:
                last_err = e
        else:
            last_err = RuntimeError(out.stderr[-2000:])
    raise RuntimeError(f"benchmark '{what}' failed: {last_err}")


if __name__ == "__main__":
    import sys

    if "--measure" in sys.argv:
        what = sys.argv[sys.argv.index("--measure") + 1]
        if what == "keypose":
            ddpm_ms, ddim_ms, pipelined_ms, pipelined_ddim_ms, b8_ms = main()
            print(ddpm_ms, ddim_ms, pipelined_ms, pipelined_ddim_ms, b8_ms)
        elif what == "keypose_mesh":
            ddpm_ms, ddim_ms, pipelined_ms, pipelined_ddim_ms, b8_ms = main(
                data_type="mesh"
            )
            print(ddpm_ms, ddim_ms, pipelined_ms, pipelined_ddim_ms, b8_ms)
        elif what == "fusion_backbone":
            print(_bench_fusion_hz_with_backbone())
        elif what == "train_e2e":
            e2e, upload_s, mat_s = _bench_train_e2e()
            print(e2e, upload_s, mat_s)
        elif what.startswith("train"):
            # "train" (flagship b32), "train:<data_type>" or
            # "train:<data_type>:<batch>" — pad per missing field.
            parts = what.split(":")
            dt = parts[1] if len(parts) > 1 else "rgbd_and_mesh"
            b = parts[2] if len(parts) > 2 else "32"
            ms, gflops = _bench_train_step(data_type=dt, batch_size=int(b))
            print(ms, gflops)
        elif what == "loader":
            print(_bench_loader_samples_per_s())
        else:
            print(_bench_fusion_hz())
    else:
        (p50_ms, ddim_ms, pipelined_ms, pipelined_ddim_ms,
         serving_b8_ms) = _run_in_subprocess("keypose")
        # Everything past the headline keypose metric is best-effort: a
        # ride-along measurement failing (degraded tunnel, cold cache) must
        # never cost the driver-tracked JSON line itself.
        try:
            (mesh_p50_ms, mesh_ddim_ms, mesh_pipelined_ms, _mesh_pddim,
             _mesh_b8) = _run_in_subprocess("keypose_mesh")
        except RuntimeError:
            mesh_p50_ms = mesh_ddim_ms = mesh_pipelined_ms = None
        try:
            (fusion_hz,) = _run_in_subprocess("fusion")
        except RuntimeError:
            fusion_hz = None
        try:
            (fusion_backbone_hz,) = _run_in_subprocess("fusion_backbone")
        except RuntimeError:
            fusion_backbone_hz = None
        # Train-step metrics are best-effort: the flagship fwd+bwd program's
        # first compile can exceed the round budget on a cold cache; the
        # headline (driver-tracked) metrics must never be lost to it.
        # Roofline helper: achieved TFLOP/s and MFU vs the chip's bf16 peak
        # (TPU v5e = 197 TFLOP/s; the step runs mixed fp32/bf16, so this is
        # a conservative utilization bound).
        def train_point(what, batch, timeout_s):
            try:
                ms, gflops = _run_in_subprocess(
                    what, retries=0, timeout_s=timeout_s
                )
            except RuntimeError:
                return None
            point = {
                "step_ms": round(ms, 3),
                "samples_per_s": round(batch * 1000.0 / ms, 1),
            }
            if gflops and gflops > 0:
                tflops = gflops / ms  # GFLOP / ms == TFLOP/s
                point["tflops_per_s"] = round(tflops, 2)
                point["mfu_pct_vs_v5e_bf16_peak"] = round(
                    100.0 * tflops * 1e12 / 197e12, 2
                )
            return point

        # The reference's training default (RGBD_AND_MESH, frozen backbone
        # forward inside the step) is the primary train metric; mesh-only is
        # the lighter secondary config. The batch sweep maps where samples/s
        # and MFU saturate (the docs' roofline story: per-op overhead bound
        # at small shapes, batching is the throughput lever).
        train_flagship = train_point("train:rgbd_and_mesh:32", 32, 2700)
        train_mesh = train_point("train:mesh:32", 32, 1800)
        train_scaling = {}
        for b in (64, 128, 256):
            pt = train_point(f"train:rgbd_and_mesh:{b}", b, 1800)
            if pt is None:
                break  # larger batches only get slower to compile / OOM
            train_scaling[str(b)] = pt
        train_step_ms = train_flagship["step_ms"] if train_flagship else None
        # Chip-fed end-to-end: materialize (real data path) -> HBM staging
        # -> 500 sustained steps slicing batches on device.
        try:
            e2e_sps, e2e_upload_s, e2e_mat_s = _run_in_subprocess(
                "train_e2e", retries=0, timeout_s=3000
            )
        except RuntimeError:
            e2e_sps = e2e_upload_s = e2e_mat_s = None
        try:
            (loader_sps,) = _run_in_subprocess(
                "loader", retries=0, timeout_s=1800
            )
        except RuntimeError:
            loader_sps = None
        loader_parallelism = max(
            1, min(LOADER_BENCH_WORKERS, os.cpu_count() or 1)
        )
        print(
            json.dumps(
                {
                    "metric": "keypose_prediction_latency_p50",
                    "value": round(p50_ms, 3),
                    "unit": "ms",
                    "vs_baseline": round(100.0 / p50_ms, 3),
                    "ddim10_latency_ms": round(ddim_ms, 3),
                    "pipelined_keypose_ms": round(pipelined_ms, 3),
                    "pipelined_ddim10_ms": round(pipelined_ddim_ms, 3),
                    "serving_ddim10_b8_keyposes_per_s": round(
                        8000.0 / serving_b8_ms, 1
                    ),
                    "mesh_only_p50_ms": (
                        round(mesh_p50_ms, 3) if mesh_p50_ms else None
                    ),
                    "mesh_only_ddim10_ms": (
                        round(mesh_ddim_ms, 3) if mesh_ddim_ms else None
                    ),
                    "mesh_only_pipelined_ms": (
                        round(mesh_pipelined_ms, 3)
                        if mesh_pipelined_ms else None
                    ),
                    "fusion_hz": round(fusion_hz, 1) if fusion_hz else None,
                    "fusion_hz_vs_target": (
                        round(fusion_hz / 30.0, 2) if fusion_hz else None
                    ),
                    "fusion_hz_with_backbone": (
                        round(fusion_backbone_hz, 1)
                        if fusion_backbone_hz else None
                    ),
                    "fusion_hz_with_backbone_vs_target": (
                        round(fusion_backbone_hz / 30.0, 2)
                        if fusion_backbone_hz else None
                    ),
                    # Flagship = the reference's training default
                    # (rgbd_and_mesh, frozen backbone inside the step).
                    "train_step_ms_b32_flagship": (
                        train_flagship["step_ms"] if train_flagship else None
                    ),
                    "train_samples_per_s": (
                        train_flagship["samples_per_s"]
                        if train_flagship else None
                    ),
                    "train_step_tflops_per_s": (
                        train_flagship.get("tflops_per_s")
                        if train_flagship else None
                    ),
                    "train_mfu_pct_vs_v5e_bf16_peak": (
                        train_flagship.get("mfu_pct_vs_v5e_bf16_peak")
                        if train_flagship else None
                    ),
                    "train_step_ms_b32_mesh": (
                        train_mesh["step_ms"] if train_mesh else None
                    ),
                    # Batch-scaling sweep (flagship shape): where does the
                    # chip saturate? Keys are batch sizes.
                    "train_batch_scaling": train_scaling or None,
                    # Chip-fed e2e: 500 sustained flagship steps from a
                    # device-staged packed epoch (data/packed.py); the ratio
                    # vs the device-only step rate is the contract (>= 0.8).
                    "train_e2e_samples_per_s": (
                        round(e2e_sps, 1) if e2e_sps else None
                    ),
                    "train_e2e_vs_device_only": (
                        round(
                            e2e_sps / train_flagship["samples_per_s"], 3
                        )
                        if e2e_sps and train_flagship else None
                    ),
                    "train_e2e_stage_upload_s": (
                        round(e2e_upload_s, 1) if e2e_upload_s else None
                    ),
                    "train_e2e_materialize_s": (
                        round(e2e_mat_s, 1) if e2e_mat_s else None
                    ),
                    # Host input pipeline is CPU-parallel (loader worker
                    # pool). The measurement runs a fixed
                    # LOADER_BENCH_WORKERS-worker pool; normalize by the
                    # pool's EFFECTIVE parallelism min(workers, cores) - not
                    # bare os.cpu_count(), which on a many-core host would
                    # understate per-worker throughput and overstate the
                    # workers needed to saturate the device step.
                    "loader_samples_per_s_per_worker": (
                        round(loader_sps / loader_parallelism, 1)
                        if loader_sps else None
                    ),
                    "loader_bench_workers": LOADER_BENCH_WORKERS,
                    "loader_host_cores": os.cpu_count(),
                    "loader_workers_to_saturate_train": (
                        round(
                            (32000.0 / train_step_ms)
                            / (loader_sps / loader_parallelism),
                            1,
                        )
                        if loader_sps and train_step_ms else None
                    ),
                }
            )
        )
