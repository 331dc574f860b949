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

Orchestration contract (the driver runs ``python bench.py`` under a hard
timeout, so the run must FIT and the JSON line must never be lost — the
reference's own CI budgets every e2e stage the same way, reference
tests/utils/e2e_helpers.py:258-259):

- Global wall-clock budget: ``BENCH_BUDGET_S`` (default 2100 s). Measurements
  run in value order (headline keypose -> fusion -> flagship train -> the
  rest) and are skipped once the remaining budget can't cover their
  estimated cost. Every subprocess gets a hard timeout.
- Incremental state: each completed measurement is persisted to
  ``/tmp/bench_state_<source-fingerprint>.json``; a later run with unchanged
  sources reuses ride-along results instead of re-measuring (the headline is
  always re-measured fresh when budget allows; state is its fallback). A
  SIGTERM/SIGINT mid-run still prints the JSON line with everything measured
  so far (the values already in the state file).
- ``python bench.py --warm``: compile-only pass (populates the persistent
  XLA compile cache so a following measured run is warm), records nothing.
- ``python bench.py --smoke``: tiny-shape in-process single-rep run on CPU,
  printing one JSON line with the headline keys in well under two minutes —
  pinned by the fast suite so the ONE-JSON-line contract can't silently
  break (tests/test_bench_smoke.py).
- ``BENCH_FORCE=1`` ignores the saved state and re-measures everything.
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


def _warm_only() -> bool:
    """Worker-mode flag: compile/warm up, skip the timed passes."""
    return os.environ.get("BENCH_WARM") == "1"

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
        if _warm_only():
            return float("nan")
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
        if _warm_only():
            return float("nan")
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
    if _warm_only():
        return float("nan")
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
    if _warm_only():
        return float("nan")
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
        # Above b32 the unchunked frozen-ViT forward's activation peak
        # exceeds one chip's 16 GB HBM (measured: b64 OOM); chunking the
        # frozen forward (no backward to recompute) restores the sweep.
        # 32-image chunks: b64 with remat lands 334 MB over HBM at chunk
        # 64 (the fp32 [B,8,820,820] attention-prob temps dominate the
        # backward's live set); the smaller chunk frees the margin.
        backbone_chunk_images=(32 if uses_rgb and batch_size > 32 else None),
    )
    B, NV, FD = batch_size, 2048, 768
    NCAM, IMG = 2, 512  # arm default: wrist + table cams at 512x512
    bounds = np.asarray(
        [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=np.float32
    )
    trainer = Trainer(
        cfg,
        TrainerConfig(
            train_iters=1, batch_size=B, save_checkpoint=False,
            # b64+ flagship activations exceed one chip's 16 GB HBM even
            # with the chunked frozen forward (measured: encoder residuals
            # at 4096 context tokens dominate); the standard transformer
            # remat policy trades a forward recompute for fitting.
            remat_policy=("dots_no_batch" if uses_rgb and batch_size > 32
                          else "none"),
        ),
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
    if _warm_only():
        return float("nan"), -1.0
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
        if _warm_only():
            return float("nan"), float("nan"), float("nan")
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
    what: str, retries: int = 0, timeout_s: float = 600.0,
    warm: bool = False,
) -> list:
    """Run one measurement in a clean process (device state isolation).

    The TPU tunnel occasionally degrades/fails transiently; retry fresh.
    Every call is hard-bounded by ``timeout_s`` — an unbounded measurement
    is what cost round 4 its entire bench output.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    if warm:
        env["BENCH_WARM"] = "1"
    last_err = None
    for _ in range(retries + 1):
        proc = subprocess.Popen(
            [sys.executable, __file__, "--measure", what],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        _ACTIVE_CHILD[0] = proc
        try:
            stdout, stderr = proc.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired as e:
            proc.kill()
            proc.wait()
            last_err = e
            continue
        finally:
            _ACTIVE_CHILD[0] = None
        if proc.returncode == 0:
            try:
                return [
                    float(v) for v in stdout.strip().splitlines()[-1].split()
                ]
            except (ValueError, IndexError) as e:
                last_err = e
        else:
            last_err = RuntimeError(stderr[-2000:])
    raise RuntimeError(f"benchmark '{what}' failed: {last_err}")


# The one in-flight measurement child: a SIGTERM to the orchestrator must
# not orphan it on the chip (it would contend with whatever the driver runs
# next). _orchestrate's handler kills it before emitting the partial line.
_ACTIVE_CHILD: list = [None]


# ---------------------------------------------------------------------------
# Orchestration: budget-aware, state-backed, partial-output-safe.
# ---------------------------------------------------------------------------

def _source_fingerprint() -> str:
    """Hash of bench.py + the package sources: saved measurements are only
    reused while the code that produced them is byte-identical."""
    import hashlib

    h = hashlib.sha256()
    with open(os.path.abspath(__file__), "rb") as f:
        h.update(f.read())
    pkg = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "nvblox_mindmap_tpu"
    )
    for root, dirs, files in sorted(os.walk(pkg)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fn in sorted(files):
            if fn.endswith((".py", ".cpp", ".h", ".sh")):
                h.update(fn.encode())
                with open(os.path.join(root, fn), "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def _state_path(fp: str) -> str:
    return f"/tmp/bench_state_{fp}_{os.getuid()}.json"


def _load_state(fp: str) -> dict:
    if os.environ.get("BENCH_FORCE") == "1":
        return {}
    try:
        with open(_state_path(fp)) as f:
            state = json.load(f)
    except (OSError, ValueError):
        return {}
    return state if state.get("fingerprint") == fp else {}


def _save_measurement(fp: str, name: str, values: list,
                      wall_s: float) -> None:
    """Atomic read-modify-write so a kill mid-save never corrupts state."""
    state = _load_state(fp) or {"fingerprint": fp, "measurements": {}}
    state["measurements"][name] = {
        "values": values, "wall_s": round(wall_s, 1), "ts": time.time(),
    }
    tmp = _state_path(fp) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(fp))


# (name, --measure arg, expected value count, estimated warm cost s,
#  per-subprocess timeout s) in VALUE ORDER: the headline first, then the
# cheap always-reported secondaries, then the expensive train points. The
# budget loop stops adding ride-alongs once the remaining budget can't
# cover a spec's estimate.
_SPECS = [
    ("keypose", "keypose", 5, 420, 1200),
    ("fusion", "fusion", 1, 60, 420),
    ("fusion_backbone", "fusion_backbone", 1, 90, 600),
    ("train_flagship", "train:rgbd_and_mesh:32", 2, 300, 1500),
    ("keypose_mesh", "keypose_mesh", 5, 240, 900),
    ("train_e2e", "train_e2e", 3, 600, 1500),
    ("train_mesh", "train:mesh:32", 2, 180, 900),
    # The scaling sweep tops out at b48 on one 16 GB chip: the backward's
    # transient fp32 [B,8,820,820] attention-probability tensors scale
    # linearly with batch (1.41 GB each at b64), and every remat policy
    # measured (dots_no_batch chunk-64: +334 MB over; chunk-32: +337 MB;
    # nothing_saveable: +1.76 GB — recompute schedules worse) still has to
    # materialize them transiently. A Pallas flash BACKWARD kernel is the
    # structural fix; until then b48 (remat + chunked frozen forward) is
    # the largest flagship batch that fits.
    ("train_b48", "train:rgbd_and_mesh:48", 2, 300, 1200),
    ("loader", "loader", 1, 420, 1200),
]
_WARM_SPECS = [s for s in _SPECS if s[0] not in ("loader", "train_e2e")]


def _collect(budget_s: float) -> tuple:
    """Run the measurement chain under a global wall-clock budget.

    Returns (results, reused, skipped): results maps spec name -> value
    list; completed measurements persist to the state file immediately, so
    a kill at any point loses at most the in-flight measurement.
    """
    import sys

    fp = _source_fingerprint()
    saved = _load_state(fp).get("measurements", {})
    deadline = time.monotonic() + budget_s
    results, reused, skipped = {}, [], []
    for name, what, nvals, est_s, timeout_s in _SPECS:
        remaining = deadline - time.monotonic()
        prior = saved.get(name, {}).get("values")
        if prior is not None and len(prior) == nvals:
            # The headline is re-measured fresh whenever the budget allows
            # (state is only its fallback); ride-alongs reuse saved values.
            if name != "keypose" or remaining < est_s:
                results[name] = prior
                reused.append(name)
                continue
        if remaining < est_s:
            skipped.append(name)
            print(
                f"bench: skipping {name} ({remaining:.0f}s left "
                f"< {est_s}s estimate)", file=sys.stderr,
            )
            continue
        t0 = time.monotonic()
        try:
            values = _run_in_subprocess(
                what,
                retries=1 if name == "keypose" else 0,
                timeout_s=min(timeout_s, max(remaining - 30.0, 60.0)),
            )
        except RuntimeError as e:
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            if prior is not None and len(prior) == nvals:
                results[name] = prior
                reused.append(name)
            else:
                skipped.append(name)
            continue
        results[name] = values
        _save_measurement(fp, name, values, time.monotonic() - t0)
    return results, reused, skipped


def _assemble(results: dict, reused: list, skipped: list,
              wall_s: float) -> dict:
    """The ONE JSON line, from whatever subset of measurements exists."""
    def get(name, i=0):
        vals = results.get(name)
        return vals[i] if vals is not None and len(vals) > i else None

    def rnd(v, nd=3):
        return round(v, nd) if v is not None else None

    p50_ms = get("keypose", 0)
    fusion_hz = get("fusion", 0)
    fusion_backbone_hz = get("fusion_backbone", 0)

    def train_point(name, batch):
        ms, gflops = get(name, 0), get(name, 1)
        if ms is None:
            return None
        point = {
            "step_ms": round(ms, 3),
            "samples_per_s": round(batch * 1000.0 / ms, 1),
        }
        if gflops and gflops > 0:
            tflops = gflops / ms  # GFLOP / ms == TFLOP/s
            point["tflops_per_s"] = round(tflops, 2)
            # Roofline helper: achieved TFLOP/s and MFU vs the chip's bf16
            # peak (TPU v5e = 197 TFLOP/s; the step runs mixed fp32/bf16,
            # so this is a conservative utilization bound).
            point["mfu_pct_vs_v5e_bf16_peak"] = round(
                100.0 * tflops * 1e12 / 197e12, 2
            )
        return point

    train_flagship = train_point("train_flagship", 32)
    train_scaling = {}
    for b in (48, 64, 128, 256):
        pt = train_point(f"train_b{b}", b)
        if pt is not None:
            train_scaling[str(b)] = pt
    train_step_ms = train_flagship["step_ms"] if train_flagship else None
    e2e_sps, e2e_upload_s, e2e_mat_s = (
        get("train_e2e", 0), get("train_e2e", 1), get("train_e2e", 2)
    )
    loader_sps = get("loader", 0)
    loader_parallelism = max(
        1, min(LOADER_BENCH_WORKERS, os.cpu_count() or 1)
    )
    serving_b8_ms = get("keypose", 4)
    return {
        "metric": "keypose_prediction_latency_p50",
        "value": rnd(p50_ms),
        "unit": "ms",
        "vs_baseline": rnd(100.0 / p50_ms) if p50_ms else None,
        "ddim10_latency_ms": rnd(get("keypose", 1)),
        "pipelined_keypose_ms": rnd(get("keypose", 2)),
        "pipelined_ddim10_ms": rnd(get("keypose", 3)),
        "serving_ddim10_b8_keyposes_per_s": (
            round(8000.0 / serving_b8_ms, 1) if serving_b8_ms else None
        ),
        "mesh_only_p50_ms": rnd(get("keypose_mesh", 0)),
        "mesh_only_ddim10_ms": rnd(get("keypose_mesh", 1)),
        "mesh_only_pipelined_ms": rnd(get("keypose_mesh", 2)),
        "fusion_hz": rnd(fusion_hz, 1),
        "fusion_hz_vs_target": (
            round(fusion_hz / 30.0, 2) if fusion_hz else None
        ),
        "fusion_hz_with_backbone": rnd(fusion_backbone_hz, 1),
        "fusion_hz_with_backbone_vs_target": (
            round(fusion_backbone_hz / 30.0, 2)
            if fusion_backbone_hz else None
        ),
        # Flagship = the reference's training default (rgbd_and_mesh,
        # frozen backbone forward inside the step).
        "train_step_ms_b32_flagship": train_step_ms,
        "train_samples_per_s": (
            train_flagship["samples_per_s"] if train_flagship else None
        ),
        "train_step_tflops_per_s": (
            train_flagship.get("tflops_per_s") if train_flagship else None
        ),
        "train_mfu_pct_vs_v5e_bf16_peak": (
            train_flagship.get("mfu_pct_vs_v5e_bf16_peak")
            if train_flagship else None
        ),
        "train_step_ms_b32_mesh": rnd(get("train_mesh", 0)),
        # Batch-scaling sweep (flagship shape): where does the chip
        # saturate? Keys are batch sizes.
        "train_batch_scaling": train_scaling or None,
        # Chip-fed e2e: 500 sustained flagship steps from a device-staged
        # packed epoch (data/packed.py); the ratio vs the device-only step
        # rate is the contract (>= 0.8).
        "train_e2e_samples_per_s": rnd(e2e_sps, 1),
        "train_e2e_vs_device_only": (
            round(e2e_sps / train_flagship["samples_per_s"], 3)
            if e2e_sps and train_flagship else None
        ),
        "train_e2e_stage_upload_s": rnd(e2e_upload_s, 1),
        "train_e2e_materialize_s": rnd(e2e_mat_s, 1),
        # Host input pipeline is CPU-parallel (loader worker pool). The
        # measurement runs a fixed LOADER_BENCH_WORKERS-worker pool;
        # normalize by the pool's EFFECTIVE parallelism min(workers, cores)
        # - not bare os.cpu_count(), which on a many-core host would
        # understate per-worker throughput and overstate the workers needed
        # to saturate the device step.
        "loader_samples_per_s_per_worker": (
            round(loader_sps / loader_parallelism, 1) if loader_sps else None
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
        # Run provenance: which ride-alongs came from the state file
        # (unchanged sources, measured by an earlier run on this machine)
        # and which were skipped for budget.
        "bench_wall_s": round(wall_s, 1),
        "reused_from_state": reused or None,
        "skipped_for_budget": skipped or None,
    }


def _orchestrate() -> None:
    """Full measured run: budget-bounded, kill-safe single-line output."""
    import signal
    import sys

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2100"))
    t0 = time.monotonic()
    printed = [False]
    results_box = {"results": {}, "reused": [], "skipped": []}

    def emit():
        if printed[0]:
            return
        printed[0] = True
        # Anything persisted by THIS or an earlier run still publishes: the
        # state file is the source of truth for completed measurements.
        fp = _source_fingerprint()
        saved = _load_state(fp).get("measurements", {})
        merged = dict(results_box["results"])
        reused = list(results_box["reused"])
        for name, _, nvals, _, _ in _SPECS:
            vals = saved.get(name, {}).get("values")
            if name not in merged and vals is not None and len(vals) == nvals:
                merged[name] = vals
                reused.append(name)
        skipped = [s for s in results_box["skipped"] if s not in merged]
        print(json.dumps(_assemble(
            merged, reused, skipped, time.monotonic() - t0
        )))
        sys.stdout.flush()

    def on_term(signum, frame):
        child = _ACTIVE_CHILD[0]
        if child is not None:
            try:
                child.kill()
            except OSError:
                pass
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, on_term)
    try:
        results, reused, skipped = _collect(budget_s)
        results_box.update(results=results, reused=reused, skipped=skipped)
    finally:
        emit()


def _smoke() -> None:
    """Tiny-shape in-process run on CPU: same JSON-line shape, < 2 minutes.

    Exists so the fast suite can pin the driver contract ("bench.py prints
    ONE JSON line with the headline keys") without TPU access or the full
    measurement cost — the contract silently breaking is what round 4 shipped.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    _enable_compilation_cache()

    from nvblox_mindmap_tpu.models.diffuser_actor import (
        DiffuserActor,
        DiffuserActorConfig,
        prepare_inputs,
        sample_trajectory,
    )
    from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType

    cfg = DiffuserActorConfig(
        embedding_dim=48,
        num_attn_heads=4,
        data_type="mesh",
        feature_type=FeatureExtractorType.RGB,
        diffusion_timesteps=8,
        fps_subsampling_factor=4,
    )
    model = DiffuserActor(cfg)
    bounds = jnp.asarray(
        [[-0.37, -0.75, -0.13], [0.95, 0.75, 0.65]], dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    B, NV, FD = 1, 128, 3
    pos = rng.uniform(-0.3, 0.6, size=(B, 3, 1, 3))
    quat = rng.normal(size=(B, 3, 1, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    close = rng.integers(0, 2, size=(B, 3, 1, 1)).astype(np.float64)
    batch = {
        "gripper_history": jnp.asarray(
            np.concatenate([pos, quat, close], -1), dtype=jnp.float32
        ),
        "vertices": jnp.asarray(
            rng.uniform(-0.3, 0.6, size=(B, NV, 3)), dtype=jnp.float32
        ),
        "vertex_features": jnp.asarray(
            rng.normal(size=(B, NV, FD)), dtype=jnp.float32
        ),
        "vertices_valid_mask": jnp.ones((B, NV), dtype=bool),
    }
    noisy = jnp.zeros((B, 1, 1, 9))
    ts = jnp.zeros((B,), dtype=jnp.int32)

    @jax.jit
    def init_fn(key, raw_batch):
        prepared = prepare_inputs(raw_batch, bounds, cfg)
        return model.init(key, prepared, noisy, ts)

    variables = init_fn(jax.random.PRNGKey(0), batch)

    @jax.jit
    def predict(params, b, key):
        prepared = prepare_inputs(b, bounds, cfg)
        traj, _, _ = sample_trajectory(
            model, {"params": params}, prepared, key, bounds
        )
        return traj

    params = variables["params"]
    jax.block_until_ready(predict(params, batch, jax.random.PRNGKey(0)))
    times = []
    for i in range(3):
        t_start = time.perf_counter()
        jax.block_until_ready(predict(params, batch, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t_start)
    p50 = float(np.percentile(times, 50) * 1000)
    line = _assemble({"keypose": [p50, None, None, None, None]}, [], [], 0.0)
    line["smoke"] = True
    print(json.dumps(line))


def _warm() -> None:
    """Compile-only pass: populate the persistent XLA compile cache so the
    driver's measured run (same sources, same cache dir) starts warm."""
    import sys

    for name, what, _, _, _ in _WARM_SPECS:
        t0 = time.monotonic()
        try:
            _run_in_subprocess(what, timeout_s=3600, warm=True)
            print(
                f"warm: {name} compiled in {time.monotonic() - t0:.0f}s",
                file=sys.stderr,
            )
        except RuntimeError as e:
            print(f"warm: {name} FAILED: {e}", file=sys.stderr)


if __name__ == "__main__":
    import sys

    if "--measure" in sys.argv:
        # Every measurement subprocess gets the persistent compile cache —
        # NOT just the keypose paths whose main() enables it internally.
        # Without this the train/fusion/e2e measurements silently recompiled
        # their multi-minute programs on every run (measured: the flagship
        # train step re-paid a 250-540 s XLA compile per subprocess while
        # the keypose programs cached fine).
        _enable_compilation_cache()
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
    elif "--smoke" in sys.argv:
        _smoke()
    elif "--warm" in sys.argv:
        _warm()
    else:
        _orchestrate()
