"""Regression baselines: stored-output comparison with --generate_baseline.

The reference pins feature-extractor outputs and generated datasets against
Git-LFS baselines (reference: tests/test_feature_extraction.py,
test_e2e.py:datasets_are_close). Here the committed .npz baselines pin:

- keypose indices + policy states of the deterministic synthetic demo,
- the RGB feature extractor output,
- the mapper's TSDF slice + extracted surface for the synthetic wall scene.

Run ``pytest --generate_baseline tests/test_baselines.py`` to regenerate
after an intentional behavior change.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

BASELINE_DIR = os.path.join(os.path.dirname(__file__), "baselines")


def check_or_generate(request, name: str, arrays: dict, atol=1e-5):
    path = os.path.join(BASELINE_DIR, f"{name}.npz")
    if request.config.getoption("--generate_baseline") or not os.path.exists(path):
        os.makedirs(BASELINE_DIR, exist_ok=True)
        np.savez_compressed(path, **arrays)
        if not request.config.getoption("--generate_baseline"):
            pytest.skip(f"baseline {name} generated; re-run to compare")
        return
    stored = np.load(path)
    assert set(stored.files) == set(arrays), (
        f"baseline {name} keys changed: {sorted(stored.files)} vs "
        f"{sorted(arrays)}"
    )
    for key, value in arrays.items():
        np.testing.assert_allclose(
            np.asarray(value), stored[key], atol=atol,
            err_msg=f"{name}/{key} drifted from baseline",
        )


def test_keypose_baseline(request, tmp_path):
    from nvblox_mindmap_tpu.data.keyposes import KeyposeDetectionMode
    from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
    from tests.test_data_pipeline import write_arm_demo

    demo = str(tmp_path / "demo_00000")
    write_arm_demo(demo, seed=0)
    import glob

    files = sorted(
        glob.glob(os.path.join(demo, "*.robot_state.npy")),
        key=lambda p: int(os.path.basename(p).split(".")[0]),
    )
    states = np.stack([np.load(p) for p in files])
    emb = ArmEmbodiment()
    keyposes = emb.extract_keypose_indices(
        states, [5], KeyposeDetectionMode.HIGHEST_Z_BETWEEN_GRASP
    )
    policy = emb.policy_states_from_robot_states(states, use_keyposes=True)
    check_or_generate(
        request,
        "arm_keyposes",
        {"keyposes": np.asarray(keyposes), "policy_states": policy},
    )


def test_rgb_feature_extractor_baseline(request):
    import jax

    from nvblox_mindmap_tpu.models.feature_extractors import (
        FeatureExtractorType,
        make_feature_extractor,
    )

    module = make_feature_extractor(FeatureExtractorType.RGB, (8, 8))
    rng = np.random.default_rng(42)
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), rgb)
    out = np.asarray(module.apply(params, rgb))
    check_or_generate(request, "rgb_features", {"features": out})


def test_mapper_wall_baseline(request):
    from nvblox_mindmap_tpu.mapping import voxel_grid as vg
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    cfg = MappingConfig(
        voxel_size_m=0.04,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        min_integration_distance_m=0.1,
        feature_dim=4,
        max_feature_pages=128,
    )
    state = vg.create_state(cfg)
    H = W = 32
    K = jnp.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    depth = jnp.full((H, W), 1.0)
    feat = jnp.ones((H, W, 4)) * jnp.asarray([0.1, 0.2, 0.3, 0.4])
    state = vg.fuse_frame(state, cfg, depth, feat, jnp.eye(4), K, K)
    vertices, features, valid = vg.extract_surface_vertices(state, cfg, 1024)
    X, Y, Z = cfg.grid_shape
    check_or_generate(
        request,
        "mapper_wall",
        {
            "tsdf_slice": np.asarray(state.tsdf[X // 2]),
            "weight_slice": np.asarray(state.weight[X // 2]),
            "vertices": np.asarray(vertices)[np.asarray(valid)],
            "features": np.asarray(features)[np.asarray(valid)],
        },
        atol=1e-4,
    )
