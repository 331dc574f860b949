"""Mapper: TSDF fusion, decay, feature integration, surface extraction."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
from nvblox_mindmap_tpu.mapping.mapper import (
    Mapper,
    get_vertices_and_features,
    integrate_frame,
    save_feature_mesh_to_disk,
)
from nvblox_mindmap_tpu.mapping import voxel_grid as vg


def small_config(feature_dim=8):
    return MappingConfig(
        voxel_size_m=0.02,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        tsdf_decay_factor=0.98,
        min_integration_distance_m=0.1,
        feature_dim=feature_dim,
        max_feature_pages=512,
        valid_depth_mask_erosion_iterations=1,
        static_mask_erosion_iterations=1,
    )


def camera():
    """Camera at origin looking along +z (camera frame == world frame)."""
    H = W = 64
    f = 64.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    return K, T, H, W


def test_tsdf_wall_integration():
    cfg = small_config()
    state = vg.create_state(cfg)
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)  # wall at z=1
    state = vg.integrate_depth(state, cfg, jnp.asarray(depth), jnp.asarray(T),
                               jnp.asarray(K))
    tsdf = np.asarray(state.tsdf)
    weight = np.asarray(state.weight)
    X, Y, Z = cfg.grid_shape
    cx, cy = X // 2, Y // 2
    zs = np.asarray(vg.voxel_centers_flat(cfg)).reshape(X, Y, Z, 3)[cx, cy, :, 2]
    center_tsdf = tsdf[cx, cy]
    center_w = weight[cx, cy]
    # Voxels well in front of the wall: positive tsdf (truncated).
    front = zs < 1.0 - cfg.truncation_distance_m
    observed_front = front & (center_w > 0)
    assert observed_front.sum() > 0
    np.testing.assert_allclose(
        center_tsdf[observed_front], cfg.truncation_distance_m, atol=1e-5
    )
    # Near the wall: tsdf crosses zero around z=1.
    near = np.abs(zs - 1.0) < 0.5 * cfg.voxel_size_m
    assert np.all(np.abs(center_tsdf[near & (center_w > 0)]) < cfg.voxel_size_m)
    # Behind the wall beyond truncation: unobserved.
    behind = zs > 1.0 + cfg.truncation_distance_m + cfg.voxel_size_m
    assert np.all(center_w[behind] == 0)


def test_decay_forgets():
    cfg = small_config()
    state = vg.create_state(cfg)
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    state = vg.integrate_depth(state, cfg, jnp.asarray(depth), jnp.asarray(T),
                               jnp.asarray(K))
    w0 = float(np.asarray(state.weight).max())
    for _ in range(3):
        state = vg.decay(state, cfg)
    w3 = float(np.asarray(state.weight).max())
    np.testing.assert_allclose(w3, w0 * cfg.tsdf_decay_factor**3, rtol=1e-5)
    # Many decays -> fully forgotten.
    for _ in range(500):
        state = vg.decay(state, cfg)
    assert float(np.asarray(state.weight).max()) == 0.0


def test_feature_integration_and_extraction():
    cfg = small_config(feature_dim=8)
    mapper = Mapper({MapperId.STATIC: cfg})
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    feat_value = np.arange(1, 9, dtype=np.float32) / 10.0
    features = np.broadcast_to(feat_value, (H, W, 8)).copy()
    rgb = np.full((H, W, 3), 0.5, dtype=np.float32)

    mapper.add_depth_frame(depth, T, K)
    mapper.add_feature_frame(features, T, K)
    mapper.add_color_frame(rgb, T, K)

    mapper.update_feature_mesh(MapperId.STATIC, max_vertices=4096)
    vertices, feats = get_vertices_and_features(mapper)
    assert vertices.shape[0] > 50
    # Vertices lie near the wall plane z=1.
    assert np.all(np.abs(vertices[:, 2] - 1.0) < 3 * cfg.voxel_size_m)
    # Extracted features match the constant input where assigned.
    nonzero = np.abs(feats).sum(axis=1) > 0
    assert nonzero.sum() > 10
    np.testing.assert_allclose(
        feats[nonzero], np.broadcast_to(feat_value, (nonzero.sum(), 8)),
        atol=2e-2,
    )


def test_page_allocation_bounded():
    cfg = small_config()
    state = vg.create_state(cfg)
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    state = vg.integrate_depth(state, cfg, jnp.asarray(depth), jnp.asarray(T),
                               jnp.asarray(K))
    state = vg.allocate_pages(state, cfg)
    n = int(state.num_pages)
    assert 0 < n <= cfg.max_feature_pages
    # Re-allocation is idempotent.
    state = vg.allocate_pages(state, cfg)
    assert int(state.num_pages) == n


def test_integrate_frame_recipe_and_persistence(tmp_path):
    cfg = small_config(feature_dim=8)
    mapper = Mapper.dual(cfg)
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    features = np.ones((128, 128, 8), dtype=np.float32)  # upscaled 2x
    rgb = (np.ones((H, W, 3)) * 128).astype(np.uint8)
    masks = integrate_frame(
        mapper,
        cfg,
        depth,
        features,
        K,
        T,
        rgb,
        input_mask=np.ones((H, W), dtype=bool),
        input_mask_erosion_iterations=1,
        valid_depth_mask_erosion_iterations=1,
        mapper_id=MapperId.STATIC,
    )
    assert masks["depth_mask"].shape == (H, W)
    assert masks["feature_mask"].shape == (128, 128)
    # Border masked out.
    assert not masks["feature_mask"][0, 0]

    path = str(tmp_path / "mesh.zst")
    save_feature_mesh_to_disk(mapper, path)
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst

    mesh = unpickle_zst(path)
    assert mesh["channel_length"] == 8
    assert mesh["vertices"].shape[0] == mesh["features"].shape[0]
    assert mesh["vertices"].dtype == np.float16

    # Map serialization roundtrip.
    map_path = str(tmp_path / "map.nvblx.pkl")
    mapper.save_map(map_path)
    mapper2 = Mapper({MapperId.STATIC: cfg})
    mapper2.load_from_file(map_path)
    np.testing.assert_array_equal(
        np.asarray(mapper.states[MapperId.STATIC].tsdf),
        np.asarray(mapper2.states[MapperId.STATIC].tsdf),
    )


def test_dynamic_scene_decay_and_remap():
    """Spatial memory: a moved wall is forgotten and re-observed."""
    cfg = small_config()
    state = vg.create_state(cfg)
    K, T, H, W = camera()
    near_wall = np.full((H, W), 0.9, dtype=np.float32)
    far_wall = np.full((H, W), 1.2, dtype=np.float32)
    state = vg.integrate_depth(state, cfg, jnp.asarray(near_wall), jnp.asarray(T),
                               jnp.asarray(K))
    # Move the wall; decay + integrate repeatedly.
    for _ in range(60):
        state = vg.decay(state, cfg)
        state = vg.integrate_depth(state, cfg, jnp.asarray(far_wall),
                                   jnp.asarray(T), jnp.asarray(K))
    X, Y, Z = cfg.grid_shape
    cx, cy = X // 2, Y // 2
    zs = np.asarray(vg.voxel_centers_flat(cfg)).reshape(X, Y, Z, 3)[cx, cy, :, 2]
    tsdf = np.asarray(state.tsdf)[cx, cy]
    w = np.asarray(state.weight)[cx, cy]
    # Old wall location now reads as free space (positive tsdf).
    old = np.abs(zs - 0.9) < cfg.voxel_size_m
    assert np.all(tsdf[old & (w > 0)] > cfg.voxel_size_m)
    # New wall location has a surface.
    new = np.abs(zs - 1.2) < cfg.voxel_size_m
    assert np.any(np.abs(tsdf[new & (w > 0)]) < cfg.voxel_size_m)


def test_fuse_frame_matches_sequential():
    cfg = small_config(feature_dim=8)
    K, T, H, W = camera()
    depth = jnp.full((H, W), 1.0)
    feat = jnp.ones((2 * H, 2 * W, 8))
    fK = jnp.asarray(np.asarray(K) * np.asarray([[2.0], [2.0], [1.0]]))

    fused = vg.create_state(cfg)
    fused = vg.fuse_frame(fused, cfg, depth, feat, jnp.asarray(T), jnp.asarray(K), fK)

    seq = vg.create_state(cfg)
    seq = vg.decay(seq, cfg)
    seq = vg.integrate_depth(seq, cfg, depth, jnp.asarray(T), jnp.asarray(K))
    seq = vg.integrate_features(seq, cfg, feat, jnp.asarray(T), fK)

    np.testing.assert_allclose(np.asarray(fused.tsdf), np.asarray(seq.tsdf))
    np.testing.assert_allclose(np.asarray(fused.feat), np.asarray(seq.feat))
    assert int(fused.num_pages) == int(seq.num_pages)


def test_surface_feature_edge_blending():
    """Vertex features blend the two edge endpoints by crossing position."""
    import dataclasses

    cfg = small_config(feature_dim=4)
    state = vg.create_state(cfg)
    b = cfg.block_size
    # Zero crossing between (10,10,10) t=+0.005 and (10,10,11) t=-0.015:
    # alpha = 0.005 / 0.02 = 0.25.
    tsdf = state.tsdf.at[10, 10, 10].set(0.005).at[10, 10, 11].set(-0.015)
    weight = state.weight.at[10, 10, 10].set(1.0).at[10, 10, 11].set(1.0)
    page_table = state.page_table.at[10 // b, 10 // b, 10 // b].set(0)
    slot0 = ((10 % b) * b + (10 % b)) * b + (10 % b)
    slot1 = ((10 % b) * b + (10 % b)) * b + (11 % b)
    f0 = np.array([1.0, 0.0, 2.0, 0.0], np.float16)
    f1 = np.array([0.0, 1.0, 0.0, 2.0], np.float16)
    feat = state.feat.at[0, slot0].set(f0).at[0, slot1].set(f1)
    feat_weight = state.feat_weight.at[0, slot0].set(1.0).at[0, slot1].set(1.0)
    state = dataclasses.replace(
        state, tsdf=tsdf, weight=weight, page_table=page_table,
        feat=feat, feat_weight=feat_weight,
        num_pages=jnp.ones((), jnp.int32),
    )
    verts, feats, valid = vg.extract_surface_vertices(state, cfg, 16)
    n = int(np.asarray(valid).sum())
    assert n == 1
    v = np.asarray(verts)[np.asarray(valid)][0]
    f = np.asarray(feats)[np.asarray(valid)][0]
    centers = np.asarray(vg.get_voxel_center_grids(cfg))
    np.testing.assert_allclose(
        v, centers[10, 10, 10] + [0, 0, 0.25 * cfg.voxel_size_m], atol=1e-6
    )
    np.testing.assert_allclose(f, 0.75 * f0 + 0.25 * f1, atol=1e-3)

    # Neighbor without features: falls back to the near endpoint alone.
    state2 = dataclasses.replace(
        state, feat_weight=state.feat_weight.at[0, slot1].set(0.0)
    )
    _, feats2, valid2 = vg.extract_surface_vertices(state2, cfg, 16)
    f2 = np.asarray(feats2)[np.asarray(valid2)][0]
    np.testing.assert_allclose(f2, f0, atol=1e-3)


def test_dense_feature_and_color_queries():
    """features_dense/colors_dense mirror the pool contents per voxel."""
    cfg = small_config(feature_dim=8)
    mapper = Mapper({MapperId.STATIC: cfg})
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    feat_value = np.arange(1, 9, dtype=np.float32) / 10.0
    mapper.add_depth_frame(depth, T, K)
    mapper.add_feature_frame(
        np.broadcast_to(feat_value, (H, W, 8)).copy(), T, K
    )
    mapper.add_color_frame(np.full((H, W, 3), 0.25, np.float32), T, K)

    dense = np.asarray(mapper.features_dense())
    colors = np.asarray(mapper.colors_dense())
    assert dense.shape == cfg.grid_shape + (8,)
    assert colors.shape == cfg.grid_shape + (3,)
    populated = np.abs(dense).sum(-1) > 0
    assert populated.sum() > 100
    np.testing.assert_allclose(
        dense[populated],
        np.broadcast_to(feat_value, (populated.sum(), 8)),
        atol=2e-2,
    )
    col_pop = np.abs(colors).sum(-1) > 0
    np.testing.assert_allclose(colors[col_pop], 0.25, atol=2e-2)
    # Populated voxels sit near the wall (z ~= 1.0).
    X, Y, Z = cfg.grid_shape
    zs = np.asarray(vg.voxel_centers_flat(cfg)).reshape(X, Y, Z, 3)[..., 2]
    assert np.all(np.abs(zs[populated] - 1.0) <= cfg.truncation_distance_m + 0.03)


def dynamic_config(feature_dim=8):
    return MappingConfig(
        voxel_size_m=0.02,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        tsdf_decay_factor=0.9,
        min_integration_distance_m=0.1,
        feature_dim=feature_dim,
        max_feature_pages=512,
        valid_depth_mask_erosion_iterations=1,
        static_mask_erosion_iterations=1,
        dynamic_mask_erosion_iterations=1,
        use_dynamic_mask=True,
        dynamic_class_labels=("robot",),
    )


def _robot_scene_frame(H, W, blob_x0):
    """Wall at z=1 with a 24px 'robot' blob at z=0.7 starting at column x0."""
    depth = np.full((H, W), 1.0, dtype=np.float32)
    seg = np.zeros((H, W), dtype=np.uint8)
    y0 = H // 2 - 12
    depth[y0 : y0 + 24, blob_x0 : blob_x0 + 24] = 0.7
    seg[y0 : y0 + 24, blob_x0 : blob_x0 + 24] = 2
    return depth, seg


def test_dynamic_mapper_routing_keeps_static_clean():
    """A robot blob sweeping the scene: static mesh stays clean, the dynamic
    mapper tracks the blob, and include_dynamic export contains both
    (reference: isaaclab_nvblox_mapper.py:71-118 + nvblox_input_helpers)."""
    from nvblox_mindmap_tpu.closed_loop.environment import (
        dynamic_mask_from_segmentation,
    )
    from nvblox_mindmap_tpu.mapping.mapper import nvblox_integrate

    cfg = dynamic_config()
    mapper = Mapper.dual(cfg)
    K, T, H, W = camera()
    feat = np.broadcast_to(
        np.arange(1, 9, dtype=np.float32) / 10.0, (H, W, 8)
    ).copy()
    rgb = np.full((H, W, 3), 0.5, dtype=np.float32)
    id_to_class = {1: "table", 2: "robot"}

    for step, x0 in enumerate([8, 20, 32]):
        mapper.decay()
        depth, seg = _robot_scene_frame(H, W, x0)
        dyn = dynamic_mask_from_segmentation(seg, id_to_class, cfg.dynamic_class_labels)
        assert dyn is not None and dyn.sum() == 24 * 24
        nvblox_integrate(
            mapper, cfg, depth, feat, K, T, rgb,
            dynamic_mask=dyn, include_dynamic=True,
        )

    # Static mesh: only wall vertices (z ~ 1.0); the moving robot never fused.
    mapper.update_feature_mesh(MapperId.STATIC, max_vertices=8192)
    sv, _ = get_vertices_and_features(mapper, MapperId.STATIC)
    assert sv.shape[0] > 50
    assert np.all(sv[:, 2] > 1.0 - 4 * cfg.voxel_size_m), (
        f"robot leaked into the static map: min z {sv[:, 2].min()}"
    )

    # Dynamic mesh: contains the blob surface near z=0.7.
    mapper.update_feature_mesh(MapperId.DYNAMIC, max_vertices=8192)
    dv, _ = get_vertices_and_features(mapper, MapperId.DYNAMIC)
    near_blob = np.abs(dv[:, 2] - 0.7) < 4 * cfg.voxel_size_m
    assert near_blob.sum() > 10, "dynamic mapper did not track the robot blob"

    # include_dynamic export contains both surfaces.
    import tempfile, os
    from nvblox_mindmap_tpu.data.dataset import unpickle_zst

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "0.nvblox_vertex_features.zst")
        save_feature_mesh_to_disk(mapper, path, include_dynamic=True)
        data = unpickle_zst(path)
    z = np.asarray(data["vertices"], dtype=np.float32)[:, 2]
    assert (np.abs(z - 1.0) < 0.1).any() and (np.abs(z - 0.7) < 0.1).any()


def test_zero_feature_vertex_filtering_and_excess_channels():
    """remove_zero_features / num_excess_features parity with reference
    nvblox_output_helpers.py:60-75."""
    cfg = small_config(feature_dim=8)
    mapper = Mapper({MapperId.STATIC: cfg})
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    feat = np.broadcast_to(
        np.arange(1, 9, dtype=np.float32) / 10.0, (H, W, 8)
    ).copy()
    rgb = np.full((H, W, 3), 0.5, dtype=np.float32)

    # Depth observed everywhere, features only on the left half: the right
    # half becomes surface vertices with all-zero features.
    mapper.add_depth_frame(depth, T, K)
    feat_mask = np.zeros((H, W), dtype=bool)
    feat_mask[:, : W // 2] = True
    mapper.add_feature_frame(feat, T, K, feature_mask=feat_mask)
    mapper.add_color_frame(rgb, T, K)
    mapper.update_feature_mesh(MapperId.STATIC, max_vertices=8192)

    v_all, f_all = get_vertices_and_features(mapper, MapperId.STATIC)
    assert np.all(f_all.sum(axis=1) == 0) is not np.True_  # some features set
    n_zero = int(np.all(f_all == 0, axis=1).sum())
    assert n_zero > 0, "test scene should produce featureless vertices"

    v_f, f_f = get_vertices_and_features(
        mapper, MapperId.STATIC, remove_zero_features=True
    )
    assert v_f.shape[0] == v_all.shape[0] - n_zero
    assert not np.any(np.all(f_f == 0, axis=1))

    # Excess channels are dropped BEFORE the zero filter (reference order).
    v_e, f_e = get_vertices_and_features(
        mapper, MapperId.STATIC, remove_zero_features=True,
        num_excess_features=3,
    )
    assert f_e.shape[1] == 5
    assert not np.any(np.all(f_e == 0, axis=1))


def test_include_dynamic_requires_segmentation():
    from nvblox_mindmap_tpu.mapping.mapper import nvblox_integrate

    cfg = dynamic_config()
    mapper = Mapper.dual(cfg)
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    feat = np.zeros((H, W, 8), dtype=np.float32)
    rgb = np.zeros((H, W, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="segmentation"):
        nvblox_integrate(mapper, cfg, depth, feat, K, T, rgb,
                         dynamic_mask=None, include_dynamic=True)


def test_surface_extraction_overflow_is_detected(caplog):
    """The crossing count is surfaced and overflow warns instead of silently
    truncating (fill entries no longer alias voxel 0 as valid)."""
    import logging

    cfg = small_config()
    mapper = Mapper({MapperId.STATIC: cfg})
    K, T, H, W = camera()
    depth = np.full((H, W), 1.0, dtype=np.float32)
    mapper.add_depth_frame(depth, T, K)

    # Ample budget: count equals the number of valid vertices.
    mapper.update_feature_mesh(MapperId.STATIC, max_vertices=8192)
    _, _, valid = mapper.get_feature_mesh(MapperId.STATIC)
    full_count = mapper.last_crossing_count
    assert full_count == int(np.asarray(valid).sum())
    assert full_count > 16

    # Tiny budget: overflow detected, exactly max_vertices valid, warning.
    with caplog.at_level(logging.WARNING,
                         logger="nvblox_mindmap_tpu.mapping"):
        mapper.update_feature_mesh(MapperId.STATIC, max_vertices=16)
    assert mapper.last_crossing_count == full_count
    _, _, valid = mapper.get_feature_mesh(MapperId.STATIC)
    assert int(np.asarray(valid).sum()) == 16
    assert any("overflow" in r.message for r in caplog.records)


def test_page_reclamation_after_decay():
    """Fully decayed blocks return their pages to the pool and their stale
    averaging weights are cleared, so long-running dynamic scenes cannot
    exhaust max_feature_pages (the role of nvblox's decayed-block
    deallocation)."""
    cfg = small_config(feature_dim=4)
    K, T, H, W = camera()
    state = vg.create_state(cfg)
    near = np.full((H, W), 0.9, dtype=np.float32)
    feat_a = np.full((H, W, 4), 0.5, dtype=np.float32)

    state = vg.integrate_depth(state, cfg, jnp.asarray(near), jnp.asarray(T),
                               jnp.asarray(K))
    state = vg.integrate_features(state, cfg, jnp.asarray(feat_a),
                                  jnp.asarray(T), jnp.asarray(K))
    n_alloc = int(state.num_pages)
    assert n_alloc > 0
    assert float(np.asarray(state.feat_weight).max()) > 0

    # Decay until the surface is fully forgotten, then reclaim.
    for _ in range(600):
        state = vg.decay(state, cfg)
    assert float(np.asarray(state.weight).max()) == 0.0
    # Pool weights decayed to zero with the surface.
    assert float(np.asarray(state.feat_weight).max()) == 0.0
    state = vg.allocate_pages(state, cfg)
    assert int(state.num_pages) == 0
    assert np.all(np.asarray(state.page_to_block) == -1)
    assert np.all(np.asarray(state.page_table) == -1)

    # A new surface reuses the reclaimed pages (no monotonic exhaustion).
    far = np.full((H, W), 1.3, dtype=np.float32)
    feat_b = np.full((H, W, 4), -0.25, dtype=np.float32)
    state = vg.integrate_depth(state, cfg, jnp.asarray(far), jnp.asarray(T),
                               jnp.asarray(K))
    state = vg.integrate_features(state, cfg, jnp.asarray(feat_b),
                                  jnp.asarray(T), jnp.asarray(K))
    assert int(state.num_pages) > 0
    vertices, feats, valid = vg.extract_surface_vertices(state, cfg, 4096)
    feats = np.asarray(feats)[np.asarray(valid)]
    nonzero = np.abs(feats).sum(axis=1) > 0
    assert nonzero.sum() > 10
    # Features are the NEW surface's values, not a stale mix with wall A.
    np.testing.assert_allclose(
        feats[nonzero], -0.25 * np.ones_like(feats[nonzero]), atol=5e-2
    )


def test_fuse_frame_rejects_wrong_resolution_masks():
    cfg = small_config(feature_dim=4)
    K, T, H, W = camera()
    state = vg.create_state(cfg)
    depth = jnp.full((H, W), 1.0)
    feat = jnp.zeros((16, 16, 4))
    fK = jnp.asarray(K) / 4.0
    with pytest.raises(ValueError, match="depth_mask"):
        vg.fuse_frame(state, cfg, depth, feat, jnp.asarray(T), jnp.asarray(K),
                      fK, depth_mask=jnp.ones((16, 16), bool))
    with pytest.raises(ValueError, match="feature_mask"):
        vg.fuse_frame(state, cfg, depth, feat, jnp.asarray(T), jnp.asarray(K),
                      fK, feature_mask=jnp.ones((H, W), bool))


def test_mapping_config_image_scaling():
    """scaled_for_image_size: identity at the reference's 512 cameras,
    proportional pixel-radius erosions at other capture resolutions
    (divergence-improvement pinned per mapping/constants.py docstring)."""
    from nvblox_mindmap_tpu.embodiments.registry import Tasks

    cfg = MappingConfig.for_task(Tasks.CUBE_STACKING, feature_dim=3)
    assert cfg.scaled_for_image_size((512, 512)) == cfg

    small = cfg.scaled_for_image_size((64, 64))
    assert small.upscaled_feature_image_size == (64, 64)
    # 17 / 8 -> 2; 3 / 8 -> floor at 1; 20 / 8 -> 2.
    assert small.static_mask_erosion_iterations == 2
    assert small.dynamic_mask_erosion_iterations == 1
    assert small.valid_depth_mask_erosion_iterations == 2
    # Everything else is untouched.
    assert small.voxel_size_m == cfg.voxel_size_m
    assert small.aabb_min_m == cfg.aabb_min_m
    assert small.feature_dim == cfg.feature_dim
