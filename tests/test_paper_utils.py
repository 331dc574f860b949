"""Paper utilities: surface voxel cubes, PCA color specs, USD export, figures.

(reference: mindmap/paper/utils/utils.py, paper/teaser/convert_maps_usd.py,
paper/reconstructions/generate_reconstruction_figures.py)
"""
import re

import numpy as np
import pytest

from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
from nvblox_mindmap_tpu.mapping.mapper import Mapper
from nvblox_mindmap_tpu.visualization.paper_utils import (
    PCASpecification,
    colors_from_features,
    compute_vertex_normals,
    convert_maps_to_usd,
    get_feature_cubes_mesh,
    get_pca_specification,
    get_surface_voxels,
    save_mesh_usda,
    usda_from_mesh,
)


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


def fused_wall_mapper(feature_dim=8):
    """Wall at z=1 with a left/right feature split (distinct PCA colors)."""
    cfg = small_config(feature_dim)
    mapper = Mapper({MapperId.STATIC: cfg})
    H = W = 64
    f = 64.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], dtype=np.float32)
    T = np.eye(4, dtype=np.float32)
    depth = np.full((H, W), 1.0, dtype=np.float32)
    features = np.zeros((H, W, feature_dim), dtype=np.float32)
    features[:, : W // 2, 0] = 1.0  # left half: channel 0
    features[:, W // 2:, 1] = 1.0  # right half: channel 1
    rgb = np.zeros((H, W, 3), dtype=np.float32)
    rgb[..., 0] = 0.8
    mapper.add_depth_frame(depth, T, K)
    mapper.add_feature_frame(features, T, K)
    mapper.add_color_frame(rgb, T, K)
    return mapper, cfg


def test_surface_voxels_on_wall():
    mapper, cfg = fused_wall_mapper()
    centers, features = get_surface_voxels(mapper)
    assert centers.shape[0] > 50
    assert features.shape == (centers.shape[0], 8)
    # Surface voxels sit just behind the wall plane (tsdf < 0 side).
    assert np.all(centers[:, 2] > 1.0 - 3 * cfg.voxel_size_m)
    assert np.all(centers[:, 2] < 1.0 + 3 * cfg.voxel_size_m)
    # No zero-feature voxels leak through.
    assert np.all(np.abs(features).sum(axis=1) > 0)


def test_pca_specification_and_colors():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(200, 16)).astype(np.float32)
    feats[:10] = 0.0  # zero rows must not influence the basis
    spec = get_pca_specification(feats)
    assert spec.projection_matrix.shape == (16, 3)
    colors, spec2 = colors_from_features(feats, spec)
    assert spec2 is spec
    assert colors.shape == (200, 3)
    assert colors.min() >= 0.0 and colors.max() <= 1.0
    # Reusing the spec reproduces identical colors (stable across frames).
    colors_again, _ = colors_from_features(feats, spec)
    np.testing.assert_array_equal(colors, colors_again)
    # Quantile bounds: ~1% of projected values clamp at each end.
    proj = feats.astype(np.float64) @ spec.projection_matrix.astype(np.float64)
    assert np.all(spec.lower_bound < spec.upper_bound)
    frac_below = (proj < spec.lower_bound).mean()
    assert 0.0 < frac_below < 0.05

    with pytest.raises(ValueError):
        get_pca_specification(np.zeros((5, 4), dtype=np.float32))


def test_feature_cubes_mesh_colors_differ_across_halves():
    mapper, cfg = fused_wall_mapper()
    vertices, triangles, colors, spec = get_feature_cubes_mesh(mapper)
    assert isinstance(spec, PCASpecification)
    assert vertices.shape[0] % 8 == 0
    n_cubes = vertices.shape[0] // 8
    assert triangles.shape == (12 * n_cubes, 3)
    assert colors.shape == (vertices.shape[0], 3)
    # The two feature populations map to distinct colors.
    centers = vertices.reshape(n_cubes, 8, 3).mean(axis=1)
    cube_colors = colors.reshape(n_cubes, 8, 3)[:, 0]
    left = cube_colors[centers[:, 0] < -0.05]
    right = cube_colors[centers[:, 0] > 0.05]
    assert left.shape[0] > 5 and right.shape[0] > 5
    assert np.linalg.norm(left.mean(0) - right.mean(0)) > 0.3


def test_compute_vertex_normals_simple_quad():
    # Two triangles in the z=0 plane -> all normals are +/-z.
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], dtype=np.float32
    )
    triangles = np.array([[0, 1, 2], [0, 2, 3]])
    normals = compute_vertex_normals(vertices, triangles)
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(normals[:, :2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-6)


def test_usda_export_round_trip(tmp_path):
    mapper, _ = fused_wall_mapper()
    vertices, triangles, colors, _ = get_feature_cubes_mesh(mapper)
    path = tmp_path / "mesh.usda"
    save_mesh_usda(str(path), vertices, triangles, colors)
    text = path.read_text()
    assert text.startswith("#usda 1.0")
    assert 'defaultPrim = "World"' in text
    assert 'def Mesh "reconstruction"' in text
    # Parse array sizes back out of the stage.
    points = re.search(r"point3f\[\] points = \[(.*?)\]", text, re.S).group(1)
    assert points.count("(") == vertices.shape[0]
    idx = re.search(r"int\[\] faceVertexIndices = \[(.*?)\]", text, re.S).group(1)
    assert len(idx.split(",")) == triangles.size
    counts = re.search(r"int\[\] faceVertexCounts = \[(.*?)\]", text, re.S).group(1)
    assert counts.split(", ") == ["3"] * triangles.shape[0]
    disp = re.search(
        r"color3f\[\] primvars:displayColor = \[(.*?)\]", text, re.S
    ).group(1)
    assert disp.count("(") == vertices.shape[0]
    assert 'interpolation = "vertex"' in text


def test_convert_maps_to_usd(tmp_path):
    mapper, _ = fused_wall_mapper()
    for i in range(2):
        mapper.save_map(str(tmp_path / f"{i:04d}.nvblox_map_static.nvblx"))
    out = convert_maps_to_usd(str(tmp_path))
    assert len(out) == 2
    for p in out:
        assert p.endswith(".usda")
        assert (tmp_path / p.split("/")[-1]).read_text().startswith("#usda 1.0")
    with pytest.raises(FileNotFoundError):
        convert_maps_to_usd(str(tmp_path), pattern="*no_such*")


def test_generate_reconstruction_figures_script(tmp_path):
    from nvblox_mindmap_tpu.scripts.generate_reconstruction_figures import main

    mapper, _ = fused_wall_mapper()
    map_path = tmp_path / "0001.nvblox_map_static.nvblx"
    mapper.save_map(str(map_path))
    out_dir = tmp_path / "figs"
    main([
        "--map_path", str(map_path), "--output_dir", str(out_dir),
    ])
    import imageio.v2 as imageio

    color = imageio.imread(out_dir / "0001_color_mesh.png")
    feature = imageio.imread(out_dir / "0001_feature_cubes_mesh.png")
    # Trimmed to shared non-white box: same size, content on both.
    assert color.shape == feature.shape
    assert (~np.all(color == 255, axis=-1)).sum() > 100
    assert (~np.all(feature == 255, axis=-1)).sum() > 100
    assert (out_dir / "pca_params.npz").exists()
    # Second run reuses the cached PCA basis without error.
    main(["--map_path", str(map_path), "--output_dir", str(out_dir)])
