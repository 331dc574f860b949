"""PCA, PLY export, tensor grids, video writer."""
import os

import numpy as np

from nvblox_mindmap_tpu.image.conversions import (
    add_depth_noise,
    depth_to_uint16,
    uint16_to_depth,
)
from nvblox_mindmap_tpu.image.pca import apply_pca, apply_pca_return_projection, fit_pca
from nvblox_mindmap_tpu.visualization.visualizer import (
    TensorVisualizer,
    VideoWriter,
    attention_to_colors,
    save_feature_pointcloud_ply,
    save_pointcloud_ply,
)


def test_pca_produces_unit_range_rgb():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 32))
    rgb, proj = apply_pca_return_projection(feats)
    assert rgb.shape == (500, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # Re-applying the same projection to the same data gives the same colors.
    rgb2 = apply_pca(feats, proj)
    np.testing.assert_allclose(rgb, rgb2, atol=1e-6)


def test_pca_low_dim_and_rank_deficient():
    """Feature dim C < 3 zero-pads the basis (no broadcast crash), and a
    rank-deficient fit zeros its ~0-eigenvalue noise directions."""
    rng = np.random.default_rng(4)
    proj = fit_pca(rng.random((10, 2)))
    assert proj.components.shape == (2, 3)
    assert np.all(proj.components[:, 2] == 0.0)  # padded column stays zero
    rgb = apply_pca(rng.random((5, 2)), proj)
    assert rgb.shape == (5, 3)
    # 2 samples of 8-dim features: at most 1 centered direction has variance.
    proj2 = fit_pca(rng.random((2, 8)))
    nonzero_cols = np.any(proj2.components != 0.0, axis=0)
    assert nonzero_cols.sum() <= 1


def test_pca_separates_clusters():
    rng = np.random.default_rng(1)
    a = rng.normal(0, 0.1, size=(100, 16))
    b = rng.normal(0, 0.1, size=(100, 16)) + 5.0
    feats = np.concatenate([a, b])
    rgb, _ = apply_pca_return_projection(feats)
    # The first principal component separates the clusters.
    assert abs(rgb[:100, 0].mean() - rgb[100:, 0].mean()) > 0.5


def test_ply_export(tmp_path):
    pts = np.random.default_rng(2).normal(size=(10, 3)).astype(np.float32)
    feats = np.random.default_rng(3).normal(size=(10, 8))
    path = str(tmp_path / "cloud.ply")
    save_feature_pointcloud_ply(path, pts, feats)
    text = open(path).read()
    assert "element vertex 10" in text
    assert text.count("\n") >= 10 + 10  # header + points

    save_pointcloud_ply(str(tmp_path / "plain.ply"), pts)
    assert os.path.exists(tmp_path / "plain.ply")


def test_attention_colors():
    w = np.asarray([0.0, 0.5, 1.0])
    colors = attention_to_colors(w)
    assert colors.shape == (3, 3)
    np.testing.assert_allclose(colors[0], [0, 0, 0], atol=1e-6)
    assert colors[2, 0] == 1.0 and colors[2, 1] == 1.0  # yellow at max


def test_tensor_visualizer_grid(tmp_path):
    viz = TensorVisualizer(output_dir=str(tmp_path))
    viz.register_tensor("feat", (4, 8, 8), nrow=2)
    viz.enable()
    viz.set("feat", np.random.default_rng(0).uniform(size=(4, 8, 8)))
    viz.flush(step=3, prefix="train_")
    assert os.path.exists(tmp_path / "train_feat_3.png")
    # Disabled visualizer ignores set().
    viz.disable()
    viz.set("feat", np.zeros((4, 8, 8)))
    viz.flush(step=4)
    assert not os.path.exists(tmp_path / "feat_4.png")


def test_video_writer(tmp_path):
    path = str(tmp_path / "out.mp4")
    writer = VideoWriter(path, fps=5)
    for i in range(3):
        writer.add_frame(np.full((16, 16, 3), i * 0.3))
    writer.close()
    # Either the mp4 or the png fallback must exist.
    assert os.path.exists(path) or os.path.exists(str(tmp_path / "out_00000.png"))


def test_depth_conversions():
    depth = np.asarray([[0.5, 1.234]])
    u16 = depth_to_uint16(depth)
    assert u16.dtype == np.uint16
    np.testing.assert_allclose(uint16_to_depth(u16), depth, atol=1e-3)


def test_depth_noise():
    rng = np.random.default_rng(0)
    depth = np.full((64, 64), 1.0, dtype=np.float32)
    noisy = add_depth_noise(depth, rng)
    assert noisy.shape == depth.shape
    assert (noisy == 0).sum() > 0  # some dropouts
    valid = noisy[noisy > 0]
    assert abs(valid.mean() - 1.0) < 0.01


def test_voxel_mesh(tmp_path):
    """get_voxel_mesh makes one closed cube per center; PLY roundtrip."""
    from nvblox_mindmap_tpu.mapping.surface_nets import save_mesh_ply
    from nvblox_mindmap_tpu.visualization.visualizer import get_voxel_mesh

    centers = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    verts, tris, vcols = get_voxel_mesh(centers, 0.1, colors)
    assert verts.shape == (16, 3) and tris.shape == (24, 3)
    assert vcols.shape == (16, 3)
    # Cube 0 spans +/- 0.05 around the origin.
    np.testing.assert_allclose(verts[:8].min(0), [-0.05] * 3)
    np.testing.assert_allclose(verts[:8].max(0), [0.05] * 3)
    # Every triangle indexes within its own cube's 8 vertices.
    assert (tris[:12] < 8).all() and (tris[12:] >= 8).all()
    # Each cube face set covers all 8 corners; closed surface => every
    # undirected edge is shared by exactly 2 triangles.
    edges = {}
    for t in tris[:12]:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges[frozenset((a, b))] = edges.get(frozenset((a, b)), 0) + 1
    assert all(v == 2 for v in edges.values())
    path = str(tmp_path / "voxels.ply")
    save_mesh_ply(path, verts, tris, vcols)
    assert os.path.getsize(path) > 0


def test_voxel_center_grids():
    from nvblox_mindmap_tpu.embodiments.registry import Tasks
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig
    from nvblox_mindmap_tpu.mapping.voxel_grid import (
        get_voxel_center_grids,
        voxel_centers_flat,
    )

    cfg = MappingConfig.for_task(Tasks.CUBE_STACKING, feature_dim=8)
    grids = np.asarray(get_voxel_center_grids(cfg))
    assert grids.shape == cfg.grid_shape + (3,)
    np.testing.assert_allclose(
        grids.reshape(-1, 3), np.asarray(voxel_centers_flat(cfg))
    )
    # First center is half a voxel inside the AABB min corner.
    np.testing.assert_allclose(
        grids[0, 0, 0],
        np.asarray(cfg.aabb_min_m) + 0.5 * cfg.voxel_size_m,
        atol=1e-6,
    )


def test_compute_pca_basis_from_dataset():
    from nvblox_mindmap_tpu.image.pca import apply_pca
    from nvblox_mindmap_tpu.visualization.visualizer import (
        compute_pca_basis_from_dataset,
    )

    rng = np.random.default_rng(0)
    loader = [{"vertex_features": rng.normal(size=(1, 32, 8))} for _ in range(5)]
    proj = compute_pca_basis_from_dataset(loader, max_num_samples_for_pca=3)
    rgb = apply_pca(np.asarray(loader[0]["vertex_features"][0], np.float32), proj)
    assert rgb.shape == (32, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        compute_pca_basis_from_dataset([], max_num_samples_for_pca=3)


def test_pink_green_color_map():
    """Diverging colormap: green start, pale middle, pink end, all in [0,1]
    (functional equivalent of the reference's hardcoded LUT)."""
    from nvblox_mindmap_tpu.visualization.visualizer import (
        get_pink_green_color_map,
        values_to_pink_green,
    )

    cmap = get_pink_green_color_map()
    assert cmap.shape == (256, 3)
    assert cmap.min() >= 0.0 and cmap.max() <= 1.0
    # Start dark green (G dominates), end dark pink (R/B dominate G).
    assert cmap[0, 1] > cmap[0, 0] and cmap[0, 1] > cmap[0, 2]
    assert cmap[-1, 0] > cmap[-1, 1] and cmap[-1, 2] > cmap[-1, 1]
    # Pale (bright) midpoint.
    assert cmap[128].min() > 0.85

    colors = values_to_pink_green(np.asarray([[0.0, 0.5], [1.0, 0.25]]))
    assert colors.shape == (2, 2, 3)
    np.testing.assert_allclose(colors[0, 0], cmap[0], atol=1e-6)
    np.testing.assert_allclose(colors[1, 0], cmap[-1], atol=1e-6)
    # Constant input maps to the low end without dividing by zero.
    flat = values_to_pink_green(np.ones(5))
    assert flat.shape == (5, 3)
