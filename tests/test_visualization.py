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
