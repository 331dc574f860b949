"""Surface Nets mesh extraction: sphere SDF and mapper color mesh."""
import os

import numpy as np

from nvblox_mindmap_tpu.mapping.surface_nets import save_mesh_ply, surface_nets


def sphere_sdf(n=32, radius=0.4, voxel=0.03125):
    coords = (np.arange(n) + 0.5) * voxel - n * voxel / 2
    x, y, z = np.meshgrid(coords, coords, coords, indexing="ij")
    sdf = np.sqrt(x**2 + y**2 + z**2) - radius
    return np.clip(sdf, -0.1, 0.1).astype(np.float32)


def test_surface_nets_sphere():
    n, radius, voxel = 32, 0.4, 0.03125
    tsdf = sphere_sdf(n, radius, voxel)
    weight = np.ones_like(tsdf)
    origin = np.full(3, -n * voxel / 2)
    vertices, triangles, cells = surface_nets(tsdf, weight, voxel, origin)
    assert len(vertices) > 100
    assert len(triangles) > 100
    # All vertices lie near the sphere surface.
    r = np.linalg.norm(vertices, axis=1)
    np.testing.assert_allclose(r, radius, atol=2 * voxel)
    # Triangles index valid vertices.
    assert triangles.min() >= 0 and triangles.max() < len(vertices)
    # A closed surface: every vertex is used by some triangle.
    used = np.zeros(len(vertices), dtype=bool)
    used[triangles.ravel()] = True
    assert used.mean() > 0.99
    # Cells within the dual lattice.
    assert cells.min() >= 0 and (cells < n - 1).all()


def test_surface_nets_respects_observation_mask():
    tsdf = sphere_sdf()
    weight = np.ones_like(tsdf)
    weight[:, :, : tsdf.shape[2] // 2] = 0  # half unobserved
    vertices, triangles, _ = surface_nets(
        tsdf, weight, 0.03125, np.full(3, -0.5)
    )
    # Only the observed hemisphere produces geometry.
    assert np.all(vertices[:, 2] > -0.06)


def test_mapper_color_mesh(tmp_path):
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
    from nvblox_mindmap_tpu.mapping.mapper import Mapper

    cfg = MappingConfig(
        voxel_size_m=0.02,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        min_integration_distance_m=0.1,
        feature_dim=4,
        max_feature_pages=512,
    )
    mapper = Mapper({MapperId.STATIC: cfg})
    H = W = 64
    K = np.asarray([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 1.0, np.float32)
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[..., 0] = 1.0  # red wall
    mapper.add_depth_frame(depth, np.eye(4), K)
    mapper.add_color_frame(rgb, np.eye(4), K)

    vertices, triangles, colors = mapper.get_color_mesh()
    assert len(vertices) > 50 and len(triangles) > 50
    # Mesh sits on the wall plane.
    np.testing.assert_allclose(vertices[:, 2], 1.0, atol=3 * cfg.voxel_size_m)
    # Colored vertices are red.
    lit = colors.sum(axis=1) > 0
    assert lit.sum() > 10
    np.testing.assert_allclose(colors[lit, 0], 1.0, atol=0.05)
    np.testing.assert_allclose(colors[lit, 1:], 0.0, atol=0.05)

    path = str(tmp_path / "mesh.ply")
    save_mesh_ply(path, vertices, triangles, colors)
    text = open(path).read()
    assert f"element face {len(triangles)}" in text
