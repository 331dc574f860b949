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


def test_device_surface_nets_matches_host():
    """The XLA Surface Nets pass reproduces the host mesh: same vertex set
    (within fp tolerance), same triangle count, watertight on a wall."""
    import jax

    from nvblox_mindmap_tpu.mapping import voxel_grid as vg
    from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
    from nvblox_mindmap_tpu.mapping.mapper import Mapper

    cfg = MappingConfig(
        voxel_size_m=0.02,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        feature_dim=4,
        max_feature_pages=256,
        valid_depth_mask_erosion_iterations=1,
        static_mask_erosion_iterations=1,
    )
    mapper = Mapper({MapperId.STATIC: cfg})
    H = W = 64
    f = 64.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    rng = np.random.default_rng(0)
    depth = (1.0 + 0.03 * rng.standard_normal((H, W))).astype(np.float32)
    rgb = np.full((H, W, 3), 0.6, np.float32)
    mapper.add_depth_frame(depth, T, K)
    mapper.add_color_frame(rgb, T, K)

    # Host mesh.
    mapper.update_color_mesh(MapperId.STATIC, backend="host")
    hv, ht, hc = mapper.get_color_mesh(MapperId.STATIC)
    # Device mesh.
    mapper.update_color_mesh(MapperId.STATIC, backend="device")
    dv, dt, dc = mapper.get_color_mesh(MapperId.STATIC)

    assert len(dv) == len(hv) > 50
    assert len(dt) == len(ht) > 50
    # Same vertex set (device emits in flat-cell order == host argwhere order).
    np.testing.assert_allclose(dv, hv, atol=1e-5)
    np.testing.assert_allclose(dc, hc, atol=1e-6)
    # Triangles reference valid vertices.
    assert dt.min() >= 0 and dt.max() < len(dv)
    # Triangle sets are identical up to ordering.
    def tri_key(t):
        return set(map(tuple, np.sort(np.asarray(t), axis=1)))

    assert tri_key(dt) == tri_key(ht)


def test_device_surface_nets_budget_overflow_detected():
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.mapping import voxel_grid as vg
    from nvblox_mindmap_tpu.mapping.constants import MappingConfig

    cfg = MappingConfig(
        voxel_size_m=0.02,
        aabb_min_m=(-0.5, -0.5, 0.5),
        aabb_max_m=(0.5, 0.5, 1.5),
        feature_dim=4,
        max_feature_pages=128,
        valid_depth_mask_erosion_iterations=1,
        static_mask_erosion_iterations=1,
    )
    state = vg.create_state(cfg)
    H = W = 64
    f = 64.0
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    T = jnp.eye(4)
    depth = jnp.full((H, W), 1.0)
    state = vg.integrate_depth(state, cfg, depth, T, K)

    out = vg.extract_surface_mesh_device(state, cfg, max_vertices=8,
                                         max_triangles=8)
    _, vertex_valid, _, _, tri_valid, n_vertices, n_triangles = out
    assert int(n_vertices) > 8  # overflow reported
    assert int(np.asarray(vertex_valid).sum()) == 8
    assert int(np.asarray(tri_valid).sum()) <= 8


def test_triangle_winding_consistent_across_axes():
    """Face normals point consistently toward the negative-TSDF side for
    axis-aligned planes along ALL three axes (the y-axis quads' (o1, o2)
    frame is left-handed and needs inverted winding)."""
    from nvblox_mindmap_tpu.mapping.surface_nets import surface_nets

    n = 12
    weight = np.ones((n, n, n), np.float32)
    for axis in range(3):
        coord = np.arange(n, dtype=np.float32)
        shape = [1, 1, 1]
        shape[axis] = n
        tsdf = np.broadcast_to(
            (coord - 5.6).reshape(shape) * 0.01, (n, n, n)
        ).copy()
        vertices, triangles, _ = surface_nets(
            tsdf, weight, 0.01, np.zeros(3), truncation=0.04
        )
        assert len(triangles) > 0, f"axis {axis}: no faces"
        a = vertices[triangles[:, 0]]
        b = vertices[triangles[:, 1]]
        c = vertices[triangles[:, 2]]
        normals = np.cross(b - a, c - a)
        comp = normals[:, axis]
        nonzero = np.abs(comp) > 1e-12
        assert nonzero.any()
        # tsdf increases along +axis => inside (negative) is -axis side;
        # outward normals all point along -axis, consistently.
        same_sign = (comp[nonzero] < 0).all() or (comp[nonzero] > 0).all()
        assert same_sign, f"axis {axis}: mixed winding"
        assert (comp[nonzero] < 0).all(), f"axis {axis}: normals point inward"
