"""Image/geometry utility parity vs the reference torch modules.

Covers backprojection, mask operations, PCA application, vertex sampling
(deterministic paths), and RGB model-input conversion. The reference modules'
third-party deps that are not in this image (transforms3d, torchtyping) are
shimmed with independent equivalents (scipy for quat->matrix). Skipped when
the read-only reference checkout is absent.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "mindmap")),
    reason="reference checkout not available",
)
torch = pytest.importorskip("torch")


def _load(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref():
    from scipy.spatial.transform import Rotation

    # transforms3d shim: quat2mat takes wxyz; scipy takes xyzw - an
    # independent implementation, so the parity check is not circular.
    t3d = type(sys)("transforms3d")
    t3d.quaternions = type(sys)("transforms3d.quaternions")
    t3d.quaternions.quat2mat = lambda q: Rotation.from_quat(
        np.asarray(q)[[1, 2, 3, 0]]
    ).as_matrix()
    sys.modules["transforms3d"] = t3d
    sys.modules["transforms3d.quaternions"] = t3d.quaternions

    # torchtyping shim: TensorType is only used in annotations.
    tt = type(sys)("torchtyping")

    class _TT:
        def __class_getitem__(cls, item):
            return torch.Tensor

    tt.TensorType = _TT
    sys.modules["torchtyping"] = tt

    ip = os.path.join(REFERENCE, "mindmap/image_processing")

    class NS:
        bp = _load("ref_bp", os.path.join(ip, "backprojection.py"))
        pca = _load("ref_pca", os.path.join(ip, "pca.py"))
        masks = _load("ref_masks", os.path.join(ip, "image_mask_operations.py"))
        conv = _load("ref_conv", os.path.join(ip, "image_conversions.py"))
        vs = _load(
            "ref_vs",
            os.path.join(REFERENCE, "mindmap/data_loading/vertex_sampling.py"),
        )

    return NS


def test_pose_to_homo_matches_reference(ref):
    from nvblox_mindmap_tpu.ops.backprojection import pose_to_homo

    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)
    quat = rng.normal(size=(4, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    poses = np.concatenate([pos, quat], -1)
    ref_T = ref.bp.pose_to_homo(torch.from_numpy(poses)).numpy()
    ours_T = np.asarray(pose_to_homo(jnp.asarray(pos), jnp.asarray(quat)))
    np.testing.assert_allclose(ours_T, ref_T, atol=1e-5)


def test_backprojection_matches_reference(ref):
    from nvblox_mindmap_tpu.ops.backprojection import (
        backproject_depth,
        pose_to_homo,
    )

    rng = np.random.default_rng(1)
    B, H, W = 2, 12, 16
    depth = rng.uniform(0.3, 2.0, size=(B, H, W)).astype(np.float32)
    K = np.broadcast_to(
        np.asarray([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]], np.float32),
        (B, 3, 3),
    ).copy()
    pos = rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)
    quat = rng.normal(size=(B, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    T = np.asarray(pose_to_homo(jnp.asarray(pos), jnp.asarray(quat)))

    ref_pcd = ref.bp.backproject_depth_to_pointcloud(
        torch.from_numpy(depth), torch.from_numpy(K), torch.from_numpy(T)
    ).numpy()  # (B, H*W, 3)
    ours = np.asarray(
        backproject_depth(jnp.asarray(depth), jnp.asarray(K), jnp.asarray(T))
    ).reshape(B, H * W, 3)
    np.testing.assert_allclose(ours, ref_pcd, atol=1e-4)


def test_erode_mask_matches_reference(ref):
    from nvblox_mindmap_tpu.ops.masks import erode_mask

    rng = np.random.default_rng(2)
    mask = rng.random((20, 24)) > 0.3
    for iters in (1, 2):
        ref_m = ref.masks.erode_mask(
            torch.from_numpy(mask), kernel_size=3, iterations=iters
        ).numpy()
        ours = np.asarray(
            erode_mask(jnp.asarray(mask), kernel_size=3, iterations=iters)
        )
        np.testing.assert_array_equal(ours, ref_m)


def test_border_mask_matches_reference(ref):
    from nvblox_mindmap_tpu.ops.masks import get_border_mask

    ref_m, bh, bw = ref.masks.get_border_mask(
        torch.Size((16, 20)), 10.0, torch.device("cpu")
    )
    ours = np.asarray(get_border_mask((16, 20), 10.0))
    np.testing.assert_array_equal(ours, ref_m.numpy())
    assert (bh, bw) == (1, 2)


def test_downscale_mask_matches_reference(ref):
    from nvblox_mindmap_tpu.ops.masks import downscale_mask

    rng = np.random.default_rng(3)
    mask = rng.random((2, 1, 16, 24)) > 0.2
    ref_m = ref.masks.downscale_mask(torch.from_numpy(mask), 4).numpy()
    ours = np.asarray(downscale_mask(jnp.asarray(mask), 4))
    np.testing.assert_array_equal(ours, ref_m)


def test_pca_apply_matches_reference(ref):
    """Same projection matrix + bounds => same projected colors."""
    from nvblox_mindmap_tpu.image.pca import PcaProjection, apply_pca

    rng = np.random.default_rng(4)
    feats = rng.normal(size=(200, 16)).astype(np.float32)
    proj = rng.normal(size=(16, 3)).astype(np.float32)
    low = np.asarray([-2.0, -1.5, -1.0], np.float32)
    high = np.asarray([2.0, 1.5, 1.0], np.float32)

    ref_rgb = ref.pca.apply_pca(
        torch.from_numpy(feats),
        (torch.from_numpy(proj), torch.from_numpy(low), torch.from_numpy(high)),
    ).numpy()
    # The reference's projection tuple has no mean (centering happens only
    # at fit time); the equivalent here is mean = 0.
    ours = apply_pca(feats, PcaProjection(np.zeros(16, np.float32), proj, low, high))
    np.testing.assert_allclose(np.asarray(ours), ref_rgb, atol=1e-5)


def test_vertex_sampling_deterministic_paths_match_reference(ref):
    from nvblox_mindmap_tpu.data.vertex_sampling import (
        VertexSamplingMethod,
        sample_to_n_vertices,
    )

    rng = np.random.default_rng(5)
    verts = rng.normal(size=(30, 3)).astype(np.float32)
    feats = rng.normal(size=(30, 5)).astype(np.float32)

    # Down-sample by z (the reference's LOWEST actually keeps highest z).
    rv, rf = ref.vs.select_n_lowest_z_vertices(
        torch.from_numpy(verts), torch.from_numpy(feats), 10
    )
    ov, of, om = sample_to_n_vertices(
        verts, feats, 10, VertexSamplingMethod.LOWEST
    )
    np.testing.assert_array_equal(ov, rv.numpy())
    np.testing.assert_array_equal(of, rf.numpy())
    assert om.all()

    # Zero padding + valid mask.
    rv, rf, rm = ref.vs.pad_with_zeros(
        torch.from_numpy(verts), torch.from_numpy(feats), 40
    )
    ov, of, om = sample_to_n_vertices(
        verts, feats, 40, VertexSamplingMethod.RANDOM_WITHOUT_REPLACEMENT,
        rng=np.random.default_rng(0),
    )
    np.testing.assert_array_equal(ov, rv.numpy())
    np.testing.assert_array_equal(of, rf.numpy())
    np.testing.assert_array_equal(om, rm.numpy())


def test_rgb_model_input_matches_reference(ref):
    from nvblox_mindmap_tpu.image.conversions import convert_rgb_to_model_input

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(8, 10, 3)).astype(np.float32)
    ref_chw = ref.conv.convert_rgb_to_model_input(torch.from_numpy(img)).numpy()
    ours = convert_rgb_to_model_input(img)  # channel-last here
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 0), ref_chw, atol=1e-6
    )


@pytest.fixture(scope="module")
def ref_transformer(ref):
    """Load the reference sample_transformer (needs tap + package shims)."""
    tap_mod = type(sys)("tap")

    class _Tap:
        pass

    tap_mod.Tap = _Tap
    sys.modules.setdefault("tap", tap_mod)
    for pkg in (
        "mindmap", "mindmap.geometry", "mindmap.tasks", "mindmap.mapping",
        "mindmap.data_loading", "mindmap.image_processing",
    ):
        sys.modules.setdefault(pkg, type(sys)(pkg))
    _load(
        "mindmap.geometry.pytorch3d_transforms",
        os.path.join(REFERENCE, "mindmap/geometry/pytorch3d_transforms.py"),
    )
    _load("mindmap.tasks.tasks", os.path.join(REFERENCE, "mindmap/tasks/tasks.py"))
    _load(
        "mindmap.mapping.nvblox_mapper_constants",
        os.path.join(REFERENCE, "mindmap/mapping/nvblox_mapper_constants.py"),
    )
    _load(
        "mindmap.data_loading.vertex_sampling",
        os.path.join(REFERENCE, "mindmap/data_loading/vertex_sampling.py"),
    )
    _load(
        "mindmap.image_processing.image_conversions",
        os.path.join(REFERENCE, "mindmap/image_processing/image_conversions.py"),
    )
    return _load(
        "ref_sample_transformer",
        os.path.join(REFERENCE, "mindmap/data_loading/sample_transformer.py"),
    )


def test_apply_transform_to_sample_matches_reference(ref_transformer):
    from nvblox_mindmap_tpu.data.transforms import apply_transform_to_sample

    rng = np.random.default_rng(0)
    translation = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
    quat = rng.normal(size=4).astype(np.float32)
    quat /= np.linalg.norm(quat)

    points = rng.normal(size=(12, 3)).astype(np.float32)
    ref_pts = ref_transformer.apply_random_transform_to_sample(
        torch.from_numpy(points), torch.from_numpy(translation),
        torch.from_numpy(quat),
    ).numpy()
    ours_pts = apply_transform_to_sample(points, translation, quat)
    np.testing.assert_allclose(ours_pts, ref_pts, atol=1e-5)

    q8 = rng.normal(size=(5, 4)).astype(np.float32)
    q8 /= np.linalg.norm(q8, axis=-1, keepdims=True)
    poses = np.concatenate(
        [rng.normal(size=(5, 3)).astype(np.float32), q8,
         rng.integers(0, 2, (5, 1)).astype(np.float32)], -1,
    )
    ref_poses = ref_transformer.apply_random_transform_to_sample(
        torch.from_numpy(poses), torch.from_numpy(translation),
        torch.from_numpy(quat),
    ).numpy()
    ours_poses = apply_transform_to_sample(poses, translation, quat)
    np.testing.assert_allclose(ours_poses, ref_poses, atol=1e-5)


def test_rgb_depth_transformers_match_reference(ref_transformer):
    from nvblox_mindmap_tpu.data.transforms import (
        DepthTransformer,
        RgbTransformer,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (6, 7, 3)).astype(np.float32)
    ref_rgb = ref_transformer.RgbTransformer()(torch.from_numpy(img)).numpy()
    ours_rgb = RgbTransformer()(img)  # channel-last here
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours_rgb), -1, 0), ref_rgb, atol=1e-6
    )

    depth_u16 = rng.integers(0, 5000, (6, 7)).astype(np.uint16)
    ref_d = ref_transformer.DepthTransformer()(
        torch.from_numpy(depth_u16.astype(np.int32))
    ).numpy()
    ours_d = DepthTransformer()(depth_u16)
    np.testing.assert_allclose(np.asarray(ours_d), ref_d, atol=1e-6)
