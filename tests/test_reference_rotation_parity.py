"""Rotation-conversion parity against the reference's pytorch3d_transforms.

Executes the reference's standalone torch rotation module (read-only checkout
at /root/reference; skipped when absent) on random inputs and checks every
public conversion this framework re-implements in jnp gives identical results.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nvblox_mindmap_tpu.geometry import rotations as R

REFERENCE = "/root/reference/mindmap/geometry/pytorch3d_transforms.py"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(REFERENCE), reason="reference checkout not available"
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
    return _load("ref_p3d", REFERENCE)


@pytest.fixture(scope="module")
def ref_utils():
    # geometry/utils.py holds the ortho-6D convention the model actually
    # uses (columns); pytorch3d_transforms' 6D (rows) is unused by the model.
    return _load(
        "ref_geo_utils", "/root/reference/mindmap/geometry/utils.py"
    )


@pytest.fixture(scope="module")
def quats():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def mats(quats):
    return np.asarray(R.quaternion_to_matrix(jnp.asarray(quats)))


def _check(ours, theirs, atol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=atol)


def test_quaternion_to_matrix(ref, quats):
    _check(
        R.quaternion_to_matrix(jnp.asarray(quats)),
        ref.quaternion_to_matrix(torch.from_numpy(quats)),
    )


def test_matrix_to_quaternion(ref, mats):
    _check(
        R.matrix_to_quaternion(jnp.asarray(mats)),
        ref.matrix_to_quaternion(torch.from_numpy(mats)),
    )


def test_rotation_6d_roundtrip(ref_utils, mats):
    six = R.matrix_to_rotation_6d(jnp.asarray(mats))
    _check(
        six,
        ref_utils.get_ortho6d_from_rotation_matrix(torch.from_numpy(mats)),
    )
    # Perturbed (non-orthonormal) 6D input exercises the Gram-Schmidt path.
    noisy = np.asarray(six) + np.random.default_rng(1).normal(
        scale=0.1, size=six.shape
    ).astype(np.float32)
    _check(
        R.rotation_6d_to_matrix(jnp.asarray(noisy)),
        ref_utils.compute_rotation_matrix_from_ortho6d(
            torch.from_numpy(noisy)
        ),
    )


def test_quaternion_algebra(ref, quats):
    a = torch.from_numpy(quats[:32])
    b = torch.from_numpy(quats[32:])
    ja, jb = jnp.asarray(quats[:32]), jnp.asarray(quats[32:])
    _check(R.quaternion_multiply(ja, jb), ref.quaternion_multiply(a, b))
    _check(R.quaternion_invert(ja), ref.quaternion_invert(a))
    _check(R.standardize_quaternion(ja), ref.standardize_quaternion(a))
    pts = np.random.default_rng(2).normal(size=(32, 3)).astype(np.float32)
    _check(
        R.quaternion_apply(ja, jnp.asarray(pts)),
        ref.quaternion_apply(a, torch.from_numpy(pts)),
    )


def test_axis_angle(ref, mats):
    aa = np.asarray(R.matrix_to_axis_angle(jnp.asarray(mats)))
    _check(aa, ref.matrix_to_axis_angle(torch.from_numpy(mats)), atol=1e-4)
    _check(
        R.axis_angle_to_matrix(jnp.asarray(aa)),
        ref.axis_angle_to_matrix(torch.from_numpy(aa)),
    )
    _check(
        R.axis_angle_to_quaternion(jnp.asarray(aa)),
        ref.axis_angle_to_quaternion(torch.from_numpy(aa)),
    )
    q = np.asarray(R.axis_angle_to_quaternion(jnp.asarray(aa)))
    _check(
        R.quaternion_to_axis_angle(jnp.asarray(q)),
        ref.quaternion_to_axis_angle(torch.from_numpy(q)),
        atol=1e-4,
    )


@pytest.mark.parametrize("convention", ["XYZ", "ZYX", "YXZ"])
def test_euler(ref, mats, convention):
    rng = np.random.default_rng(3)
    angles = rng.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float32)
    _check(
        R.euler_angles_to_matrix(jnp.asarray(angles), convention),
        ref.euler_angles_to_matrix(torch.from_numpy(angles), convention),
    )
    _check(
        R.matrix_to_euler_angles(jnp.asarray(mats), convention),
        ref.matrix_to_euler_angles(torch.from_numpy(mats), convention),
        atol=1e-4,
    )
