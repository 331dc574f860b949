"""Depth-image backprojection to world-frame point clouds.

Matches the reference pipeline (mindmap/image_processing/backprojection.py):
pixel grid -> K^-1 unprojection scaled by depth -> extrinsic transform; NaN/inf
points are zeroed. Everything is a batched matmul, so it runs on the MXU.

Camera pose quaternions here are **wxyz** (transforms3d convention used by the
reference's ``pose_to_homo``).
"""
from __future__ import annotations

import jax.numpy as jnp

from nvblox_mindmap_tpu.geometry.rotations import quaternion_to_matrix


def pose_to_homo(position: jnp.ndarray, quat_wxyz: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) position + (B, 4) wxyz quaternion -> (B, 4, 4) homogeneous matrix."""
    B = position.shape[0]
    rot = quaternion_to_matrix(quat_wxyz)
    top = jnp.concatenate([rot, position[:, :, None]], axis=-1)  # (B, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=position.dtype), (B, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def backproject_depth(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, transform: jnp.ndarray
) -> jnp.ndarray:
    """Backproject a batch of depth images to world points.

    Args:
        depth: (B, H, W) metric depth.
        intrinsics: (B, 3, 3) camera matrices.
        transform: (B, 4, 4) camera-to-world transforms.

    Returns:
        (B, H, W, 3) world-frame points; invalid (nan/inf) values become 0.
    """
    B, H, W = depth.shape
    jj, ii = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    uv1 = jnp.stack([ii, jj, jnp.ones_like(ii)], axis=-1).reshape(1, H * W, 3)
    k_inv = jnp.linalg.inv(intrinsics)  # (B, 3, 3)
    rays = uv1 @ jnp.swapaxes(k_inv, -1, -2)  # (B, HW, 3)
    xyz_cam = depth.reshape(B, H * W, 1) * rays
    rot = transform[:, :3, :3]
    trans = transform[:, :3, 3]
    xyz_world = xyz_cam @ jnp.swapaxes(rot, -1, -2) + trans[:, None, :]
    xyz_world = jnp.nan_to_num(xyz_world, nan=0.0, posinf=0.0, neginf=0.0)
    return xyz_world.reshape(B, H, W, 3)


def get_camera_pointcloud(
    intrinsics: jnp.ndarray,
    depth: jnp.ndarray,
    position: jnp.ndarray,
    orientation_wxyz: jnp.ndarray,
) -> jnp.ndarray:
    """World-frame point cloud from depth + camera pose.

    Args:
        intrinsics: (B, 3, 3) or (3, 3).
        depth: (B, H, W) or (H, W).
        position: (B, 3) or (3,).
        orientation_wxyz: (B, 4) or (4,) quaternion.

    Returns:
        (B, H, W, 3) points (batch dim squeezed if input was unbatched).
    """
    squeeze = depth.ndim == 2
    if squeeze:
        intrinsics, depth = intrinsics[None], depth[None]
        position, orientation_wxyz = position[None], orientation_wxyz[None]
    transform = pose_to_homo(position, orientation_wxyz)
    pcd = backproject_depth(depth, intrinsics, transform)
    return pcd[0] if squeeze else pcd
