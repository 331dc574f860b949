"""TSDF + deep-feature voxel grid: functional state and XLA integrators.

TPU-native equivalent of the nvblox core (see SURVEY.md section 2.2; the
reference drives it through nvblox_torch:
mapping/helpers/nvblox_mapping_helpers.py:79-261). Design:

- The TSDF lives **dense over the task AABB** (task workspaces are <= ~2 m at
  1 cm voxels => a few million voxels, trivially HBM-resident). Integration is
  a *gather* pass - every voxel center projects into the depth image - which
  vectorizes perfectly on TPU, instead of nvblox's CUDA raycast scatter.
- Per-voxel deep features (e.g. 768-d) are too big dense, so they live in a
  **block-paged pool** mirroring nvblox's 8^3 voxel blocks: an int32 page
  table over the block grid plus a (P, 512, F) fp16 page pool. Pages are
  allocated for blocks that contain near-surface voxels inside the camera
  frustum; allocation is a cumsum over the block grid (no host sync).
- All ops are pure: state in, state out; everything jits, so a fusion step
  (depth + feature + decay) compiles to one XLA program.

Shapes are static; the voxel grid shape comes from MappingConfig.grid_shape.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nvblox_mindmap_tpu.mapping.constants import MappingConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VoxelGridState:
    """Mapper state pytree."""

    tsdf: jnp.ndarray  # (X, Y, Z) f32, truncated signed distance
    weight: jnp.ndarray  # (X, Y, Z) f32, 0 = unobserved
    page_table: jnp.ndarray  # (BX, BY, BZ) i32, -1 = unallocated
    page_to_block: jnp.ndarray  # (P,) i32 flat block index, -1 = free
    num_pages: jnp.ndarray  # () i32
    feat: jnp.ndarray  # (P, B^3, F) f16 weighted-average features
    feat_weight: jnp.ndarray  # (P, B^3) f32
    color: jnp.ndarray  # (P, B^3, 3) f16 rgb in [0,1]
    color_weight: jnp.ndarray  # (P, B^3) f32


def create_state(config: MappingConfig) -> VoxelGridState:
    X, Y, Z = config.grid_shape
    BX, BY, BZ = config.block_grid_shape
    P = config.max_feature_pages
    B3 = config.block_size**3
    F = config.feature_dim
    return VoxelGridState(
        tsdf=jnp.full((X, Y, Z), config.truncation_distance_m, dtype=jnp.float32),
        weight=jnp.zeros((X, Y, Z), dtype=jnp.float32),
        page_table=jnp.full((BX, BY, BZ), -1, dtype=jnp.int32),
        page_to_block=jnp.full((P,), -1, dtype=jnp.int32),
        num_pages=jnp.zeros((), dtype=jnp.int32),
        feat=jnp.zeros((P, B3, F), dtype=jnp.float16),
        feat_weight=jnp.zeros((P, B3), dtype=jnp.float32),
        color=jnp.zeros((P, B3, 3), dtype=jnp.float16),
        color_weight=jnp.zeros((P, B3), dtype=jnp.float32),
    )


# -----------------------------------------------------------------------------
# Geometry helpers
# -----------------------------------------------------------------------------


def voxel_centers_flat(config: MappingConfig) -> jnp.ndarray:
    """(V, 3) world coordinates of all voxel centers (V = X*Y*Z)."""
    X, Y, Z = config.grid_shape
    xs = jnp.arange(X, dtype=jnp.float32)
    ys = jnp.arange(Y, dtype=jnp.float32)
    zs = jnp.arange(Z, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    idx = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    origin = jnp.asarray(config.aabb_min_m, dtype=jnp.float32)
    return origin + (idx + 0.5) * config.voxel_size_m


def _project(
    points_w: jnp.ndarray, T_WC: jnp.ndarray, K: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World points -> (u, v, z) pixel coords + camera-frame depth.

    T_WC is camera-to-world; K the 3x3 intrinsic matrix.
    """
    R = T_WC[:3, :3]
    t = T_WC[:3, 3]
    p_c = (points_w - t) @ R  # R^T (p - t)
    z = p_c[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * p_c[..., 0] / safe_z + K[0, 2]
    v = K[1, 1] * p_c[..., 1] / safe_z + K[1, 2]
    return u, v, z


def _bilinear_or_nearest_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Nearest-neighbor gather of img (H, W[, C]) at float pixel coords."""
    H, W = img.shape[:2]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    return img[vi, ui], ui, vi


# -----------------------------------------------------------------------------
# TSDF integration
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def integrate_depth(
    state: VoxelGridState,
    config: MappingConfig,
    depth: jnp.ndarray,
    T_WC: jnp.ndarray,
    K: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> VoxelGridState:
    """Fuse one masked depth frame into the TSDF (projective update).

    Args:
        depth: (H, W) metric depth (0 / non-finite = invalid).
        T_WC: (4, 4) camera-to-world transform.
        K: (3, 3) intrinsics for the depth image resolution.
        mask: optional (H, W) bool; False pixels are not integrated.
    """
    X, Y, Z = config.grid_shape
    trunc = config.truncation_distance_m
    centers = voxel_centers_flat(config)
    u, v, z = _project(centers, T_WC, K)

    H, W = depth.shape
    in_image = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    surf, ui, vi = _bilinear_or_nearest_gather(depth, u, v)
    surf = jnp.nan_to_num(surf, nan=0.0, posinf=0.0, neginf=0.0)
    pixel_ok = surf > 0
    if mask is not None:
        pixel_ok &= mask[vi, ui]
    depth_ok = (
        (z > config.min_integration_distance_m)
        & (z < config.projective_integrator_max_integration_distance_m)
    )
    sdf = surf - z
    update = in_image & pixel_ok & depth_ok & (sdf > -trunc)
    sdf = jnp.clip(sdf, -trunc, trunc)

    w_old = state.weight.reshape(-1)
    tsdf_old = state.tsdf.reshape(-1)
    w_meas = jnp.where(update, 1.0, 0.0)
    w_new = w_old + w_meas
    safe_w = jnp.where(w_new > 0, w_new, 1.0)
    tsdf_new = (tsdf_old * w_old + sdf * w_meas) / safe_w
    tsdf_new = jnp.where(update, tsdf_new, tsdf_old)
    w_new = jnp.minimum(w_new, config.max_tsdf_weight)

    return dataclasses.replace(
        state,
        tsdf=tsdf_new.reshape(X, Y, Z),
        weight=w_new.reshape(X, Y, Z),
    )


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def decay(state: VoxelGridState, config: MappingConfig) -> VoxelGridState:
    """Multiplicative TSDF-weight decay; fully decayed voxels become
    unobserved (reference: mapper.decay() each sim step)."""
    w = state.weight * config.tsdf_decay_factor
    dead = w < 1e-2
    return dataclasses.replace(
        state,
        weight=jnp.where(dead, 0.0, w),
        tsdf=jnp.where(dead, config.truncation_distance_m, state.tsdf),
    )


# -----------------------------------------------------------------------------
# Block page allocation + feature / color integration
# -----------------------------------------------------------------------------


def _near_surface_blocks(state: VoxelGridState, config: MappingConfig) -> jnp.ndarray:
    """(BX, BY, BZ) bool: block contains an observed near-surface voxel."""
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    near = (jnp.abs(state.tsdf) < config.truncation_distance_m * 0.75) & (
        state.weight > 0
    )
    view = near.reshape(BX, b, BY, b, BZ, b)
    return jnp.any(view, axis=(1, 3, 5))


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def allocate_pages(state: VoxelGridState, config: MappingConfig) -> VoxelGridState:
    """Assign pool pages to near-surface blocks that lack one.

    Deterministic cumsum allocation; silently stops allocating when the pool
    is exhausted (callers can size max_feature_pages per task).
    """
    active = _near_surface_blocks(state, config)
    flat_active = active.reshape(-1)
    flat_table = state.page_table.reshape(-1)
    needs = flat_active & (flat_table < 0)
    order = jnp.cumsum(needs.astype(jnp.int32)) - 1  # alloc rank per block
    new_page = state.num_pages + order
    can_alloc = needs & (new_page < config.max_feature_pages)
    flat_table = jnp.where(can_alloc, new_page, flat_table)
    num_new = jnp.sum(can_alloc.astype(jnp.int32))

    # Inverse mapping page -> flat block index.
    block_ids = jnp.arange(flat_table.shape[0], dtype=jnp.int32)
    page_to_block = state.page_to_block
    # Scatter: for blocks just allocated, page_to_block[new_page] = block_id.
    page_to_block = page_to_block.at[
        jnp.where(can_alloc, new_page, config.max_feature_pages)
    ].set(jnp.where(can_alloc, block_ids, -1), mode="drop")

    return dataclasses.replace(
        state,
        page_table=flat_table.reshape(state.page_table.shape),
        page_to_block=page_to_block,
        num_pages=state.num_pages + num_new,
    )


def _page_voxel_centers(
    state: VoxelGridState, config: MappingConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World centers of every voxel of every page: (P, B^3, 3) + page valid."""
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    blk = state.page_to_block  # (P,)
    valid = blk >= 0
    safe = jnp.maximum(blk, 0)
    bx = safe // (BY * BZ)
    by = (safe // BZ) % BY
    bz = safe % BZ
    base = jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32) * b  # (P, 3)

    r = jnp.arange(b, dtype=jnp.float32)
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    offsets = jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # (B^3, 3)

    idx = base[:, None, :] + offsets[None, :, :]
    origin = jnp.asarray(config.aabb_min_m, dtype=jnp.float32)
    return origin + (idx + 0.5) * config.voxel_size_m, valid


def _integrate_pool(
    pool: jnp.ndarray,
    pool_weight: jnp.ndarray,
    state: VoxelGridState,
    config: MappingConfig,
    image: jnp.ndarray,
    T_WC: jnp.ndarray,
    K: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    measurement_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-average update of a per-voxel page pool from one image."""
    centers, page_valid = _page_voxel_centers(state, config)  # (P, B^3, 3)
    P, B3, _ = centers.shape
    u, v, z = _project(centers.reshape(-1, 3), T_WC, K)
    H, W = image.shape[:2]
    in_image = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    values, ui, vi = _bilinear_or_nearest_gather(image, u, v)
    ok = in_image & (z > config.min_integration_distance_m) & (
        z < config.projective_integrator_max_integration_distance_m
    )
    if mask is not None:
        ok &= mask[vi, ui]

    # Only near-surface observed voxels accumulate appearance.
    flat_vox = _page_voxel_flat_indices(state, config)  # (P, B^3)
    tsdf_flat = state.tsdf.reshape(-1)[flat_vox.reshape(-1)]
    w_flat = state.weight.reshape(-1)[flat_vox.reshape(-1)]
    near = (jnp.abs(tsdf_flat) < config.truncation_distance_m * 0.75) & (w_flat > 0)
    ok = ok & near & jnp.repeat(page_valid, B3)

    w_meas = jnp.where(ok, measurement_weight, 0.0).reshape(P, B3)
    w_old = pool_weight
    w_new = w_old + w_meas
    safe_w = jnp.where(w_new > 0, w_new, 1.0)[..., None]
    vals = values.reshape(P, B3, -1).astype(jnp.float32)
    pool_new = (
        pool.astype(jnp.float32) * w_old[..., None] + vals * w_meas[..., None]
    ) / safe_w
    pool_new = jnp.where(
        (w_new > 0)[..., None], pool_new, pool.astype(jnp.float32)
    )
    return pool_new.astype(pool.dtype), w_new


def _page_voxel_flat_indices(state: VoxelGridState, config: MappingConfig):
    """(P, B^3) flat voxel indices into the dense grid for each page."""
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    X, Y, Z = config.grid_shape
    blk = jnp.maximum(state.page_to_block, 0)
    bx = blk // (BY * BZ)
    by = (blk // BZ) % BY
    bz = blk % BZ

    r = jnp.arange(b, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    vx = bx[:, None] * b + ox.reshape(-1)[None, :]
    vy = by[:, None] * b + oy.reshape(-1)[None, :]
    vz = bz[:, None] * b + oz.reshape(-1)[None, :]
    return (vx * Y + vy) * Z + vz


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def integrate_features(
    state: VoxelGridState,
    config: MappingConfig,
    features: jnp.ndarray,
    T_WC: jnp.ndarray,
    K: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> VoxelGridState:
    """Fuse a (H, W, F) feature image into the block-paged feature pool."""
    state = allocate_pages(state, config)
    feat, feat_weight = _integrate_pool(
        state.feat,
        state.feat_weight,
        state,
        config,
        features,
        T_WC,
        K,
        mask,
        config.projective_appearance_integrator_measurement_weight,
    )
    return dataclasses.replace(state, feat=feat, feat_weight=feat_weight)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def integrate_color(
    state: VoxelGridState,
    config: MappingConfig,
    rgb: jnp.ndarray,
    T_WC: jnp.ndarray,
    K: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> VoxelGridState:
    """Fuse a (H, W, 3) color image into the color pool."""
    state = allocate_pages(state, config)
    color, color_weight = _integrate_pool(
        state.color,
        state.color_weight,
        state,
        config,
        rgb,
        T_WC,
        K,
        mask,
        1.0,
    )
    return dataclasses.replace(state, color=color, color_weight=color_weight)


# -----------------------------------------------------------------------------
# Surface extraction
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "max_vertices"))
def extract_surface_vertices(
    state: VoxelGridState, config: MappingConfig, max_vertices: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract surface points with per-vertex features.

    Surface voxels are observed voxels whose TSDF crosses zero against a
    +x/+y/+z neighbor; the vertex is placed at the zero crossing along that
    axis (linear interpolation), and features come from the voxel's pool slot.

    Returns (vertices (N, 3), features (N, F), valid (N,)) with N =
    max_vertices; invalid rows are zero.
    """
    X, Y, Z = config.grid_shape
    tsdf = state.tsdf
    w = state.weight
    observed = w > 0

    verts_parts = []
    for axis in range(3):
        shifted_t = jnp.roll(tsdf, -1, axis=axis)
        shifted_o = jnp.roll(observed, -1, axis=axis)
        # Exclude wrap-around at the boundary.
        edge_valid = jnp.ones_like(observed)
        idx = [slice(None)] * 3
        idx[axis] = slice(-1, None)
        edge_valid = edge_valid.at[tuple(idx)].set(False)
        crossing = (
            observed
            & shifted_o
            & edge_valid
            & (jnp.sign(tsdf) != jnp.sign(shifted_t))
            & (jnp.abs(tsdf) < config.truncation_distance_m)
        )
        denom = tsdf - shifted_t
        alpha = jnp.where(jnp.abs(denom) > 1e-9, tsdf / denom, 0.5)
        verts_parts.append((crossing, alpha, axis))

    centers = voxel_centers_flat(config).reshape(X, Y, Z, 3)
    all_pos = []
    all_flags = []
    for crossing, alpha, axis in verts_parts:
        offset = jnp.zeros((X, Y, Z, 3))
        offset = offset.at[..., axis].set(alpha * config.voxel_size_m)
        all_pos.append((centers + offset).reshape(-1, 3))
        all_flags.append(crossing.reshape(-1))
    positions = jnp.concatenate(all_pos, axis=0)
    flags = jnp.concatenate(all_flags, axis=0)

    sel = jnp.nonzero(flags, size=max_vertices, fill_value=0)[0]
    valid = flags[sel]
    vertices = jnp.where(valid[:, None], positions[sel], 0.0)

    # Feature lookup: voxel -> block -> page -> slot.
    vox_flat = sel % (X * Y * Z)
    features = _lookup_features(state, config, vox_flat)
    features = jnp.where(valid[:, None], features, 0.0)
    return vertices, features, valid


def _lookup_features(
    state: VoxelGridState, config: MappingConfig, vox_flat: jnp.ndarray
) -> jnp.ndarray:
    """Gather pool features for flat voxel indices; zeros if unallocated."""
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    X, Y, Z = config.grid_shape
    vx = vox_flat // (Y * Z)
    vy = (vox_flat // Z) % Y
    vz = vox_flat % Z
    page = state.page_table[vx // b, vy // b, vz // b]
    slot = ((vx % b) * b + (vy % b)) * b + (vz % b)
    safe_page = jnp.maximum(page, 0)
    feats = state.feat[safe_page, slot].astype(jnp.float32)
    has_feat = (page >= 0) & (state.feat_weight[safe_page, slot] > 0)
    return jnp.where(has_feat[:, None], feats, 0.0)


def query_tsdf_dense(state: VoxelGridState, config: MappingConfig) -> jnp.ndarray:
    """Dense (X, Y, Z) TSDF with unobserved voxels filled with
    config.unobserved_value (reference: convert_layer_to_dense_tensor)."""
    return jnp.where(state.weight > 0, state.tsdf, config.unobserved_value)
