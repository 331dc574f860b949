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
  allocated for blocks that contain near-surface voxels; allocation is a
  cumsum over the block grid (no host sync).
- All ops are pure: state in, state out; everything jits.

Performance note: each jitted kernel takes ONLY the state leaves it actually
touches, with donation on the mutated ones. Funneling the whole state pytree
through every op would force the runtime to shuttle the (hundreds of MB)
feature pool across each call boundary even for a TSDF-only update.

Why XLA and not Pallas here: the integrators are image-gather kernels (every
voxel gathers its depth/feature pixel at a data-dependent index). Mosaic's
gather lowering only supports same-shape single-axis gathers, while XLA's
native TPU gather handles this pattern directly - and the fused fuse_frame
program already runs at >1 kHz per frame (HBM-bound, ~roofline for the
traffic involved). The Pallas budget goes to attention instead
(ops/flash_attention.py).

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


def get_voxel_center_grids(config: MappingConfig) -> jnp.ndarray:
    """(X, Y, Z, 3) world coordinates of every voxel center.

    Grid-shaped counterpart of voxel_centers_flat; mirrors
    nvblox_torch.indexing.get_voxel_center_grids (reference:
    paper/utils/utils.py:16-18, visualization/visualizer.py usage).
    """
    X, Y, Z = config.grid_shape
    return voxel_centers_flat(config).reshape(X, Y, Z, 3)


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


def _nearest_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Nearest-neighbor gather of img (H, W[, C]) at float pixel coords."""
    H, W = img.shape[:2]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    return img[vi, ui], ui, vi


# -----------------------------------------------------------------------------
# TSDF integration
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "has_mask"), donate_argnums=(0, 1))
def _integrate_depth_jit(
    tsdf, weight, depth, T_WC, K, mask, config: MappingConfig, has_mask: bool
):
    X, Y, Z = config.grid_shape
    trunc = config.truncation_distance_m
    centers = voxel_centers_flat(config)
    u, v, z = _project(centers, T_WC, K)

    H, W = depth.shape
    in_image = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    surf, ui, vi = _nearest_gather(depth, u, v)
    surf = jnp.nan_to_num(surf, nan=0.0, posinf=0.0, neginf=0.0)
    pixel_ok = surf > 0
    if has_mask:
        pixel_ok &= mask[vi, ui]
    depth_ok = (
        (z > config.min_integration_distance_m)
        & (z < config.projective_integrator_max_integration_distance_m)
    )
    sdf = surf - z
    update = in_image & pixel_ok & depth_ok & (sdf > -trunc)
    sdf = jnp.clip(sdf, -trunc, trunc)

    w_old = weight.reshape(-1)
    tsdf_old = tsdf.reshape(-1)
    w_meas = jnp.where(update, 1.0, 0.0)
    w_new = w_old + w_meas
    safe_w = jnp.where(w_new > 0, w_new, 1.0)
    tsdf_new = (tsdf_old * w_old + sdf * w_meas) / safe_w
    tsdf_new = jnp.where(update, tsdf_new, tsdf_old)
    w_new = jnp.minimum(w_new, config.max_tsdf_weight)
    return tsdf_new.reshape(X, Y, Z), w_new.reshape(X, Y, Z)


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
    has_mask = mask is not None
    mask_arg = mask if has_mask else jnp.zeros((1, 1), dtype=bool)
    tsdf, weight = _integrate_depth_jit(
        state.tsdf, state.weight, depth, T_WC, K, mask_arg, config, has_mask
    )
    return dataclasses.replace(state, tsdf=tsdf, weight=weight)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0, 1))
def _decay_jit(tsdf, weight, config: MappingConfig):
    w = weight * config.tsdf_decay_factor
    dead = w < 1e-2
    return (
        jnp.where(dead, config.truncation_distance_m, tsdf),
        jnp.where(dead, 0.0, w),
    )


@partial(jax.jit, static_argnames=("config",), donate_argnums=(0,))
def _decay_pool_weight_jit(pool_weight, config: MappingConfig):
    w = pool_weight * config.tsdf_decay_factor
    return jnp.where(w < 1e-2, 0.0, w)


def decay(state: VoxelGridState, config: MappingConfig) -> VoxelGridState:
    """Multiplicative weight decay; fully decayed voxels become unobserved
    (reference: mapper.decay() each sim step).

    Feature/color averaging weights decay with the same factor so a surface
    that moves away and returns re-averages against a faded (not full-weight
    stale) mean - the role nvblox's decayed-block deallocation plays. Freed
    pages are actually reclaimed by the allocator (allocate_pages) once
    their block has no observed voxel left.
    """
    tsdf, weight = _decay_jit(state.tsdf, state.weight, config)
    return dataclasses.replace(
        state,
        tsdf=tsdf,
        weight=weight,
        feat_weight=_decay_pool_weight_jit(state.feat_weight, config),
        color_weight=_decay_pool_weight_jit(state.color_weight, config),
    )


# -----------------------------------------------------------------------------
# Block page allocation + feature / color integration
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config",), donate_argnums=(2, 3, 4, 5))
def _allocate_pages_jit(tsdf, weight, page_table, page_to_block,
                        feat_weight, color_weight, config: MappingConfig):
    """Reclaim dead pages, then assign free pages to near-surface blocks.

    Reclamation (the TPU equivalent of nvblox's decayed-block deallocation):
    a page whose block has no observed voxel left (all TSDF weights decayed
    to zero) returns to the free list and its pool weights are zeroed, so a
    robot sweeping the workspace cannot exhaust max_feature_pages.
    Allocation is a deterministic cumsum over the free list.
    """
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    P = config.max_feature_pages
    observed = weight > 0
    block_observed = jnp.any(
        observed.reshape(BX, b, BY, b, BZ, b), axis=(1, 3, 5)
    ).reshape(-1)

    # --- reclaim -------------------------------------------------------------
    page_valid = page_to_block >= 0
    safe_block = jnp.maximum(page_to_block, 0)
    freeable = page_valid & ~block_observed[safe_block]
    flat_table = page_table.reshape(-1)
    flat_table = flat_table.at[
        jnp.where(freeable, safe_block, flat_table.shape[0])
    ].set(-1, mode="drop")
    page_to_block = jnp.where(freeable, -1, page_to_block)
    feat_weight = jnp.where(freeable[:, None], 0.0, feat_weight)
    color_weight = jnp.where(freeable[:, None], 0.0, color_weight)

    # --- allocate ------------------------------------------------------------
    near = (jnp.abs(tsdf) < config.truncation_distance_m * 0.75) & observed
    active = jnp.any(near.reshape(BX, b, BY, b, BZ, b), axis=(1, 3, 5))
    needs = active.reshape(-1) & (flat_table < 0)
    order = jnp.cumsum(needs.astype(jnp.int32)) - 1  # alloc rank per block

    free = page_to_block < 0
    num_free = jnp.sum(free.astype(jnp.int32))
    free_ids = jnp.nonzero(free, size=P, fill_value=P)[0].astype(jnp.int32)
    new_page = free_ids[jnp.clip(order, 0, P - 1)]
    can_alloc = needs & (order < num_free)
    flat_table = jnp.where(can_alloc, new_page, flat_table)

    block_ids = jnp.arange(flat_table.shape[0], dtype=jnp.int32)
    page_to_block = page_to_block.at[
        jnp.where(can_alloc, new_page, P)
    ].set(jnp.where(can_alloc, block_ids, -1), mode="drop")

    num_pages = jnp.sum((page_to_block >= 0).astype(jnp.int32))
    return (
        flat_table.reshape(BX, BY, BZ),
        page_to_block,
        num_pages,
        feat_weight,
        color_weight,
    )


def allocate_pages(state: VoxelGridState, config: MappingConfig) -> VoxelGridState:
    """Reclaim + assign pool pages for near-surface blocks.

    Deterministic cumsum allocation over the free list; silently stops
    allocating when the pool is exhausted (callers size max_feature_pages
    per task). ``num_pages`` tracks the live allocated-page count.
    """
    page_table, page_to_block, num_pages, feat_weight, color_weight = (
        _allocate_pages_jit(
            state.tsdf, state.weight, state.page_table, state.page_to_block,
            state.feat_weight, state.color_weight, config,
        )
    )
    return dataclasses.replace(
        state,
        page_table=page_table,
        page_to_block=page_to_block,
        num_pages=num_pages,
        feat_weight=feat_weight,
        color_weight=color_weight,
    )


def _page_voxel_coords(page_to_block: jnp.ndarray, config: MappingConfig):
    """Per-page voxel integer coords (P, B^3, 3) + page-valid mask (P,)."""
    b = config.block_size
    BX, BY, BZ = config.block_grid_shape
    valid = page_to_block >= 0
    safe = jnp.maximum(page_to_block, 0)
    bx = safe // (BY * BZ)
    by = (safe // BZ) % BY
    bz = safe % BZ
    base = jnp.stack([bx, by, bz], axis=-1) * b  # (P, 3)
    r = jnp.arange(b, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    offsets = jnp.stack([ox, oy, oz], axis=-1).reshape(-1, 3)  # (B^3, 3)
    return base[:, None, :] + offsets[None, :, :], valid


@partial(
    jax.jit,
    static_argnames=("config", "has_mask", "measurement_weight"),
    donate_argnums=(0, 1),
)
def _integrate_pool_jit(
    pool,
    pool_weight,
    page_to_block,
    tsdf,
    weight,
    image,
    T_WC,
    K,
    mask,
    config: MappingConfig,
    has_mask: bool,
    measurement_weight: float,
):
    """Weighted-average update of a per-voxel page pool from one image."""
    coords, page_valid = _page_voxel_coords(page_to_block, config)  # (P, B^3, 3)
    P, B3, _ = coords.shape
    X, Y, Z = config.grid_shape
    origin = jnp.asarray(config.aabb_min_m, dtype=jnp.float32)
    centers = origin + (coords.astype(jnp.float32) + 0.5) * config.voxel_size_m

    u, v, z = _project(centers.reshape(-1, 3), T_WC, K)
    H, W = image.shape[:2]
    in_image = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    values, ui, vi = _nearest_gather(image, u, v)
    ok = in_image & (z > config.min_integration_distance_m) & (
        z < config.projective_integrator_max_integration_distance_m
    )
    if has_mask:
        ok &= mask[vi, ui]

    # Only near-surface observed voxels accumulate appearance.
    flat_vox = (
        (coords[..., 0] * Y + coords[..., 1]) * Z + coords[..., 2]
    ).reshape(-1)
    tsdf_flat = tsdf.reshape(-1)[flat_vox]
    w_flat = weight.reshape(-1)[flat_vox]
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
    has_mask = mask is not None
    mask_arg = mask if has_mask else jnp.zeros((1, 1), dtype=bool)
    feat, feat_weight = _integrate_pool_jit(
        state.feat,
        state.feat_weight,
        state.page_to_block,
        state.tsdf,
        state.weight,
        features,
        T_WC,
        K,
        mask_arg,
        config,
        has_mask,
        config.projective_appearance_integrator_measurement_weight,
    )
    return dataclasses.replace(state, feat=feat, feat_weight=feat_weight)


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
    has_mask = mask is not None
    mask_arg = mask if has_mask else jnp.zeros((1, 1), dtype=bool)
    color, color_weight = _integrate_pool_jit(
        state.color,
        state.color_weight,
        state.page_to_block,
        state.tsdf,
        state.weight,
        rgb,
        T_WC,
        K,
        mask_arg,
        config,
        has_mask,
        1.0,
    )
    return dataclasses.replace(state, color=color, color_weight=color_weight)


# -----------------------------------------------------------------------------
# Surface extraction
# -----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "max_vertices"))
def _extract_surface_jit(
    tsdf, weight, page_table, feat, feat_weight, config: MappingConfig,
    max_vertices: int,
):
    X, Y, Z = config.grid_shape
    observed = weight > 0

    centers = voxel_centers_flat(config).reshape(X, Y, Z, 3)
    all_pos = []
    all_flags = []
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
        offset = jnp.zeros((X, Y, Z, 3))
        offset = offset.at[..., axis].set(alpha * config.voxel_size_m)
        all_pos.append((centers + offset).reshape(-1, 3))
        all_flags.append(crossing.reshape(-1))
    positions = jnp.concatenate(all_pos, axis=0)
    flags = jnp.concatenate(all_flags, axis=0)

    # Total crossings BEFORE truncation, so callers can detect overflow of
    # the fixed max_vertices budget (silent truncation would under-sample the
    # map). Validity comes from the count - fill_value=0 would otherwise
    # alias voxel 0 when flags[0] is set.
    count = jnp.sum(flags)
    sel = jnp.nonzero(flags, size=max_vertices, fill_value=0)[0]
    valid = jnp.arange(max_vertices) < count
    vertices = jnp.where(valid[:, None], positions[sel], 0.0)

    # Feature lookup: voxel -> block -> page -> slot, for both edge
    # endpoints, blended by the zero-crossing position (the reference's
    # marching-cubes mesh interpolates per-vertex features the same way).
    b = config.block_size

    def lookup(vx, vy, vz):
        page = page_table[vx // b, vy // b, vz // b]
        slot = ((vx % b) * b + (vy % b)) * b + (vz % b)
        safe_page = jnp.maximum(page, 0)
        f = feat[safe_page, slot].astype(jnp.float32)
        ok = (page >= 0) & (feat_weight[safe_page, slot] > 0)
        return f, ok

    axis_id = sel // (X * Y * Z)
    vox_flat = sel % (X * Y * Z)
    vx = vox_flat // (Y * Z)
    vy = (vox_flat // Z) % Y
    vz = vox_flat % Z
    nx = jnp.minimum(vx + (axis_id == 0), X - 1)
    ny = jnp.minimum(vy + (axis_id == 1), Y - 1)
    nz = jnp.minimum(vz + (axis_id == 2), Z - 1)
    f0, ok0 = lookup(vx, vy, vz)
    f1, ok1 = lookup(nx, ny, nz)
    t0 = tsdf[vx, vy, vz]
    t1 = tsdf[nx, ny, nz]
    denom = t0 - t1
    alpha = jnp.clip(
        jnp.where(jnp.abs(denom) > 1e-9, t0 / denom, 0.5), 0.0, 1.0
    )
    w0 = jnp.where(ok0, 1.0 - alpha, 0.0)
    w1 = jnp.where(ok1, alpha, 0.0)
    wsum = w0 + w1
    blended = (w0[:, None] * f0 + w1[:, None] * f1) / jnp.maximum(
        wsum[:, None], 1e-9
    )
    has_feat = wsum > 0
    features = jnp.where(has_feat[:, None] & valid[:, None], blended, 0.0)
    return vertices, features, valid, count


def extract_surface_vertices(
    state: VoxelGridState, config: MappingConfig, max_vertices: int,
    return_count: bool = False,
):
    """Extract surface points with per-vertex features.

    Surface voxels are observed voxels whose TSDF crosses zero against a
    +x/+y/+z neighbor; the vertex is placed at the zero crossing along that
    axis (linear interpolation), and features come from the voxel's pool slot.

    Returns (vertices (N, 3), features (N, F), valid (N,)) with N =
    max_vertices; invalid rows are zero. With ``return_count`` also returns
    the total crossing count (may exceed max_vertices - overflow means the
    budget truncated the surface; raise max_vertices or the voxel size).
    """
    vertices, features, valid, count = _extract_surface_jit(
        state.tsdf,
        state.weight,
        state.page_table,
        state.feat,
        state.feat_weight,
        config,
        max_vertices,
    )
    if return_count:
        return vertices, features, valid, count
    return vertices, features, valid


@partial(
    jax.jit, static_argnames=("config", "max_vertices", "max_triangles")
)
def _surface_nets_device_jit(tsdf, weight, config: MappingConfig,
                             max_vertices: int, max_triangles: int):
    """Dual (Surface Nets) triangle mesh fully on device.

    XLA redesign of the host surface_nets pass (mapping/surface_nets.py, the
    TPU counterpart of nvblox's CUDA marching cubes update_color_mesh): one
    vertex per sign-change cell at the mean of its edge zero-crossings, a quad
    (two triangles) across every grid edge with a sign change. Fixed budgets
    (max_vertices / max_triangles) keep shapes static for jit.
    """
    X, Y, Z = config.grid_shape
    CX, CY, CZ = X - 1, Y - 1, Z - 1
    trunc = config.truncation_distance_m
    obs = (weight > 0) & (jnp.abs(tsdf) < trunc)
    signs = tsdf >= 0

    def corner(a, dx, dy, dz):
        return a[dx: CX + dx, dy: CY + dy, dz: CZ + dz]

    all_obs = jnp.ones((CX, CY, CZ), dtype=bool)
    any_pos = jnp.zeros((CX, CY, CZ), dtype=bool)
    any_neg = jnp.zeros((CX, CY, CZ), dtype=bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                all_obs &= corner(obs, dx, dy, dz)
                s = corner(signs, dx, dy, dz)
                any_pos |= s
                any_neg |= ~s
    active = all_obs & any_pos & any_neg

    # Vertex position per cell: mean of the 12 edge zero-crossings (traced
    # python loop = unrolled elementwise ops; XLA fuses the lot).
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(CX, dtype=jnp.float32),
        jnp.arange(CY, dtype=jnp.float32),
        jnp.arange(CZ, dtype=jnp.float32),
        indexing="ij",
    )
    base = jnp.stack([gx, gy, gz], axis=-1)  # (CX, CY, CZ, 3)
    acc = jnp.zeros((CX, CY, CZ, 3))
    counts = jnp.zeros((CX, CY, CZ))
    for axis in range(3):
        for u in (0, 1):
            for v in (0, 1):
                a = [u, v]
                a.insert(axis, 0)
                b = [u, v]
                b.insert(axis, 1)
                va = corner(tsdf, *a)
                vb = corner(tsdf, *b)
                crossing = (va >= 0) != (vb >= 0)
                denom = va - vb
                t = jnp.where(jnp.abs(denom) > 1e-12, va / jnp.where(
                    jnp.abs(denom) > 1e-12, denom, 1.0), 0.5)
                point = base + jnp.asarray(a, dtype=jnp.float32)
                point = point.at[..., axis].add(t)
                acc = acc + jnp.where(crossing[..., None], point, 0.0)
                counts = counts + crossing
    centers = acc / jnp.maximum(counts, 1.0)[..., None]
    origin = jnp.asarray(config.aabb_min_m, dtype=jnp.float32)
    positions = origin + (centers + 0.5) * config.voxel_size_m

    n_vertices = jnp.sum(active)
    sel = jnp.nonzero(active.reshape(-1), size=max_vertices, fill_value=0)[0]
    vertex_valid = jnp.arange(max_vertices) < n_vertices
    vertices = jnp.where(
        vertex_valid[:, None], positions.reshape(-1, 3)[sel], 0.0
    )
    cells = jnp.stack(
        [sel // (CY * CZ), (sel // CZ) % CY, sel % CZ], axis=-1
    ).astype(jnp.int32)
    cells = jnp.where(vertex_valid[:, None], cells, 0)

    # Dense cell -> compact vertex id (invalid = -1). Padded sel entries are
    # fill_value=0 and would scatter a -1 onto cell 0's real id (duplicate
    # scatter indices have an undefined winner); route them out of bounds
    # instead, where mode="drop" discards them.
    vid = jnp.full(CX * CY * CZ, -1, dtype=jnp.int32)
    scatter_idx = jnp.where(vertex_valid, sel, CX * CY * CZ)
    vid = vid.at[scatter_idx].set(
        jnp.arange(max_vertices, dtype=jnp.int32), mode="drop"
    )
    vid = vid.reshape(CX, CY, CZ)

    # Quads per crossing grid edge, all three axes concatenated.
    quad_ids = []
    quad_flags = []
    quad_flips = []
    for axis in range(3):
        dims = [X, Y, Z]
        sl_a = [slice(0, X), slice(0, Y), slice(0, Z)]
        sl_b = list(sl_a)
        sl_a[axis] = slice(0, dims[axis] - 1)
        sl_b[axis] = slice(1, dims[axis])
        ea = signs[tuple(sl_a)]
        eb = signs[tuple(sl_b)]
        eobs = obs[tuple(sl_a)] & obs[tuple(sl_b)]
        change = (ea != eb) & eobs
        EX, EY, EZ = change.shape
        exg, eyg, ezg = jnp.meshgrid(
            jnp.arange(EX), jnp.arange(EY), jnp.arange(EZ), indexing="ij"
        )
        coords = [exg, eyg, ezg]
        o1, o2 = [a for a in range(3) if a != axis]
        ids4 = []
        ok = change
        for d1 in (0, 1):
            for d2 in (0, 1):
                c = [coords[0], coords[1], coords[2]]
                c[o1] = c[o1] - d1
                c[o2] = c[o2] - d2
                in_range = (
                    (c[0] >= 0) & (c[0] < CX)
                    & (c[1] >= 0) & (c[1] < CY)
                    & (c[2] >= 0) & (c[2] < CZ)
                )
                cid = vid[
                    jnp.clip(c[0], 0, CX - 1),
                    jnp.clip(c[1], 0, CY - 1),
                    jnp.clip(c[2], 0, CZ - 1),
                ]
                cid = jnp.where(in_range, cid, -1)
                ok = ok & (cid >= 0)
                ids4.append(cid.reshape(-1))
        quad_ids.append(jnp.stack(ids4, axis=-1))  # (E, 4)
        quad_flags.append(ok.reshape(-1))
        # (o1, o2) for axis=1 is (0, 2): x-hat cross z-hat = -y-hat, a
        # LEFT-handed quad frame around the edge direction - invert the
        # winding for that axis so all faces orient consistently.
        quad_flips.append(
            ea.reshape(-1) ^ (axis == 1)
        )
    quad_ids = jnp.concatenate(quad_ids, axis=0)
    quad_flags = jnp.concatenate(quad_flags, axis=0)
    quad_flips = jnp.concatenate(quad_flips, axis=0)

    max_quads = max_triangles // 2
    n_quads = jnp.sum(quad_flags)
    qsel = jnp.nonzero(quad_flags, size=max_quads, fill_value=0)[0]
    quad_valid = jnp.arange(max_quads) < n_quads
    q = quad_ids[qsel]  # (Q, 4) order: (0,0), (0,1), (1,0), (1,1)
    flips = quad_flips[qsel]
    q00, q01, q10, q11 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    t1 = jnp.where(
        flips[:, None], jnp.stack([q00, q10, q11], 1),
        jnp.stack([q00, q11, q10], 1),
    )
    t2 = jnp.where(
        flips[:, None], jnp.stack([q00, q11, q01], 1),
        jnp.stack([q00, q01, q11], 1),
    )
    triangles = jnp.concatenate([t1, t2], axis=0)
    tri_valid = jnp.concatenate([quad_valid, quad_valid], axis=0)
    triangles = jnp.where(tri_valid[:, None], triangles, 0)
    return vertices, vertex_valid, cells, triangles, tri_valid, n_vertices, \
        n_quads * 2


def extract_surface_mesh_device(
    state: VoxelGridState, config: MappingConfig,
    max_vertices: int = 65536, max_triangles: int = 262144,
):
    """Device triangle mesh: (vertices (V, 3), vertex_valid (V,), cells
    (V, 3) owning cell for attribute lookup, triangles (T, 3), tri_valid (T,),
    n_vertices, n_triangles). Budget overflow is detectable via the counts."""
    return _surface_nets_device_jit(
        state.tsdf, state.weight, config, max_vertices, max_triangles
    )


@partial(jax.jit, static_argnames=("config",))
def _query_pool_dense_jit(page_table, pool, pool_weight,
                          config: MappingConfig):
    X, Y, Z = config.grid_shape
    b = config.block_size
    page_vox = jnp.repeat(
        jnp.repeat(jnp.repeat(page_table, b, 0), b, 1), b, 2
    )  # (X, Y, Z)
    vx, vy, vz = jnp.meshgrid(
        jnp.arange(X), jnp.arange(Y), jnp.arange(Z), indexing="ij"
    )
    slot = ((vx % b) * b + (vy % b)) * b + (vz % b)
    safe = jnp.maximum(page_vox, 0).reshape(-1)
    slot = slot.reshape(-1)
    values = pool[safe, slot].astype(jnp.float32)
    valid = (page_vox.reshape(-1) >= 0) & (pool_weight[safe, slot] > 0)
    return jnp.where(valid[:, None], values, 0.0).reshape(
        X, Y, Z, pool.shape[-1]
    )


def query_features_dense(
    state: VoxelGridState, config: MappingConfig
) -> jnp.ndarray:
    """Dense (X, Y, Z, F) per-voxel features; unallocated voxels are zero.

    The feature_layer_view -> convert_layer_to_dense_tensor export
    (reference: mapping/helpers/nvblox_output_helpers.py:13,
    visualization/visualizer.py:678-711). Beware memory: full 768-d grids
    are gigabytes - slice or reduce feature_dim for visualization.
    """
    return _query_pool_dense_jit(
        state.page_table, state.feat, state.feat_weight, config
    )


def query_colors_dense(
    state: VoxelGridState, config: MappingConfig
) -> jnp.ndarray:
    """Dense (X, Y, Z, 3) per-voxel colors; unallocated voxels are zero."""
    return _query_pool_dense_jit(
        state.page_table, state.color, state.color_weight, config
    )


@partial(jax.jit, static_argnames=("config",))
def _query_tsdf_dense_jit(tsdf, weight, config: MappingConfig):
    return jnp.where(weight > 0, tsdf, config.unobserved_value)


def query_tsdf_dense(state: VoxelGridState, config: MappingConfig) -> jnp.ndarray:
    """Dense (X, Y, Z) TSDF with unobserved voxels filled with
    config.unobserved_value (reference: convert_layer_to_dense_tensor)."""
    return _query_tsdf_dense_jit(state.tsdf, state.weight, config)


# -----------------------------------------------------------------------------
# Fused per-frame update (single XLA program)
# -----------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("config", "has_dmask", "has_fmask", "with_decay"),
    donate_argnums=(0,),
)
def _fuse_frame_jit(state: VoxelGridState, depth, features, T_WC, K, feat_K,
                    depth_mask, feature_mask, config: MappingConfig,
                    has_dmask: bool, has_fmask: bool, with_decay: bool):
    tsdf, weight = state.tsdf, state.weight
    in_fw, in_cw = state.feat_weight, state.color_weight
    if with_decay:
        tsdf, weight = _decay_jit.__wrapped__(tsdf, weight, config)
        in_fw = _decay_pool_weight_jit.__wrapped__(in_fw, config)
        in_cw = _decay_pool_weight_jit.__wrapped__(in_cw, config)
    tsdf, weight = _integrate_depth_jit.__wrapped__(
        tsdf, weight, depth, T_WC, K, depth_mask, config, has_dmask
    )
    page_table, page_to_block, num_pages, fw, cw = (
        _allocate_pages_jit.__wrapped__(
            tsdf, weight, state.page_table, state.page_to_block,
            in_fw, in_cw, config,
        )
    )
    feat, feat_weight = _integrate_pool_jit.__wrapped__(
        state.feat, fw, page_to_block, tsdf, weight, features,
        T_WC, feat_K, feature_mask, config, has_fmask,
        config.projective_appearance_integrator_measurement_weight,
    )
    return dataclasses.replace(
        state,
        tsdf=tsdf,
        weight=weight,
        page_table=page_table,
        page_to_block=page_to_block,
        num_pages=num_pages,
        feat=feat,
        feat_weight=feat_weight,
        color_weight=cw,
    )


def fuse_frame(
    state: VoxelGridState,
    config: MappingConfig,
    depth: jnp.ndarray,
    features: jnp.ndarray,
    T_WC: jnp.ndarray,
    K: jnp.ndarray,
    feat_K: jnp.ndarray,
    depth_mask: Optional[jnp.ndarray] = None,
    with_decay: bool = True,
    feature_mask: Optional[jnp.ndarray] = None,
) -> VoxelGridState:
    """One fused map update: decay + TSDF + page alloc + feature fusion.

    Dispatches a single XLA program per frame - the production fusion path
    (host dispatch overhead amortizes to one call; everything stays in HBM).
    Masks are per-resolution: ``depth_mask`` at the depth image resolution,
    ``feature_mask`` at the feature image resolution (a single mask cannot
    serve both - the integrators index it with their own pixel coordinates).
    """
    if depth_mask is not None and depth_mask.shape != depth.shape:
        raise ValueError(
            f"depth_mask shape {depth_mask.shape} != depth {depth.shape}; "
            "pass feature-resolution masks via feature_mask="
        )
    if feature_mask is not None and feature_mask.shape != features.shape[:2]:
        raise ValueError(
            f"feature_mask shape {feature_mask.shape} != feature image "
            f"{features.shape[:2]}"
        )
    has_dmask = depth_mask is not None
    has_fmask = feature_mask is not None
    dummy = jnp.zeros((1, 1), dtype=bool)
    return _fuse_frame_jit(
        state, depth, features, T_WC, K, feat_K,
        depth_mask if has_dmask else dummy,
        feature_mask if has_fmask else dummy,
        config, has_dmask, has_fmask, with_decay,
    )
