"""Mapper: the nvblox_torch-equivalent API over the TPU voxel grid.

Re-implements the reference mapping stack
(mindmap/mapping/isaaclab_nvblox_mapper.py + helpers/*) TPU-natively:

- ``Mapper``: multi-mapper container (STATIC / DYNAMIC) with the method
  surface of nvblox_torch.Mapper: add_depth_frame / add_color_frame /
  add_feature_frame / decay / update_feature_mesh / get_feature_mesh /
  save_map / load_from_file / tsdf_layer_view-style dense queries.
- ``integrate_frame``: the per-frame fusion recipe with mask erosion, border
  masking, intrinsic upscaling for the feature image
  (reference helpers/nvblox_mapping_helpers.py:162-273).
- ``get_vertices_and_features`` + zstd persistence of
  {vertices f16, features f16, channel_length}
  (reference helpers/nvblox_output_helpers.py, nvblox_to_disk_helpers.py).

Host code stays thin; each integration call dispatches one fused XLA program.
"""
from __future__ import annotations

import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nvblox_mindmap_tpu.mapping import voxel_grid as vg
from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
from nvblox_mindmap_tpu.ops.masks import downscale_mask, erode_mask, get_border_mask


class Mapper:
    """Dual-mapper (STATIC/DYNAMIC) TSDF + deep-feature voxel mapper."""

    def __init__(self, configs: Dict[int, MappingConfig]):
        self.configs = configs
        self.states = {mid: vg.create_state(cfg) for mid, cfg in configs.items()}
        self._mesh_cache: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = {}

    @classmethod
    def dual(cls, config: MappingConfig) -> "Mapper":
        return cls({MapperId.STATIC: config, MapperId.DYNAMIC: config})

    @classmethod
    def from_file(cls, path: str, mapper_id: int = MapperId.STATIC) -> "Mapper":
        """Construct a single-mapper instance from a save_map file
        (reference: nvblox Mapper(...).load_from_file, convert_maps_usd.py).
        Reads/unpickles the (potentially hundreds of MB) payload once."""
        with open(path, "rb") as f:
            payload = pickle.load(f)
        mapper = cls({mapper_id: payload["config"]})
        mapper._apply_payload(payload, mapper_id)
        return mapper

    # --- nvblox_torch method surface -----------------------------------------
    def add_depth_frame(self, depth, camera_pose, intrinsics, mask=None,
                        mapper_id: int = MapperId.STATIC):
        cfg = self.configs[mapper_id]
        self.states[mapper_id] = vg.integrate_depth(
            self.states[mapper_id],
            cfg,
            jnp.asarray(depth, dtype=jnp.float32),
            jnp.asarray(camera_pose, dtype=jnp.float32),
            jnp.asarray(intrinsics, dtype=jnp.float32),
            None if mask is None else jnp.asarray(mask, dtype=bool),
        )

    def add_color_frame(self, rgb, camera_pose, intrinsics, mask_frame=None,
                        mapper_id: int = MapperId.STATIC):
        cfg = self.configs[mapper_id]
        rgb = jnp.asarray(rgb)
        if rgb.dtype == jnp.uint8:
            rgb = rgb.astype(jnp.float32) / 255.0
        self.states[mapper_id] = vg.integrate_color(
            self.states[mapper_id],
            cfg,
            rgb,
            jnp.asarray(camera_pose, dtype=jnp.float32),
            jnp.asarray(intrinsics, dtype=jnp.float32),
            None if mask_frame is None else jnp.asarray(mask_frame, dtype=bool),
        )

    def add_feature_frame(self, features, camera_pose, feature_intrinsics,
                          feature_mask=None, mapper_id: int = MapperId.STATIC):
        cfg = self.configs[mapper_id]
        self.states[mapper_id] = vg.integrate_features(
            self.states[mapper_id],
            cfg,
            jnp.asarray(features),
            jnp.asarray(camera_pose, dtype=jnp.float32),
            jnp.asarray(feature_intrinsics, dtype=jnp.float32),
            None if feature_mask is None else jnp.asarray(feature_mask, dtype=bool),
        )

    def decay(self, mapper_id: Optional[int] = None):
        ids = self.states.keys() if mapper_id is None else [mapper_id]
        for mid in ids:
            self.states[mid] = vg.decay(self.states[mid], self.configs[mid])

    def clear(self, mapper_id: Optional[int] = None):
        ids = list(self.states.keys()) if mapper_id is None else [mapper_id]
        for mid in ids:
            self.states[mid] = vg.create_state(self.configs[mid])
        self._mesh_cache.clear()

    # --- mesh / vertex extraction --------------------------------------------
    def update_feature_mesh(self, mapper_id: int = MapperId.STATIC,
                            max_vertices: int = 65536):
        cfg = self.configs[mapper_id]
        vertices, features, valid, count = vg.extract_surface_vertices(
            self.states[mapper_id], cfg, max_vertices, return_count=True
        )
        self._mesh_cache[mapper_id] = (vertices, features, valid)
        self.last_crossing_count = int(count)
        if self.last_crossing_count > max_vertices:
            import logging

            logging.getLogger("nvblox_mindmap_tpu.mapping").warning(
                "surface extraction overflow: %d zero-crossings > "
                "max_vertices=%d; the mesh is truncated (raise max_vertices "
                "or the voxel size)",
                self.last_crossing_count, max_vertices,
            )

    def get_feature_mesh(self, mapper_id: int = MapperId.STATIC):
        """Returns (vertices (N, 3), features (N, F), valid (N,)). Extracts on
        demand if update_feature_mesh was not called."""
        if mapper_id not in self._mesh_cache:
            self.update_feature_mesh(mapper_id)
        return self._mesh_cache[mapper_id]

    def update_color_mesh(self, mapper_id: int = MapperId.STATIC,
                          backend: str = "device",
                          max_vertices: int = 65536,
                          max_triangles: int = 262144):
        """Extract a triangle mesh with per-vertex colors.

        (reference: nvblox update_color_mesh / get_color_mesh for viz)
        ``backend="device"`` runs the Surface Nets pass as one XLA program
        (vg.extract_surface_mesh_device); ``"host"`` keeps the numpy path
        (unbounded vertex count, useful offline).
        """
        cfg = self.configs[mapper_id]
        if backend == "device":
            (vertices, vertex_valid, cells, triangles, tri_valid,
             n_vertices, n_triangles) = vg.extract_surface_mesh_device(
                self.states[mapper_id], cfg, max_vertices, max_triangles
            )
            (vertices, vertex_valid, cells, triangles, tri_valid) = (
                jax.device_get(
                    (vertices, vertex_valid, cells, triangles, tri_valid)
                )
            )
            if int(n_vertices) > max_vertices or int(n_triangles) > max_triangles:
                import logging

                logging.getLogger("nvblox_mindmap_tpu.mapping").warning(
                    "color-mesh budget overflow: %d vertices / %d triangles "
                    "(budget %d / %d); mesh truncated",
                    int(n_vertices), int(n_triangles),
                    max_vertices, max_triangles,
                )
            vertices = np.asarray(vertices)[vertex_valid]
            cells = np.asarray(cells)[vertex_valid]
            triangles = np.asarray(triangles)[tri_valid]
            state = jax.device_get(self.states[mapper_id])
        else:
            from nvblox_mindmap_tpu.mapping.surface_nets import surface_nets

            state = jax.device_get(self.states[mapper_id])
            vertices, triangles, cells = surface_nets(
                np.asarray(state.tsdf),
                np.asarray(state.weight),
                cfg.voxel_size_m,
                np.asarray(cfg.aabb_min_m, dtype=np.float64),
                truncation=cfg.truncation_distance_m,
            )
        colors = self._lookup_pool_host(state, cfg, cells, state.color,
                                        state.color_weight)
        self._color_mesh_cache = (vertices, triangles, colors)

    def get_color_mesh(self, mapper_id: int = MapperId.STATIC):
        """Returns (vertices (V, 3), triangles (T, 3), colors (V, 3))."""
        if not hasattr(self, "_color_mesh_cache"):
            self.update_color_mesh(mapper_id)
        return self._color_mesh_cache

    @staticmethod
    def _lookup_pool_host(state, cfg: MappingConfig, voxels: np.ndarray,
                          pool, pool_weight) -> np.ndarray:
        """Host-side per-voxel pool lookup (zeros where unallocated)."""
        if len(voxels) == 0:
            return np.zeros((0, np.asarray(pool).shape[-1]), np.float32)
        b = cfg.block_size
        page_table = np.asarray(state.page_table)
        pool = np.asarray(pool)
        pool_weight = np.asarray(pool_weight)
        vx, vy, vz = voxels.T
        page = page_table[vx // b, vy // b, vz // b]
        slot = ((vx % b) * b + (vy % b)) * b + (vz % b)
        safe = np.maximum(page, 0)
        values = pool[safe, slot].astype(np.float32)
        has = (page >= 0) & (pool_weight[safe, slot] > 0)
        return np.where(has[:, None], values, 0.0)

    # --- dense queries (layer views) -----------------------------------------
    def tsdf_dense(self, mapper_id: int = MapperId.STATIC) -> jnp.ndarray:
        return vg.query_tsdf_dense(self.states[mapper_id], self.configs[mapper_id])

    def features_dense(self, mapper_id: int = MapperId.STATIC) -> jnp.ndarray:
        """(X, Y, Z, F) dense feature grid (zeros where unallocated)."""
        return vg.query_features_dense(
            self.states[mapper_id], self.configs[mapper_id]
        )

    def colors_dense(self, mapper_id: int = MapperId.STATIC) -> jnp.ndarray:
        """(X, Y, Z, 3) dense color grid (zeros where unallocated)."""
        return vg.query_colors_dense(
            self.states[mapper_id], self.configs[mapper_id]
        )

    def weight_dense(self, mapper_id: int = MapperId.STATIC) -> jnp.ndarray:
        return self.states[mapper_id].weight

    # --- persistence ---------------------------------------------------------
    def save_map(self, path: str, mapper_id: int = MapperId.STATIC):
        state = jax.device_get(self.states[mapper_id])
        payload = {
            "config": self.configs[mapper_id],
            "state": {
                f.name: np.asarray(getattr(state, f.name))
                for f in state.__dataclass_fields__.values()
            },
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_from_file(self, path: str, mapper_id: int = MapperId.STATIC):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self._apply_payload(payload, mapper_id)

    def _apply_payload(self, payload, mapper_id: int):
        self.configs[mapper_id] = payload["config"]
        self.states[mapper_id] = vg.VoxelGridState(
            **{k: jnp.asarray(v) for k, v in payload["state"].items()}
        )
        self._mesh_cache.pop(mapper_id, None)


def integrate_frame(
    mapper: Mapper,
    config: MappingConfig,
    depth_frame: np.ndarray,
    feature_frame: np.ndarray,
    intrinsics: np.ndarray,
    camera_pose: np.ndarray,
    rgb: np.ndarray,
    input_mask: np.ndarray,
    input_mask_erosion_iterations: int,
    valid_depth_mask_erosion_iterations: int,
    mapper_id: int,
) -> Dict[str, np.ndarray]:
    """Per-frame fusion recipe (depth + color + feature with mask hygiene).

    Mirrors reference helpers/nvblox_mapping_helpers.py:integrate_frame.
    """
    depth_frame = jnp.asarray(depth_frame, dtype=jnp.float32)
    input_mask = jnp.asarray(input_mask, dtype=bool)
    valid_depth_mask = depth_frame > config.min_integration_distance_m
    depth_mask = input_mask & valid_depth_mask

    mapper.add_depth_frame(depth_frame, camera_pose, intrinsics, depth_mask, mapper_id)
    mapper.add_color_frame(rgb, camera_pose, intrinsics, depth_mask, mapper_id)

    # Eroded masks for the (convolution-bled) feature image.
    input_eroded = erode_mask(input_mask, iterations=input_mask_erosion_iterations)
    depth_eroded = erode_mask(
        valid_depth_mask, iterations=valid_depth_mask_erosion_iterations
    )
    mask_eroded = input_eroded & depth_eroded

    fh, fw = feature_frame.shape[:2]
    assert fh == fw, "square feature images only"
    upscale = fh / depth_frame.shape[0]
    feature_intrinsics = np.asarray(intrinsics, dtype=np.float32).copy()
    feature_intrinsics[:2, :] *= upscale

    # Nearest upscale of the mask to the feature resolution.
    reps = int(round(upscale))
    if reps >= 1:
        mask_up = jnp.repeat(jnp.repeat(mask_eroded, reps, axis=0), reps, axis=1)
    else:
        factor = int(round(1 / upscale))
        mask_up = downscale_mask(mask_eroded[None, None], factor)[0, 0]
    border = get_border_mask((fh, fw), config.feature_mask_border_percent)
    feature_mask = border & mask_up

    mapper.add_feature_frame(
        jnp.asarray(feature_frame, dtype=jnp.float16),
        camera_pose,
        feature_intrinsics,
        feature_mask,
        mapper_id,
    )
    return {
        "depth_mask": np.asarray(depth_mask),
        "feature_mask": np.asarray(feature_mask),
    }


def nvblox_integrate(
    mapper: Mapper,
    config: MappingConfig,
    depth_frame: np.ndarray,
    feature_frame: np.ndarray,
    intrinsics: np.ndarray,
    camera_pose: np.ndarray,
    rgb: np.ndarray,
    dynamic_mask: Optional[np.ndarray],
    include_dynamic: bool,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Route one camera frame into the STATIC (and optionally DYNAMIC) mapper.

    Mirrors reference helpers/nvblox_mapping_helpers.py:nvblox_integrate:
    robot pixels (``dynamic_mask``, built from the task's
    ``dynamic_class_labels``) are excluded from the static spatial-memory map
    and, when ``include_dynamic``, integrated into the DYNAMIC mapper with
    their own (smaller) erosion radius. A missing segmentation channel
    (``dynamic_mask is None``) degrades to static-everything.
    """
    if config.use_dynamic_mask and dynamic_mask is not None:
        static_mask = ~np.asarray(dynamic_mask, dtype=bool)
    else:
        static_mask = np.ones(np.asarray(depth_frame).shape, dtype=bool)

    images = {
        "STATIC": integrate_frame(
            mapper,
            config,
            depth_frame,
            feature_frame,
            intrinsics,
            camera_pose,
            rgb,
            input_mask=static_mask,
            input_mask_erosion_iterations=config.static_mask_erosion_iterations,
            valid_depth_mask_erosion_iterations=(
                config.valid_depth_mask_erosion_iterations
            ),
            mapper_id=MapperId.STATIC,
        )
    }
    if include_dynamic:
        if dynamic_mask is None:
            raise ValueError(
                "include_dynamic requires a segmentation channel "
                "(CameraFrame.segmentation / <idx>.<cam>_semantic.png) to "
                "build the dynamic mask from"
            )
        images["DYNAMIC"] = integrate_frame(
            mapper,
            config,
            depth_frame,
            feature_frame,
            intrinsics,
            camera_pose,
            rgb,
            input_mask=np.asarray(dynamic_mask, dtype=bool),
            input_mask_erosion_iterations=config.dynamic_mask_erosion_iterations,
            valid_depth_mask_erosion_iterations=(
                config.valid_depth_mask_erosion_iterations
            ),
            mapper_id=MapperId.DYNAMIC,
        )
    return images


def get_vertices_and_features(
    mapper: Mapper,
    mapper_id: int = MapperId.STATIC,
    remove_zero_features: bool = False,
    num_excess_features: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract valid surface vertices + features as host numpy arrays.

    Mirrors reference helpers/nvblox_output_helpers.py:22-80:
    ``num_excess_features`` trailing (padding) channels are dropped first and
    ``remove_zero_features`` discards vertices whose features are all zero so
    featureless points never reach the vertex sample budget. (The AABB filter
    of the reference is implicit here: the dense-in-AABB grid cannot produce
    vertices outside the workspace bounds.)
    """
    vertices, features, valid = mapper.get_feature_mesh(mapper_id)
    vertices, features, valid = jax.device_get((vertices, features, valid))
    vertices, features = vertices[valid], features[valid]
    if num_excess_features > 0:
        features = features[..., :-num_excess_features]
    if remove_zero_features:
        nonzero = ~np.all(features == 0, axis=1)
        vertices, features = vertices[nonzero], features[nonzero]
    return vertices, features


def save_feature_mesh_to_disk(
    mapper: Mapper,
    path: str,
    mapper_id: int = MapperId.STATIC,
    remove_zero_features: bool = True,
    num_excess_features: int = 0,
    include_dynamic: bool = False,
):
    """Persist the feature mesh as the reference's zstd-pickled dict.

    ``remove_zero_features`` defaults True, matching the reference's datagen
    export (nvblox_to_disk_helpers.py:41-45). ``include_dynamic`` concatenates
    the DYNAMIC mapper's vertices after the static ones - an intentional
    extension: the reference asserts this unsupported for mesh encoding
    (nvblox_to_disk_helpers.py:40), while here the dual-mapper state makes the
    combined export straightforward.
    """
    from nvblox_mindmap_tpu.data.dataset import pickle_zst

    mapper.update_feature_mesh(mapper_id)
    vertices, features = get_vertices_and_features(
        mapper, mapper_id, remove_zero_features, num_excess_features
    )
    if include_dynamic:
        mapper.update_feature_mesh(MapperId.DYNAMIC)
        dyn_v, dyn_f = get_vertices_and_features(
            mapper, MapperId.DYNAMIC, remove_zero_features, num_excess_features
        )
        vertices = np.concatenate([vertices, dyn_v], axis=0)
        features = np.concatenate([features, dyn_f], axis=0)
    pickle_zst(
        {
            "vertices": vertices.astype(np.float16),
            "features": features.astype(np.float16),
            "channel_length": int(features.shape[1]),
        },
        path,
    )
