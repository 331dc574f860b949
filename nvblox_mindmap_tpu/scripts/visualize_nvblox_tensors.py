"""Visualize a saved voxel map: TSDF slices + surface PLY (reference:
scripts/visualize_nvblox_tensors.py)."""
from __future__ import annotations

import argparse
import os

import numpy as np


def tsdf_slices_to_images(tsdf: np.ndarray, weight: np.ndarray,
                          num_slices: int = 8) -> np.ndarray:
    """(X, Y, Z) TSDF -> (num_slices, Y, Z, 3) diverging-color slice images."""
    X = tsdf.shape[0]
    idx = np.linspace(0, X - 1, num_slices).astype(int)
    out = []
    scale = np.abs(tsdf).max() or 1.0
    for i in idx:
        t = tsdf[i] / scale  # [-1, 1]
        observed = weight[i] > 0
        r = np.clip(-t, 0, 1)  # inside surface -> red
        b = np.clip(t, 0, 1)  # free space -> blue
        g = np.zeros_like(t)
        img = np.stack([r, g, b], axis=-1)
        out.append(np.where(observed[..., None], img, 0.15))
    return np.stack(out)


def main(argv=None):
    import imageio.v2 as imageio

    from nvblox_mindmap_tpu.mapping.constants import MapperId, MappingConfig
    from nvblox_mindmap_tpu.mapping.mapper import Mapper, get_vertices_and_features
    from nvblox_mindmap_tpu.visualization.visualizer import (
        save_feature_pointcloud_ply,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--map", required=True, help="saved map (.nvblx.pkl)")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--num_slices", type=int, default=8)
    args = parser.parse_args(argv)

    mapper = Mapper({MapperId.STATIC: MappingConfig()})
    mapper.load_from_file(args.map)
    os.makedirs(args.output_dir, exist_ok=True)

    state = mapper.states[MapperId.STATIC]
    slices = tsdf_slices_to_images(
        np.asarray(state.tsdf), np.asarray(state.weight), args.num_slices
    )
    for i, img in enumerate(slices):
        imageio.imwrite(
            os.path.join(args.output_dir, f"tsdf_slice_{i}.png"),
            (img * 255).astype(np.uint8),
        )

    mapper.update_feature_mesh()
    vertices, features = get_vertices_and_features(mapper)
    if len(vertices):
        save_feature_pointcloud_ply(
            os.path.join(args.output_dir, "surface.ply"), vertices, features
        )
    print(f"Wrote {len(slices)} slices + surface.ply ({len(vertices)} vertices)")


if __name__ == "__main__":
    main()
