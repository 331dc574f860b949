"""Precompute feature images for every RGB frame of a dataset (reference:
scripts/extract_image_features.py). Batches frames through the jitted
extractor and writes <idx>.<cam>_features.npy files."""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from nvblox_mindmap_tpu.data.dataset import get_demo_paths
from nvblox_mindmap_tpu.models.feature_extractors import FeatureExtractorType


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from nvblox_mindmap_tpu.models.feature_extractors import make_feature_extractor

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--demos", default="0")
    parser.add_argument("--feature_type", default="rgb")
    parser.add_argument("--feature_image_size", type=int, default=32)
    parser.add_argument("--camera", default="wrist")
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(argv)

    import imageio.v2 as imageio

    ft = FeatureExtractorType(args.feature_type)
    module = make_feature_extractor(
        ft, feature_image_size=(args.feature_image_size, args.feature_image_size)
    )
    params = None
    apply = jax.jit(lambda p, x: module.apply(p, x))

    for demo_path in get_demo_paths(args.dataset, args.demos):
        frames = sorted(
            glob.glob(os.path.join(demo_path, f"*.{args.camera}_rgb.png")),
            key=lambda p: int(os.path.basename(p).split(".")[0]),
        )
        for i in range(0, len(frames), args.batch_size):
            chunk = frames[i : i + args.batch_size]
            rgb = np.stack(
                [np.asarray(imageio.imread(p), np.float32) / 255.0 for p in chunk]
            )
            if params is None:
                params = module.init(jax.random.PRNGKey(0), jnp.asarray(rgb))
            feats = np.asarray(apply(params, jnp.asarray(rgb)))
            for path, feat in zip(chunk, feats):
                idx = os.path.basename(path).split(".")[0]
                np.save(
                    os.path.join(demo_path, f"{idx}.{args.camera}_features.npy"),
                    feat.astype(np.float16),
                )
        print(f"Extracted features for {len(frames)} frames in {demo_path}")


if __name__ == "__main__":
    main()
