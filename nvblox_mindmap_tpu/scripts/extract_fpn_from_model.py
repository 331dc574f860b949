"""Extract the trained CLIP-FPN neck from a policy checkpoint.

(reference: mindmap/scripts/extract_fpn_from_model.py) The FPN is the only
trainable part of the CLIP_RESNET50_FPN extractor; after training it can be
reused as the mapping extractor's neck (``--backbone_weights`` consumes the
emitted npz, whose ``params/fpn`` subtree grafts next to the frozen trunk).

    python -m nvblox_mindmap_tpu.scripts.extract_fpn_from_model \
        --model_path train_logs/checkpoints/<ts>/best.ckpt \
        --output_path fpn.npz
"""
from __future__ import annotations

import argparse
import pickle

from flax import serialization

from nvblox_mindmap_tpu.models.weight_conversion import save_variables_npz


def extract_fpn_weights(model_path: str, output_path: str) -> dict:
    with open(model_path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.msgpack_restore(payload["params"])
    try:
        fx = params["encoder"]["feature_extractor"]
        fpn = fx["fpn"]
    except KeyError as e:
        raise KeyError(
            "checkpoint has no encoder/feature_extractor/fpn subtree - was it "
            "trained with --feature_type clip_resnet50_fpn and an rgbd data "
            f"type? (missing {e})"
        ) from e
    variables = {"params": {"fpn": fpn}}
    if "backbone" in fx:
        # Ship the frozen trunk alongside so the npz is self-sufficient for
        # --backbone_weights.
        variables["params"]["backbone"] = fx["backbone"]
    save_variables_npz(output_path, variables)
    print(f"wrote FPN weights to {output_path}")
    return variables


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args(argv)
    extract_fpn_weights(args.model_path, args.output_path)


if __name__ == "__main__":
    main()
