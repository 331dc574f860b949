"""Checkpoint inspection tools (reference: scripts/print_checkpoint_iters.py,
extract_fpn_from_model.py)."""
from __future__ import annotations

import argparse
import pickle
from typing import Optional

from flax import serialization


def print_checkpoint_info(path: str):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    print(f"{path}: iter={payload['iter']} best_loss={payload['best_loss']}")
    return payload["iter"], payload["best_loss"]


def extract_subtree(path: str, subtree: str, output_path: str):
    """Extract a named params subtree (e.g. the trainable FPN) to its own file.

    The reference's extract_fpn_from_model saves the CLIP extractor's FPN so
    non-RGBD runs can load a frozen FPN; here any subtree path like
    "encoder/feature_extractor/fpn" can be carved out.
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = serialization.msgpack_restore(payload["params"])
    node = params
    for key in subtree.split("/"):
        assert key in node, f"{key} not in {sorted(node)}"
        node = node[key]
    with open(output_path, "wb") as f:
        f.write(serialization.msgpack_serialize(node))
    print(f"Wrote {subtree} -> {output_path}")


def load_subtree(path: str):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(bytearray(f.read()))


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_info = sub.add_parser("info")
    p_info.add_argument("checkpoint")
    p_extract = sub.add_parser("extract")
    p_extract.add_argument("checkpoint")
    p_extract.add_argument("subtree")
    p_extract.add_argument("output")
    args = parser.parse_args(argv)
    if args.cmd == "info":
        print_checkpoint_info(args.checkpoint)
    else:
        extract_subtree(args.checkpoint, args.subtree, args.output)


if __name__ == "__main__":
    main()
