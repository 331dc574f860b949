"""Materialize a packed training epoch: the offline half of chip-fed training.

Runs the PRODUCTION data path (the same ``build_loaders`` assembly as
``apps/run_training`` — decode, keypose windows, transforms, vertex
sampling) once, and writes the resulting batches to a packed-epoch
directory (``data/packed.py``: one mmap-able .npy per key + meta). Train
from it with ``run_training --packed_dataset <out>``: the epoch is staged
into HBM once and every step slices it on device, so a slow host or
transfer link no longer bounds the step rate.

Host-only (numpy): never touches an accelerator. Replaces, for the packed
mode, the per-step DataLoader worker feed the reference trains with
(reference: mindmap/data_loading/dataset.py:499).

Usage:
    python -m nvblox_mindmap_tpu.scripts.pack_dataset \
        --dataset <demos> --task cube_stacking --data_type mesh \
        --feature_type rgb --demos_train 0-7 --batch_size 32 \
        --packed_out /tmp/packed [--packed_num_batches 64]
"""
from __future__ import annotations

import dataclasses
import json
import logging

from nvblox_mindmap_tpu.utils.config import TrainingAppArgs, parse_args

logger = logging.getLogger("nvblox_mindmap_tpu.pack_dataset")


@dataclasses.dataclass
class PackDatasetArgs(TrainingAppArgs):
    packed_out: str = "/tmp/packed_epoch"
    # 0 packs exactly one epoch; >0 packs that many batches (cycling the
    # loader across epochs, each with its own transform draws).
    packed_num_batches: int = 0


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
    args = parse_args(PackDatasetArgs, argv)
    assert args.task is not None, "--task is required"
    assert args.dataset is not None, "--dataset is required"

    from nvblox_mindmap_tpu.apps.run_training import build_loaders
    from nvblox_mindmap_tpu.data.packed import materialize_packed_epoch
    from nvblox_mindmap_tpu.embodiments.registry import make_embodiment_for_task

    embodiment = make_embodiment_for_task(args.task)
    train_loader, _, _ = build_loaders(args, embodiment, skip_val=True)
    n = args.packed_num_batches or len(train_loader)

    def batches():
        written = 0
        while written < n:
            for batch in train_loader:  # each epoch redraws transforms
                if written >= n:
                    return
                yield batch
                written += 1

    meta = materialize_packed_epoch(batches(), args.packed_out, num_batches=n)
    logger.info(
        "packed %d batches -> %s\n%s",
        meta["num_batches"], args.packed_out, json.dumps(meta, indent=1),
    )
    return meta


if __name__ == "__main__":
    main()
