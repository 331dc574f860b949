"""Packed epoch staging: materialize the real data path once, train chip-fed.

Problem (measured, docs/pages/benchmarks.md): the training feed is host-CPU
work — png/zstd decode, keypose windowing, backprojection — and a 1-core
host feeds ~8-15 samples/s while the chip consumes hundreds; worse, on a
remote-dispatch backend the per-step host->device re-upload of a flagship
batch costs seconds (9.4 s/step measured through the tunnel). Streaming the
loader per step therefore CANNOT keep the chip busy here, no matter how many
loader threads run.

The TPU-first answer has two halves:

1. **Materialize** (offline, once): run the production ``DataLoader``
   (the real decode/window/transform path, reference
   ``data_loading/dataset.py:499``'s worker model) and write its batches to
   one flat ``.npy`` per key — uncompressed, so ``np.load(mmap_mode="r")``
   gives zero-copy views (the same trick as the checkpoint mmap fast path).
   RGB re-packs to uint8 (the loader's own ``RgbTransformer`` is
   uint8/255, so the round trip is exact); everything else keeps the
   loader's dtype.

2. **Stage to device** (once per run): upload the packed epoch into HBM as
   whole ``(N, B, ...)`` arrays and slice batch ``i`` per step ON DEVICE —
   an XLA slice over HBM (~sub-ms), no host work, no tunnel transfer. The
   uint8->float conversion happens device-side in ``prepare_inputs``.
   Training then runs at the device-only step rate; the host's only job per
   step is dispatching.

For epochs larger than HBM, ``stage_to_device`` takes an index subset —
callers can rotate segments between epochs (one upload amortized over
hundreds of steps each).

``bench.py --measure train_e2e`` demonstrates the contract: a sustained
500-step flagship-shape run from a packed epoch at >= 80% of the
device-only step rate.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Sequence

import numpy as np

_META = "packed_meta.json"

# Fixed-size .npy 2.0 header (magic 6 + version 2 + len 4 + text 244 = 256
# bytes, a multiple of 64 as the format recommends): the leading dimension
# is unknown until the last batch lands, so the header is written as a
# placeholder and REWRITTEN in place on finalize — fixed size makes that
# rewrite safe regardless of how many digits the final N has.
_HEADER_TEXT_LEN = 244


def _write_npy_header(f, dtype: np.dtype, shape: tuple) -> None:
    text = repr({
        "descr": np.lib.format.dtype_to_descr(np.dtype(dtype)),
        "fortran_order": False,
        "shape": tuple(int(s) for s in shape),
    })
    assert len(text) < _HEADER_TEXT_LEN, f"npy header too long: {text}"
    text = text + " " * (_HEADER_TEXT_LEN - len(text) - 1) + "\n"
    f.write(b"\x93NUMPY" + bytes([2, 0]))
    f.write(np.uint32(_HEADER_TEXT_LEN).tobytes())
    f.write(text.encode("latin1"))


def _is_exact_uint8_rgb(key: str, arr: np.ndarray) -> bool:
    """True when the float array is exactly uint8/255 (RgbTransformer output)."""
    if "rgb" not in key or arr.dtype != np.float32:
        return False
    if arr.size == 0 or float(arr.min()) < 0.0 or float(arr.max()) > 1.0:
        return False
    scaled = arr * 255.0
    return bool(np.array_equal(scaled, np.round(scaled)))


def materialize_packed_epoch(
    batches: Iterable[Dict[str, Any]],
    path: str,
    num_batches: Optional[int] = None,
) -> Dict[str, Any]:
    """Write loader batches to a packed-epoch directory.

    ``batches``: any iterable of model-input batch dicts (a production
    ``DataLoader`` in the intended use). All batches must share structure
    and shape (training loaders use drop_last=True). Returns the metadata
    dict (also written to ``packed_meta.json``).
    """
    os.makedirs(path, exist_ok=True)
    writers: Dict[str, Any] = {}
    meta: Dict[str, Any] = {"keys": {}, "none_keys": [], "num_batches": 0}
    shapes: Dict[str, tuple] = {}
    n = 0
    for batch in batches:
        if num_batches is not None and n >= num_batches:
            break
        for key, value in batch.items():
            if value is None:
                if n == 0:
                    meta["none_keys"].append(key)
                else:
                    assert key in meta["none_keys"], f"{key} became None mid-epoch"
                continue
            arr = np.asarray(value)
            if n == 0:
                rgb_u8 = _is_exact_uint8_rgb(key, arr)
                meta["keys"][key] = {
                    "dtype": "uint8" if rgb_u8 else str(arr.dtype),
                    "rgb_uint8": rgb_u8,
                    "batch_shape": list(arr.shape),
                }
                shapes[key] = arr.shape
                writers[key] = open(os.path.join(path, f"{key}.npy"), "wb")
                # Placeholder header; rewritten in place with the true N on
                # finalize (fixed-size header makes the rewrite safe).
                _write_npy_header(
                    writers[key], meta["keys"][key]["dtype"], (0,) + arr.shape
                )
            else:
                assert arr.shape == shapes[key], (
                    f"{key}: shape {arr.shape} != first batch {shapes[key]} "
                    "(pack training loaders with drop_last=True)"
                )
            if meta["keys"][key]["rgb_uint8"]:
                # The uint8 decision is made on batch 0; every later batch
                # must stay on the 1/255 grid or the cast would silently
                # corrupt it (np.round(1.2*255)=306 wraps to 50 as uint8).
                if n > 0 and not _is_exact_uint8_rgb(key, arr):
                    raise ValueError(
                        f"{key}: batch {n} is not exactly uint8/255 while "
                        "batch 0 was; uint8 rgb packing needs every batch "
                        "on the 1/255 grid (disable photometric transforms "
                        "or pack as float32)"
                    )
                arr = np.round(arr * 255.0).astype(np.uint8)
            writers[key].write(np.ascontiguousarray(arr).tobytes())
        n += 1
    assert n > 0, "no batches to pack"
    meta["num_batches"] = n
    for key, f in writers.items():
        f.close()
        with open(os.path.join(path, f"{key}.npy"), "r+b") as g:
            _write_npy_header(g, meta["keys"][key]["dtype"], (n,) + shapes[key])
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class PackedEpoch:
    """Zero-copy view over a packed-epoch directory (mmap'd .npy per key)."""

    def __init__(self, path: str):
        with open(os.path.join(path, _META)) as f:
            self.meta = json.load(f)
        self.path = path
        self.arrays: Dict[str, np.ndarray] = {
            key: np.load(os.path.join(path, f"{key}.npy"), mmap_mode="r")
            for key in self.meta["keys"]
        }
        for key, arr in self.arrays.items():
            expect = (self.meta["num_batches"],) + tuple(
                self.meta["keys"][key]["batch_shape"]
            )
            assert arr.shape == expect, (
                f"{key}: on-disk shape {arr.shape} != meta {expect}"
            )

    def __len__(self) -> int:
        return int(self.meta["num_batches"])

    def batch(self, i: int, decode_rgb: bool = True) -> Dict[str, Any]:
        """Batch ``i`` as numpy (host) arrays; rgb back to float32 [0,1]."""
        out: Dict[str, Any] = {k: None for k in self.meta["none_keys"]}
        for key, arr in self.arrays.items():
            v = np.asarray(arr[i])
            if decode_rgb and self.meta["keys"][key]["rgb_uint8"]:
                v = v.astype(np.float32) / 255.0
            out[key] = v
        return out


def stage_to_device(
    packed: PackedEpoch,
    indices: Optional[Sequence[int]] = None,
    sharding: Optional[Any] = None,
) -> Dict[str, Any]:
    """Upload packed batches into HBM as (N, B, ...) device arrays.

    One transfer per key (the whole point: amortize the tunnel/host cost
    over every step that follows). ``sharding`` shards the BATCH dim (axis
    1) across a data mesh — pass ``jax.sharding.NamedSharding(mesh,
    P(None, "data"))``. uint8 rgb stays uint8 on device; ``prepare_inputs``
    upcasts it inside the compiled step.
    """
    import jax

    idx = np.asarray(indices if indices is not None else range(len(packed)))
    staged: Dict[str, Any] = {k: None for k in packed.meta["none_keys"]}
    for key, arr in packed.arrays.items():
        host = np.ascontiguousarray(arr[idx])
        staged[key] = (
            jax.device_put(host, sharding) if sharding is not None
            else jax.device_put(host)
        )
    staged["__num_batches__"] = len(idx)
    return staged


class PackedDeviceLoader:
    """DataLoader-shaped iterator over a DEVICE-staged packed epoch.

    Drop-in for ``Trainer.run_training``'s loader interface (``__len__``,
    ``__iter__``, ``.sampler``): batches come out as device arrays (HBM
    slices), so the trainer's ``shard_batch`` device_put is a no-op and the
    per-step host cost is dispatch only. Shuffling permutes the BATCH order
    per epoch on the host (indices only — no data movement); within-batch
    composition is fixed at materialization time, matching the reference's
    epoch-level reshuffle granularity (``set_epoch`` every N epochs).
    """

    sampler = None  # trainer probes loader.sampler for set_epoch

    def __init__(
        self,
        packed: "PackedEpoch | str",
        mesh: Optional[Any] = None,
        shuffle: bool = True,
        seed: int = 0,
        indices: Optional[Sequence[int]] = None,
    ):
        if isinstance(packed, str):
            packed = PackedEpoch(packed)
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            sharding = NamedSharding(mesh, PartitionSpec(None, "data"))
        self._staged = stage_to_device(packed, indices=indices,
                                       sharding=sharding)
        self._n = self._staged["__num_batches__"]
        self._shuffle = shuffle
        self._seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        return self._n

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle stream to an absolute epoch index.

        The trainer calls this with ``step // epoch_length`` so a run
        RESUMED from a checkpoint replays the same batch orders the
        uninterrupted run would have used (plain iteration without
        ``set_epoch`` falls back to the internal counter).
        """
        self._epoch = int(epoch)

    def __iter__(self):
        order = np.arange(self._n)
        if self._shuffle:
            order = np.random.default_rng(
                [self._seed, self._epoch]
            ).permutation(self._n)
        self._epoch += 1
        for i in order:
            yield device_batch(self._staged, int(i))


def device_batch(staged: Dict[str, Any], step: int) -> Dict[str, Any]:
    """Batch ``step % N`` as device slices — an XLA gather over HBM, no host
    data movement. Feed to ``Trainer.train_one_step(..., on_device=True)``."""
    n = staged["__num_batches__"]
    i = step % n
    return {
        k: (None if v is None else v[i])
        for k, v in staged.items()
        if k != "__num_batches__"
    }
