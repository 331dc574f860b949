"""Native runtime decoder: build, decode parity, fallbacks."""
import os

import numpy as np
import pytest

from nvblox_mindmap_tpu.runtime import (
    decode_png,
    decode_png_batch,
    decode_zstd_pickle,
    ensure_built,
    native_available,
)


@pytest.fixture(scope="module")
def built():
    return ensure_built()


def test_zstd_pickle_roundtrip(tmp_path, built):
    from nvblox_mindmap_tpu.data.dataset import pickle_zst

    obj = {
        "vertices": np.random.default_rng(0).normal(size=(64, 3)).astype(np.float16),
        "features": np.random.default_rng(1).normal(size=(64, 8)).astype(np.float16),
        "channel_length": 8,
    }
    path = str(tmp_path / "x.zst")
    pickle_zst(obj, path)
    back = decode_zstd_pickle(path)
    np.testing.assert_array_equal(back["features"], obj["features"])
    np.testing.assert_array_equal(back["vertices"], obj["vertices"])


def test_png_decode_parity(tmp_path, built):
    import imageio.v2 as imageio

    rgb = np.random.default_rng(2).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    depth = np.random.default_rng(3).integers(0, 5000, (32, 32)).astype(np.uint16)
    rgb_path = str(tmp_path / "rgb.png")
    depth_path = str(tmp_path / "depth.png")
    imageio.imwrite(rgb_path, rgb)
    imageio.imwrite(depth_path, depth)

    np.testing.assert_array_equal(decode_png(rgb_path), rgb)
    d = decode_png(depth_path)
    assert d.dtype == np.uint16
    np.testing.assert_array_equal(d, depth)

    outs = decode_png_batch([rgb_path, depth_path, rgb_path])
    np.testing.assert_array_equal(outs[0], rgb)
    np.testing.assert_array_equal(outs[1], depth)


def test_native_build_state(built):
    # The library builds in this environment; if the toolchain were missing,
    # native_available() would be False and all entry points still work via
    # the Python fallbacks (covered above implicitly).
    assert isinstance(native_available(), bool)
    if built:
        assert native_available()


def test_png_batch_tolerates_corrupt_entry(tmp_path, built):
    import imageio.v2 as imageio

    good = tmp_path / "good.png"
    imageio.imwrite(str(good), np.full((8, 8, 3), 7, dtype=np.uint8))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\nthis is not a real png")
    missing = tmp_path / "missing.png"

    out = decode_png_batch([str(good), str(bad), str(missing)])
    assert out[0] is not None and out[0].shape == (8, 8, 3)
    assert out[1] is None
    assert out[2] is None
