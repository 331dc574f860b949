"""Orbax checkpoint backend roundtrip."""
import numpy as np

import jax.numpy as jnp

from nvblox_mindmap_tpu.training.orbax_checkpoint import OrbaxCheckpointer


def test_orbax_best_last_roundtrip(tmp_path):
    ckpt = OrbaxCheckpointer(str(tmp_path), async_write=False)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    opt = {"m": jnp.full((3, 3), 0.5)}
    best = ckpt.save_best_and_last(params, opt, 10, 0.7, None)
    assert best == 0.7
    # A worse loss updates last but not best.
    best = ckpt.save_best_and_last(params, opt, 20, 0.9, best)
    assert best == 0.7
    p, o, step, bl = ckpt.restore("best", params, opt)
    assert step == 10 and abs(bl - 0.7) < 1e-9
    np.testing.assert_array_equal(np.asarray(p["w"]), np.ones((3, 3)))
    p, o, step, bl = ckpt.restore("last", params, opt)
    assert step == 20
