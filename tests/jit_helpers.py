"""Jit wrappers for test hot paths.

Eager (op-by-op) execution on the suite's 8-virtual-device CPU backend costs
tens of seconds even for tiny models - a full eager reverse-diffusion pass
measures ~12 s where the compiled program runs in under a second and lands
in the persistent compile cache. Production code always jits (trainer,
make_infer_fn, serving); these helpers give tests the same treatment.
"""
import jax

from nvblox_mindmap_tpu.models.diffuser_actor import sample_trajectory


def jit_sample(model, variables, prepared, rng, bounds, **kw):
    """jitted sample_trajectory with identical call signature."""
    fn = jax.jit(
        lambda v, p, r, b: sample_trajectory(model, v, p, r, b, **kw)
    )
    return fn(variables, prepared, rng, bounds)
