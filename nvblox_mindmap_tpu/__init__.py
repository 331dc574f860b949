"""nvblox_mindmap_tpu: a TPU-native (JAX/XLA/Pallas) 3D diffusion policy framework.

Re-implements the capabilities of NVlabs/nvblox_mindmap (a 3D diffusion policy
for robot manipulation with nvblox deep-feature spatial memory) as an idiomatic
JAX framework:

- ``models``     : DiffuserActor denoising-diffusion keypose policy (flax).
- ``ops``        : rotary 3D positional encodings, fused attention, FPS,
                   diffusion schedulers - the TPU compute kernels.
- ``mapping``    : TSDF + deep-feature voxel mapper (the nvblox equivalent)
                   built on dense-in-AABB grids and block-paged feature storage.
- ``data``       : demo dataset reader, keypose extraction, augmentation,
                   weighted sampling and batching (numpy, host-side).
- ``embodiments``: arm (Franka) and humanoid (GR1T2) state/action codecs.
- ``training``   : pjit data-parallel trainer, AdamW, checkpointing.
- ``closed_loop``: policy runners and task evaluators.
- ``geometry``   : quaternion / rotation-matrix / 6D rotation conversions.
"""

__version__ = "0.1.0"
