"""kair_tpu — a TPU-native JAX/XLA/Pallas image & video restoration framework.

A from-scratch rebuild of the capabilities of KAIR (cszn's image-restoration
toolbox plus the Owen1B SPECT fork) designed TPU-first:

* compute path: jax / XLA / Pallas (NHWC layouts, static shapes, MXU-friendly
  channel counts, bf16-by-default training);
* scaling: a single `jax.sharding.Mesh` with data / tensor / tile axes,
  pjit-sharded train steps, and shard_map halo-tiled inference — no NCCL;
* runtime: functional TrainState pytrees, orbax-style single-file
  checkpoints with auto-resume, torch-checkpoint converters for the
  released model zoos.

Reference behaviours are cited as ``file:line`` into /root/reference
throughout the codebase so parity can be audited.
"""

__version__ = "0.1.0"
