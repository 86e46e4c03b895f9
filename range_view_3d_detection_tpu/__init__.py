"""rangebox-tpu: a TPU-native range-view LiDAR 3D detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``benjaminrwilson/range-view-3d-detection`` (torchbox3d, CoRL 2024):

- ``ops``        pure-JAX geometry, box coding, target assignment, losses,
                 rotated IoU and on-device NMS (replacing CUDA extensions).
- ``models``     Flax modules: meta-kernel stem, width-strided DLA-style
                 backbone, multi-scale detection heads, full detector.
- ``data``       host-side feather data pipeline with fixed-shape batches.
- ``parallel``   device meshes, sharding rules, collective helpers.
- ``training``   optimizer/schedule, jitted train step, loop, checkpoints.
- ``evaluation`` AV2 / Waymo detection metrics (dependency-free).
- ``utils``      config composition (Hydra-compatible conf/ tree), IO.
- ``kernels``    Pallas TPU kernels for hot ops.

Everything device-side is functional: static shapes, padded box sets with
validity masks, and a single jitted ``train_step`` sharded over a
``jax.sharding.Mesh`` instead of torch Lightning + DDP/NCCL.
"""

__version__ = "0.1.0"
