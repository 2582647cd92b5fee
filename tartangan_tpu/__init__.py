"""tartangan-tpu: a TPU-native (JAX/XLA/Pallas) image-GAN training framework.

A from-scratch rebuild of the capabilities of awentzonline/tartangan
(reference layout mapped in /root/repo/SURVEY.md), designed TPU-first:

- pure-functional flax models in NHWC layout, bfloat16 compute on the MXU
- a single jitted train step per workload (D step + R1 + G step + EMA fused)
- data-parallel scale-out over a ``jax.sharding.Mesh`` (GSPMD collectives)
- host-side orchestration (components/callbacks, checkpointing, sampling)
  cleanly separated from the compiled device step
"""

__version__ = "0.1.0"
