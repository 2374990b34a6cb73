"""sisr_tpu — TPU-native single-image super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CoderLinxin/Single-Image-Super-Resolution-Application (PyTorch/CUDA):

* ``sisr_tpu.models``       — HiT-SIR-Pro (flax), UNet-SN discriminator, VGG losses
* ``sisr_tpu.ops``          — resize / color / metrics / window primitives (+ Pallas kernels)
* ``sisr_tpu.data``         — blind-SR degradation pipeline + host data loading
* ``sisr_tpu.parallel``     — device-mesh sharding and overlap-tiled inference
* ``sisr_tpu.train``        — losses, optimizers, checkpointing
* ``sisr_tpu.experiments``  — config-driven train/eval/test experiment runner
* ``sisr_tpu.configs``      — typed config classes (field parity with the reference)

Design: pure-functional flax models over NHWC activations, one jit-compiled
train step (loss + grad + psum + update), static shapes everywhere, host-side
stochastic degradation feeding a double-buffered device prefetch.
"""

__version__ = "0.1.0"
