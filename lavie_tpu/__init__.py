"""lavie_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-video framework.

A from-scratch rebuild of the capabilities of rigelshysaj/LaVie: a three-stage
text-to-video cascade (base T2V, temporal interpolation, video super-resolution)
plus the fork's image-conditioned LoRA fine-tuning and CLIPSIM/FVD evaluation.

Unlike the reference (three copy-pasted PyTorch stage packages), this is one
shared library: a single configurable spatio-temporal UNet covers all three
stages, diffusion math is pure table-driven functions scanned under `jit`, and
attention runs through fused TPU kernels.
"""

__version__ = "0.1.0"
