"""mra_gan_tpu — TPU-native 3D CycleGAN framework for unpaired medical-image
translation (JAX / XLA / Pallas / pjit).

A ground-up TPU-first rebuild of the capability surface of
pedrob37/MRA-GAN (3D CycleGAN for MR↔MRA synthesis, PyTorch+MONAI+SimpleITK):

- ``ops``       — 3D conv / transposed-conv / norm / loss primitives (NDHWC,
                  MXU-friendly), with Pallas fused kernels for hot paths.
- ``models``    — network zoo (ResNet / U-Net / DynUNet generators, PatchGAN
                  discriminators) as flax.linen modules + the functional
                  CycleGAN training algorithm compiled to ONE jitted step.
- ``data``      — dependency-free NIfTI-1 IO, physical-space resampling,
                  patch sampling, and on-device JAX augmentations.
- ``parallel``  — mesh construction + sharding rules (DP over ICI first).
- ``training``  — LR schedules, epoch driver, logging.
- ``infer``     — sliding-window full-volume inference with overlap blending.
- ``checkpoint``— Orbax save/restore + torch-checkpoint import shim.
- ``options``   — argparse flag surface compatible with the reference CLIs.
"""

__version__ = "0.1.0"
