"""RTFS-TPU: a TPU-native audio-visual speech separation framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
RTFS-Net (ICLR 2024, arXiv:2309.17189; reference repo
SutirthaChakraborty/RTFS-Net). The compute path is pure JAX (jit/pjit over a
`jax.sharding.Mesh`), the hot recurrence runs as a fused TPU kernel, and the
model zoo (RTFS-Net, TDFNet, CTCNet) is composed from a typed, string-keyed
layer registry mirroring the reference's config-driven design.

Layout convention: channels-LAST everywhere inside the model ("NHWC"/"NTC"),
which is the fast layout for TPU convolutions and keeps the channel axis on
the 128-wide vector lanes. The reference uses channels-first; converters in
`rtfs_tpu.utils.torch_import` handle weight translation.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
