"""Low-level TPU-native ops: STFT, convolution primitives, norms, scans.

Submodules are imported lazily by their users; no function re-exports here so
that module names (e.g. ``rtfs_tpu.ops.stft``) stay addressable.
"""

from . import stft  # noqa: F401
