"""Model zoo: AVNet composition, separators, layer registries."""

from . import layers  # noqa: F401
from .avnet import AVNet  # noqa: F401
