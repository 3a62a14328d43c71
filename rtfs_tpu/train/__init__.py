"""Training system: optimizers, train state, jitted train/val steps."""

from .optim import make_optimizer, ReduceLROnPlateau, EpochDivideLR  # noqa: F401
from .system import AVSystem, TrainState  # noqa: F401
