"""Data layer: manifest dataset, transforms, synthetic smoke fixtures."""

from .dataset import AVSpeechDataset, normalize_wav  # noqa: F401
from .loader import PrefetchLoader  # noqa: F401
from .synthetic import SyntheticAVDataset  # noqa: F401
from .transforms import preprocess_mouth  # noqa: F401
