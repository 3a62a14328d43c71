"""Synthetic random dataset — the ``local_test.py`` smoke-train fixture.

Parity with the reference's fake dataset (``local_test.py:22-35``): random
waveforms + random mouth crops with the real shapes, so a 1-epoch train
exercises the full system without any data on disk.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np


@dataclass
class SyntheticAVDataset:
    n_samples: int = 16
    n_src: int = 1
    sample_rate: int = 16000
    segment: float = 2.0
    video_frames: int = 50
    mouth_size: int = 88
    seed: int = 0

    def __len__(self):
        return self.n_samples

    def batches(self, batch_size: int, **_) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed)
        length = int(self.segment * self.sample_rate)
        for _ in range(self.n_samples // batch_size):
            src = rng.standard_normal(
                (batch_size, self.n_src, length)
            ).astype(np.float32) * 0.1
            yield {
                "mix": src.sum(1),
                "src": src,
                "mouth": rng.standard_normal(
                    (batch_size, self.video_frames, self.mouth_size,
                     self.mouth_size)
                ).astype(np.float32),
                "key": [f"synthetic_{i}" for i in range(batch_size)],
            }
