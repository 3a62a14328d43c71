"""Synthetic random dataset — the ``local_test.py`` smoke-train fixture.

Parity with the reference's fake dataset (``local_test.py:22-35``): random
waveforms + random mouth crops with the real shapes, so a 1-epoch train
exercises the full system without any data on disk.

Index-addressed and host-shardable: sample ``i`` is a pure function of
``(dataset seed, i)``, so a multi-process run sharding the index plan
(``host_id::num_hosts``, same rule as ``AVSpeechDataset``) sees exactly the
same global batch membership as a single-process run — the property the
multi-host equivalence test pins (tests/test_multihost.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List

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

    def __getitem__(self, idx: int, rng=None):
        """Sample ``idx`` deterministically from (self.seed, idx)."""
        rng = np.random.default_rng((self.seed, int(idx)))
        length = int(self.segment * self.sample_rate)
        src = rng.standard_normal((self.n_src, length)).astype(np.float32) * 0.1
        mouth = rng.standard_normal(
            (self.video_frames, self.mouth_size, self.mouth_size)
        ).astype(np.float32)
        return src.sum(0), src, mouth, f"synthetic_{idx}"

    def batch_index_plan(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        epoch: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
    ) -> List[np.ndarray]:
        """Deterministic per-epoch plan, sharded across hosts — same rule
        as ``AVSpeechDataset.batch_index_plan``."""
        order = np.arange(self.n_samples)
        rng = np.random.default_rng(seed + epoch * 7919)
        if shuffle:
            rng.shuffle(order)
        order = order[host_id::num_hosts]
        stop = len(order) - (len(order) % batch_size if drop_last else 0)
        return [order[s: s + batch_size] for s in range(0, stop, batch_size)]

    def sample_rng(self, idx: int, seed: int, epoch: int):
        return None  # samples are pure functions of (self.seed, idx)

    def collate(self, items: List[tuple]) -> dict:
        return {
            "mix": np.stack([it[0] for it in items]),
            "src": np.stack([it[1] for it in items]),
            "mouth": np.stack([it[2] for it in items]),
            "key": [it[3] for it in items],
        }

    def batches(self, batch_size: int, **plan_kwargs) -> Iterator[dict]:
        for idxs in self.batch_index_plan(batch_size, **plan_kwargs):
            yield self.collate([self.__getitem__(int(i)) for i in idxs])
