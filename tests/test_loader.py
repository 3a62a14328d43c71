"""PrefetchLoader tests: bit-parity with the sync path, placement,
exception propagation, early abandonment, synthetic fallback."""

import numpy as np
import pytest

import json

from rtfs_tpu.data import AVSpeechDataset, PrefetchLoader, SyntheticAVDataset


@pytest.fixture(scope="module")
def manifest_dir(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("loaderdata")
    mouths = root / "mouths"
    mouths.mkdir()
    rng = np.random.default_rng(0)
    entries = {"mix": [], "s1": [], "s2": []}
    for i in range(2):
        n = 32000
        s1 = rng.standard_normal(n).astype(np.float32) * 0.1
        s2 = rng.standard_normal(n).astype(np.float32) * 0.1
        for name, sig in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
            d = root / name
            d.mkdir(exist_ok=True)
            p = str(d / f"a{i}_0_-3_b{i}_1_3.wav")
            wavfile.write(p, 16000, sig)
            if name == "mix":
                entries[name].append((p, n))
        for spk_i, spk in enumerate((f"a{i}_0", f"b{i}_1")):
            mp = str(mouths / f"{spk}.npz")
            np.savez(mp, data=rng.integers(0, 255, (50, 96, 96)).astype(np.uint8))
            name = "s1" if spk_i == 0 else "s2"
            p = str(root / name / f"a{i}_0_-3_b{i}_1_3.wav")
            entries[name].append((p, mp, n))
    for name, info in entries.items():
        with open(root / f"{name}.json", "w") as f:
            json.dump(info, f)
    return str(root)


def _flatten(batches):
    return [
        (tuple(b["key"]), b["mix"].copy(), b["src"].copy(), b["mouth"].copy())
        for b in batches
    ]


def test_prefetch_matches_sync(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    kw = dict(seed=3, epoch=2, shuffle=True)
    sync = _flatten(ds.batches(2, **kw))
    loader = PrefetchLoader(ds, 2, num_workers=4)
    pre = _flatten(loader.epoch(**kw))
    assert len(sync) == len(pre) == 2
    for (ks, ms, ss, mos), (kp, mp, sp, mop) in zip(sync, pre):
        assert ks == kp
        np.testing.assert_array_equal(ms, mp)
        np.testing.assert_array_equal(ss, sp)
        np.testing.assert_array_equal(mos, mop)


def test_prefetch_place_and_key(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    calls = []

    def place(batch):
        assert "key" not in batch  # strings never reach device placement
        calls.append(sorted(batch))
        return {k: v + 0 for k, v in batch.items()}

    loader = PrefetchLoader(ds, 2, num_workers=2, place=place)
    out = list(loader.epoch(shuffle=False))
    assert len(out) == 2 and all("key" in b for b in out)
    assert calls and all(c == ["mix", "mouth", "src"] for c in calls)


def test_prefetch_propagates_decode_error(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    ds.mix = [(p + ".missing", n) for (p, n) in ds.mix]
    loader = PrefetchLoader(ds, 2, num_workers=2)
    with pytest.raises(Exception):
        list(loader.epoch(shuffle=False))


def test_prefetch_early_abandon(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    loader = PrefetchLoader(ds, 1, num_workers=2, lookahead=1)
    it = loader.epoch(shuffle=False)
    next(it)
    it.close()  # must not hang or leak a stuck producer


def test_synthetic_fallback():
    ds = SyntheticAVDataset(n_samples=4)
    loader = PrefetchLoader(ds, 2, place=lambda b: b)
    out = list(loader.epoch())
    assert len(out) == 2 and out[0]["mix"].shape == (2, 32000)
