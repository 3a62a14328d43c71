"""AVSpeechDataset unit tests on a temp manifest tree (real files)."""

import json
import os

import numpy as np
import pytest

from rtfs_tpu.data import AVSpeechDataset


@pytest.fixture(scope="module")
def manifest_dir(tmp_path_factory):
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("avdata")
    mouths = root / "mouths"
    mouths.mkdir()
    rng = np.random.default_rng(0)
    entries = {"mix": [], "s1": [], "s2": []}
    lengths = [32000, 32000, 8000]  # third is short -> dropped at segment=2s
    for i, n in enumerate(lengths):
        s1 = rng.standard_normal(n).astype(np.float32) * 0.1
        s2 = rng.standard_normal(n).astype(np.float32) * 0.1
        for name, sig in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
            d = root / name
            d.mkdir(exist_ok=True)
            p = str(d / f"spkA{i}_0000{i}_-3_spkB{i}_1111{i}_3.wav")
            wavfile.write(p, 16000, sig)
            if name == "mix":
                entries[name].append((p, n))
        for spk_i, spk in enumerate((f"spkA{i}_0000{i}", f"spkB{i}_1111{i}")):
            mp = str(mouths / f"{spk}.npz")
            np.savez(mp, data=rng.integers(0, 255, (50, 96, 96)).astype(np.uint8))
            name = "s1" if spk_i == 0 else "s2"
            p = str(root / name / f"spkA{i}_0000{i}_-3_spkB{i}_1111{i}_3.wav")
            entries[name].append((p, mp, n))
    for name, info in entries.items():
        with open(root / f"{name}.json", "w") as f:
            json.dump(info, f)
    return str(root)


def test_nsrc1_doubles_and_drops_short(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    # 2 usable mixtures x 2 speakers = 4 samples; the 0.5 s one dropped
    assert len(ds) == 4
    mix, src, mouth, key = ds[0]
    assert mix.shape == (32000,)
    assert src.shape == (1, 32000)
    assert mouth.shape == (1, 50, 88, 88)  # cropped 96 -> 88
    assert key.endswith(".wav")


def test_nsrc2_pairs(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=2, segment=2.0)
    assert len(ds) == 2
    mix, src, mouth, key = ds[0]
    assert src.shape == (2, 32000)
    assert mouth.shape == (2, 50, 88, 88)
    np.testing.assert_allclose(src.sum(0), mix, atol=1e-5)


def test_batches_shapes_and_host_sharding(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0)
    batches = list(ds.batches(2, shuffle=False))
    assert len(batches) == 2
    b = batches[0]
    assert b["mix"].shape == (2, 32000)
    assert b["src"].shape == (2, 1, 32000)
    assert b["mouth"].shape == (2, 50, 88, 88)
    # two hosts see disjoint samples
    k0 = [k for bt in ds.batches(1, shuffle=False, host_id=0, num_hosts=2)
          for k in bt["key"]]
    k1 = [k for bt in ds.batches(1, shuffle=False, host_id=1, num_hosts=2)
          for k in bt["key"]]
    assert len(k0) == len(k1) == 2


def test_normalize_audio(manifest_dir):
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=2.0,
                         normalize_audio=True)
    mix, src, _, _ = ds[0]
    assert abs(float(np.std(mix)) - 1.0) < 1e-3


def test_testmode_batches_carry_true_lengths(manifest_dir):
    """segment=None batches expose per-utterance lengths so batched eval
    can trim zero padding before the metric tracker."""
    ds = AVSpeechDataset(manifest_dir, n_src=1, segment=None)
    # the 8000-sample utterance is kept in test mode -> 6 samples
    assert len(ds) == 6
    batches = list(ds.batches(3, shuffle=False, drop_last=False))
    lens = np.concatenate([b["length"] for b in batches])
    assert sorted(lens.tolist()) == [8000, 8000, 32000, 32000, 32000, 32000]
    for b in batches:
        for i, L in enumerate(b["length"]):
            # padding beyond the true length must be exactly zero
            assert np.all(b["mix"][i, L:] == 0)
            assert np.any(b["mix"][i, :L] != 0)
