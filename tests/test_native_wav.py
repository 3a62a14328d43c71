"""Native C++ WAV decoder: build + decode parity + prefetch loader."""

import os

import numpy as np
import pytest

from rtfs_tpu.data import native_wav


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    from scipy.io import wavfile

    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(20000) * 0.1).astype(np.float32)
    f32 = str(d / "f32.wav")
    i16 = str(d / "i16.wav")
    wavfile.write(f32, 16000, x)
    wavfile.write(i16, 16000, (x * 32767).astype(np.int16))
    return f32, i16, x


def test_native_builds_and_decodes_f32(wavs):
    if not native_wav.native_available():
        pytest.skip("g++ unavailable to build libwavio")
    f32, _, x = wavs
    got = native_wav.read_wav(f32)
    np.testing.assert_array_equal(got, x)


def test_native_decodes_i16_with_truncation(wavs):
    if not native_wav.native_available():
        pytest.skip("native lib unavailable")
    _, i16, x = wavs
    got = native_wav.read_wav(i16, max_len=8000)
    ref = (x[:8000] * 32767).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_array_equal(got, ref)


def test_batch_decode_pads_and_truncates(wavs):
    f32, i16, x = wavs
    out = native_wav.read_wav_batch([f32, i16], 25000)
    assert out.shape == (2, 25000)
    np.testing.assert_array_equal(out[0, :20000], x)
    assert np.all(out[0, 20000:] == 0)


def test_bad_file_raises(tmp_path):
    if not native_wav.native_available():
        pytest.skip("native lib unavailable")
    p = tmp_path / "garbage.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(IOError):
        native_wav.read_wav(str(p))


def test_prefetch_loader_order():
    def factory():
        for i in range(5):
            yield {"i": i}

    out = [b["i"] for b in native_wav.PrefetchLoader(factory)]
    assert out == list(range(5))
