"""Golden parity tests: rtfs_tpu STFT/iSTFT vs torch.stft/torch.istft."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import rtfs_tpu.ops.stft as stft_mod


@pytest.mark.parametrize(
    "length,n_fft,hop",
    [(32000, 256, 128), (12345, 256, 128), (16000, 256, 100)],
)
def test_stft_matches_torch(length, n_fft, hop):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, length)).astype(np.float32)

    window_t = torch.hann_window(n_fft)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=window_t,
        return_complex=True,
    ).numpy()  # (B, F, T)

    got = stft_mod.stft(
        jnp.asarray(x), n_fft, hop, stft_mod.hann_window(n_fft)
    )  # (B, T, F)
    got = np.asarray(got).transpose(0, 2, 1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got.real, ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(got.imag, ref.imag, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("length,n_fft,hop", [(32000, 256, 128)])
def test_istft_matches_torch(length, n_fft, hop):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, length)).astype(np.float32)

    window_t = torch.hann_window(n_fft)
    spec_t = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=window_t,
        return_complex=True,
    )
    ref = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop, window=window_t, length=length
    ).numpy()

    spec_j = jnp.asarray(spec_t.numpy()).transpose(0, 2, 1)  # (B, T, F)
    got = np.asarray(
        stft_mod.istft(spec_j, n_fft, hop, stft_mod.hann_window(n_fft), length)
    )

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_roundtrip_reconstruction():
    """stft -> istft must reconstruct the waveform (NOLA holds for 256/128)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    w = stft_mod.hann_window(256)
    spec = stft_mod.stft(jnp.asarray(x), 256, 128, w)
    y = np.asarray(stft_mod.istft(spec, 256, 128, w, 32000))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_frame_count_static_helper():
    assert stft_mod.stft_frames(32000, 256, 128) == 251
