"""STFT / iSTFT with exact `torch.stft` / `torch.istft` semantics, TPU-first.

Reference behavior being matched (see reference repo
`src/models/TDAVNet/encoder.py:161-175` and `decoder.py:110-132`):

- ``torch.stft(x, n_fft=win, hop_length=hop, window=hann(win),
  return_complex=True)`` with the defaults ``center=True``,
  ``pad_mode="reflect"``, ``normalized=False``, ``onesided=True``.
- ``torch.istft(spec, n_fft=win, hop_length=hop, window=hann(win),
  length=L)`` which performs windowed overlap-add with window-envelope
  normalization and trims the center padding plus trailing frames.

TPU-first design notes:

- Framing is a gather-free ``dynamic_slice``-style reshape: for the common
  case ``n_fft % hop == 0`` both the analysis framing and the synthesis
  overlap-add are expressed as static reshapes + ``R`` shifted adds
  (``R = n_fft // hop``), avoiding XLA scatter entirely. The FFT itself is
  XLA's batched real FFT, which maps well onto the TPU.
- All shapes are static; the window-envelope normalizer is a compile-time
  constant folded by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window(win)``."""
    n = np.arange(win)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win)
    return jnp.asarray(w, dtype=dtype)


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Slice ``x`` (B, L) into overlapping frames (B, T, n_fft).

    Assumes ``x`` is already center-padded. Uses a strided gather via
    ``jnp.take`` with a static index matrix; XLA lowers this to an efficient
    copy because the indices are compile-time constants.
    """
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop
    if n_fft % hop == 0:
        # Gather-free framing: cut into hop-sized chunks, then stack R
        # consecutive chunks per frame with R shifted slices.
        r = n_fft // hop
        n_chunks = length // hop
        chunks = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        parts = [chunks[..., i : i + n_frames, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return jnp.take(x, jnp.asarray(idx), axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(x: jax.Array, n_fft: int, hop: int, window: jax.Array) -> jax.Array:
    """torch.stft-parity STFT.

    Args:
      x: (..., L) real waveform.
      n_fft: FFT size (reference: 256).
      hop: hop length (reference: 128).
      window: (n_fft,) analysis window.

    Returns:
      (..., T, F) complex64 with T = 1 + L // hop (for even n_fft) and
      F = n_fft // 2 + 1. Note the axis order is (T, F) — time-major,
      channels-last friendly — whereas torch returns (F, T).
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = _frame(x, n_fft, hop)  # (..., T, n_fft)
    frames = frames * window
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(
    spec: jax.Array, n_fft: int, hop: int, window: jax.Array, length: int
) -> jax.Array:
    """torch.istft-parity inverse STFT.

    Args:
      spec: (..., T, F) complex spectrogram, onesided (F = n_fft//2 + 1).
      length: output waveform length (torch's ``length=`` argument).

    Returns:
      (..., length) real waveform.
    """
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # (..., T, n_fft)
    frames = frames * window
    n_frames = frames.shape[-2]

    y = _overlap_add(frames, hop)  # (..., (T-1)*hop + n_fft)

    # Window-envelope normalizer: a compile-time constant under jit.
    win_sq = (window * window)[None, :]
    env = _overlap_add(jnp.broadcast_to(win_sq, (n_frames, n_fft)), hop)

    pad = n_fft // 2
    y = y[..., pad : pad + length]
    env = env[pad : pad + length]
    # torch.istft raises if the envelope has near-zero bins (NOLA violation);
    # with hann(256)/hop 128 the envelope is exactly 1.0 except at the very
    # edges. Guard with a tiny epsilon exactly like torch's cutoff.
    env = jnp.where(jnp.abs(env) > 1e-11, env, 1.0)
    return y / env


def _overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add (..., T, n_fft) frames at stride ``hop``.

    Scatter-free when ``n_fft % hop == 0``: each frame is split into
    ``R = n_fft // hop`` hop-sized chunks; chunk ``r`` of frame ``t`` lands on
    output chunk ``t + r``, so the whole OLA is R shifted, padded adds.
    """
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    out_len = (n_frames - 1) * hop + n_fft
    if n_fft % hop == 0:
        r = n_fft // hop
        n_out_chunks = out_len // hop
        chunks = frames.reshape(*frames.shape[:-1], r, hop)
        out = jnp.zeros((*frames.shape[:-2], n_out_chunks, hop), frames.dtype)
        for i in range(r):
            pad_spec = [(0, 0)] * (frames.ndim - 2) + [
                (i, n_out_chunks - n_frames - i),
                (0, 0),
            ]
            out = out + jnp.pad(chunks[..., i, :], pad_spec)
        return out.reshape(*frames.shape[:-2], out_len)
    # General fallback: scatter-add.
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    flat = frames.reshape(*frames.shape[:-2], -1)
    out = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype)
    return out.at[..., jnp.asarray(idx.ravel())].add(flat)


def stft_frames(length: int, n_fft: int, hop: int) -> int:
    """Number of STFT frames for a centered transform (static helper)."""
    return 1 + length // hop if n_fft % 2 == 0 else 1 + (length - 1) // hop
