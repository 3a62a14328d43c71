"""Inference helper: separate one mixture with energy renormalization.

Counterpart of the reference ``src/utils/separator.py:22-68``: run the
model on a (possibly un-batched) waveform + mouth embedding and rescale
each estimated source to the mixture's input energy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def separate_sample(model, variables, wav, mouth_emb=None):
    """Separate one utterance.

    Args:
      wav: (L,) or (B, L) mixture waveform.
      mouth_emb: (T2, C) or (B, T2, C) lip embedding, or None (audio-only).

    Returns:
      (B, n_src, L) estimates, energy-renormalized to the input scale.
    """
    wav = jnp.asarray(wav)
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if mouth_emb is not None:
        mouth_emb = jnp.asarray(mouth_emb)
        if mouth_emb.ndim == 2:
            mouth_emb = mouth_emb[None]

    est = model.apply(variables, wav, mouth_emb)  # (B, n_src, L)

    # energy renormalization: match input mixture RMS per source
    in_rms = jnp.sqrt(jnp.mean(wav**2, axis=-1, keepdims=True))[:, None]
    est_rms = jnp.sqrt(jnp.mean(est**2, axis=-1, keepdims=True)) + 1e-8
    est = est * (in_rms / est_rms)
    return np.asarray(est[0] if squeeze else est)


def separate_long(
    model,
    variables,
    wav,
    mouth_emb=None,
    *,
    segment_samples: int = 32000,
    sample_rate: int = 16000,
    video_fps: int = 25,
    overlap: float = 0.5,
):
    """Separate an arbitrarily long utterance by overlapped chunking.

    The reference hard-truncates everything to 2 s
    (``avspeech_dataset.py:167,215``); production serving needs full
    utterances. This runs the (fixed-shape, jit-cached) model over 50%%-
    overlapped segments and cross-fades with a Hann-weighted overlap-add —
    chunk shapes stay static so only ONE compiled executable is used
    regardless of utterance length.

    Args:
      wav: (L,) mixture of any length.
      mouth_emb: (T2, C) lip embedding covering the utterance (or None).

    Returns:
      (n_src, L) separated sources.
    """
    import numpy as np

    wav = np.asarray(wav)
    length = wav.shape[-1]
    if length <= segment_samples:
        pad = segment_samples - length
        wav_p = np.pad(wav, (0, pad))
        emb = None
        if mouth_emb is not None:
            emb = _emb_segment(
                np.asarray(mouth_emb), 0, segment_samples, sample_rate,
                video_fps,
            )
        out = separate_sample(model, variables, wav_p, emb)
        return out[..., :length]

    hop = int(segment_samples * (1.0 - overlap))
    starts = list(range(0, max(length - segment_samples, 0) + hop, hop))
    window = np.hanning(segment_samples).astype(np.float32) + 1e-3

    acc = None
    norm = np.zeros(length + segment_samples, np.float32)
    for s0 in starts:
        chunk = wav[s0 : s0 + segment_samples]
        if chunk.shape[-1] < segment_samples:
            chunk = np.pad(chunk, (0, segment_samples - chunk.shape[-1]))
        emb = None
        if mouth_emb is not None:
            emb = _emb_segment(
                np.asarray(mouth_emb), s0, segment_samples, sample_rate,
                video_fps,
            )
        est = separate_sample(model, variables, chunk, emb)  # (n_src, seg)
        if acc is None:
            acc = np.zeros((est.shape[0], length + segment_samples),
                           np.float32)
        acc[:, s0 : s0 + segment_samples] += est * window
        norm[s0 : s0 + segment_samples] += window
    return acc[:, :length] / np.maximum(norm[:length], 1e-6)


def _emb_segment(emb, start_sample, seg_samples, sample_rate, fps):
    """Slice/pad the lip embedding to the video frames covering a segment."""
    import numpy as np

    frames_per_seg = int(round(seg_samples / sample_rate * fps))
    f0 = int(round(start_sample / sample_rate * fps))
    seg = emb[f0 : f0 + frames_per_seg]
    if seg.shape[0] < frames_per_seg:
        pad = frames_per_seg - seg.shape[0]
        seg = np.pad(seg, ((0, pad), (0, 0)), mode="edge") if seg.shape[0] \
            else np.zeros((frames_per_seg, emb.shape[-1]), emb.dtype)
    return seg
