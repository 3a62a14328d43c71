"""Inference helpers: single-shot and long-form (chunked) separation.

``separate_sample`` is the reference's ``separate()`` counterpart
(``src/utils/separator.py:22-68``): one forward + energy renormalization.

``separate_long`` extends beyond the reference (which hard-truncates every
utterance to 2 s, ``avspeech_dataset.py:167,215``): it serves arbitrary
lengths by running the fixed-shape jitted model over 50%-overlapped
segments and Hann-cross-fading, with per-chunk PIT permutation alignment
(a PIT-trained model orders its outputs arbitrarily per forward; each
chunk is aligned to the already-stitched signal by overlap correlation
before overlap-add — the standard continuous-separation stitching rule).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


def separate_sample(model, variables, wav, mouth_emb=None):
    """Separate one utterance (or batch).

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
    est = _energy_renormalize(np.asarray(est), np.asarray(wav))
    return est[0] if squeeze else est


def _energy_renormalize(est: np.ndarray, mix: np.ndarray) -> np.ndarray:
    """Match each source's RMS to the mixture RMS (reference semantics)."""
    in_rms = np.sqrt(np.mean(mix**2, axis=-1, keepdims=True))[..., None, :]
    est_rms = np.sqrt(np.mean(est**2, axis=-1, keepdims=True)) + 1e-8
    return est * (in_rms / est_rms)


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
    """Separate an arbitrarily long single utterance by overlapped chunking.

    Args:
      wav: (L,) mixture — one utterance (batch inputs are rejected; loop
        over utterances for batches).
      mouth_emb: (T2, C) lip embedding covering the utterance, or None.

    Returns:
      (n_src, L) separated sources, energy-renormalized once on the full
      stitched output (per-chunk renormalization would pump gains at seams).
    """
    wav = np.asarray(wav)
    if wav.ndim != 1:
        raise ValueError(
            f"separate_long takes one (L,) utterance, got shape {wav.shape}; "
            "loop over the batch for multiple utterances"
        )
    length = wav.shape[-1]

    # One compiled executable regardless of utterance length: fixed chunk
    # shapes through a jitted forward. Non-jittable model stand-ins (e.g.
    # host-side oracles in tests) fall back to eager dispatch.
    state = {"fwd": jax.jit(lambda v, w, m: model.apply(v, w, m))}

    def run_chunk(chunk, emb):
        args = (
            variables,
            jnp.asarray(chunk)[None],
            None if emb is None else jnp.asarray(emb)[None],
        )
        try:
            out = state["fwd"](*args)
        except jax.errors.TracerArrayConversionError:
            state["fwd"] = lambda v, w, m: model.apply(v, w, m)
            out = state["fwd"](*args)
        return np.asarray(out)[0]  # (n_src, seg)

    if length <= segment_samples:
        chunk = np.pad(wav, (0, segment_samples - length))
        emb = None
        if mouth_emb is not None:
            emb = _emb_segment(np.asarray(mouth_emb), 0, segment_samples,
                               sample_rate, video_fps)
        est = run_chunk(chunk, emb)[..., :length]
        return _energy_renormalize(est[None], wav[None])[0]

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
            emb = _emb_segment(np.asarray(mouth_emb), s0, segment_samples,
                               sample_rate, video_fps)
        est = run_chunk(chunk, emb)  # (n_src, seg)
        if acc is None:
            acc = np.zeros((est.shape[0], length + segment_samples),
                           np.float32)
        else:
            est = _align_permutation(
                est, acc[:, s0 : s0 + segment_samples],
                norm[s0 : s0 + segment_samples],
            )
        acc[:, s0 : s0 + segment_samples] += est * window
        norm[s0 : s0 + segment_samples] += window

    out = acc[:, :length] / np.maximum(norm[:length], 1e-6)
    return _energy_renormalize(out[None], wav[None])[0]


def _align_permutation(est: np.ndarray, acc_seg: np.ndarray,
                       norm_seg: np.ndarray) -> np.ndarray:
    """Reorder a chunk's sources to best match the stitched overlap region.

    A PIT-trained model emits sources in arbitrary order per forward pass;
    without alignment, cross-fading mixes speakers mid-utterance. Chooses
    the permutation maximizing summed overlap correlation with the already-
    accumulated signal.
    """
    n_src = est.shape[0]
    if n_src == 1:
        return est
    valid = norm_seg > 1e-6
    if not np.any(valid):
        return est
    ref = acc_seg[:, valid] / norm_seg[valid]
    cand = est[:, valid]

    def corr(a, b):
        denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-8
        return float(np.dot(a, b) / denom)

    best_perm, best_score = None, -np.inf
    for perm in itertools.permutations(range(n_src)):
        score = sum(corr(cand[p], ref[i]) for i, p in enumerate(perm))
        if score > best_score:
            best_score, best_perm = score, perm
    return est[list(best_perm)]


def _emb_segment(emb, start_sample, seg_samples, sample_rate, fps):
    """Slice/pad the lip embedding to the video frames covering a segment."""
    frames_per_seg = int(round(seg_samples / sample_rate * fps))
    f0 = int(round(start_sample / sample_rate * fps))
    seg = emb[f0 : f0 + frames_per_seg]
    if seg.shape[0] < frames_per_seg:
        if seg.shape[0]:
            pad = frames_per_seg - seg.shape[0]
            seg = np.pad(seg, ((0, pad), (0, 0)), mode="edge")
        else:
            seg = np.zeros((frames_per_seg, emb.shape[-1]), emb.dtype)
    return seg
