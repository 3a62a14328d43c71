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
