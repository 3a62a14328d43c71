"""Online mixture augmentation: remix sources across the batch.

Counterpart of the reference ``System.online_mixing_collate``
(``src/system/core.py:184-202``): permute each source slot independently
across the batch, rescale each drawn source to the energy of the one it
replaces, and rebuild the mixture as the sum — enabled by the
``training.online_mix`` config flag.

Implemented as a pure jittable function over the batch dict so it runs
on-device inside the training step (per-host batch; permutation from the
step RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def online_mixing(batch: dict, rng: jax.Array) -> dict:
    """Remix ``batch['src']`` (B, n_src, L) into new mixtures.

    Returns a new batch dict with remixed ``src`` and ``mix``; other keys
    (e.g. ``mouth``) are passed through — note the reference applies this
    only to the audio-only path (``core.py:96-99``), since mouth crops must
    stay paired with their source.
    """
    src = batch["src"]
    b, n_src, _ = src.shape
    energies = jnp.sum(src**2, axis=-1, keepdims=True)  # (B, n_src, 1)

    new_srcs = []
    for i in range(n_src):
        rng, sub = jax.random.split(rng)
        perm = jax.random.permutation(sub, b)
        drawn = src[perm, i]  # (B, L)
        drawn_energy = jnp.sum(drawn**2, axis=-1, keepdims=True) + 1e-8
        scale = jnp.sqrt(energies[:, i] / drawn_energy)
        new_srcs.append(drawn * scale)

    new_src = jnp.stack(new_srcs, axis=1)
    out = dict(batch)
    out["src"] = new_src
    out["mix"] = new_src.sum(axis=1)
    return out
