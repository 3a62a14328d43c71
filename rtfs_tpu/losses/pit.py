"""Permutation-invariant training (PIT) wrapper — jit-native.

Reference: ``src/losses/pit_wrapper.py:15-116``. The reference enumerates
permutations with a one-hot einsum for n_src <= 3 and falls back to a SciPy
Hungarian solver on host. On TPU the factorial einsum stays inside jit (all
active configs have n_src in {1, 2}); for larger n_src we run the Hungarian
assignment through ``jax.pure_callback`` on host, exactly mirroring the
reference's CPU detour.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _perm_matrix(n_src: int) -> np.ndarray:
    """(n_perm, n_src, n_src) one-hot permutation tensors."""
    perms = list(itertools.permutations(range(n_src)))
    one_hot = np.zeros((len(perms), n_src, n_src), np.float32)
    for i, p in enumerate(perms):
        one_hot[i, np.arange(n_src), p] = 1.0
    return one_hot


def _perm_indices(n_src: int) -> np.ndarray:
    return np.asarray(list(itertools.permutations(range(n_src))), np.int32)


def find_best_perm(pw_losses: jax.Array):
    """Min-over-permutations of a pairwise loss matrix.

    Args:
      pw_losses: (B, n_src_est, n_src_tgt).
    Returns:
      (min_loss (B,), batch_indices (B, n_src)) where ``batch_indices[b][i]``
      is the target index matched to estimate ... (source ordering matches
      the reference: row = target, column = estimate after transpose).
    """
    n_src = pw_losses.shape[-1]
    pwl = jnp.swapaxes(pw_losses, -1, -2)  # (B, tgt, est)
    if n_src <= 4:
        perms_oh = jnp.asarray(_perm_matrix(n_src))
        loss_set = jnp.einsum("bij,pij->bp", pwl, perms_oh) / n_src
        min_loss = jnp.min(loss_set, axis=1)
        idx = jnp.argmin(loss_set, axis=1)
        batch_indices = jnp.asarray(_perm_indices(n_src))[idx]
        return min_loss, batch_indices

    # Host Hungarian via pure_callback (reference pit_wrapper.py:109-116).
    def hungarian(pwl_np):
        from scipy.optimize import linear_sum_assignment

        out = np.stack(
            [linear_sum_assignment(m)[1] for m in pwl_np]
        ).astype(np.int32)
        return out

    batch_indices = jax.pure_callback(
        hungarian,
        jax.ShapeDtypeStruct((pwl.shape[0], n_src), jnp.int32),
        jax.lax.stop_gradient(pwl),
        vmap_method="sequential",
    )
    picked = jnp.take_along_axis(pwl, batch_indices[..., None], axis=2)
    min_loss = jnp.mean(picked, axis=(-1, -2))
    return min_loss, batch_indices


def reorder_sources(sources: jax.Array, batch_indices: jax.Array) -> jax.Array:
    """Reorder (B, n_src, ...) estimates by per-batch permutation indices."""
    return jax.vmap(lambda s, idx: s[idx])(sources, batch_indices)


def pit_loss(
    pairwise_loss_fn: Callable,
    ests: jax.Array,
    targets: jax.Array,
    return_ests: bool = False,
):
    """Functional PIT: mean best-permutation loss (optionally + reordered ests)."""
    pw = pairwise_loss_fn(ests, targets)
    min_loss, batch_indices = find_best_perm(pw)
    mean_loss = jnp.mean(min_loss)
    if return_ests:
        return mean_loss, reorder_sources(ests, batch_indices)
    return mean_loss


class PITLossWrapper:
    """Object-style wrapper mirroring the reference API (``pit_from="pw_mtx"``)."""

    def __init__(self, loss_func: Callable, pit_from: str = "pw_mtx"):
        if pit_from != "pw_mtx":
            raise NotImplementedError(
                "only pairwise-matrix PIT is used by the model zoo"
            )
        self.loss_func = loss_func

    def __call__(self, ests, targets, return_ests: bool = False):
        return pit_loss(self.loss_func, ests, targets, return_ests)
