"""Negative SNR / SI-SDR / SD-SDR losses (pairwise, single, multi-src).

Numerics match the reference ``src/losses/matrix.py:13-149``: zero-mean over
time, eps 1e-8 added to target energy AND inside the log, ``10*log10``.
The reference's loss_func dict is ``train = PIT(pairwise_neg_snr)``,
``val/test = PIT(pairwise_neg_sisdr)`` (``train.py:98-101``).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

EPS = 1e-8


def _zero_mean(ests, targets, axis):
    targets = targets - jnp.mean(targets, axis=axis, keepdims=True)
    ests = ests - jnp.mean(ests, axis=axis, keepdims=True)
    return ests, targets


def pairwise_neg_sdr(ests, targets, sdr_type: str = "sisdr", zero_mean=True,
                     take_log=True, eps: float = EPS):
    """Pairwise matrix of negative SDRs.

    Args:
      ests, targets: (B, n_src, L).
    Returns:
      (B, n_src_est, n_src_tgt) negative SDR matrix.
    """
    assert ests.ndim == 3 and targets.ndim == 3
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=2)
    s_target = targets[:, None]       # (B, 1, n_src, L)
    s_est = ests[:, :, None]          # (B, n_src, 1, L)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(s_est * s_target, axis=3, keepdims=True)
        energy = jnp.sum(s_target**2, axis=3, keepdims=True) + eps
        proj = dot * s_target / energy
    else:
        proj = s_target + jnp.zeros_like(s_est)  # broadcast to pairwise shape
    if sdr_type in ("sdsdr", "snr"):
        e_noise = s_est - s_target
    else:
        e_noise = s_est - proj
    sdr = jnp.sum(proj**2, axis=3) / (jnp.sum(e_noise**2, axis=3) + eps)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + eps)
    return -sdr


def multisrc_neg_sdr(ests, targets, sdr_type="sisdr", zero_mean=True,
                     take_log=True, eps: float = EPS):
    """(B,) per-sample mean of matched-index negative SDRs."""
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=2)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=2, keepdims=True)
        energy = jnp.sum(targets**2, axis=2, keepdims=True) + eps
        scaled = dot * targets / energy
    else:
        scaled = targets
    e_noise = ests - targets if sdr_type in ("sdsdr", "snr") else ests - scaled
    sdr = jnp.sum(scaled**2, axis=2) / (jnp.sum(e_noise**2, axis=2) + eps)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + eps)
    return -jnp.mean(sdr, axis=-1)


def singlesrc_neg_sdr(ests, targets, sdr_type="sisdr", zero_mean=True,
                      take_log=True, eps: float = EPS):
    """(B,) negative SDRs for (B, L) inputs."""
    if zero_mean:
        ests, targets = _zero_mean(ests, targets, axis=1)
    if sdr_type in ("sisdr", "sdsdr"):
        dot = jnp.sum(ests * targets, axis=1, keepdims=True)
        energy = jnp.sum(targets**2, axis=1, keepdims=True) + eps
        scaled = dot * targets / energy
    else:
        scaled = targets
    e_noise = ests - targets if sdr_type in ("sdsdr", "snr") else ests - scaled
    sdr = jnp.sum(scaled**2, axis=1) / (jnp.sum(e_noise**2, axis=1) + eps)
    if take_log:
        sdr = 10.0 * jnp.log10(sdr + eps)
    return -sdr


pairwise_neg_sisdr = functools.partial(pairwise_neg_sdr, sdr_type="sisdr")
pairwise_neg_sdsdr = functools.partial(pairwise_neg_sdr, sdr_type="sdsdr")
pairwise_neg_snr = functools.partial(pairwise_neg_sdr, sdr_type="snr")
multisrc_neg_sisdr = functools.partial(multisrc_neg_sdr, sdr_type="sisdr")
multisrc_neg_snr = functools.partial(multisrc_neg_sdr, sdr_type="snr")
singlesrc_neg_sisdr = functools.partial(singlesrc_neg_sdr, sdr_type="sisdr")
singlesrc_neg_snr = functools.partial(singlesrc_neg_sdr, sdr_type="snr")
