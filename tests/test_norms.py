"""Norm statistics numerics: single-pass E[x^2]-E[x]^2 vs torch two-pass.

The TPU-native norms (``rtfs_tpu/models/layers.py``) compute mean and
variance as sibling single-pass reductions so XLA fuses them into one HBM
sweep. The E[x^2]-E[x]^2 form loses ~2*log2(|mean|/std) bits to
cancellation when a large DC offset dominates (ADVICE r2); these tests pin
both the tight tolerance at RTFS activation scales AND the documented
degradation at a pathological 1e3-sigma DC offset. (A shifted-center
variant that fixed the large-offset case was tried and reverted: the
data-dependent center slice fused into strided producer convolutions and
made them 15x slower on TPU — see the comment in GlobalLayerNorm.)
"""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from rtfs_tpu.models.layers import GlobalLayerNorm, LayerNormalization4D  # noqa: E402


def _gln_pair(x_np):
    """(ours, torch) outputs for gLN with identity affine, NCHW<->NHWC."""
    mod = GlobalLayerNorm(features=x_np.shape[-1])
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x_np)))
    # torch GroupNorm(1, C) on (B, C, T, F)
    t = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())
    ref = torch.nn.functional.group_norm(t, 1, eps=1e-5)
    return ours, np.moveaxis(ref.numpy(), 1, -1)


@pytest.mark.parametrize("offset,tol", [
    (0.0, 2e-5),     # RTFS activation scale: tight
    (10.0, 2e-3),    # mild offset: ~7 bits lost, still near-exact
    (100.0, 2e-1),   # |mean|/std = 1e2 -> ~13 of 24 f32 bits cancelled:
                     # this pins the DOCUMENTED accuracy floor of the fast
                     # single-pass form (no preset produces such inputs)
])
def test_gln_single_pass_large_mean_tolerance(offset, tol):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 17, 9, 32)) + offset).astype(np.float32)
    ours, ref = _gln_pair(x)
    # after normalization outputs are unit-scale, so abs tol == rel tol
    np.testing.assert_allclose(ours, ref, atol=tol)


def test_gln_extreme_offset_stays_finite():
    """At 1e3-sigma DC the variance fully cancels in f32 — accuracy is
    gone (documented limitation), but the eps + max(.,0) clamp must keep
    the output FINITE (no inf/nan blowup)."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 17, 9, 32)) + 1000.0).astype(np.float32)
    ours, _ = _gln_pair(x)
    assert np.all(np.isfinite(ours))


@pytest.mark.parametrize("offset,tol", [(0.0, 2e-5), (10.0, 2e-3),
                                        (100.0, 2e-1)])
def test_ln4d_single_pass_large_mean_tolerance(offset, tol):
    rng = np.random.default_rng(1)
    B, T, F, C = 2, 13, 8, 24
    x = (rng.standard_normal((B, T, F, C)) + offset).astype(np.float32)
    mod = LayerNormalization4D(features=C, n_freqs=F)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(variables, jnp.asarray(x)))
    # reference semantics (normalizations.py:20-37): stats over (C, F),
    # biased variance, eps 1e-5 — two-pass in f64 as the oracle
    xs = x.astype(np.float64)
    mean = xs.mean(axis=(2, 3), keepdims=True)
    var = ((xs - mean) ** 2).mean(axis=(2, 3), keepdims=True)
    ref = (xs - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(ours, ref.astype(np.float32), atol=tol)
