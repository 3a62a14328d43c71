"""Smoke coverage for the legacy/ablation layer zoo + chunking utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.models import legacy_layers as LL
from rtfs_tpu.models import chunking
from rtfs_tpu.models.separators import LAYER_REGISTRY, build_layer


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (LL.CBAMBlock, dict(in_chan=16, reduction=4, kernel_size=7)),
        (LL.ShuffleAttention, dict(in_chan=16, G=2)),
        (LL.CoTAttention, dict(in_chan=16, kernel_size=3)),
        (LL.MLPMixerLayer, dict(in_chan=16, patch_size=4, image_size=(12, 8),
                                dim=32, depth=1)),
        (LL.PermutatorLayer, dict(in_chan=16, patch_size=4, image_size=(12, 8),
                                  dim=32, depth=1, segments=2)),
        (LL.GlobalGALR, dict(in_chan=16, n_head=2)),
        (LL.BiLSTM2D, dict(in_chan=16, hid_chan=8, window=4, kernel_size=3)),
    ],
)
def test_legacy_2d_layers_forward(cls, kwargs):
    m = cls(**kwargs)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 12, 8, 16)).astype(np.float32)
    )
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_convolutional_rnn_1d():
    m = LL.ConvolutionalRNN(in_chan=16, hid_chan=32, kernel_size=3)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 20, 16)).astype(np.float32)
    )
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x)
    assert out.shape == x.shape


def test_registry_covers_legacy_names():
    for name in ("CBAMBlock", "ShuffleAttention", "CoTAttention", "MLP",
                 "Permutator", "ConvolutionalRNN", "BiLSTM2D", "GlobalGALR"):
        assert name in LAYER_REGISTRY


def test_split_merge_roundtrip():
    """50%-overlap split/merge must reconstruct 2x the input (two streams)."""
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 50, 6)).astype(np.float32)
    )
    blocks, rest = chunking.split_feature(x, 16)
    merged = chunking.merge_feature(blocks, rest)
    np.testing.assert_allclose(np.asarray(merged), 2 * np.asarray(x), atol=1e-5)


def test_bandwidths_sum():
    bw = chunking.get_bandwidths(256)
    assert sum(bw) == 256 // 2 + 1
