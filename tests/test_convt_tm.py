"""Parity: fused time-major ConvTranspose+OLA kernel vs the XLA lowering.

The kernel replaces ``ConvTranspose1d(2H, C, k, stride 1)`` at the tail of
every DualPathRNN (reference ``rnn_layers.py:129,153``) on the Pallas SRU
path. Interpret mode runs the exact Mosaic program on CPU; the oracle is
``convops.conv_transpose`` (itself torch-golden in test_convops.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.ops import convt_tm
from rtfs_tpu.ops.convt_tm import _xla_reference, convt1d_ola_tm


@pytest.mark.parametrize(
    "length,c_in,c_out,bsz,k",
    [
        (58, 64, 64, 40, 8),    # freq-scan site geometry (small batch)
        (119, 64, 64, 24, 8),   # time-scan site geometry
        (13, 32, 48, 17, 5),    # ragged batch, odd kernel, c_in != c_out
    ],
)
def test_convt_ola_tm_fwd_parity(length, c_in, c_out, bsz, k):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((length, c_in, bsz)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((k, c_out, c_in)) * 0.1).astype(np.float32)
    )
    got = convt1d_ola_tm(x, w, True)
    want = _xla_reference(x, w, None)
    assert got.shape == (length + k - 1, c_out, bsz)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_convt_ola_tm_grad_parity():
    rng = np.random.default_rng(1)
    length, c_in, c_out, bsz, k = 23, 64, 64, 19, 8
    x = jnp.asarray(rng.standard_normal((length, c_in, bsz)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((k, c_out, c_in)) * 0.1).astype(np.float32)
    )
    g = jnp.asarray(
        rng.standard_normal((length + k - 1, c_out, bsz)).astype(np.float32)
    )

    def loss_kernel(x, w):
        return jnp.sum(convt1d_ola_tm(x, w, True) * g)

    def loss_ref(x, w):
        return jnp.sum(_xla_reference(x, w, None) * g)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_convt_ola_tm_bf16_finite():
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((30, 64, 12)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.standard_normal((8, 64, 64)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    got = convt1d_ola_tm(x, w, True)
    want = _xla_reference(x.astype(jnp.float32), w.astype(jnp.float32), None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_dualpathrnn_time_major_path_matches_scan(monkeypatch):
    """Model-level: DualPathRNN via the fused time-major tail (interpret
    Mosaic kernels) must match the scan + XLA-ConvT path."""
    from rtfs_tpu.models.rnn_blocks import DualPathRNN

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 21, 13, 16)).astype(np.float32))
    mod = DualPathRNN(in_chan=16, hid_chan=8, dim=3, kernel_size=4,
                      rnn_type="SRU", num_layers=2)

    monkeypatch.setenv("RTFS_SRU_BACKEND", "scan")
    params = mod.init(jax.random.PRNGKey(0), x)
    y_scan = mod.apply(params, x)

    def loss(p):
        return jnp.sum(jnp.sin(mod.apply(p, x)))

    g_scan = jax.grad(loss)(params)

    monkeypatch.setenv("RTFS_SRU_BACKEND", "interpret")
    y_tm = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_tm), np.asarray(y_scan), atol=2e-4, rtol=2e-4
    )
    g_tm = jax.grad(loss)(params)
    flat_a = jax.tree_util.tree_leaves(g_tm)
    flat_b = jax.tree_util.tree_leaves(g_scan)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )
