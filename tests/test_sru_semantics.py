"""De-circularized SRU validation (VERDICT round-1 item 4).

The real ``sru`` package is not installable in this image, so parity is
pinned three independent ways instead of against a live install:

1. ``_sru_package_naive`` below is a numpy transcription of the PACKAGE's
   own elementwise recurrence and parameter layouts — written from the
   package structure (sru/ops.py elementwise_recurrence_naive + the CUDA
   kernel's pointer arithmetic), NOT from rtfs_tpu code: time-major input,
   weight columns [dir][unit][k] (k innermost per hidden unit), weight_c /
   bias stored as flat [all-forget; all-reset] halves, reset gate computed
   from the *updated* cell state c_t (the code does this; the paper's
   eq. uses c_{t-1}), direction-major output concat.
2. ``convert_sru_packed`` (the importer's rnn_lst translation) must map a
   package-layout parameter set onto ``ops.sru.sru_layer`` such that the
   JAX output matches (1) exactly — this exercises the same code path a
   real checkpoint import takes.
3. The torch stub used by the full-model goldens (``ref_stubs``) must also
   match (1), so "golden == stub" chains to "golden == package semantics".

``tools/validate_sru_import.py`` closes the final gap on any machine where
``pip install sru`` works.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rtfs_tpu.ops.sru import sru_layer
from rtfs_tpu.utils.torch_import import convert_sru_packed


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _sru_package_naive(x_tbd, weight, weight_c, bias, hidden, bidirectional):
    """One SRU layer exactly as the ``sru`` package computes it.

    Args:
      x_tbd: (L, B, d_in) time-major input (package default, and how the
        reference DualPathRNN feeds it — rnn_layers.py:148).
      weight: (d_in, dirs*hidden*k) with [dir][unit][k] column order.
      weight_c, bias: flat (2*dirs*hidden,) = [forget half; reset half].

    Returns:
      (L, B, dirs*hidden), forward direction first.
    """
    dirs = 2 if bidirectional else 1
    L, B, d_in = x_tbd.shape
    d_out = dirs * hidden
    k = weight.shape[1] // d_out

    # U = x W, viewed with k innermost per (dir, unit) — the layout the
    # CUDA kernel's `up = u + col*k` walk implies.
    u = (x_tbd.reshape(-1, d_in) @ weight).reshape(L, B, dirs, hidden, k)
    vf = weight_c[:d_out].reshape(dirs, hidden)
    vr = weight_c[d_out:].reshape(dirs, hidden)
    bf = bias[:d_out].reshape(dirs, hidden)
    br = bias[d_out:].reshape(dirs, hidden)

    out = np.zeros((L, B, dirs, hidden), np.float64)
    for d in range(dirs):
        order = range(L) if d == 0 else range(L - 1, -1, -1)
        c = np.zeros((B, hidden), np.float64)
        for t in order:
            u_t = u[t, :, d]  # (B, hidden, k)
            f = _sigmoid(u_t[..., 1] + vf[d] * c + bf[d])
            c = f * c + (1.0 - f) * u_t[..., 0]
            r = _sigmoid(u_t[..., 2] + vr[d] * c + br[d])
            if k == 4:
                xhw = u_t[..., 3]
            else:  # k == 3: highway from this direction's input slice
                xhw = x_tbd[t, :, d * hidden : (d + 1) * hidden]
            out[t, :, d] = r * c + (1.0 - r) * xhw
    return out.reshape(L, B, d_out)


def _random_packed_params(rng, d_in, hidden, dirs):
    d_out = dirs * hidden
    k = 4 if d_in != d_out else 3
    w = rng.standard_normal((d_in, dirs * hidden * k)).astype(np.float32)
    w *= (3.0 / d_in) ** 0.5
    wc = (rng.standard_normal(2 * d_out) * 0.3).astype(np.float32)
    b = np.zeros(2 * d_out, np.float32)
    b[d_out:] = -1.0  # highway_bias on the reset half
    return w, wc, b, k


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("d_in_mode", ["k4", "k3"])
def test_import_translation_matches_package_semantics(bidirectional, d_in_mode):
    """package-layout params -> convert_sru_packed -> ops.sru == package math."""
    rng = np.random.default_rng(7)
    hidden = 8
    dirs = 2 if bidirectional else 1
    d_in = 24 if d_in_mode == "k4" else dirs * hidden
    w, wc, b, k = _random_packed_params(rng, d_in, hidden, dirs)

    x = rng.standard_normal((11, 3, d_in)).astype(np.float32)  # (L, B, D)
    ref = _sru_package_naive(x, w, wc, b, hidden, bidirectional)

    wj, wcj, bj = convert_sru_packed(w, wc, b, dirs=dirs)
    out = sru_layer(
        jnp.asarray(x.transpose(1, 0, 2)),  # rtfs is batch-major
        jnp.asarray(wj), jnp.asarray(wcj), jnp.asarray(bj),
        hidden, bidirectional,
    )
    out = np.asarray(out).transpose(1, 0, 2)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_torch_stub_matches_package_semantics(bidirectional):
    """The goldens' torch SRU stub must agree with the package recurrence."""
    import torch

    from tests.ref_stubs import _make_torch_sru

    rng = np.random.default_rng(3)
    hidden, d_in, L, B = 8, 20, 9, 2
    dirs = 2 if bidirectional else 1
    sru_cls = _make_torch_sru()
    m = sru_cls(d_in, hidden, num_layers=1, bidirectional=bidirectional)

    # convert the stub's rtfs-layout params to package layout for the ref
    w = m.weights[0].detach().numpy()  # (d_in, dirs*k*H), [dir][k][unit]
    k = w.shape[1] // (dirs * hidden)
    w_pkg = (
        w.reshape(d_in, dirs, k, hidden)
        .transpose(0, 1, 3, 2)
        .reshape(d_in, dirs * hidden * k)
    )
    vc = m.weight_cs[0].detach().numpy()  # (dirs, 2, H)
    vc_pkg = vc.transpose(1, 0, 2).reshape(2 * dirs * hidden)
    bias = m.biases[0].detach().numpy()
    bias_pkg = bias.transpose(1, 0, 2).reshape(2 * dirs * hidden)

    x = rng.standard_normal((L, B, d_in)).astype(np.float32)
    ref = _sru_package_naive(x, w_pkg, vc_pkg, bias_pkg, hidden, bidirectional)
    out = m(torch.from_numpy(x))[0].detach().numpy()
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_multilayer_stacking_matches_package():
    """k transitions (4 then 3) across stacked layers, as SRU(num_layers=N)."""
    rng = np.random.default_rng(11)
    hidden, d_in, L, B, dirs = 8, 24, 7, 2, 2
    from rtfs_tpu.ops.sru import SRU
    import jax

    model = SRU(input_size=d_in, hidden_size=hidden, num_layers=3,
                bidirectional=True)
    x = rng.standard_normal((B, L, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(model.apply(variables, jnp.asarray(x)))

    h = x.transpose(1, 0, 2)
    for layer in range(3):
        w = np.asarray(variables["params"][f"weight_{layer}"])
        vc = np.asarray(variables["params"][f"weight_c_{layer}"])
        b = np.asarray(variables["params"][f"bias_{layer}"])
        k = w.shape[1] // (dirs * hidden)
        di = h.shape[-1]
        w_pkg = (
            w.reshape(di, dirs, k, hidden)
            .transpose(0, 1, 3, 2)
            .reshape(di, dirs * hidden * k)
        )
        vc_pkg = vc.transpose(1, 0, 2).reshape(-1)
        b_pkg = b.transpose(1, 0, 2).reshape(-1)
        h = _sru_package_naive(h, w_pkg, vc_pkg, b_pkg, hidden, True)
    np.testing.assert_allclose(
        out, h.transpose(1, 0, 2), atol=3e-5, rtol=1e-4
    )
