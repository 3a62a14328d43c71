"""RNN parity tests: LSTM/GRU vs torch; SRU vs an independent numpy loop."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rtfs_tpu.ops.rnn import RNN
from rtfs_tpu.ops.sru import SRU


@pytest.mark.parametrize("cell", ["LSTM", "GRU"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_rnn_matches_torch(cell, bidirectional):
    torch.manual_seed(0)
    d_in, hidden, layers = 12, 8, 2
    m = getattr(torch.nn, cell)(
        d_in, hidden, num_layers=layers, batch_first=True,
        bidirectional=bidirectional,
    )
    x = torch.randn(3, 20, d_in)
    ref = m(x)[0].detach().numpy()

    model = RNN(
        cell=cell, input_size=d_in, hidden_size=hidden,
        num_layers=layers, bidirectional=bidirectional,
    )
    jparams = {}
    for name, p in m.named_parameters():
        v = p.detach().numpy()
        if "weight" in name:
            v = v.T  # torch (gates*H, D) -> ours (D, gates*H)
        jparams[name] = jnp.asarray(v)

    out = model.apply({"params": jparams}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def _sru_numpy(x, params, hidden, layers, bidirectional, highway_bias=-1.0):
    """Independent per-timestep numpy implementation of SRU v2 semantics."""
    dirs = 2 if bidirectional else 1
    d_out = dirs * hidden
    h = x
    for layer in range(layers):
        w = params[f"weight_{layer}"]
        vc = params[f"weight_c_{layer}"]
        b = params[f"bias_{layer}"]
        d_in = h.shape[-1]
        k = 4 if d_in != d_out else 3
        u = h @ w  # (B, L, dirs*k*H)
        bsz, length = h.shape[:2]
        u = u.reshape(bsz, length, dirs, k, hidden)
        outs = []
        for d in range(dirs):
            order = range(length) if d == 0 else range(length - 1, -1, -1)
            c = np.zeros((bsz, hidden), np.float32)
            hs = np.zeros((bsz, length, hidden), np.float32)
            for t in order:
                u_t = u[:, t, d]
                f = 1 / (1 + np.exp(-(u_t[:, 1] + vc[d, 0] * c + b[d, 0])))
                c = f * c + (1 - f) * u_t[:, 0]
                # sru-package order: reset gate reads the updated cell
                r = 1 / (1 + np.exp(-(u_t[:, 2] + vc[d, 1] * c + b[d, 1])))
                xhw = u_t[:, 3] if k == 4 else h[:, t, d * hidden:(d + 1) * hidden]
                hs[:, t] = r * c + (1 - r) * xhw
            outs.append(hs)
        h = np.concatenate(outs, axis=-1) if dirs > 1 else outs[0]
    return h


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("d_in", [32, 16])  # 16 == hidden*dirs triggers k=3
def test_sru_matches_numpy_loop(bidirectional, d_in):
    hidden, layers = 8, 3
    model = SRU(
        input_size=d_in, hidden_size=hidden, num_layers=layers,
        bidirectional=bidirectional,
    )
    x = np.random.default_rng(0).standard_normal((2, 15, d_in)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))

    np_params = {k: np.asarray(v) for k, v in variables["params"].items()}
    ref = _sru_numpy(x, np_params, hidden, layers, bidirectional)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)


def test_sru_grads_flow():
    """Every SRU parameter must receive a nonzero gradient."""
    model = SRU(input_size=24, hidden_size=8, num_layers=2, bidirectional=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 10, 24)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    for name, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.abs(np.asarray(g)).max() > 0, f"zero grad for {name}"
