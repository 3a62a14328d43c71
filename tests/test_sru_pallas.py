"""Pallas SRU kernel parity (interpret mode on CPU): fwd + grads vs lax.scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.ops import sru as sru_scan
from rtfs_tpu.ops import sru_pallas


def _random_layer(rng, d_in, hidden, dirs):
    k = 4 if d_in != dirs * hidden else 3
    w = rng.standard_normal((d_in, dirs * k * hidden)).astype(np.float32) * 0.1
    wc = rng.standard_normal((dirs, 2, hidden)).astype(np.float32) * 0.2
    b = rng.standard_normal((dirs, 2, hidden)).astype(np.float32) * 0.1
    return w, wc, b


@pytest.mark.parametrize("bidirectional", [True, False])
@pytest.mark.parametrize("d_in,hidden", [(48, 8), (16, 8)])
def test_pallas_forward_matches_scan(bidirectional, d_in, hidden):
    rng = np.random.default_rng(0)
    dirs = 2 if bidirectional else 1
    x = rng.standard_normal((5, 12, d_in)).astype(np.float32)
    w, wc, b = _random_layer(rng, d_in, hidden, dirs)

    ref = sru_scan.sru_layer(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wc), jnp.asarray(b),
        hidden, bidirectional,
    )
    got = sru_pallas.sru_layer_tpu(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(wc), jnp.asarray(b),
        hidden, bidirectional, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_pallas_grads_match_scan():
    rng = np.random.default_rng(1)
    d_in, hidden, dirs = 32, 8, 2
    x = rng.standard_normal((3, 10, d_in)).astype(np.float32)
    w, wc, b = _random_layer(rng, d_in, hidden, dirs)
    args = tuple(map(jnp.asarray, (x, w, wc, b)))

    def loss_scan(x, w, wc, b):
        out = sru_scan.sru_layer(x, w, wc, b, hidden, True)
        return jnp.sum(jnp.sin(out))

    def loss_pallas(x, w, wc, b):
        out = sru_pallas.sru_layer_tpu(x, w, wc, b, hidden, True,
                                       interpret=True)
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(*args)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    for a, e, name in zip(g_got, g_ref, ("dx", "dw", "dwc", "db")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), atol=2e-5, rtol=1e-3,
            err_msg=f"gradient mismatch: {name}",
        )


def test_module_backend_interpret_matches_scan():
    from rtfs_tpu.ops.sru import SRU

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 9, 24)).astype(np.float32))
    m_scan = SRU(input_size=24, hidden_size=8, num_layers=3,
                 bidirectional=True, backend="scan")
    m_pl = SRU(input_size=24, hidden_size=8, num_layers=3,
               bidirectional=True, backend="interpret")
    variables = m_scan.init(jax.random.PRNGKey(0), x)
    ref = m_scan.apply(variables, x)
    got = m_pl.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_windowed_sru_matches_unfold_path():
    """Conv-formulated layer-0 == unfold+matmul (same params, both backends)."""
    from rtfs_tpu.ops.sru import SRU

    rng = np.random.default_rng(3)
    c, k = 6, 4
    x = jnp.asarray(rng.standard_normal((3, 14, c)).astype(np.float32))
    m_scan = SRU(input_size=c * k, hidden_size=8, num_layers=3,
                 bidirectional=True, backend="scan", window=(k, 1))
    m_pl = SRU(input_size=c * k, hidden_size=8, num_layers=3,
               bidirectional=True, backend="interpret", window=(k, 1))
    variables = m_scan.init(jax.random.PRNGKey(0), x)
    ref = m_scan.apply(variables, x)
    got = m_pl.apply(variables, x)
    assert ref.shape == got.shape == (3, 11, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_windowed_sru_grads():
    from rtfs_tpu.ops.sru import SRU

    rng = np.random.default_rng(4)
    c, k = 4, 3
    x = jnp.asarray(rng.standard_normal((2, 10, c)).astype(np.float32))

    def make_loss(backend):
        m = SRU(input_size=c * k, hidden_size=4, num_layers=2,
                bidirectional=True, backend=backend, window=(k, 1))
        variables = m.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(jnp.sin(m.apply({"params": params}, x)))

        return variables["params"], loss

    p, loss_scan = make_loss("scan")
    _, loss_pl = make_loss("interpret")
    g_ref = jax.grad(loss_scan)(p)
    g_got = jax.grad(loss_pl)(p)
    keyfn = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_got), key=keyfn),
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=keyfn),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-3)
