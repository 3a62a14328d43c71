"""Fused dual-direction SRU stack parity (interpret mode on CPU).

Covers the second-generation kernels in ``rtfs_tpu.ops.sru_fused``:
in-kernel time reversal, fused hidden-layer projections, multi-chunk
carries and multi-tile batch grids, forward and BPTT — all against the
``ops.sru`` lax.scan reference (itself golden-tested against the torch
``sru`` semantics in test_sru_semantics.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.ops.convops import unfold_1d
from rtfs_tpu.ops.sru import SRU, sru_layer
from rtfs_tpu.ops.sru_fused import T_CHUNK, sru_stack_tpu


def _stack_params(rng, d_in0, hidden, n_layers, scale=0.15):
    dirs = 2
    ws, wcs, bs = [], [], []
    for layer in range(n_layers):
        d_in = d_in0 if layer == 0 else dirs * hidden
        k = 4 if d_in != dirs * hidden else 3
        ws.append(jnp.asarray(
            (rng.standard_normal((d_in, dirs * k * hidden)) * scale
             ).astype(np.float32)))
        wcs.append(jnp.asarray(
            (rng.standard_normal((dirs, 2, hidden)) * 0.3
             ).astype(np.float32)))
        bs.append(jnp.asarray(
            (rng.standard_normal((dirs, 2, hidden)) * 0.1
             ).astype(np.float32)))
    return ws, wcs, bs


def _ref_stack(x, ws, wcs, bs, hidden, window):
    h = unfold_1d(x, window[0], window[1]) if window else x
    for w, wc, b in zip(ws, wcs, bs):
        h = sru_layer(h, w, wc, b, hidden, True)
    return h


def test_fused_stack_windowed_multichunk():
    """T spans 3 chunks; folded batch is far below one lane tile."""
    rng = np.random.default_rng(0)
    B, T, C, ks, H = 3, 2 * T_CHUNK + 11, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C * ks, H, 3)

    ref = _ref_stack(x, ws, wcs, bs, H, (ks, 1))
    got = sru_stack_tpu(x, ws, wcs, bs, H, window=(ks, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_stack_multitile_batch():
    """Folded batch > LANE exercises the batch-tile grid axis + carry reset."""
    rng = np.random.default_rng(1)
    B, T, C, H = 140, T_CHUNK + 5, 20, 4  # no window; einsum layer 0 (k=4)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C, H, 2)

    ref = _ref_stack(x, ws, wcs, bs, H, None)
    got = sru_stack_tpu(x, ws, wcs, bs, H, window=None, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_stack_single_layer():
    rng = np.random.default_rng(2)
    B, T, C, ks, H = 2, 19, 6, 4, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C * ks, H, 1)

    ref = _ref_stack(x, ws, wcs, bs, H, (ks, 1))
    got = sru_stack_tpu(x, ws, wcs, bs, H, window=(ks, 1), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_stack_grads():
    """BPTT through 3 fused layers: dx, dW, dv, db vs lax.scan autodiff."""
    rng = np.random.default_rng(3)
    B, T, C, ks, H = 2, T_CHUNK + 9, 8, 4, 6
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C * ks, H, 3)

    def loss_ref(ws_, wcs_, bs_, x_):
        return jnp.sum(jnp.sin(_ref_stack(x_, ws_, wcs_, bs_, H, (ks, 1))))

    def loss_new(ws_, wcs_, bs_, x_):
        return jnp.sum(jnp.sin(sru_stack_tpu(
            x_, ws_, wcs_, bs_, H, window=(ks, 1), interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(ws, wcs, bs, x)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2, 3))(ws, wcs, bs, x)
    for name, ref_list, new_list in (
        ("dW", g_ref[0], g_new[0]),
        ("dv", g_ref[1], g_new[1]),
        ("db", g_ref[2], g_new[2]),
        ("dx", (g_ref[3],), (g_new[3],)),
    ):
        for i, (a, b) in enumerate(zip(ref_list, new_list)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5, rtol=1e-3,
                err_msg=f"{name}[{i}]",
            )


def test_fused_stack_bf16_close_to_f32():
    rng = np.random.default_rng(4)
    B, T, C, ks, H = 2, 21, 8, 4, 8
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C * ks, H, 2)

    ref = sru_stack_tpu(x, ws, wcs, bs, H, window=(ks, 1), interpret=True)
    to_bf16 = lambda t: [a.astype(jnp.bfloat16) for a in t]
    got = sru_stack_tpu(
        x.astype(jnp.bfloat16), to_bf16(ws), to_bf16(wcs), to_bf16(bs),
        H, window=(ks, 1), interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
    assert err < 0.15, err  # bf16 mantissa; gate-saturating recurrence


def test_module_uses_fused_path_and_matches_scan():
    """SRU(backend='interpret', bidirectional, k0=4) routes to the fused
    stack and matches backend='scan' with identical params."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 40, 24)).astype(np.float32))
    kw = dict(input_size=24, hidden_size=8, num_layers=4,
              bidirectional=True)
    m_scan = SRU(backend="scan", **kw)
    m_fused = SRU(backend="interpret", **kw)
    variables = m_scan.init(jax.random.PRNGKey(0), x)
    ref = m_scan.apply(variables, x)
    got = m_fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_stack_bf16_grads_tolerance():
    """ADVICE r2: the backward kernels recompute gates from c checkpoints
    stored in the INPUT dtype; under bf16 the forward carried f32, so the
    recomputed gates differ by c's rounding and add gradient noise. This
    pins the accepted bf16 gradient error against the f32 fused gradients
    (cosine similarity + relative magnitude), so a regression in the
    recompute path fails loudly instead of silently degrading training.
    """
    rng = np.random.default_rng(7)
    B, T, C, ks, H = 2, T_CHUNK + 9, 8, 4, 6
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    ws, wcs, bs = _stack_params(rng, C * ks, H, 2)

    def loss(ws_, wcs_, bs_, x_):
        out = sru_stack_tpu(x_, ws_, wcs_, bs_, H, window=(ks, 1),
                            interpret=True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g32 = jax.grad(loss, argnums=(0, 1, 2, 3))(ws, wcs, bs, x)
    to_bf16 = lambda t: [a.astype(jnp.bfloat16) for a in t]
    g16 = jax.grad(loss, argnums=(0, 1, 2, 3))(
        to_bf16(ws), to_bf16(wcs), to_bf16(bs), x.astype(jnp.bfloat16)
    )

    def flat(g):
        return jnp.concatenate([jnp.ravel(a).astype(jnp.float32)
                                for a in jax.tree.leaves(g)])

    a, b = flat(g32), flat(g16)
    cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    # bf16 params + bf16-rounded c checkpoints: direction must hold, and
    # the relative L2 noise stays well under the step-to-step gradient
    # scale AdamW normalizes away
    assert cos > 0.99, cos
    assert rel < 0.15, rel
