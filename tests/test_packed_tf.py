"""Parity tests for the packed-TF Pallas kernels (ops/packed_tf.py).

Every kernel runs in interpret mode on CPU and is compared against the
existing XLA-path ops (``convops.conv`` / ``adaptive_avg_pool`` /
``interp_nearest`` and the einsum pointwise lowering) on the UNPACKED
rank-4 layout — forward values AND all gradients, so the custom VJPs are
pinned too. Shapes are small and deliberately ragged (odd T/F, T not a
multiple of the kernel T-chunk) to exercise halo and ragged-grid paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtfs_tpu.ops import convops
from rtfs_tpu.ops import packed_tf as P

B, T, F, C = 2, 13, 7, 4
CI = 6


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _pack(x4):
    return np.asarray(x4).reshape(x4.shape[0], x4.shape[1], -1)


# ------------------------------------------------------------- depthwise


@pytest.mark.parametrize("kt,kf,pads_t,pads_f", [
    (4, 4, (1, 2), (1, 2)),   # torch 'same' for k=4 (the RTFS pyramid)
    (5, 5, (2, 2), (2, 2)),   # odd kernel 'same'
    (4, 4, (1, 1), (1, 1)),   # stride-2 padding geometry (pre-subsample)
    (3, 3, (1, 1), (1, 1)),
])
def test_dw_conv_packed_matches_xla(kt, kf, pads_t, pads_f):
    rng = np.random.default_rng(0)
    x4 = _rand(rng, B, T, F, C)
    w = _rand(rng, kt, kf, C)          # (kT, kF, C) depthwise taps
    bias = _rand(rng, C)
    xp = jnp.asarray(_pack(x4))

    # reference: convops.conv with HWIO depthwise kernel (kT,kF,1,C)
    ref = convops.conv(
        x4, w[:, :, None, :], stride=1,
        padding=(pads_t, pads_f), groups=C, bias=bias,
    )

    def packed_fn(xp, w, bias):
        return P.dw_conv_packed(xp, w, bias, F, C, pads_t, pads_f,
                                (kt, kf), True)

    out = packed_fn(xp, w, bias)
    t_out = T + sum(pads_t) - kt + 1
    f_out = F + sum(pads_f) - kf + 1
    assert out.shape == (B, t_out, f_out * C)
    np.testing.assert_allclose(
        np.asarray(out).reshape(B, t_out, f_out, C), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )

    # gradients: compare d(loss)/d(x, w, bias) against the XLA path
    cot = _rand(rng, B, t_out, f_out, C)

    def loss_ref(x4, w, bias):
        y = convops.conv(x4, w[:, :, None, :], stride=1,
                         padding=(pads_t, pads_f), groups=C, bias=bias)
        return jnp.sum(y * cot)

    def loss_packed(x4, w, bias):
        y = packed_fn(jnp.reshape(x4, (B, T, F * C)), w, bias)
        return jnp.sum(jnp.reshape(y, (B, t_out, f_out, C)) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x4, w, bias)
    g_new = jax.grad(loss_packed, argnums=(0, 1, 2))(x4, w, bias)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_dw_conv_packed_no_bias():
    rng = np.random.default_rng(1)
    x4 = _rand(rng, 1, 9, F, C)
    w = _rand(rng, 4, 4, C)
    xp = jnp.asarray(_pack(x4))
    ref = convops.conv(x4, w[:, :, None, :], stride=1,
                       padding=((1, 2), (1, 2)), groups=C)
    out = P.dw_conv_packed(xp, w, None, F, C, (1, 2), (1, 2), (4, 4), True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def test_dw_conv_stride2_composition():
    """stride-2 dwconv == row/F-block subsample of the stride-1 output
    (torch integer padding 1, the ConvNormAct stride>1 convention)."""
    rng = np.random.default_rng(2)
    t_in, f_in = 15, 9
    x4 = _rand(rng, B, t_in, f_in, C)
    w = _rand(rng, 4, 4, C)
    bias = _rand(rng, C)
    xp = jnp.asarray(np.asarray(x4).reshape(B, t_in, -1))

    ref = convops.conv(x4, w[:, :, None, :], stride=2, padding=1,
                       groups=C, bias=bias)
    t2, f2 = ref.shape[1], ref.shape[2]

    def fn(xp, w, bias):
        y = P.dw_conv_packed(xp, w, bias, f_in, C, (1, 1), (1, 1),
                             (4, 4), True)
        t_conv = t_in + 2 - 4 + 1
        f_conv = f_in + 2 - 4 + 1
        m, fs, fw = P.stride2_select_maps(t_conv, t2, f_conv, f2)
        return P.spatial_down_packed(
            y, P._hashable(m), P._hashable(fs), P._hashable(fw), f2, C, True
        )

    out = fn(xp, w, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    cot = _rand(rng, B, t2, f2, C)
    g_ref = jax.grad(
        lambda x, w, b: jnp.sum(convops.conv(
            x, w[:, :, None, :], stride=2, padding=1, groups=C, bias=b
        ) * cot), argnums=(0, 1, 2),
    )(x4, w, bias)
    g_new = jax.grad(
        lambda x, w, b: jnp.sum(fn(
            jnp.reshape(x, (B, t_in, f_in * C)), w, b) * cot),
        argnums=(0, 1, 2),
    )(x4, w, bias)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- pointwise


def test_pw_proj_and_unproj_match_einsum():
    rng = np.random.default_rng(3)
    x4 = _rand(rng, B, T, F, CI)
    w = _rand(rng, CI, C)
    bias = _rand(rng, C)

    ref = jnp.einsum("btfi,io->btfo", x4, w) + bias
    out = P.pw_proj_packed(x4, w, bias, True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )

    cot4 = _rand(rng, B, T, F, C)
    g_ref = jax.grad(
        lambda x, w, b: jnp.sum((jnp.einsum("btfi,io->btfo", x, w) + b)
                                * cot4), argnums=(0, 1, 2),
    )(x4, w, bias)
    g_new = jax.grad(
        lambda x, w, b: jnp.sum(
            jnp.reshape(P.pw_proj_packed(x, w, b, True),
                        (B, T, F, C)) * cot4),
        argnums=(0, 1, 2),
    )(x4, w, bias)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    # unproj: packed -> rank-4
    w2 = _rand(rng, C, CI)
    bias2 = _rand(rng, CI)
    xp = jnp.asarray(_pack(x4[..., :C]))
    ref2 = jnp.einsum("btfi,io->btfo", x4[..., :C], w2) + bias2
    out2 = P.pw_unproj_packed(xp, w2, bias2, F, True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)

    cot2 = _rand(rng, B, T, F, CI)
    x0 = x4[..., :C]
    g_ref = jax.grad(
        lambda x, w, b: jnp.sum((jnp.einsum("btfi,io->btfo", x, w) + b)
                                * cot2), argnums=(0, 1, 2),
    )(x0, w2, bias2)
    g_new = jax.grad(
        lambda x, w, b: jnp.sum(P.pw_unproj_packed(
            jnp.reshape(x, (B, T, F * C)), w, b, F, True) * cot2),
        argnums=(0, 1, 2),
    )(x0, w2, bias2)
    for a, b_ in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- spatial maps


def test_spatial_down_adaptive_pool():
    rng = np.random.default_rng(4)
    t2, f2 = 6, 3
    x4 = _rand(rng, B, T, F, C)
    xp = jnp.asarray(_pack(x4))
    ref = convops.adaptive_avg_pool(x4, (t2, f2))
    m, fs, fw = P.adaptive_pool_maps(T, t2, F, f2)
    out = P.spatial_down_packed(
        xp, P._hashable(m), P._hashable(fs), P._hashable(fw), f2, C, True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    cot = _rand(rng, B, t2, f2, C)
    g_ref = jax.grad(
        lambda x: jnp.sum(convops.adaptive_avg_pool(x, (t2, f2)) * cot)
    )(x4)
    g_new = jax.grad(
        lambda x: jnp.sum(P.spatial_down_packed(
            jnp.reshape(x, (B, T, F * C)), P._hashable(m), P._hashable(fs),
            P._hashable(fw), f2, C, True) * cot)
    )(x4)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_up_nearest():
    rng = np.random.default_rng(5)
    t2, f2 = 6, 3
    x4 = _rand(rng, B, t2, f2, C)
    ref = convops.interp_nearest(x4, (T, F))
    m, fs, fw = P.nearest_up_maps(t2, T, f2, F)
    out = P.spatial_up_packed(
        x4, P._hashable(m), P._hashable(fs), P._hashable(fw), F, True
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-6, atol=1e-6,
    )

    cot = _rand(rng, B, T, F, C)
    g_ref = jax.grad(
        lambda x: jnp.sum(convops.interp_nearest(x, (T, F)) * cot)
    )(x4)
    g_new = jax.grad(
        lambda x: jnp.sum(jnp.reshape(P.spatial_up_packed(
            x, P._hashable(m), P._hashable(fs), P._hashable(fw), F, True),
            (B, T, F, C)) * cot)
    )(x4)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- packed gLN


def test_gln_packed_matches_module():
    from rtfs_tpu.models.layers import GlobalLayerNorm

    rng = np.random.default_rng(6)
    x4 = _rand(rng, B, T, F, C)
    mod = GlobalLayerNorm(C)
    variables = mod.init(jax.random.PRNGKey(0), x4)
    gamma = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    variables = {"params": {"scale": gamma, "bias": beta}}
    ref = mod.apply(variables, x4)
    out = P.gln_packed(jnp.asarray(_pack(x4)), gamma, beta, F=F)
    np.testing.assert_allclose(
        np.asarray(out).reshape(ref.shape), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


# ------------------------------------------------------- model-level parity


def _build_small_rtfs():
    import dataclasses

    from rtfs_tpu.config import build_avnet, load_config

    conf = load_config("lrs2_RTFSNet_4_layer")
    conf["audionet"]["audio_params"]["repeats"] = 2
    conf["audionet"]["video_params"]["repeats"] = 1
    return build_avnet(conf)


def test_packed_tf_model_parity():
    """AVNet(packed_tf=True) must match the standard path exactly (same
    params, reduction-order tolerance) — the packed layout is a pure
    computation-layout choice, like batch_fold."""
    import dataclasses

    rng = np.random.default_rng(0)
    model = _build_small_rtfs()
    wav = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((2, 50, 512)).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), wav[:1], emb[:1])

    out1 = np.asarray(model.apply(variables, wav, emb))
    model2 = dataclasses.replace(model, packed_tf=True)
    out2 = np.asarray(model2.apply(variables, wav, emb))
    np.testing.assert_allclose(out2, out1, atol=2e-5, rtol=1e-4)


def test_packed_tf_gradients_match():
    import dataclasses

    from jax.flatten_util import ravel_pytree

    rng = np.random.default_rng(1)
    model = _build_small_rtfs()
    wav = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((2, 50, 512)).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), wav[:1], emb[:1])
    tgt = wav[:, None] * 0.5

    def make_loss(mdl):
        def loss(params):
            out = mdl.apply(
                {"params": params, **{k: v for k, v in variables.items()
                                      if k != "params"}}, wav, emb,
            )
            return jnp.mean((out - tgt) ** 2) * 1e3
        return loss

    g1 = jax.grad(make_loss(model))(variables["params"])
    g2 = jax.grad(make_loss(dataclasses.replace(model, packed_tf=True)))(
        variables["params"]
    )
    flat1, _ = ravel_pytree(g1)
    flat2, _ = ravel_pytree(g2)
    scale = float(jnp.max(jnp.abs(flat1))) + 1e-12
    err = float(jnp.max(jnp.abs(flat1 - flat2))) / scale
    assert err < 2e-4, err
