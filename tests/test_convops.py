"""Golden parity: conv/interp/pool/unfold primitives vs torch equivalents."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rtfs_tpu.ops import convops


def _t2j_conv_w(w: torch.Tensor) -> jnp.ndarray:
    """torch conv weight (Cout, Cin/g, *k) -> ours (*k, Cin/g, Cout)."""
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return jnp.asarray(w.permute(*perm).numpy())


def _t2j_convT_w(w: torch.Tensor) -> jnp.ndarray:
    """torch convT weight (Cin, Cout, *k) -> ours (*k, Cout, Cin)."""
    nd = w.ndim - 2
    perm = tuple(range(2, 2 + nd)) + (1, 0)
    return jnp.asarray(w.permute(*perm).numpy())


@pytest.mark.parametrize(
    "cin,cout,k,stride,groups,dilation,padding",
    [
        (16, 24, 4, 1, 1, 1, "same"),   # even kernel, asymmetric same
        (16, 16, 5, 2, 16, 1, 2),        # depthwise strided (TDANet downsample)
        (16, 24, 5, 1, 1, 2, "same"),   # dilated
        (12, 8, 21, 10, 1, 1, 10),       # ConvolutionalEncoder geometry
    ],
)
def test_conv1d_parity(cin, cout, k, stride, groups, dilation, padding):
    torch.manual_seed(0)
    m = torch.nn.Conv1d(
        cin, cout, k, stride=stride, padding=padding, dilation=dilation,
        groups=groups, bias=True,
    )
    x = torch.randn(2, cin, 101)
    ref = m(x).detach().numpy()  # (B, Cout, T')

    got = convops.conv(
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        _t2j_conv_w(m.weight.detach()),
        stride=stride,
        padding=padding,
        dilation=dilation,
        groups=groups,
        bias=jnp.asarray(m.bias.detach().numpy()),
    )
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding",
    [
        (8, 12, 3, 1, "same"),
        (8, 8, 4, 2, 1),
        (4, 6, 3, 1, 1),
        (2, 32, 3, 1, 1),     # STFT-encoder geometry: narrow Cin tap plan
        (32, 2, 3, 1, "same"),  # narrow Cout tap plan (GEMM-first)
    ],
)
def test_conv2d_parity(cin, cout, k, stride, padding):
    torch.manual_seed(1)
    m = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=padding)
    x = torch.randn(2, cin, 37, 29)
    ref = m(x).detach().numpy()

    got = convops.conv(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        _t2j_conv_w(m.weight.detach()),
        stride=stride,
        padding=padding,
        bias=jnp.asarray(m.bias.detach().numpy()),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,output_padding",
    [
        (24, 16, 8, 1, 0, 0),    # DualPathRNN back-projection geometry
        (12, 1, 21, 10, 10, 9),  # ConvolutionalDecoder geometry
    ],
)
def test_conv_transpose1d_parity(cin, cout, k, stride, padding, output_padding):
    torch.manual_seed(2)
    m = torch.nn.ConvTranspose1d(
        cin, cout, k, stride=stride, padding=padding,
        output_padding=output_padding,
    )
    x = torch.randn(2, cin, 57)
    ref = m(x).detach().numpy()

    got = convops.conv_transpose(
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        _t2j_convT_w(m.weight.detach()),
        stride=stride,
        padding=padding,
        output_padding=output_padding,
        bias=jnp.asarray(m.bias.detach().numpy()),
    )
    got = np.asarray(got).transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose2d_parity():
    torch.manual_seed(3)
    m = torch.nn.ConvTranspose2d(16, 2, 3, stride=1, padding=1, bias=False)
    x = torch.randn(2, 16, 21, 17)
    ref = m(x).detach().numpy()

    got = convops.conv_transpose(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        _t2j_convT_w(m.weight.detach()),
        stride=1,
        padding=1,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_tap_lowering_grad_parity():
    """The narrow-channel tap lowering must agree with the general conv
    path on outputs AND input/weight gradients (it replaces the lowering
    for the STFT encoder's 2->256 conv and the decoder's 256->2 ConvT,
    both of which train)."""
    rng = np.random.default_rng(7)

    def general_conv(x, w, pads, dilation):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=pads,
            rhs_dilation=dilation, dimension_numbers=dn,
        )

    for cin, cout, k, dilation in [(2, 24, 3, (1, 1)), (24, 2, 3, (1, 2))]:
        x = jnp.asarray(rng.standard_normal((2, 19, 17, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32)
        )
        pads = ((1, 1), (dilation[1], dilation[1]))

        def loss_tap(x, w):
            return jnp.sum(
                jnp.sin(convops._conv_tap_einsum(x, w, pads, dilation))
            )

        def loss_gen(x, w):
            return jnp.sum(jnp.sin(general_conv(x, w, pads, dilation)))

        y_tap = convops._conv_tap_einsum(x, w, pads, dilation)
        y_gen = general_conv(x, w, pads, dilation)
        np.testing.assert_allclose(
            np.asarray(y_tap), np.asarray(y_gen), atol=1e-5, rtol=1e-5
        )
        g_tap = jax.grad(loss_tap, argnums=(0, 1))(x, w)
        g_gen = jax.grad(loss_gen, argnums=(0, 1))(x, w)
        for a, b in zip(g_tap, g_gen):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )


@pytest.mark.parametrize("in_sz,out_sz", [(50, 251), (251, 50), (10, 33), (64, 129)])
def test_interp_nearest_1d(in_sz, out_sz):
    x = torch.randn(2, 7, in_sz)
    ref = F.interpolate(x, size=out_sz, mode="nearest").numpy()
    got = convops.interp_nearest(
        jnp.asarray(x.numpy().transpose(0, 2, 1)), (out_sz,)
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=0)


def test_interp_nearest_2d():
    x = torch.randn(2, 5, 63, 33)
    ref = F.interpolate(x, size=(126, 65), mode="nearest").numpy()
    got = convops.interp_nearest(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (126, 65)
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, atol=0)


@pytest.mark.parametrize("in_sz,out_sz", [(126, 63), (251, 63), (50, 7)])
def test_adaptive_avg_pool1d(in_sz, out_sz):
    x = torch.randn(2, 6, in_sz)
    ref = F.adaptive_avg_pool1d(x, out_sz).numpy()
    got = convops.adaptive_avg_pool(
        jnp.asarray(x.numpy().transpose(0, 2, 1)), (out_sz,)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), ref, atol=1e-6, rtol=1e-5
    )


def test_adaptive_avg_pool2d():
    x = torch.randn(2, 6, 251, 129)
    ref = F.adaptive_avg_pool2d(x, (63, 33)).numpy()
    got = convops.adaptive_avg_pool(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), (63, 33)
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-5
    )


def test_unfold_matches_torch():
    """unfold_1d must reproduce nn.Unfold((k,1)) channel-major ordering."""
    k = 8
    x = torch.randn(3, 16, 40, 1)  # (B, C, T, 1) as DualPathRNN uses it
    ref = torch.nn.Unfold((k, 1), stride=(1, 1))(x).numpy()  # (B, C*k, T')
    got = convops.unfold_1d(
        jnp.asarray(x.numpy()[..., 0].transpose(0, 2, 1)), k, 1
    )  # (B, T', C*k)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, atol=0)


def test_interp_nearest_scatter_free_vjp():
    """The custom adjoint (per-axis one-hot matmuls, no scatter-add) must
    equal the autodiff-of-gather adjoint for up/down/mixed resizes."""
    rng = np.random.default_rng(7)
    cases = [((2, 13, 4), (29,)), ((2, 29, 4), (13,)),
             ((2, 13, 7, 4), (29, 17)), ((2, 29, 17, 4), (13, 7)),
             ((2, 13, 7, 4), (13, 17)), ((2, 13, 7, 4), (29, 7)),
             # shift-repeat plans (r, a>0): the RTFS "2n+1" TF upsample
             # and the CAF 50->251 video resize
             ((2, 125, 64, 4), (251, 129)), ((2, 50, 4), (251,)),
             ((1, 7, 3), (50,))]
    for shape, size in cases:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        y1, vjp1 = jax.vjp(lambda x_: convops.interp_nearest(x_, size), x)
        y2, vjp2 = jax.vjp(
            lambda x_: convops._interp_nearest_fwd_impl(x_, size), x
        )
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        g = jnp.asarray(rng.standard_normal(y1.shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(vjp1(g)[0]), np.asarray(vjp2(g)[0]),
            atol=2e-6, rtol=1e-6, err_msg=f"{shape} -> {size}",
        )
