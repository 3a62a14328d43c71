"""Video (lip-reading) backbones: FRCNN (Conv3d + ResNet18/ShuffleNetV2), AE.

TPU-native counterparts of the reference ``src/models/videomodels/``. The
backbone is FROZEN during AV training (reference
``frcnn_videomodel.py:103-115``: grads off, BatchNorm locked in eval mode) —
here that means the caller wraps it in ``jax.lax.stop_gradient`` and
BatchNorms always run with running statistics (``train=False`` semantics),
which is the default of ``layers.BatchNorm``.

Layout: input mouth video (B, T, H, W) grayscale (reference: (B,1,T,H,W));
output embeddings (B, T, C) channels-last (reference: (B, C, T)).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import layers as L


class ChannelPReLU(nn.Module):
    """torch nn.PReLU(num_parameters=C): per-channel slope, init 0.25."""

    features: int

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
            (self.features,),
        )
        return jnp.where(x >= 0, x, a * x)


def _msra_conv_init(key, shape, dtype=jnp.float32):
    """Reference ResNet init: normal(0, sqrt(2/(k*k*out))) (resnet.py:91-94)."""
    receptive = int(np.prod(shape[:-2]))
    n = receptive * shape[-1]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / n)


class _ConvBN(nn.Module):
    """conv (no bias) + BatchNorm (+ optional relu), channels-last."""

    in_chan: int
    out_chan: int
    kernel: int
    stride: int = 1
    padding: Any = 0
    groups: int = 1
    relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = L.Conv(
            self.in_chan, self.out_chan, self.kernel, stride=self.stride,
            padding=self.padding, groups=self.groups, use_bias=False, nd=2,
        )(x)
        x = L.BatchNorm(self.out_chan)(x, train=train)
        if self.relu:
            x = jax.nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """ResNet BasicBlock with optional PReLU (reference ``resnet.py:24-65``)."""

    inplanes: int
    planes: int
    stride: int = 1
    has_downsample: bool = False
    relu_type: str = "prelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = L.Conv(self.inplanes, self.planes, 3, stride=self.stride,
                     padding=1, use_bias=False, nd=2)(x)
        out = L.BatchNorm(self.planes)(out, train=train)
        out = (
            ChannelPReLU(self.planes)(out)
            if self.relu_type == "prelu"
            else jax.nn.relu(out)
        )
        out = L.Conv(self.planes, self.planes, 3, padding=1, use_bias=False,
                     nd=2)(out)
        out = L.BatchNorm(self.planes)(out, train=train)
        if self.has_downsample:
            residual = _ConvBN(
                self.inplanes, self.planes, 1, stride=self.stride
            )(x, train)
        out = out + residual
        return (
            ChannelPReLU(self.planes)(out)
            if self.relu_type == "prelu"
            else jax.nn.relu(out)
        )


class ResNetTrunk(nn.Module):
    """ResNet-18 trunk: layers [2,2,2,2] → adaptive avgpool → 512
    (reference ``resnet.py:68-130``)."""

    relu_type: str = "prelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = 64
        for planes, blocks, stride in (
            (64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)
        ):
            for i in range(blocks):
                s = stride if i == 0 else 1
                ds = i == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(
                    inplanes, planes, s, ds, self.relu_type
                )(x, train)
                inplanes = planes
        return jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)


def _channel_shuffle(x, groups: int):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit (reference ``shufflenetv2.py:37-99``)."""

    inp: int
    oup: int
    stride: int
    benchmodel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        oup_inc = self.oup // 2
        if self.benchmodel == 1:
            x1 = x[..., : x.shape[-1] // 2]
            x2 = x[..., x.shape[-1] // 2:]
            out = _ConvBN(oup_inc, oup_inc, 1, relu=True)(x2, train)
            out = _ConvBN(oup_inc, oup_inc, 3, stride=self.stride, padding=1,
                          groups=oup_inc)(out, train)
            out = _ConvBN(oup_inc, oup_inc, 1, relu=True)(out, train)
            out = jnp.concatenate([x1, out], axis=-1)
        else:
            b1 = _ConvBN(self.inp, self.inp, 3, stride=self.stride, padding=1,
                         groups=self.inp)(x, train)
            b1 = _ConvBN(self.inp, oup_inc, 1, relu=True)(b1, train)
            b2 = _ConvBN(self.inp, oup_inc, 1, relu=True)(x, train)
            b2 = _ConvBN(oup_inc, oup_inc, 3, stride=self.stride, padding=1,
                         groups=oup_inc)(b2, train)
            b2 = _ConvBN(oup_inc, oup_inc, 1, relu=True)(b2, train)
            out = jnp.concatenate([b1, b2], axis=-1)
        return _channel_shuffle(out, 2)


_SHUFFLE_CHANNELS = {
    0.5: [-1, 24, 48, 96, 192, 1024],
    1.0: [-1, 24, 116, 232, 464, 1024],
    1.5: [-1, 24, 176, 352, 704, 1024],
    2.0: [-1, 24, 244, 488, 976, 2048],
}


class ShuffleNetV2Trunk(nn.Module):
    """ShuffleNetV2 feature trunk (features + conv_last + globalpool),
    as used by FRCNNVideoModel (``frcnn_videomodel.py:33-39``)."""

    width_mult: float = 1.0
    input_size: int = 96

    @nn.compact
    def __call__(self, x, train: bool = False):
        chans = _SHUFFLE_CHANNELS[self.width_mult]
        stage_repeats = [4, 8, 4]
        input_channel = chans[1]
        for idxstage, numrepeat in enumerate(stage_repeats):
            output_channel = chans[idxstage + 2]
            for i in range(numrepeat):
                if i == 0:
                    x = InvertedResidual(input_channel, output_channel, 2, 2)(
                        x, train
                    )
                else:
                    x = InvertedResidual(output_channel, output_channel, 1, 1)(
                        x, train
                    )
                input_channel = output_channel
        x = _ConvBN(input_channel, chans[-1], 1, relu=True)(x, train)
        return jnp.mean(x, axis=(1, 2))  # global avg pool


class FRCNNVideoModel(nn.Module):
    """Frozen lip-embedding backbone (reference ``frcnn_videomodel.py:16-100``).

    Conv3d(5,7,7)/s(1,2,2) + BN + PReLU + MaxPool3d(1,3,3)/s(1,2,2), then a
    per-frame 2D trunk. Input (B, T, H, W) grayscale in [0,1]-ish normalized
    units; output (B, T, C_out) with C_out = 512 (resnet) / 1024-2048
    (shufflenet).
    """

    backbone_type: str = "resnet"
    relu_type: str = "prelu"
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w = x.shape
        x = x[..., None]  # (B, T, H, W, 1)

        frontend_nout = 64 if self.backbone_type == "resnet" else 24
        # Conv3d (5,7,7), stride (1,2,2), padding (2,3,3), no bias.
        kernel = self.param(
            "frontend_conv", _msra_conv_init, (5, 7, 7, 1, frontend_nout)
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 2, 2),
            padding=[(2, 2), (3, 3), (3, 3)], dimension_numbers=dn,
        )
        x = L.BatchNorm(frontend_nout)(x, train=train)
        x = (
            ChannelPReLU(frontend_nout)(x)
            if self.relu_type == "prelu"
            else jax.nn.relu(x)
        )
        # MaxPool3d kernel (1,3,3) stride (1,2,2) padding (0,1,1)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, 3, 3, 1),
            window_strides=(1, 1, 2, 2, 1),
            padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
        )

        # fold time into batch for the 2D trunk
        bt = b * t
        x = x.reshape(bt, *x.shape[2:])
        if self.backbone_type == "resnet":
            feats = ResNetTrunk(self.relu_type)(x, train)
        elif self.backbone_type == "shufflenet":
            feats = ShuffleNetV2Trunk(self.width_mult)(x, train)
        else:
            raise ValueError(self.backbone_type)
        return feats.reshape(b, t, -1)  # (B, T, C)

    @property
    def out_channels(self) -> int:
        if self.backbone_type == "resnet":
            return 512
        return 2048 if self.width_mult == 2.0 else 1024


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d(affine=True) parity, channels-last."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class EncoderAE(nn.Module):
    """Conv AE encoder (reference ``autoencoder/autoencoder.py:8-83``)."""

    in_channels: int = 1
    base_channels: int = 4
    num_layers: int = 3
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        cin = self.in_channels
        for i in range(self.num_layers):
            cout = self.base_channels * (2**i)
            x = L.Conv(cin, cout, 2, stride=2, padding=0, nd=2)(x)
            x = InstanceNorm(cout)(x)
            x = jnp.where(x >= 0, x, self.leaky_slope * x)
            cin = cout
        return x


class DecoderAE(nn.Module):
    """Conv AE decoder (transposed convs, reference ``autoencoder.py:35-106``)."""

    in_channels: int = 1
    base_channels: int = 4
    num_layers: int = 3
    leaky_slope: float = 0.3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            cin = self.base_channels * (2 ** (self.num_layers - i - 1))
            cout = (
                self.in_channels if i == self.num_layers - 1 else cin // 2
            )
            x = L.ConvTranspose(cin, cout, 2, stride=2, nd=2)(x)
            x = InstanceNorm(cout)(x)
            x = jnp.where(x >= 0, x, self.leaky_slope * x)
        return x


class AEVideoModel(nn.Module):
    """Autoencoder lip backbone (reference ``autoencoder_videomodel.py:9-80``).

    Input (B, T, H, W); output (B, T, C*H'*W') 1D embeddings (or the is2d
    variant (B, H'*W', T, C) — expressed channels-last as (B, T, C, H'W')).
    """

    in_channels: int = 1
    base_channels: int = 4
    num_layers: int = 3
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w = x.shape
        z = EncoderAE(self.in_channels, self.base_channels, self.num_layers)(
            x.reshape(b * t, h, w)[..., None]
        )  # (B*T, H', W', C)
        if self.is2d:
            # Reference semantics (autoencoder_videomodel.py:50-52): the
            # flattened spatial grid H'*W' becomes the CHANNEL axis and the
            # encoder channels C become a spatial axis — channel-first
            # (B, H'W', T, C) is channels-last (B, T, C, H'W') here.
            c = z.shape[-1]
            z = z.reshape(b, t, -1, c)  # (B, T, H'*W', C)
            return jnp.swapaxes(z, 2, 3)  # (B, T, C, H'W')
        # 1D: flatten per-frame features. NOTE: channels-last flatten order
        # is (H', W', C) vs the reference's channel-first (C, H', W') — a
        # fixed permutation of the embedding vector (importer would need a
        # row permutation on the consuming conv; no shipped preset loads a
        # pretrained 1D-AE backbone).
        return z.reshape(b, t, -1)  # (B, T, C*H'*W')


VIDEO_MODEL_REGISTRY = {
    "FRCNNVideoModel": FRCNNVideoModel,
    "AEVideoModel": AEVideoModel,
    # reference legacy configs name the AE video path by its encoder
    # (config/legacy-configs/lrs2_dptnet2d_mini.yml: model_name: EncoderAE)
    "EncoderAE": AEVideoModel,
}


def make_video_model(conf: Dict[str, Any]):
    """Build a video backbone from the ``videonet`` config group."""
    import dataclasses as _dc

    conf = dict(conf)
    name = conf.pop("model_name", "FRCNNVideoModel")
    cls = VIDEO_MODEL_REGISTRY[name]
    fields = {f.name for f in _dc.fields(cls)}
    return cls(**{k: v for k, v in conf.items() if k in fields})
