"""Separator cores: TDANet (RTFS block host), FRCNN (CTCNet), DPTNet.

TPU-native counterparts of the reference ``src/models/separators/``. Each
separator exposes ``block(i)`` (shared or per-repeat parameters) plus a
standalone ``__call__`` with the residual-accumulation recursion
(reference ``tdanet.py:205-209``); the AV refinement loop drives ``block``
directly.

The "globalatt" stack is config-driven through ``build_layer`` — the typed
equivalent of the reference's string registry (``layers/__init__.py:19-31``).

Layout: 2D maps (B, T, F, C); 1D maps (B, T, C).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import convops
from ..ops import packed_tf as P
from . import layers as L
from .attention import (
    GlobalAttention,
    GlobalAttention2D,
    MultiHeadSelfAttention,
    MultiHeadSelfAttention2D,
)
from .fusion_layers import InjectionMultiSum
from .rnn_blocks import DualPathRNN, GlobalAttentionRNN, RNNProjection

# ---------------------------------------------------------------------------
# Config-string -> layer registry
# ---------------------------------------------------------------------------

LAYER_REGISTRY = {
    "DualPathRNN": DualPathRNN,
    "MultiHeadSelfAttention2D": MultiHeadSelfAttention2D,
    "MultiHeadSelfAttention": MultiHeadSelfAttention,
    "GlobalAttention": GlobalAttention,
    "GlobalAttention2D": GlobalAttention2D,
    "GlobalAttentionRNN": GlobalAttentionRNN,
    "RNNProjection": RNNProjection,
    "FeedForwardNetwork": L.FeedForwardNetwork,
}


def _register_legacy():
    """Legacy/ablation layers (reference legacy-configs breadth)."""
    from . import legacy_layers as LL

    LAYER_REGISTRY.update(
        {
            "CBAMBlock": LL.CBAMBlock,
            "ShuffleAttention": LL.ShuffleAttention,
            "CoTAttention": LL.CoTAttention,
            "MLP": LL.MLPMixerLayer,
            "Permutator": LL.PermutatorLayer,
            "ConvolutionalRNN": LL.ConvolutionalRNN,
            "BiLSTM2D": LL.BiLSTM2D,
            "GlobalGALR": LL.GlobalGALR,
        }
    )


_register_legacy()


def build_layer(layer_conf: Dict[str, Any], in_chan: int) -> nn.Module:
    """Instantiate a globalatt layer from its config dict.

    Mirrors ``get(layer['layer_type'])(in_chan=hid_chan, **layer)``
    (reference ``tdanet.py:49``), filtering kwargs to the module's fields.
    """
    conf = dict(layer_conf)
    layer_type = conf.pop("layer_type")
    cls = LAYER_REGISTRY[layer_type]
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in conf.items() if k in fields}
    if "in_chan" in fields:
        kwargs["in_chan"] = in_chan
    if "input_size" in fields:
        kwargs.setdefault("input_size", in_chan)
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# TDANet
# ---------------------------------------------------------------------------


class TDANetBlock(nn.Module):
    """One RTFS/TDA block (reference ``tdanet.py:8-131``).

    gateway DW-conv → 1x1 projection → stride-2 downsample pyramid →
    pooled global sum → globalatt stack → InjectionMultiSum ("TF-AR")
    reconstruction → residual.
    """

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    stride: int = 2
    norm_type: str = "gLN"
    act_type: str = "PReLU"
    upsampling_depth: int = 4
    layers: Tuple[Dict[str, Any], ...] = ()
    is2d: bool = False

    def setup(self):
        self.gateway = L.ConvNormAct(
            self.in_chan, self.in_chan, 1, groups=self.in_chan,
            act_type=self.act_type, is2d=self.is2d,
        )
        self.projection = L.ConvNormAct(
            self.in_chan, self.hid_chan, 1, is2d=self.is2d
        )
        self.downsample_layers = [
            L.ConvNormAct(
                self.hid_chan, self.hid_chan, self.kernel_size,
                stride=1 if i == 0 else self.stride, groups=self.hid_chan,
                norm_type=self.norm_type, is2d=self.is2d,
            )
            for i in range(self.upsampling_depth)
        ]
        self.globalatt = [
            build_layer(conf, self.hid_chan) for conf in self.layers
        ]
        self.fusion_layers = [
            InjectionMultiSum(
                self.hid_chan, self.kernel_size, self.norm_type, self.is2d
            )
            for _ in range(self.upsampling_depth)
        ]
        self.concat_layers = [
            InjectionMultiSum(
                self.hid_chan, self.kernel_size, self.norm_type, self.is2d
            )
            for _ in range(self.upsampling_depth - 1)
        ]
        self.residual_conv = L.ConvNormAct(
            self.hid_chan, self.in_chan, 1, is2d=self.is2d
        )

    def __call__(self, x, train: bool = False):
        residual = self.gateway(x, train)

        # Packed-TF layout (ops/packed_tf.py): the full-resolution
        # 64-channel segment of the block runs on (B, T, F*C) maps so the
        # minor dim is 128-lane aligned (no 2x HBM padding). Entered at
        # the projection, exited at the stride-2 downsample / pool /
        # residual conv. Pure layout choice; parameters unchanged.
        packed = (
            P.packed_enabled()
            and self.is2d
            and L.fold_factor() == 1
            and not isinstance(x, P.PackedTF)
            and self.kernel_size > 1
            and self.stride == 2
        )
        x_enc = self.projection(
            P.PackRequest(residual) if packed else residual, train
        )

        downsampled = [self.downsample_layers[0](x_enc, train)]
        for i in range(1, self.upsampling_depth):
            downsampled.append(self.downsample_layers[i](downsampled[-1], train))

        # Global pooling to the deepest resolution, then sum.
        target = downsampled[-1].shape[1:-1]
        global_features = sum(
            P.adaptive_pool_from(f, *target)
            if isinstance(f, P.PackedTF)
            else convops.adaptive_avg_pool(f, target)
            for f in downsampled
        )

        # globalatt (DualPathRNN / MHSA2D) runs UNFOLDED: its scans and
        # attention mix channels in ways the fold cannot replicate, and at
        # the pooled resolution the unfold/refold transposes are cheap.
        bf = L.fold_factor()
        global_features = L.unfold_batch(global_features, bf)
        with L.batch_fold(1):
            for layer in self.globalatt:
                global_features = layer(global_features, train)
        global_features = L.fold_batch(global_features, bf)

        x_fused = [
            self.fusion_layers[i](downsampled[i], global_features, train)
            for i in range(self.upsampling_depth)
        ]

        expanded = (
            self.concat_layers[-1](x_fused[-2], x_fused[-1], train)
            + downsampled[-2]
        )
        for i in range(self.upsampling_depth - 3, -1, -1):
            expanded = (
                self.concat_layers[i](x_fused[i], expanded, train)
                + downsampled[i]
            )

        return self.residual_conv(expanded, train) + residual


class FRCNNBlock(nn.Module):
    """Fully-connected multi-scale pyramid block (reference ``frcnn.py:8-163``)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    stride: int = 2
    norm_type: str = "gLN"
    act_type: str = "PReLU"
    upsampling_depth: int = 4
    is2d: bool = False

    def setup(self):
        d = self.upsampling_depth
        self.gateway = L.ConvNormAct(
            self.in_chan, self.in_chan, 1, groups=self.in_chan,
            act_type=self.act_type, is2d=self.is2d,
        )
        self.projection = L.ConvNormAct(
            self.in_chan, self.hid_chan, 1, is2d=self.is2d
        )
        self.downsample_layers = [
            L.ConvNormAct(
                self.hid_chan, self.hid_chan, self.kernel_size,
                stride=1 if i == 0 else self.stride, groups=self.hid_chan,
                norm_type=self.norm_type, is2d=self.is2d,
            )
            for i in range(d)
        ]
        # lateral downsample convs: used for level i reading level i-1.
        self.lateral_down = [
            L.ConvNormAct(
                self.hid_chan, self.hid_chan, self.kernel_size,
                stride=self.stride, groups=self.hid_chan,
                norm_type=self.norm_type, is2d=self.is2d,
            )
            if i > 0
            else None
            for i in range(d)
        ]
        self.concat_layers = [
            L.ConvNormAct(
                self.hid_chan * (2 if i in (0, d - 1) else 3), self.hid_chan,
                1, norm_type=self.norm_type, act_type=self.act_type,
                is2d=self.is2d,
            )
            for i in range(d)
        ]
        self.residual_conv_1 = L.ConvNormAct(
            self.hid_chan * d, self.hid_chan, 1, norm_type=self.norm_type,
            act_type=self.act_type, is2d=self.is2d,
        )
        self.residual_conv_2 = L.ConvNormAct(
            self.hid_chan, self.in_chan, 1, is2d=self.is2d
        )

    def __call__(self, x, train: bool = False):
        d = self.upsampling_depth
        residual = self.gateway(x, train)
        x_enc = self.projection(residual, train)

        downsampled = [self.downsample_layers[0](x_enc, train)]
        for i in range(1, d):
            downsampled.append(self.downsample_layers[i](downsampled[-1], train))

        x_fused = []
        for i in range(d):
            shape = downsampled[i].shape[1:-1]
            parts = []
            if i - 1 >= 0:
                parts.append(self.lateral_down[i](downsampled[i - 1], train))
            parts.append(downsampled[i])
            if i + 1 < d:
                parts.append(convops.interp_nearest(downsampled[i + 1], shape))
            y = L.fold_concat(parts)
            x_fused.append(self.concat_layers[i](y, train))

        shape0 = downsampled[0].shape[1:-1]
        x_fused = [x_fused[0]] + [
            convops.interp_nearest(f, shape0) for f in x_fused[1:]
        ]
        out = self.residual_conv_2(
            self.residual_conv_1(L.fold_concat(x_fused), train),
            train,
        )
        return out + residual


class DPTNetBlock(nn.Module):
    """Thin block: gateway → projection → globalatt → residual (``dpt.py:7-48``)."""

    in_chan: int
    hid_chan: int
    layers: Tuple[Dict[str, Any], ...] = ()
    is2d: bool = False

    def setup(self):
        self.gateway = L.ConvNormAct(
            self.in_chan, self.in_chan, 1, groups=self.in_chan,
            act_type="PReLU", is2d=self.is2d,
        )
        self.projection = L.ConvNormAct(
            self.in_chan, self.hid_chan, 1, is2d=self.is2d
        )
        self.globalatt = [
            build_layer(conf, self.hid_chan) for conf in self.layers
        ]
        self.residual_conv = L.ConvNormAct(
            self.hid_chan, self.in_chan, 1, is2d=self.is2d
        )

    def __call__(self, x, train: bool = False):
        residual = self.gateway(x, train)
        x = self.projection(residual, train)
        bf = L.fold_factor()
        x = L.unfold_batch(x, bf)
        with L.batch_fold(1):
            for layer in self.globalatt:
                x = layer(x, train)
        x = L.fold_batch(x, bf)
        return self.residual_conv(x, train) + residual


class Separator(nn.Module):
    """Repeat-host wrapper: shared or per-repeat blocks + residual recursion.

    Generalises the reference's TDANet/FRCNN/DPTNet outer classes
    (identical except for the block type).
    """

    block_type: str  # "TDANet" | "FRCNN" | "DPTNet"
    in_chan: int = -1
    hid_chan: int = -1
    kernel_size: int = 5
    stride: int = 2
    norm_type: str = "gLN"
    act_type: str = "PReLU"
    upsampling_depth: int = 4
    layers: Tuple[Dict[str, Any], ...] = ()
    repeats: int = 4
    shared: bool = False
    is2d: bool = False

    def setup(self):
        if self.in_chan <= 0 or (
            self.hid_chan <= 0 and self.block_type != "DPTNet"
        ):
            self.blocks = None
            return
        if self.block_type == "TDANet":
            make = lambda: TDANetBlock(
                self.in_chan, self.hid_chan, self.kernel_size, self.stride,
                self.norm_type, self.act_type, self.upsampling_depth,
                tuple(self.layers), self.is2d,
            )
        elif self.block_type == "FRCNN":
            make = lambda: FRCNNBlock(
                self.in_chan, self.hid_chan, self.kernel_size, self.stride,
                self.norm_type, self.act_type, self.upsampling_depth,
                self.is2d,
            )
        elif self.block_type == "DPTNet":
            make = lambda: DPTNetBlock(
                self.in_chan, self.hid_chan, tuple(self.layers), self.is2d
            )
        else:
            raise ValueError(f"Unknown separator: {self.block_type}")
        if self.shared:
            self.blocks = make()
        else:
            self.blocks = [make() for _ in range(self.repeats)]

    def block(self, i: int, x, train: bool = False):
        if self.blocks is None:
            return x
        blk = self.blocks if self.shared else self.blocks[i]
        return blk(x, train)

    def __call__(self, x, train: bool = False):
        residual = x
        for i in range(self.repeats):
            x = self.block(i, (x + residual) if i > 0 else x, train)
        return x


SEPARATOR_REGISTRY = {"TDANet", "FRCNN", "DPTNet"}


def make_separator(params: Dict[str, Any], in_chan: int) -> Separator:
    """Build a separator from a reference-style config group.

    ``params`` uses the reference's keys (``audio_net``/``video_net`` name,
    ``layers`` as an ordered dict of dicts, etc.).
    """
    p = dict(params)
    name = p.pop("audio_net", None) or p.pop("video_net", None)
    p.pop("video_net", None)
    if name is None:
        return Separator(block_type="TDANet", in_chan=-1, repeats=p.get("repeats", 0))
    layers = p.pop("layers", {})
    if isinstance(layers, Mapping):
        # ordered dict-of-dicts: {"layer_1": {...}, ...} (reference style);
        # flax converts nested dicts to FrozenDict, hence Mapping.
        layers = tuple(dict(v) for v in layers.values())
    else:
        layers = tuple(dict(v) for v in layers)
    fields = {f.name for f in dataclasses.fields(Separator)}
    kwargs = {k: v for k, v in p.items() if k in fields}
    return Separator(
        block_type=name, in_chan=in_chan, layers=layers, **kwargs
    )
