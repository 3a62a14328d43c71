"""AVNet: the top-level audio-visual separation model, TPU-native.

Composition (reference ``src/models/tdavnet.py:14-108``):

  encoder → audio/video bottlenecks → RefinementModule (separators + CAF
  fusion) → mask generator (S³ complex mask) → decoder

All configs of the reference model zoo (RTFS-Net 4/6/12, TDFNet, CTCNet)
are expressible through the same reference-style nested config dicts.

Layouts: waveform (B, L); TF embedding (B, T, F, C); 1D embedding (B, T, C);
video embedding from the lip backbone (B, T2, C2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import convops
from ..ops import packed_tf as PTF
from ..ops import stft as stft_ops
from . import layers as L
from .fusion_layers import (
    ATTNFusionCell,
    ConvGRUFusionCell,
    ConvLSTMFusionCell,
    InjectionMultiSum,
)
from .separators import Separator, make_separator


def _filter_kwargs(cls, conf: Dict[str, Any]) -> Dict[str, Any]:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in conf.items() if k in fields}


# ---------------------------------------------------------------------------
# Encoders (reference src/models/TDAVNet/encoder.py)
# ---------------------------------------------------------------------------


class STFTEncoder(nn.Module):
    """STFT → stack(real, imag) → 3x3 conv (reference ``encoder.py:122-175``)."""

    win: int
    hop_length: int
    out_chan: int = 2
    kernel_size: int = -1
    stride: int = 1
    act_type: Optional[str] = "ReLU"
    norm_type: Optional[str] = "gLN"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, L) waveform
        window = stft_ops.hann_window(self.win, x.dtype)
        spec = stft_ops.stft(x, self.win, self.hop_length, window)  # (B,T,F) cplx
        spec = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, T, F, 2)
        return L.ConvNormAct(
            2, self.out_chan, self.kernel_size, stride=self.stride,
            act_type=self.act_type, norm_type=self.norm_type,
            xavier_init=True, use_bias=self.use_bias, is2d=True,
        )(spec, train)

    @property
    def enc_out_chan(self) -> int:
        return self.out_chan if self.kernel_size > 0 else 2


class ConvolutionalEncoder(nn.Module):
    """Multi-dilation Conv1d bank with LCM padding (``encoder.py:58-119``)."""

    out_chan: int
    kernel_size: int
    stride: int
    act_type: Optional[str] = None
    norm_type: Optional[str] = "gLN"
    use_bias: bool = False
    num_layers: int = 1
    upsampling_depth: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, L) -> (B, T', out_chan)
        lcm_1 = abs(
            self.out_chan // 2 * 2**self.upsampling_depth
        ) // math.gcd(self.kernel_size // 2, 2**self.upsampling_depth)
        lcm_2 = abs(
            self.kernel_size // 2 * 2**self.upsampling_depth
        ) // math.gcd(self.kernel_size // 2, 2**self.upsampling_depth)

        for lcm in (lcm_1, lcm_2):
            rem = x.shape[-1] % lcm
            if rem:
                x = jnp.pad(x, ((0, 0), (0, lcm - rem)))

        x = x[..., None]  # (B, L, 1)
        maps = []
        for i in range(self.num_layers):
            dilation = i + 1
            maps.append(
                L.ConvNormAct(
                    1, self.out_chan, self.kernel_size * dilation,
                    stride=self.stride, dilation=dilation,
                    norm_type=self.norm_type, act_type=self.act_type,
                    xavier_init=True, use_bias=self.use_bias,
                )(x, train)
            )
        return sum(maps)


# ---------------------------------------------------------------------------
# Decoders (reference src/models/TDAVNet/decoder.py)
# ---------------------------------------------------------------------------


class STFTDecoder(nn.Module):
    """ConvTranspose2d → complex → iSTFT (reference ``decoder.py:72-132``)."""

    win: int
    hop_length: int
    in_chan: int
    n_src: int
    kernel_size: int = -1
    stride: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, length: int, train: bool = False):
        # x: (B, n_src, T, F, C) -> (B, n_src, length)
        b, n_src = x.shape[0], x.shape[1]
        x = x.reshape(b * n_src, *x.shape[2:])
        if self.kernel_size > 0:
            x = L.ConvTranspose(
                x.shape[-1], 2, self.kernel_size, stride=self.stride,
                padding=(self.kernel_size - 1) // 2,
                use_bias=self.use_bias, xavier_init=True, nd=2,
            )(x)
        spec = jax.lax.complex(
            x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32)
        )  # (B*n_src, T, F)
        window = stft_ops.hann_window(self.win)
        wav = stft_ops.istft(spec, self.win, self.hop_length, window, length)
        return wav.reshape(b, n_src, length)


class ConvolutionalDecoder(nn.Module):
    """ConvTranspose1d overlap-add decoder (``decoder.py:25-69``)."""

    in_chan: int
    n_src: int
    kernel_size: int
    stride: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, length: int, train: bool = False):
        # x: (B, n_src, T, C) -> (B, n_src, length)
        b, n_src = x.shape[0], x.shape[1]
        x = x.reshape(b * n_src, *x.shape[2:])
        pad = (self.kernel_size - 1) // 2
        out = L.ConvTranspose(
            x.shape[-1], 1, self.kernel_size, stride=self.stride,
            padding=pad, output_padding=pad - 1, use_bias=self.use_bias,
            xavier_init=True, nd=1,
        )(x)[..., 0]
        out_len = out.shape[-1]
        if out_len < length:
            out = jnp.pad(out, ((0, 0), (0, length - out_len)))
        else:
            out = out[..., :length]
        return out.reshape(b, n_src, length)


# ---------------------------------------------------------------------------
# Mask generation (reference src/models/TDAVNet/mask_generator.py)
# ---------------------------------------------------------------------------


class MaskGenerator(nn.Module):
    """S³ mask head: PReLU + ConvNormAct (+Tanh×Sigmoid gate); ``RI_split``
    applies the complex multiplication mask ⊙ embedding
    (reference ``mask_generator.py:20-99``).
    """

    n_src: int
    audio_emb_dim: int
    bottleneck_chan: int
    kernel_size: int = 1
    mask_act: str = "ReLU"
    RI_split: bool = False
    output_gate: bool = False
    dw_gate: bool = False
    direct: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, refined, embedding, train: bool = False):
        # refined: (B, T, (F,), bottleneck); embedding: (B, T, (F,), C)
        if self.direct:
            return refined
        c = self.audio_emb_dim
        mask_chan = self.n_src * c
        masks = L.PReLU()(refined)
        masks = L.ConvNormAct(
            self.bottleneck_chan, mask_chan, self.kernel_size,
            act_type=self.mask_act, is2d=self.is2d,
        )(masks, train)
        if self.output_gate:
            groups = mask_chan if self.dw_gate else 1
            out = L.ConvNormAct(
                mask_chan, mask_chan, 1, act_type="Tanh", groups=groups,
                is2d=self.is2d,
            )(masks, train)
            gate = L.ConvNormAct(
                mask_chan, mask_chan, 1, act_type="Sigmoid", groups=groups,
                is2d=self.is2d,
            )(masks, train)
            masks = out * gate

        f = L.fold_factor()
        if self.RI_split:
            # Complex multiply via LANE SLICES on the channel axis instead
            # of a (..., n_src, 2, C/2) reshape: the rank-6 reshape forces
            # XLA to materialize padded layout copies of the full-res map
            # (profiled at ~2.5 ms/step + 0.5 GB of HLO temps at bs 32);
            # 128-aligned slices of a 256-lane tensor are free. Under
            # batch_fold the channel layout is [g: n_src*C] for masks and
            # [g: C] for the embedding, sliced per (source, group).
            h = c // 2
            per_src = []
            for s in range(self.n_src):
                parts = []
                for g in range(f):
                    eb = g * c
                    er = embedding[..., eb:eb + h]
                    ei = embedding[..., eb + h:eb + c]
                    mb = g * self.n_src * c + s * c
                    mr = masks[..., mb:mb + h]
                    mi = masks[..., mb + h:mb + c]
                    parts.append(
                        jnp.concatenate(
                            [er * mr - ei * mi, er * mi + ei * mr], axis=-1
                        )
                    )
                per_src.append(
                    parts[0] if f == 1 else jnp.concatenate(parts, axis=-1)
                )
            # (B(/f), n_src, *spatial, (f*)C) built directly — no moveaxis
            return jnp.stack(per_src, axis=1)
        per_src = []
        for s in range(self.n_src):
            parts = []
            for g in range(f):
                eb = g * c
                mb = g * self.n_src * c + s * c
                parts.append(
                    masks[..., mb:mb + c] * embedding[..., eb:eb + c]
                )
            per_src.append(
                parts[0] if f == 1 else jnp.concatenate(parts, axis=-1)
            )
        return jnp.stack(per_src, axis=1)


class MaskGenerator2Chan(nn.Module):
    """2-channel (raw RI spectrogram) mask variant (``mask_generator.py:102-187``)."""

    n_src: int
    bottleneck_chan: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    mask_act: str = "ReLU"
    RI_split: bool = False
    output_gate: bool = False
    dw_gate: bool = False
    direct: bool = False

    @nn.compact
    def __call__(self, refined, embedding, train: bool = False):
        mask_chan = self.n_src * 2
        x = L.PReLU()(refined)
        x = L.ConvTranspose(
            self.bottleneck_chan, mask_chan, self.kernel_size, stride=self.stride,
            padding=(self.kernel_size - 1) // 2, use_bias=self.use_bias, nd=2,
        )(x)
        x = L.make_act(self.mask_act)(x)
        if self.output_gate:
            groups = mask_chan if self.dw_gate else 1
            out = L.ConvNormAct(mask_chan, mask_chan, 1, act_type="Tanh",
                                groups=groups, is2d=True)(x, train)
            gate = L.ConvNormAct(mask_chan, mask_chan, 1, act_type="Sigmoid",
                                 groups=groups, is2d=True)(x, train)
            x = out * gate
        b = x.shape[0]
        if self.direct:
            return jnp.moveaxis(
                x.reshape(*x.shape[:-1], self.n_src, 2), -2, 1
            )
        if self.RI_split:
            m = x.reshape(*x.shape[:-1], self.n_src, 2, 1)
            e = embedding.reshape(*embedding.shape[:-1], 1, 2, 1)
            mr, mi = m[..., 0, :], m[..., 1, :]
            er, ei = e[..., 0, :], e[..., 1, :]
            sep = jnp.concatenate([er * mr - ei * mi, er * mi + ei * mr], -1)
        else:
            m = x.reshape(*x.shape[:-1], self.n_src, 2)
            sep = m * embedding[..., None, :]
        return jnp.moveaxis(sep, -2, 1)


# ---------------------------------------------------------------------------
# Cross-modal fusion (reference src/models/TDAVNet/fusion.py)
# ---------------------------------------------------------------------------


class ConcatFusion(nn.Module):
    """Concatenate + conv in both directions (``TDAVNet/fusion.py:40-64``)."""

    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        # audio may be 2D (B,T,F,C) while video is 1D (B,T2,C2): wrangle by
        # adding a singleton F axis to the lower-rank side (reference
        # ``fusion.py:21-37``).
        squeeze_video = audio.ndim > video.ndim
        squeeze_audio = video.ndim > audio.ndim
        if squeeze_video:
            video = video[..., None, :]
        if squeeze_audio:
            audio = audio[..., None, :]

        a_spatial = audio.shape[1:-1]
        v_spatial = video.shape[1:-1]
        video_interp = convops.interp_nearest(video, a_spatial)
        audio_fused = L.ConvNormAct(
            self.ain_chan + self.vin_chan, self.ain_chan, self.kernel_size,
            norm_type="gLN", is2d=self.is2d,
        )(jnp.concatenate([audio, video_interp], -1), train)

        if self.video_fusion:
            audio_interp = convops.interp_nearest(audio, v_spatial)
            video_fused = L.ConvNormAct(
                self.ain_chan + self.vin_chan, self.vin_chan, self.kernel_size,
                norm_type="gLN", is2d=self.is2d,
            )(jnp.concatenate([audio_interp, video], -1), train)
        else:
            video_fused = video

        if squeeze_video:
            video_fused = video_fused[..., 0, :]
        if squeeze_audio:
            audio_fused = audio_fused[..., 0, :]
        return audio_fused, video_fused


class SumFusion(nn.Module):
    """Project + add in both directions (``TDAVNet/fusion.py:67-89``)."""

    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        squeeze_video = audio.ndim > video.ndim
        if squeeze_video:
            video = video[..., None, :]
        a_spatial = audio.shape[1:-1]
        v_spatial = video.shape[1:-1]
        if self.video_fusion:
            audio_interp = convops.interp_nearest(audio, v_spatial)
            video_fused = (
                L.ConvNormAct(
                    self.ain_chan, self.vin_chan, self.kernel_size,
                    norm_type="gLN", is2d=self.is2d,
                )(audio_interp, train)
                + video
            )
        else:
            video_fused = video
        video_interp = convops.interp_nearest(video, a_spatial)
        audio_fused = (
            L.ConvNormAct(
                self.vin_chan, self.ain_chan, self.kernel_size,
                norm_type="gLN", is2d=self.is2d,
            )(video_interp, train)
            + audio
        )
        if squeeze_video:
            video_fused = video_fused[..., 0, :]
        return audio_fused, video_fused


class ATTNFusion(nn.Module):
    """CAF fusion (``TDAVNet/fusion.py:187-212``): audio refined by video
    via ATTNFusionCell; optional reverse direction."""

    ain_chan: int
    vin_chan: int
    kernel_size: int
    video_fusion: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, audio, video, train: bool = False):
        if self.video_fusion:
            video_fused = ATTNFusionCell(
                self.vin_chan, self.ain_chan, self.kernel_size, is2d=False
            )(video, audio, train)
        else:
            video_fused = video
        audio_fused = ATTNFusionCell(
            self.ain_chan, self.vin_chan, self.kernel_size, is2d=self.is2d
        )(audio, video, train)
        return audio_fused, video_fused


FUSION_REGISTRY = {
    "ConcatFusion": ConcatFusion,
    "SumFusion": SumFusion,
    "ATTNFusion": ATTNFusion,
}


class MultiModalFusion(nn.Module):
    """Fusion builder: shared or per-repeat fusion blocks
    (reference ``TDAVNet/fusion.py:215-281``)."""

    audio_bn_chan: int
    video_bn_chan: int
    kernel_size: int = 1
    fusion_repeats: int = 3
    fusion_type: str = "ConcatFusion"
    fusion_shared: bool = False
    is2d: bool = False

    def setup(self):
        if self.fusion_repeats == 0:
            self.fusion_module = None
            return
        cls = FUSION_REGISTRY[self.fusion_type]

        def make(i):
            return cls(
                ain_chan=self.audio_bn_chan,
                vin_chan=self.video_bn_chan,
                kernel_size=self.kernel_size,
                video_fusion=(
                    self.fusion_repeats > 1
                    if self.fusion_shared
                    else i != self.fusion_repeats - 1
                ),
                is2d=self.is2d,
            )

        if self.fusion_shared:
            self.fusion_module = make(0)
        else:
            self.fusion_module = [make(i) for i in range(self.fusion_repeats)]

    def fuse(self, i: int, audio, video, train: bool = False):
        mod = (
            self.fusion_module
            if self.fusion_shared
            else self.fusion_module[i]
        )
        return mod(audio, video, train)

    def __call__(self, audio, video, train: bool = False):
        audio_residual, video_residual = audio, video
        audio_fused, video_fused = audio, video
        for i in range(self.fusion_repeats):
            if i == 0:
                audio_fused, video_fused = self.fuse(i, audio, video, train)
            else:
                audio_fused, video_fused = self.fuse(
                    i, audio_fused + audio_residual,
                    video_fused + video_residual, train,
                )
        return audio_fused


# ---------------------------------------------------------------------------
# Refinement module + AVNet
# ---------------------------------------------------------------------------


class RefinementModule(nn.Module):
    """The AV fusion loop (reference ``refinement_module.py:10-62``):
    ``fusion_repeats`` joint audio+video+fusion repeats through shared
    blocks, then ``audio_repeats`` audio-only repeats with residual
    re-injection."""

    audio_params: Dict[str, Any]
    video_params: Dict[str, Any]
    audio_bn_chan: int
    video_bn_chan: int
    fusion_params: Dict[str, Any]

    def setup(self):
        self.fusion_repeats = self.video_params.get("repeats", 0)
        self.audio_repeats = self.audio_params["repeats"] - self.fusion_repeats
        self.audio_net = make_separator(dict(self.audio_params), self.audio_bn_chan)
        self.video_net = make_separator(dict(self.video_params), self.video_bn_chan)
        self.crossmodal_fusion = MultiModalFusion(
            audio_bn_chan=self.audio_bn_chan,
            video_bn_chan=self.video_bn_chan,
            fusion_repeats=self.fusion_repeats,
            **_filter_kwargs_not(
                MultiModalFusion, self.fusion_params,
                exclude=("audio_bn_chan", "video_bn_chan", "fusion_repeats"),
            ),
        )

    def __call__(self, audio, video, train: bool = False):
        audio_residual = audio
        video_residual = video
        bf = L.fold_factor()

        for i in range(self.fusion_repeats):
            audio = self.audio_net.block(
                i, audio + audio_residual if i > 0 else audio, train
            )
            # the video path and the cross-modal fusion run UNFOLDED: the
            # video net may hold BatchNorms and the fusion mixes audio and
            # video channels; both are tiny next to the audio TF maps
            audio = L.unfold_batch(audio, bf)
            with L.batch_fold(1):
                video = self.video_net.block(
                    i, video + video_residual if i > 0 else video, train
                )
                audio, video = self.crossmodal_fusion.fuse(
                    i, audio, video, train
                )
            audio = L.fold_batch(audio, bf)

        for j in range(self.audio_repeats):
            i = j + self.fusion_repeats
            audio = self.audio_net.block(
                i, audio + audio_residual if i > 0 else audio, train
            )
        return audio


def _filter_kwargs_not(cls, conf: Dict[str, Any], exclude=()):
    fields = {f.name for f in dataclasses.fields(cls)}
    return {
        k: v for k, v in conf.items() if k in fields and k not in exclude
    }


ENCODER_REGISTRY = {
    "STFTEncoder": STFTEncoder,
    "ConvolutionalEncoder": ConvolutionalEncoder,
}
DECODER_REGISTRY = {
    "STFTDecoder": STFTDecoder,
    "ConvolutionalDecoder": ConvolutionalDecoder,
}
MASKGEN_REGISTRY = {
    "MaskGenerator": MaskGenerator,
    "MaskGenerator2Chan": MaskGenerator2Chan,
}


class AVNet(nn.Module):
    """Top model (reference ``tdavnet.py:14-108``), config-driven.

    Call: ``model.apply(vars, audio_mixture, mouth_embedding)`` with
    ``audio_mixture`` (B, L) and ``mouth_embedding`` (B, T2, C2) from the
    (frozen) video backbone. Returns (B, n_src, L).
    """

    n_src: int
    enc_dec_params: Dict[str, Any]
    audio_bn_params: Dict[str, Any]
    audio_params: Dict[str, Any]
    mask_generation_params: Dict[str, Any]
    pretrained_vout_chan: int = -1
    video_bn_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    video_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    fusion_params: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # "bfloat16" runs the refinement core in bf16 (STFT analysis/synthesis,
    # complex masking and losses stay fp32); params are cast at use via
    # rtfs_tpu.utils.precision.cast_params. Halves HBM traffic on the
    # memory-bound conv/fusion path.
    compute_dtype: str = "float32"
    # Optional jax.sharding.NamedSharding for the (B, T, F, C) TF maps:
    # constrains the refinement core so XLA SPMD shards the frequency axis
    # over an ICI "model" mesh axis (halo exchange for F-convs, collectives
    # for the F-folded attention are compiler-inserted). None = unsharded.
    tf_sharding: Any = None
    # Batch-pair channel folding (see rtfs_tpu.models.layers.batch_fold):
    # run the refinement core on (B/f, T, F, f*C) tensors so every channel
    # axis is a multiple of 128 lanes — removes the 2x HBM padding tax on
    # the 64-channel hid maps. Requires batch % batch_fold == 0. Pure
    # computation-layout choice: parameters and numerics are unchanged
    # (pinned by tests/test_batch_fold.py).
    batch_fold: int = 1
    # Packed time-frequency layout (ops/packed_tf.py): run the RTFS
    # block's full-resolution 64-channel segment on (B, T, F*C) maps via
    # Pallas kernels, removing the 2x HBM lane-padding tax that
    # batch_fold targeted but lost to XLA retiling (docs/design.md §8).
    # Pure layout choice; parameters and numerics unchanged (pinned by
    # tests/test_packed_tf.py model-level parity). Mutually exclusive
    # with batch_fold > 1.
    packed_tf: bool = False

    def setup(self):
        edp = dict(self.enc_dec_params)
        if "layers" in edp:  # reference key name for the conv encoder bank
            edp["num_layers"] = edp.pop("layers")
        enc_type = edp.pop("encoder_type")
        dec_type = edp.pop("decoder_type")
        enc_cls = ENCODER_REGISTRY[enc_type]
        enc_kwargs = _filter_kwargs(enc_cls, edp)
        enc_kwargs_bias = dict(enc_kwargs)
        if "bias" in edp:
            enc_kwargs_bias["use_bias"] = bool(edp["bias"])
        if enc_cls is ConvolutionalEncoder:
            enc_kwargs_bias["upsampling_depth"] = self.audio_params.get(
                "upsampling_depth", 1
            )
        self.encoder = enc_cls(**enc_kwargs_bias)

        if enc_type == "STFTEncoder":
            self.enc_out_chan = (
                edp["out_chan"] if edp.get("kernel_size", -1) > 0 else 2
            )
            self.is2d = True
        else:
            self.enc_out_chan = edp["out_chan"]
            self.is2d = False

        self.audio_bn_chan = self.audio_bn_params.get(
            "out_chan", self.enc_out_chan
        )
        self.video_bn_chan = self.video_bn_params.get(
            "out_chan", self.pretrained_vout_chan
        )

        abn = dict(self.audio_bn_params)
        abn.setdefault("out_chan", self.audio_bn_chan)
        abn.setdefault("kernel_size", 1)
        if "bias" in abn:
            abn["use_bias"] = bool(abn.pop("bias"))
        self.audio_bottleneck = L.ConvNormAct(
            in_chan=self.enc_out_chan,
            **_filter_kwargs_not(L.ConvNormAct, abn, exclude=("in_chan",)),
        )
        vbn = dict(self.video_bn_params)
        vbn.setdefault("kernel_size", -1)  # identity when unconfigured
        vbn.setdefault("out_chan", max(self.video_bn_chan, 1))
        self.video_bottleneck = L.ConvNormAct(
            in_chan=max(self.pretrained_vout_chan, 1),
            **_filter_kwargs_not(L.ConvNormAct, vbn, exclude=("in_chan",)),
        )
        if self.video_bn_params.get("kernel_size", -1) <= 0:
            self.video_bn_chan = self.pretrained_vout_chan

        self.refinement_module = RefinementModule(
            audio_params=self.audio_params,
            video_params=self.video_params,
            audio_bn_chan=self.audio_bn_chan,
            video_bn_chan=self.video_bn_chan,
            fusion_params=self.fusion_params,
        )

        mgp = dict(self.mask_generation_params)
        mg_type = mgp.pop("mask_generator_type", "MaskGenerator")
        mg_cls = MASKGEN_REGISTRY[mg_type]
        self.mask_generator = mg_cls(
            n_src=self.n_src,
            **_filter_kwargs_not(
                mg_cls,
                {
                    **mgp,
                    "audio_emb_dim": self.enc_out_chan,
                    "bottleneck_chan": self.audio_bn_chan,
                },
                exclude=("n_src",),
            ),
        )

        dec_cls = DECODER_REGISTRY[dec_type]
        dec_kwargs = _filter_kwargs_not(
            dec_cls, edp, exclude=("in_chan", "n_src")
        )
        if "bias" in edp:
            dec_kwargs["use_bias"] = bool(edp["bias"])
        self.decoder = dec_cls(
            in_chan=self.enc_out_chan, n_src=self.n_src, **dec_kwargs
        )

    def __call__(self, audio_mixture, mouth_embedding=None, train: bool = False):
        length = audio_mixture.shape[-1]
        dtype = jnp.dtype(self.compute_dtype)
        bf = self.batch_fold
        if bf > 1 and audio_mixture.shape[0] % bf:
            raise ValueError(
                f"batch_fold={bf} requires batch % {bf} == 0, got "
                f"{audio_mixture.shape[0]}"
            )
        if self.packed_tf and bf > 1:
            raise ValueError("packed_tf and batch_fold>1 are exclusive")
        embedding = self.encoder(audio_mixture, train)  # (B,T,(F,),C)
        if dtype != jnp.float32:
            embedding = embedding.astype(dtype)
            mouth_embedding = mouth_embedding.astype(dtype)
        with L.batch_fold(bf):
            embedding_f = L.fold_batch(embedding, bf)
            audio = self.audio_bottleneck(embedding_f, train)
            # Under batch_fold the TF map is (B/f, T, F, f*C) — same axis
            # meanings, so the same PartitionSpec applies (ADVICE r3: the
            # old `bf == 1` guard silently dropped the constraint).
            if self.tf_sharding is not None and audio.ndim == 4:
                audio = jax.lax.with_sharding_constraint(
                    audio, self.tf_sharding
                )
            # audio-only mode (reference System(video_model=None)): no
            # video branch; the refinement module runs audio repeats only.
            if mouth_embedding is None:
                video = None
            else:
                with L.batch_fold(1):  # video path stays unfolded
                    video = self.video_bottleneck(mouth_embedding, train)
            # Derive the DualPathRNN folded-scan sharding from tf_sharding:
            # the folded (B*other, scan, C) batch shards over the data AND
            # model axes jointly, keeping the sequential scans local
            # (TP_ANALYSIS r3 -> r4).
            scan_sh = None
            if self.tf_sharding is not None:
                try:
                    from jax.sharding import (
                        NamedSharding, PartitionSpec as PSpec,
                    )

                    spec = self.tf_sharding.spec
                    axes = tuple(
                        a for a in (spec[0] if len(spec) > 0 else None,
                                    spec[2] if len(spec) > 2 else None)
                        if a is not None
                    )
                    if axes:
                        scan_sh = NamedSharding(
                            self.tf_sharding.mesh,
                            PSpec(axes if len(axes) > 1 else axes[0],
                                  None, None),
                        )
                except (AttributeError, TypeError):
                    scan_sh = None
            with PTF.packed_scope(self.packed_tf), L.scan_sharding(scan_sh):
                refined = self.refinement_module(audio, video, train)
            if self.tf_sharding is not None and refined.ndim == 4:
                refined = jax.lax.with_sharding_constraint(
                    refined, self.tf_sharding
                )
            separated = self.mask_generator(refined, embedding_f, train)
        # unfold groups back into the batch axis: (B/f, n_src, *sp, f*C)
        # -> (B, n_src, *sp, C)
        separated = L.unfold_batch(separated, bf)
        if dtype != jnp.float32:
            separated = separated.astype(jnp.float32)
        out = self.decoder(separated, length, train)
        # uniform f32 waveform interface: ConvolutionalDecoder computes in
        # the param dtype, so bf16 models would otherwise emit bf16 wavs
        # (STFTDecoder models already synthesize in f32)
        return out.astype(jnp.float32)
