"""Gated fusion cells: TF-AR InjectionMultiSum, CAF attention fusion, conv RNN cells.

TPU-native counterparts of the reference ``src/models/layers/fusion.py``.
Layout: 2D maps (B, T, F, C), 1D maps (B, T, C); all resizing uses the
torch-nearest convention via ``ops.convops.interp_nearest``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import convops
from ..ops import packed_tf as P
from . import layers as L


def _spatial(x):
    return x.shape[1:-1]


class InjectionMultiSum(nn.Module):
    """TF-AR unit: ``local * sigmoid-gate(global) + global`` with nearest
    resize of whichever side is smaller (reference ``fusion.py:9-69``).

    All three embeddings are depthwise convs + gLN (gate adds a sigmoid).
    """

    in_chan: int
    kernel_size: int
    norm_type: str = "gLN"
    is2d: bool = False

    @nn.compact
    def __call__(self, local_features, global_features, train: bool = False):
        def dw_conv(act_type=None):
            return L.ConvNormAct(
                self.in_chan,
                self.in_chan,
                self.kernel_size,
                groups=self.in_chan,
                norm_type=self.norm_type,
                act_type=act_type,
                use_bias=False,
                is2d=self.is2d,
            )

        old_shape = _spatial(global_features)
        new_shape = _spatial(local_features)

        local_emb = dw_conv()(local_features, train)

        if isinstance(local_features, P.PackedTF):
            # packed full-res local + rank-4 pooled global: embed/gate at
            # the pooled resolution (same branch as the reference's
            # prod(new) > prod(old) case), then nearest-upsample straight
            # into the packed layout — the interpolated full-res maps are
            # never materialized in the padded rank-4 form.
            assert int(np.prod(new_shape)) > int(np.prod(old_shape))
            t_out, f_out = new_shape
            global_emb = P.spatial_up_to(
                dw_conv()(global_features, train), t_out, f_out
            )
            gate = P.spatial_up_to(
                dw_conv("Sigmoid")(global_features, train), t_out, f_out
            )
            return local_emb * gate + global_emb

        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            global_emb = convops.interp_nearest(
                dw_conv()(global_features, train), new_shape
            )
            gate = convops.interp_nearest(
                dw_conv("Sigmoid")(global_features, train), new_shape
            )
        else:
            g_interp = convops.interp_nearest(global_features, new_shape)
            global_emb = dw_conv()(g_interp, train)
            gate = dw_conv("Sigmoid")(g_interp, train)

        return local_emb * gate + global_emb


class ConvLSTMFusionCell(nn.Module):
    """Cross-modal LSTM-style gates from two tensors (``fusion.py:72-124``)."""

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    bidirectional: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        if self.bidirectional:
            flip_axes = (1, 2) if self.is2d else (1,)
            a = jnp.concatenate([a, jnp.flip(a, flip_axes)], axis=-1)
            b = jnp.concatenate([b, jnp.flip(b, flip_axes)], axis=-1)

        conv_a = L.ConvNormAct(
            self.in_chan_a * num_dir, self.in_chan_a * 4, self.kernel_size,
            groups=self.in_chan_a // 4, norm_type="gLN", is2d=self.is2d,
        )
        conv_b = L.ConvNormAct(
            self.in_chan_b * num_dir, self.in_chan_a * 4, self.kernel_size,
            groups=self.in_chan_a // 4, norm_type="gLN", is2d=self.is2d,
        )
        new_shape = _spatial(a)
        old_shape = _spatial(b)
        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            gates = conv_a(a, train) + convops.interp_nearest(
                conv_b(b, train), new_shape
            )
        else:
            gates = conv_a(a, train) + conv_b(
                convops.interp_nearest(b, new_shape), train
            )

        i_t, f_t, g_t, o_t = jnp.split(gates, 4, axis=-1)
        c_next = jax.nn.sigmoid(f_t) + jax.nn.sigmoid(i_t) * jnp.tanh(g_t)
        return jax.nn.sigmoid(o_t) * jnp.tanh(c_next)


class ConvGRUFusionCell(nn.Module):
    """Cross-modal GRU-style gates (``fusion.py:127-191``)."""

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    bidirectional: bool = False
    is2d: bool = False

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        if self.bidirectional:
            flip_axes = (1, 2) if self.is2d else (1,)
            a = jnp.concatenate([a, jnp.flip(a, flip_axes)], axis=-1)
            b = jnp.concatenate([b, jnp.flip(b, flip_axes)], axis=-1)

        conv_a = L.ConvNormAct(
            self.in_chan_a * num_dir, self.in_chan_a * 3, self.kernel_size,
            groups=self.in_chan_a, norm_type="gLN", is2d=self.is2d,
        )
        conv_b = L.ConvNormAct(
            self.in_chan_b * num_dir, self.in_chan_a * 3, self.kernel_size,
            groups=self.in_chan_a, norm_type="gLN", is2d=self.is2d,
        )
        new_shape = _spatial(a)
        old_shape = _spatial(b)
        x = conv_a(a, train)
        if int(np.prod(new_shape)) > int(np.prod(old_shape)):
            h = convops.interp_nearest(conv_b(b, train), new_shape)
        else:
            h = conv_b(convops.interp_nearest(b, new_shape), train)

        x_r, x_z, x_n = jnp.split(x, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(h, 3, axis=-1)
        r_t = jax.nn.sigmoid(x_r + h_r)
        z_t = jax.nn.sigmoid(x_z + h_z)
        n_t = jnp.tanh(x_n + r_t * h_n)
        return (1.0 - z_t) * n_t


class ATTNFusionCell(nn.Module):
    """CAF kernel (reference ``fusion.py:194-274``).

    ``a`` is the modality being refined (2D TF map when ``is2d``), ``b`` is
    the conditioning modality as a 1D sequence (the reference applies 1D
    convs to ``b`` regardless of ``is2d``). Two paths:

      k1 = key_embed(a) ⊙ resize(b)                      (gated path)
      k2 = softmax_T(mean_k(attention_embed(b))) ⊙ value_embed(a)

    with ``b`` nearest-interpolated to ``a``'s time axis.
    """

    in_chan_a: int
    in_chan_b: int
    kernel_size: int = 1
    is2d: bool = False

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        time_steps = a.shape[1]

        key_embed = L.ConvNormAct(
            self.in_chan_a, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="BatchNorm2d", act_type="ReLU", use_bias=False,
            is2d=self.is2d,
        )
        value_embed = L.ConvNormAct(
            self.in_chan_a, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="BatchNorm2d", use_bias=False, is2d=self.is2d,
        )
        attention_embed = L.ConvNormAct(
            self.in_chan_b, self.kernel_size * self.in_chan_a, 1,
            groups=self.in_chan_a, norm_type="gLN",
        )
        resize = L.ConvNormAct(
            self.in_chan_b, self.in_chan_a, 1, groups=self.in_chan_a,
            norm_type="gLN",
        )

        b_t = convops.interp_nearest(resize(b, train), (time_steps,))
        if self.is2d:
            b_t = b_t[:, :, None, :]  # broadcast over F

        k1 = key_embed(a, train) * b_t
        v = value_embed(a, train)

        att = attention_embed(b, train)  # (B, T2, k*Ca), group-major channels
        bsz, t2 = att.shape[0], att.shape[1]
        att = att.reshape(bsz, t2, self.in_chan_a, self.kernel_size)
        att = jnp.mean(att, axis=-1)  # (B, T2, Ca)
        att = jax.nn.softmax(att, axis=1)  # over the sequence axis
        att = convops.interp_nearest(att, (time_steps,))
        if self.is2d:
            att = att[:, :, None, :]
        k2 = att * v

        return k1 + k2
