"""Legacy / ablation layer zoo: attention variants, mixers, windowed ConvLSTM.

TPU-native counterparts of the reference's legacy-config layers:
``src/models/layers/attention.py:283-446`` (CBAM, ShuffleAttention,
CoTAttention), ``mlp.py`` (MLPMixer), ``permutator.py`` (Permutator),
``rnn_layers.py:165-301`` (ConvLSTMCell/BiLSTM2D) and ``:329-379``
(GlobalGALR), ``conv_layers.py:262-316`` (ConvolutionalRNN). These back the
39 legacy configs (``config/legacy-configs/``) — breadth of the
string-registry design, not headline-parity targets.

Layout: 2D maps (B, T, F, C); 1D maps (B, T, C).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import convops
from ..ops.rnn import RNN
from . import layers as L
from .attention import MultiHeadSelfAttention
from .rnn_blocks import RNNProjection


class CBAMBlock(nn.Module):
    """Channel + spatial attention (reference ``attention.py:283-343``)."""

    in_chan: int = 512
    reduction: int = 16
    kernel_size: int = 49

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        # channel attention: shared SE-MLP over max- and avg-pooled stats
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        av = jnp.mean(x, axis=(1, 2), keepdims=True)
        se1 = L.Conv(self.in_chan, self.in_chan // self.reduction, 1,
                     use_bias=False, nd=2)
        se2 = L.Conv(self.in_chan // self.reduction, self.in_chan, 1,
                     use_bias=False, nd=2)
        ca = jax.nn.sigmoid(se2(jax.nn.relu(se1(mx))) + se2(jax.nn.relu(se1(av))))
        x = x * ca
        # spatial attention over [max_c, mean_c]
        sa_in = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True),
             jnp.mean(x, axis=-1, keepdims=True)], axis=-1,
        )
        sa = jax.nn.sigmoid(
            L.Conv(2, 1, self.kernel_size, padding=self.kernel_size // 2,
                   nd=2)(sa_in)
        )
        return x * sa + residual


class ShuffleAttention(nn.Module):
    """Grouped channel/spatial gating + shuffle (``attention.py:346-407``)."""

    in_chan: int = 512
    G: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, f, c = x.shape
        g = self.G
        half = c // (2 * g)
        x = x.reshape(b, t, f, g, c // g).transpose(0, 3, 1, 2, 4)
        x = x.reshape(b * g, t, f, c // g)
        x0, x1 = x[..., :half], x[..., half:]

        cweight = self.param("cweight", nn.initializers.zeros, (half,))
        cbias = self.param("cbias", nn.initializers.ones, (half,))
        sweight = self.param("sweight", nn.initializers.zeros, (half,))
        sbias = self.param("sbias", nn.initializers.ones, (half,))

        ch = jnp.mean(x0, axis=(1, 2), keepdims=True)
        x_channel = x0 * jax.nn.sigmoid(cweight * ch + cbias)

        # GroupNorm(half groups of 1 chan) == per-channel instance norm
        mean = jnp.mean(x1, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x1 - mean), axis=(1, 2), keepdims=True)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (half,))
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (half,))
        x1n = (x1 - mean) * jax.lax.rsqrt(var + 1e-5) * gn_scale + gn_bias
        x_spatial = x1 * jax.nn.sigmoid(sweight * x1n + sbias)

        out = jnp.concatenate([x_channel, x_spatial], axis=-1)
        out = out.reshape(b, g, t, f, c // g).transpose(0, 2, 3, 1, 4)
        out = out.reshape(b, t, f, c)
        # channel shuffle with 2 groups
        out = out.reshape(b, t, f, 2, c // 2)
        out = jnp.swapaxes(out, -1, -2).reshape(b, t, f, c)
        return out


class CoTAttention(nn.Module):
    """Contextual transformer attention (``attention.py:410-446``)."""

    in_chan: int = 512
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, k = self.in_chan, self.kernel_size
        b, t, f, _ = x.shape
        k1 = L.Conv(c, c, k, padding=k // 2, groups=4, use_bias=False, nd=2)(x)
        k1 = L.BatchNorm(c)(k1, train=train)
        k1 = jax.nn.relu(k1)
        v = L.Conv(c, c, 1, use_bias=False, nd=2)(x)
        v = L.BatchNorm(c)(v, train=train)

        y = jnp.concatenate([k1, x], axis=-1)
        att = L.Conv(2 * c, 2 * c // 4, 1, use_bias=False, nd=2)(y)
        att = L.BatchNorm(2 * c // 4)(att, train=train)
        att = jax.nn.relu(att)
        att = L.Conv(2 * c // 4, k * k * c, 1, nd=2)(att)
        att = att.reshape(b, t, f, c, k * k).mean(-1)
        att = att.reshape(b, t * f, c)
        att = jax.nn.softmax(att, axis=1)  # softmax over spatial (torch dim -1 of (B,C,HW))
        k2 = att.reshape(b, t, f, c) * v
        return k1 + k2


class MLPMixerLayer(nn.Module):
    """Patch MLP-Mixer over a padded TF map (reference ``mlp.py``).

    Config name ``MLP``; ``image_size`` is the (T', F') map size at the
    globalatt position.
    """

    in_chan: int
    patch_size: int
    image_size: Tuple[int, int]
    dim: int = 256
    depth: int = 2
    expansion_factor: int = 4
    expansion_factor_token: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        b, old_t, old_f, c = x.shape
        new_t = (old_t // p) * p + p - old_t
        new_f = (old_f // p) * p + p - old_f
        x = jnp.pad(x, ((0, 0), (0, new_t), (0, new_f), (0, 0)))
        t, f = x.shape[1], x.shape[2]
        h, w = t // p, f // p
        n_patch = h * w

        z = x.reshape(b, h, p, w, p, c).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(b, n_patch, p * p * c)
        z = nn.Dense(self.dim)(z)
        for _ in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5)(z)
            y = jnp.swapaxes(y, 1, 2)  # token-mixing over patches
            y = nn.Dense(int(n_patch * self.expansion_factor))(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(n_patch)(y)
            z = z + jnp.swapaxes(y, 1, 2)
            y = nn.LayerNorm(epsilon=1e-5)(z)
            y = nn.Dense(int(self.dim * self.expansion_factor_token))(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(self.dim)(y)
            z = z + y
        z = nn.LayerNorm(epsilon=1e-5)(z)
        z = nn.Dense(p * p * c)(z)
        z = z.reshape(b, h, w, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(b, t, f, c)
        return z[:, :old_t, :old_f]


class PermutatorLayer(nn.Module):
    """ViP-style permute-MLP (reference ``permutator.py``); config ``Permutator``."""

    in_chan: int
    patch_size: int
    image_size: Tuple[int, int]
    dim: int = 256
    depth: int = 2
    segments: int = 4
    expansion_factor: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        p, s = self.patch_size, self.segments
        b, old_t, old_f, c = x.shape
        new_t = (old_t // p) * p + p - old_t
        new_f = (old_f // p) * p + p - old_f
        x = jnp.pad(x, ((0, 0), (0, new_t), (0, new_f), (0, 0)))
        t, f = x.shape[1], x.shape[2]
        h, w = t // p, f // p

        z = x.reshape(b, h, p, w, p, c).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(b, h, w, p * p * c)
        z = nn.Dense(self.dim)(z)
        d = self.dim
        for _ in range(self.depth):
            y = nn.LayerNorm(epsilon=1e-5)(z)
            # height mixing
            yh = y.reshape(b, h, w, d // s, s).transpose(0, 2, 3, 1, 4)
            yh = yh.reshape(b, w, d // s, h * s)
            yh = nn.Dense(h * s)(yh)
            yh = yh.reshape(b, w, d // s, h, s).transpose(0, 3, 1, 2, 4)
            yh = yh.reshape(b, h, w, d)
            # width mixing
            yw = y.reshape(b, h, w, d // s, s).transpose(0, 1, 3, 2, 4)
            yw = yw.reshape(b, h, d // s, w * s)
            yw = nn.Dense(w * s)(yw)
            yw = yw.reshape(b, h, d // s, w, s).transpose(0, 1, 3, 2, 4)
            yw = yw.reshape(b, h, w, d)
            yc = nn.Dense(d)(y)
            z = z + nn.Dense(d)(yh + yw + yc)
            y = nn.LayerNorm(epsilon=1e-5)(z)
            y = nn.Dense(d * self.expansion_factor)(y)
            y = jax.nn.gelu(y)
            y = nn.Dense(d)(y)
            z = z + y
        z = nn.LayerNorm(epsilon=1e-5)(z)
        z = nn.Dense(p * p * c)(z)
        z = z.reshape(b, h, w, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(b, t, f, c)
        return z[:, :old_t, :old_f]


class ConvolutionalRNN(nn.Module):
    """Bidirectional "conv RNN" via flipped DW convs (``conv_layers.py:262-316``)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    norm_type: str = "gLN"
    act_type: str = "ReLU"
    dropout: float = 0.0
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        x = L.ConvNormAct(self.in_chan, self.hid_chan, 1,
                          norm_type=self.norm_type, use_bias=False,
                          is2d=self.is2d)(x, train)
        fwd = L.ConvNormAct(self.hid_chan, self.hid_chan, self.kernel_size,
                            groups=self.hid_chan, act_type=self.act_type,
                            is2d=self.is2d)(x, train)
        flip_axes = (1, 2) if self.is2d else (1,)
        bwd = L.ConvNormAct(self.hid_chan, self.hid_chan, self.kernel_size,
                            groups=self.hid_chan, act_type=self.act_type,
                            is2d=self.is2d)(jnp.flip(x, flip_axes), train)
        y = jnp.concatenate([fwd, bwd], axis=-1)
        y = L.DropPath(self.dropout)(y, train)
        y = L.ConvNormAct(self.hid_chan * 2, self.in_chan, 1,
                          norm_type=self.norm_type, use_bias=False,
                          is2d=self.is2d)(y, train)
        return L.DropPath(self.dropout)(y, train) + res


class BiLSTM2D(nn.Module):
    """Windowed ConvLSTM over a TF map (reference ``rnn_layers.py:213-301``).

    Exact reference dataflow, channels-last. Per H-window iteration i, the
    W axis is unfolded (kernel=window, stride) into channels and the
    ConvLSTM gates convolve over the L unfold positions, with the hidden/
    cell state carried ACROSS windows; outputs are stitched back along H
    and the W axis back-projected by a grouped ConvTranspose (window, 1).
    ``dim=3`` windows over the original T axis (the reference transposes),
    ``dim=4`` over F. Golden-tested against the torch reference with
    imported weights (tests/test_legacy_layers.py).
    """

    in_chan: int
    hid_chan: int
    dim: int = 3
    kernel_size: int = 5
    window: int = 8
    stride: int = 1
    act_type: str = "PReLU"
    norm_type: str = "gLN"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        residual = x
        norm = L.make_norm(self.norm_type, self.in_chan)
        x = L._apply_norm(norm, x, train)

        # bidirectional = concat a flipped copy on channels (reference
        # flips torch-dim (self.dim - 1): T for dim=3, F for dim=4), then
        # make the windowed axis the H(last-spatial) axis
        if self.bidirectional:
            x = jnp.concatenate([x, jnp.flip(x, 1 if self.dim == 3 else 2)],
                                axis=-1)
        if self.dim == 3:
            x = jnp.swapaxes(x, 1, 2)  # (B, W=F, H=T, C2)

        b, old_w, old_h, cdir = x.shape
        win, st = self.window, self.stride
        new_w = -(-(old_w - win) // st) * st + win
        new_h = -(-(old_h - win) // st) * st + win
        x = jnp.pad(x, ((0, 0), (0, new_w - old_w), (0, new_h - old_h),
                        (0, 0)))
        iterations = -(-new_h // win)

        cw = self.in_chan * win  # unfolded channels per direction
        hid = self.hid_chan

        def make_cell_branch():
            return (
                [L.ConvActNorm(cw, cw, self.kernel_size, groups=cw),
                 L.ConvActNorm(cw, 4 * hid, 1)],
                L.ConvActNorm(hid, 4 * hid, 1),
            )

        lin_ih, lin_hh = make_cell_branch()
        if num_dir > 1:
            lin_ih_b, lin_hh_b = make_cell_branch()

        # state carried across H-windows: (B*win, L, H*dirs); initialized
        # as a broadcastable zero exactly like the reference's (1, HD, 1)
        hidden = jnp.zeros((1, 1, hid * num_dir), x.dtype)
        cell = jnp.zeros((1, 1, hid * num_dir), x.dtype)
        outputs = []
        for i in range(iterations):
            sl = x[:, :, i * win: (i + 1) * win, :]  # (B, W, win_i, C2)
            win_i = sl.shape[2]
            bsz = b * win_i
            # fold the window positions into batch, unfold W into channels
            sl = sl.transpose(0, 2, 1, 3).reshape(bsz, new_w, cdir)
            sl = convops.unfold_1d(sl, win, st)  # (bsz, L, C2*win)
            if num_dir > 1:
                sf, sb = sl[..., : cw], sl[..., cw:]
                hf = hidden[..., :hid]
                hb = hidden[..., hid:]
                gf = lin_ih[1](lin_ih[0](sf, train), train) \
                    + lin_hh(hf, train)[:bsz]
                gb = lin_ih_b[1](lin_ih_b[0](sb, train), train) \
                    + lin_hh_b(hb, train)[:bsz]
                gates = jnp.concatenate([gf, gb], axis=-1)
            else:
                gates = lin_ih[1](lin_ih[0](sl, train), train) \
                    + lin_hh(hidden, train)[:bsz]
            # plain 4-way channel chunk, exactly torch's gates.chunk(4, 1):
            # for bidirectional this MIXES directions (i_t is the forward
            # branch's first 2H channels, g_t the backward's, ...) — kept
            # bug-for-bug for weight-import parity
            i_t, f_t, g_t, o_t = jnp.split(gates, 4, axis=-1)
            cell = (jax.nn.sigmoid(f_t) * cell[:bsz]
                    + jax.nn.sigmoid(i_t) * jnp.tanh(g_t))
            hidden = jax.nn.sigmoid(o_t) * jnp.tanh(cell)
            # (bsz, L, HD) -> (B, win_i, L, HD) -> (B, L, win_i, HD)
            outputs.append(
                hidden.reshape(b, win_i, -1, num_dir * hid).transpose(
                    0, 2, 1, 3
                )
            )

        y = jnp.concatenate(outputs, axis=2)  # (B, L, new_h, HD)
        hd = hid * num_dir
        # grouped (depthwise) back-projection of the W axis:
        # (L, new_h) -> ((L-1)*stride + window = new_w, new_h)
        y = L.ConvTranspose(hd, hd, (win, 1), stride=(st, 1), groups=hd,
                            nd=2)(y)
        y = L.make_act(self.act_type)(y)
        norm2 = L.make_norm(self.norm_type, hd)
        y = L._apply_norm(norm2, y, train)
        y = L.ConvNormAct(hd, self.in_chan, 1, is2d=True)(y, train)
        y = y[:, :old_w, :old_h]
        if self.dim == 3:
            y = jnp.swapaxes(y, 1, 2)
        return y + residual


class GlobalGALR(nn.Module):
    """time-RNN + freq-MHSA hybrid (reference ``rnn_layers.py:329-379``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    ffn_name: str = "FeedForwardNetwork"
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    group_ffn: bool = False
    pos_enc: bool = True
    rnn_type: str = "LSTM"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F, C)
        b, t, f, c = x.shape
        hid = self.hid_chan if self.hid_chan is not None else 2 * c

        z = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        z = RNNProjection(c, c, self.rnn_type, self.dropout,
                          self.bidirectional)(z, train)
        x = z.reshape(b, f, t, c).transpose(0, 2, 1, 3)

        z = x.reshape(b * t, f, c)
        z = MultiHeadSelfAttention(c, self.n_head, self.dropout,
                                   self.pos_enc)(z, train)
        z = L.FeedForwardNetwork(c, hid, self.kernel_size,
                                 dropout=self.dropout)(z, train)
        x = z.reshape(b, t, f, c)
        if self.group_ffn:
            x = L.FeedForwardNetwork(c, hid, self.kernel_size,
                                     dropout=self.dropout, is2d=True)(x, train)
        return x
