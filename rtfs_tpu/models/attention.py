"""Attention layers: 1D MHSA, the RTFS TF-domain 2D MHSA, global blocks.

TPU-native counterparts of the reference ``src/models/layers/attention.py``.
Sequences here are short (T≈251, F≈64), so attention is plain XLA einsum —
batched (B·heads, T, T) matmuls ride the MXU without needing a custom
flash-attention kernel; XLA fuses the softmax chain.

Layout: 1D inputs are (B, T, C); 2D TF maps are (B, T, F, C).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import layers as L


def sinusoidal_pe(max_len: int, channels: int) -> np.ndarray:
    """Reference PositionalEncoding table (``attention.py:9-25``)."""
    pe = np.zeros((max_len, channels), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, channels, 2, dtype=np.float32)
        * -(math.log(float(max_len)) / channels)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention parity: packed QKV, attn-weight dropout."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, C)
        c, h = self.embed_dim, self.num_heads
        hd = c // h
        bound = math.sqrt(6.0 / (2 * c))  # torch xavier_uniform on (3C, C)

        def xavier(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        in_w = self.param("in_proj_weight", xavier, (c, 3 * c))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        out_w = self.param(
            "out_proj_weight",
            lambda k, s: L.torch_conv_kernel_init(k, (1, *s)).reshape(s),
            (c, c),
        )
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (c,))

        qkv = x @ in_w + in_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t = x.shape[0], x.shape[1]

        def heads(z):
            return z.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        if self.dropout > 0 and train:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.dropout
            attn = attn * jax.random.bernoulli(rng, keep, attn.shape) / keep
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        return out @ out_w + out_b


class MultiHeadSelfAttention(nn.Module):
    """1D MHSA block (reference ``attention.py:28-73``).

    LN → +PE → MHA → dropout + residual → LN → DropPath + outer residual.
    Input (B, T, C).
    """

    in_chan: int
    n_head: int = 8
    dropout: float = 0.1
    positional_encoding: bool = True
    max_len: int = 10000

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        x = nn.LayerNorm(epsilon=1e-5)(x)
        if self.positional_encoding:
            # slice host-side so only the needed rows become a constant
            pe = jnp.asarray(
                sinusoidal_pe(self.max_len, self.in_chan)[: x.shape[1]]
            )
            x = x + pe
        residual = x
        x = TorchMHA(self.in_chan, self.n_head, self.dropout)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x + residual)
        return L.DropPath(self.dropout)(x, train) + res


class MultiHeadSelfAttention2D(nn.Module):
    """RTFS TF attention (reference ``attention.py:76-189``).

    Per-head Q/K/V via 1x1 conv + PReLU + LayerNormalization4D; attention
    runs over T with F folded into the embedding: scores are
    (B·heads, T, T) with embedding dim E·F (Q/K) and values C/heads·F.
    ``dim=4`` transposes so the attended axis is frequency instead.

    Input (B, T, F, C). All heads' Q/K/V are computed as single grouped
    1x1 convs (channels n_head*E) rather than n_head separate convs —
    one MXU matmul instead of a Python loop; head h uses output block h,
    matching the reference's per-head module list semantics exactly.
    """

    in_chan: int
    n_freqs: int
    n_head: int = 4
    hid_chan: int = 4
    act_type: str = "PReLU"
    norm_type: str = "LayerNormalization4D"
    dim: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dim == 4:
            x = jnp.swapaxes(x, 1, 2)
        b, t, f, c = x.shape
        residual = x
        nh, e = self.n_head, self.hid_chan
        ch = c // nh

        # Heads stacked along channels in ONE conv (one MXU matmul instead of
        # a per-head Python loop), but the PReLU slope and LN4D affine stay
        # per-head to match the reference's per-head module lists
        # (attention.py:100-137) parameter-for-parameter.
        def qkv_proj(out_per_head, name):
            z = L.Conv(c, nh * out_per_head, 1, nd=2)(x)  # (B,T,F,nh*o)
            z = z.reshape(b, t, f, nh, out_per_head).transpose(0, 3, 1, 2, 4)
            # per-head PReLU (reference: nn.PReLU() per head)
            alpha = self.param(
                f"{name}_prelu",
                lambda k_, s: jnp.full(s, 0.25, jnp.float32),
                (nh, 1, 1, 1),  # right-aligns to (B, nh, T, F, O)
            )
            z = jnp.where(z >= 0, z, alpha * z)
            if self.norm_type in ("LayerNormalization4D", "LN4d"):
                # per-head LN4D: stats over (F, E), affine (nh, F, E)
                mean = jnp.mean(z, axis=(-2, -1), keepdims=True)
                var = jnp.mean(
                    jnp.square(z - mean), axis=(-2, -1), keepdims=True
                )
                gamma = self.param(
                    f"{name}_ln_scale", nn.initializers.ones,
                    (nh, 1, f, out_per_head),
                )
                beta = self.param(
                    f"{name}_ln_bias", nn.initializers.zeros,
                    (nh, 1, f, out_per_head),
                )
                z = (z - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
            return z.reshape(b * nh, t, f, out_per_head)

        q = qkv_proj(e, "q")  # (B*nh, T, F, E)
        k = qkv_proj(e, "k")
        v = qkv_proj(ch, "v")  # (B*nh, T, F, C/nh)

        q2 = q.reshape(b * nh, t, f * e)
        k2 = k.reshape(b * nh, t, f * e)
        v2 = v.reshape(b * nh, t, f * ch)
        attn = jnp.einsum(
            "bqe,bke->bqk", q2, k2, preferred_element_type=jnp.float32
        ) / math.sqrt(f * e)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bqk,bkd->bqd", attn, v2, preferred_element_type=jnp.float32
        )
        out = out.reshape(b, nh, t, f, ch)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, t, f, nh * ch)

        out = L.Conv(c, c, 1, nd=2)(out)
        out = L.make_act(self.act_type)(out)
        norm = L.make_norm(self.norm_type, c, n_freqs=f)
        if norm is not None:
            out = norm(out)

        x = out + residual
        if self.dim == 4:
            x = jnp.swapaxes(x, 1, 2)
        return x


class GlobalAttention(nn.Module):
    """MHSA + conv-FFN block (reference ``attention.py:192-220``), 1D."""

    in_chan: int
    hid_chan: Optional[int] = None
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    pos_enc: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = self.hid_chan if self.hid_chan is not None else 2 * self.in_chan
        x = MultiHeadSelfAttention(
            self.in_chan, self.n_head, self.dropout, self.pos_enc
        )(x, train)
        x = L.FeedForwardNetwork(
            self.in_chan, hid, self.kernel_size, dropout=self.dropout
        )(x, train)
        return x


class GlobalAttention2D(nn.Module):
    """T-axis then F-axis MHSA with batch folding (``attention.py:223-280``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    kernel_size: int = 5
    n_head: int = 8
    dropout: float = 0.1
    single_ffn: bool = True
    group_ffn: bool = False
    pos_enc: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F, C)
        b, t, f, c = x.shape
        hid = self.hid_chan if self.hid_chan is not None else 2 * self.in_chan

        # time-axis attention: fold F into batch
        z = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        z = MultiHeadSelfAttention(c, self.n_head, self.dropout, self.pos_enc)(
            z, train
        )
        if self.single_ffn:
            z = L.FeedForwardNetwork(c, hid, self.kernel_size, dropout=self.dropout)(
                z, train
            )
        x = z.reshape(b, f, t, c).transpose(0, 2, 1, 3)
        # the reference applies the SAME group_FFN module after both stages
        # (attention.py:252,271,278) — share one instance
        group_ffn = (
            L.FeedForwardNetwork(
                c, hid, self.kernel_size, dropout=self.dropout, is2d=True
            )
            if self.group_ffn
            else None
        )
        if group_ffn is not None:
            x = group_ffn(x, train)

        # freq-axis attention: fold T into batch
        z = x.reshape(b * t, f, c)
        z = MultiHeadSelfAttention(c, self.n_head, self.dropout, self.pos_enc)(
            z, train
        )
        if self.single_ffn:
            z = L.FeedForwardNetwork(c, hid, self.kernel_size, dropout=self.dropout)(
                z, train
            )
        x = z.reshape(b, t, f, c)
        if group_ffn is not None:
            x = group_ffn(x, train)
        return x
