"""Recurrent TF-domain blocks: DualPathRNN (the RTFS F-/T-scan), projections.

TPU-native counterparts of the reference ``src/models/layers/rnn_layers.py``.
The DualPathRNN is the heart of every active RTFS-Net config: it folds one
axis of the TF map into the batch, windows the other axis (torch
``nn.Unfold`` kernel 8 / stride 1), runs a 4-layer bidirectional SRU along
it, and projects back with a ConvTranspose1d — all wrapped in a residual.

Here the unfold is a static slice-stack (``ops.convops.unfold_1d``), the SRU
input projections are batched MXU matmuls and the recurrence a fused scan
(``ops.sru``), so the whole block is three large GEMMs + one elementwise
scan per direction.

Layout: 2D maps (B, T, F, C); 1D maps (B, T, C).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import convops
from ..ops.rnn import RNN
from ..ops.sru import SRU
from . import layers as L
from .attention import MultiHeadSelfAttention


class RNNProjection(nn.Module):
    """LN → (bi)LSTM/GRU → PReLU+Linear → LN, double residual.

    Reference ``rnn_layers.py:12-59``. Input (B, T, C).
    """

    input_size: int
    hidden_size: int
    rnn_type: str = "LSTM"
    dropout: float = 0.0
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        num_dir = 2 if self.bidirectional else 1
        res = x
        x = nn.LayerNorm(epsilon=1e-5)(x)
        residual = x
        x = RNN(
            cell=self.rnn_type,
            input_size=self.input_size,
            hidden_size=self.hidden_size,
            num_layers=1,
            bidirectional=self.bidirectional,
        )(x)
        x = L.PReLU()(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.input_size)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.LayerNorm(epsilon=1e-5)(x + residual)
        return x + res


class GlobalAttentionRNN(nn.Module):
    """RNNProjection wrapper (reference ``rnn_layers.py:304-326``)."""

    in_chan: int
    hid_chan: Optional[int] = None
    dropout: float = 0.1
    rnn_type: str = "LSTM"
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = self.hid_chan if self.hid_chan is not None else self.in_chan
        return RNNProjection(
            self.in_chan, hid, self.rnn_type, self.dropout, self.bidirectional
        )(x, train)


class DualPathRNN(nn.Module):
    """Windowed SRU scan over one TF axis (reference ``rnn_layers.py:62-162``).

    ``dim=3`` scans along time (frequency folded into batch); ``dim=4``
    scans along frequency (time folded into batch). Pipeline:

      pad → norm → fold other axis into batch → unfold(k, s) →
      rnn over windows → ConvTranspose1d(k, s) back → +residual → crop

    Input (B, T, F, C).
    """

    in_chan: int
    hid_chan: int
    dim: int
    kernel_size: int = 8
    stride: int = 1
    rnn_type: str = "SRU"
    num_layers: int = 1
    norm_type: str = "LayerNormalization4D"
    bidirectional: bool = True
    apply_ffn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dim == 4:
            x = jnp.swapaxes(x, 1, 2)  # scan axis becomes axis 1

        b, old_t, old_f, c = x.shape
        ks, st = self.kernel_size, self.stride
        new_t = math.ceil((old_t - ks) / st) * st + ks
        new_f = math.ceil((old_f - ks) / st) * st + ks
        x = jnp.pad(x, ((0, 0), (0, new_t - old_t), (0, new_f - old_f), (0, 0)))

        residual = x
        norm = L.make_norm(self.norm_type, c, n_freqs=1)
        if norm is not None:
            x = L._apply_norm(norm, x, train)

        # Fold the non-scanned axis (F) into batch: (B*new_F, new_T, C).
        x = x.transpose(0, 2, 1, 3).reshape(b * new_f, new_t, c)

        # Under a DP x TP mesh, shard the FOLDED batch over both axes so
        # the sequential scan never sees a sharded scan axis (the r3
        # audit showed per-step collective-permutes otherwise) — see
        # layers.scan_sharding.
        scan_sh = L.scan_sharding_value()
        if scan_sh is not None:
            import jax

            x = jax.lax.with_sharding_constraint(x, scan_sh)

        unfolded = c * ks
        num_dir = 2 if self.bidirectional else 1
        time_major = False
        if self.rnn_type == "SRU":
            from ..ops.sru import uses_fused_stack

            rnn_out = self.hid_chan * num_dir
            # On the fused Pallas path the whole tail stays in the stack's
            # time-major layout: SRU emits (L, 2H, B*F), the fused
            # ConvT+OLA kernel back-projects in place (ops.convt_tm), and
            # ONE transpose lands directly in (B, T, F, C) — replacing the
            # stack exit transpose + ConvT round-trip + refold transpose.
            import os

            # Inference-only: in the train step the pallas boundary +
            # extra layout adjoints around the fused tail cost MORE than
            # the ConvT fusions they replace (+5 ms/step, r5 A/B:
            # 80.2 vs 75.2 ms with identical fwd win), so training keeps
            # the XLA ConvT path. RTFS_CONVT_TM=0 disables it everywhere
            # (A/B escape hatch).
            time_major = (
                uses_fused_stack(unfolded, self.hid_chan, self.bidirectional)
                and st == 1
                and not self.apply_ffn
                and not train
                # f32 at large folded batch keeps XLA's ConvT: the kernel
                # halves its lane width in f32 (256) and measured +1.1 ms
                # on the bs-8 f32 forward (r5 A/B); bf16 and bs-1 win.
                and (x.dtype == jnp.bfloat16 or b * new_f <= 256)
                and os.environ.get("RTFS_CONVT_TM", "1") != "0"
            )
            # raw sequence + window: layer 0's projection runs as a conv
            # (no unfolded tensor materialized) on the Pallas backend.
            x = SRU(
                input_size=unfolded,
                hidden_size=self.hid_chan,
                num_layers=self.num_layers,
                bidirectional=self.bidirectional,
                window=(ks, st),
            )(x, time_major=time_major)
        elif self.rnn_type == "Attn":
            rnn_out = unfolded
            x = convops.unfold_1d(x, ks, st)
            x = MultiHeadSelfAttention(unfolded, 8)(x, train)
        else:
            x = convops.unfold_1d(x, ks, st)
            rnn_out = self.hid_chan * num_dir
            x = RNN(
                cell=self.rnn_type,
                input_size=unfolded,
                hidden_size=self.hid_chan,
                num_layers=self.num_layers,
                bidirectional=self.bidirectional,
            )(x)

        if self.apply_ffn:
            x = L.FeedForwardNetwork(
                unfolded, unfolded * 2, self.kernel_size, dropout=0.1
            )(x, train)

        if time_major:
            # x: (L, 2H, B*F) -> kernel -> (new_T, C, B*F) -> (B, T, F, C)
            x = L.ConvTranspose(rnn_out, c, ks, stride=st, nd=1)(
                x, time_major=True
            )
            x = x.reshape(new_t, c, b, new_f).transpose(2, 0, 3, 1)
        else:
            x = L.ConvTranspose(rnn_out, c, ks, stride=st, nd=1)(x)  # (B*F, new_T, C)
            x = x.reshape(b, new_f, new_t, c).transpose(0, 2, 1, 3)
        x = x + residual
        x = x[:, :old_t, :old_f]

        if self.dim == 4:
            x = jnp.swapaxes(x, 1, 2)
        return x
