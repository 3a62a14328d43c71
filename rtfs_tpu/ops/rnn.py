"""LSTM / GRU scans with torch gate semantics (cuDNN replacement).

The reference resolves ``getattr(nn, rnn_type)`` for TDFNet's GRU/LSTM paths
(``src/models/layers/rnn_layers.py:31-37,117-122``). On TPU these run as
``jax.lax.scan`` cells: the four/three gate projections are batched matmuls
(MXU) computed for the whole sequence up front, and the scan carries only the
elementwise state updates.

Gate conventions match torch exactly:
  LSTM: gates ordered (i, f, g, o);  c' = f*c + i*g;  h' = o*tanh(c')
  GRU:  gates ordered (r, z, n);     n = tanh(W_in x + b_in + r*(W_hn h + b_hn))
        h' = (1-z)*n + z*h
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_scan(x, w_ih, w_hh, b_ih, b_hh, hidden, reverse=False):
    """One-direction LSTM over (B, L, D). Returns (B, L, H)."""
    if reverse:
        x = jnp.flip(x, axis=1)
    # All input projections up front: (B, L, 4H) — one big MXU matmul.
    xi = x @ w_ih + b_ih

    def step(carry, xi_t):
        h, c = carry
        gates = xi_t + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    b = x.shape[0]
    h0 = jnp.zeros((b, hidden), x.dtype)
    (_, _), hs = jax.lax.scan(step, (h0, h0), jnp.moveaxis(xi, 1, 0))
    hs = jnp.moveaxis(hs, 0, 1)
    return jnp.flip(hs, axis=1) if reverse else hs


def gru_scan(x, w_ih, w_hh, b_ih, b_hh, hidden, reverse=False):
    """One-direction GRU over (B, L, D), torch new-gate convention."""
    if reverse:
        x = jnp.flip(x, axis=1)
    xi = x @ w_ih + b_ih  # (B, L, 3H)

    def step(h, xi_t):
        hh = h @ w_hh + b_hh
        x_r, x_z, x_n = jnp.split(xi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hh, 3, axis=-1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        n = jnp.tanh(x_n + r * h_n)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((x.shape[0], hidden), x.dtype)
    _, hs = jax.lax.scan(step, h0, jnp.moveaxis(xi, 1, 0))
    hs = jnp.moveaxis(hs, 0, 1)
    return jnp.flip(hs, axis=1) if reverse else hs


class RNN(nn.Module):
    """torch nn.LSTM/nn.GRU parity: multi-layer, optionally bidirectional.

    Input/output batch-major (B, L, D). Weights use torch's per-layer,
    per-direction parameter structure (transposed to column-major for the
    right matmul orientation) and torch's uniform(-1/sqrt(H), 1/sqrt(H))
    init.
    """

    cell: str  # "LSTM" | "GRU"
    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        assert self.cell in ("LSTM", "GRU")
        scan = lstm_scan if self.cell == "LSTM" else gru_scan
        n_gates = 4 if self.cell == "LSTM" else 3
        dirs = 2 if self.bidirectional else 1
        bound = 1.0 / math.sqrt(self.hidden_size)
        h = x
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else self.hidden_size * dirs
            outs = []
            for d in range(dirs):
                sfx = f"l{layer}" + ("_reverse" if d == 1 else "")
                w_ih = self.param(
                    f"weight_ih_{sfx}", _uniform_init(bound),
                    (d_in, n_gates * self.hidden_size),
                )
                w_hh = self.param(
                    f"weight_hh_{sfx}", _uniform_init(bound),
                    (self.hidden_size, n_gates * self.hidden_size),
                )
                b_ih = self.param(
                    f"bias_ih_{sfx}", _uniform_init(bound),
                    (n_gates * self.hidden_size,),
                )
                b_hh = self.param(
                    f"bias_hh_{sfx}", _uniform_init(bound),
                    (n_gates * self.hidden_size,),
                )
                outs.append(
                    scan(h, w_ih, w_hh, b_ih, b_hh, self.hidden_size, d == 1)
                )
            h = jnp.concatenate(outs, axis=-1) if dirs > 1 else outs[0]
        return h
