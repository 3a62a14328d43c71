"""SRU (Simple Recurrent Unit) — the RTFS-Net workhorse, TPU-native.

The reference uses the third-party CUDA ``sru`` package (v2.6 semantics;
reference ``src/models/layers/rnn_layers.py:6,99-105``, dep pinned at
``setup/requirements.yaml:33``). Per layer and direction, with
``U = x @ W`` split into k chunks (k = 4 when input dim != output dim,
else 3; output dim = hidden * num_directions):

    f_t = sigmoid(U1_t + v_f * c_{t-1} + b_f)
    c_t = f_t * c_{t-1} + (1 - f_t) * U0_t
    r_t = sigmoid(U2_t + v_r * c_t + b_r)         # NOTE: reads c_t
    h_t = r_t * c_t + (1 - r_t) * x_hw_t          # highway

NOTE on the reset gate: the PAPER (arXiv 1709.02755) writes r_t as a
function of c_{t-1}, but the shipped ``sru`` package computes the reset
gate from the *updated* cell state c_t (both the CUDA kernel and the
naive fallback update the cell before the second sigmoid). The package is
what the reference actually executes, so rtfs_tpu follows the code, not
the paper. ``tests/test_sru_semantics.py`` pins this with an independent
numpy transcription of the package recurrence.

where ``x_hw = x`` when k == 3 (input dim == output dim) or ``U3`` when
k == 4, ``v_f, v_r`` are per-unit recurrence vectors ("weight_c"), and the
reset/highway bias is initialised to ``highway_bias``. c_0 = 0.

TPU-first structure: the input projection ``x @ W`` is one large batched
matmul (MXU — this is where ~all the FLOPs are: for the RTFS config the
first layer is a 2048-wide projection), and the recurrence is a cheap
elementwise scan. The gates read c_{t-1}, so the recurrence is inherently
sequential (NOT a linear associative scan); it runs as ``jax.lax.scan``
with both directions fused into one scan body so forward and backward
timesteps execute in the same iteration.

A fused Pallas kernel for the recurrence (keeping U tiles VMEM-resident
across timesteps) lives in ``rtfs_tpu.ops.sru_pallas`` and is used
automatically on TPU for the steady-state sizes; this module is the
reference implementation and the CPU/backward-compatible path.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _layer_scan(u: jax.Array, v: jax.Array, b: jax.Array, x_hw: jax.Array):
    """One direction's recurrence.

    Args:
      u: (B, L, 3, H) gate pre-activations [x_tilde, f, r].
      v: (2, H) recurrence vectors [v_f, v_r].
      b: (2, H) biases [b_f, b_r].
      x_hw: (B, L, H) highway input.

    Returns:
      h: (B, L, H)
    """
    v_f, v_r = v[0], v[1]
    b_f, b_r = b[0], b[1]

    def step(c, inputs):
        u_t, xhw_t = inputs  # (B, 3, H), (B, H)
        f = jax.nn.sigmoid(u_t[:, 1] + v_f * c + b_f)
        c_new = f * c + (1.0 - f) * u_t[:, 0]
        # reset gate reads the UPDATED cell (sru package semantics; the
        # paper says c_{t-1} — see module docstring)
        r = jax.nn.sigmoid(u_t[:, 2] + v_r * c_new + b_r)
        h = r * c_new + (1.0 - r) * xhw_t
        return c_new, h

    c0 = jnp.zeros((u.shape[0], u.shape[-1]), u.dtype)
    # scan over time: move L to the leading axis.
    u_t = jnp.moveaxis(u, 1, 0)
    x_t = jnp.moveaxis(x_hw, 1, 0)
    _, h = jax.lax.scan(step, c0, (u_t, x_t))
    return jnp.moveaxis(h, 0, 1)


def sru_layer(
    x: jax.Array,
    weight: jax.Array,
    weight_c: jax.Array,
    bias: jax.Array,
    hidden: int,
    bidirectional: bool,
) -> jax.Array:
    """Single SRU layer, both directions.

    Args:
      x: (B, L, D_in).
      weight: (D_in, dirs * k * H).
      weight_c: (dirs, 2, H).
      bias: (dirs, 2, H).

    Returns:
      (B, L, dirs * H)
    """
    dirs = 2 if bidirectional else 1
    d_in = x.shape[-1]
    d_out = dirs * hidden
    k = 4 if d_in != d_out else 3

    u = jnp.einsum(
        "bld,dk->blk", x, weight, preferred_element_type=jnp.float32
    )
    u = u.reshape(*x.shape[:2], dirs, k, hidden)

    outs = []
    for d in range(dirs):
        u_d = u[:, :, d]
        x_hw = (
            u_d[:, :, 3]
            if k == 4
            else x[..., d * hidden : (d + 1) * hidden]
        )
        u_gates = u_d[:, :, :3]
        x_hw = x_hw.astype(u.dtype)  # recurrence runs in the matmul dtype
        if d == 1:
            u_gates = jnp.flip(u_gates, axis=1)
            x_hw = jnp.flip(x_hw, axis=1)
        h = _layer_scan(u_gates, weight_c[d], bias[d], x_hw)
        if d == 1:
            h = jnp.flip(h, axis=1)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1) if dirs > 1 else outs[0]


def resolve_backend(backend: str = "auto") -> str:
    """The SRU backend actually used: "pallas" | "scan" | "interpret".

    RTFS_SRU_BACKEND overrides the default choice — used by perf A/B runs
    (Pallas custom-call vs pure-XLA scan) and as an escape hatch on
    backends where Mosaic misbehaves.
    """
    if backend != "auto":
        return backend
    import os

    return os.environ.get(
        "RTFS_SRU_BACKEND",
        "pallas" if jax.default_backend() == "tpu" else "scan",
    )


def uses_fused_stack(input_size: int, hidden_size: int,
                     bidirectional: bool, backend: str = "auto") -> bool:
    """True when SRU.__call__ will take the fused dual-direction Pallas
    stack (and therefore supports ``time_major`` output). Mirrors the
    dispatch condition in ``SRU.__call__``."""
    b = resolve_backend(backend)
    dirs = 2 if bidirectional else 1
    return (
        b in ("pallas", "interpret")
        and bidirectional
        and input_size != dirs * hidden_size
    )


class SRU(nn.Module):
    """Multi-layer (bi)directional SRU, batch-major (B, L, D).

    Matches the ``sru`` package's SRU(input_size, hidden_size, num_layers,
    bidirectional) as instantiated by the reference DualPathRNN
    (``rnn_layers.py:99-105``): no layer dropout (default 0), no layer
    norm, highway_bias applied to the reset-gate bias.
    """

    input_size: int
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    highway_bias: float = -1.0
    backend: str = "auto"  # "auto" | "pallas" | "scan" | "interpret"
    # Optional (kernel, stride) window: the caller passes the RAW sequence
    # and layer 0's input projection runs as a 1D convolution (the unfold-
    # then-matmul identity), never materializing the unfolded tensor.
    # Parameter shapes are identical to the unfolded formulation.
    window: Optional[tuple] = None

    def _layer_params(self):
        """Create (or look up) all layers' params; shared by both paths."""
        dirs = 2 if self.bidirectional else 1
        d_out = dirs * self.hidden_size
        weights, weight_cs, biases = [], [], []
        for layer in range(self.num_layers):
            d_in = self.input_size if layer == 0 else d_out
            k = 4 if d_in != d_out else 3

            def w_init(key, shape, dtype=jnp.float32):
                bound = math.sqrt(3.0 / shape[0])
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            weights.append(self.param(
                f"weight_{layer}", w_init, (d_in, dirs * k * self.hidden_size)
            ))
            weight_cs.append(self.param(
                f"weight_c_{layer}",
                lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -math.sqrt(3.0 / self.hidden_size),
                    math.sqrt(3.0 / self.hidden_size),
                ),
                (dirs, 2, self.hidden_size),
            ))

            hb = self.highway_bias

            def b_init(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[:, 1].set(hb)  # reset/highway-gate bias

            biases.append(self.param(
                f"bias_{layer}", b_init, (dirs, 2, self.hidden_size)
            ))
        return weights, weight_cs, biases

    @nn.compact
    def __call__(self, x: jax.Array, time_major: bool = False) -> jax.Array:
        backend = resolve_backend(self.backend)
        fuse_window = self.window is not None and backend in (
            "pallas", "interpret"
        )
        dirs = 2 if self.bidirectional else 1
        d_out = dirs * self.hidden_size
        weights, weight_cs, biases = self._layer_params()

        # Fully-fused dual-direction stack (ops.sru_fused): one kernel per
        # layer, hidden-layer projections fused in, no flips/transposes
        # between layers. Requires bidirectional + a projected highway on
        # layer 0 (k=4, i.e. input_size != dirs*hidden).
        if (
            backend in ("pallas", "interpret")
            and self.bidirectional
            and self.input_size != d_out
        ):
            from .sru_fused import sru_stack_tpu

            return sru_stack_tpu(
                x, weights, weight_cs, biases, self.hidden_size,
                window=self.window if fuse_window else None,
                interpret=(backend == "interpret"),
                time_major=time_major,
            )

        if time_major:
            raise ValueError(
                "time_major output requires the fused Pallas stack "
                "(gate with uses_fused_stack())"
            )
        if self.window is not None and not fuse_window:
            from .convops import unfold_1d

            x = unfold_1d(x, self.window[0], self.window[1])
        if backend in ("pallas", "interpret"):
            from .sru_pallas import sru_layer_tpu, sru_layer_tpu_windowed

            def layer_fn(h, w, wc, b):
                return sru_layer_tpu(
                    h, w, wc, b, self.hidden_size, self.bidirectional,
                    interpret=(backend == "interpret"),
                )

            def layer0_fn(h, w, wc, b):
                if not fuse_window:
                    return layer_fn(h, w, wc, b)
                return sru_layer_tpu_windowed(
                    h, w, wc, b, self.hidden_size, self.bidirectional,
                    kernel=self.window[0], stride=self.window[1],
                    interpret=(backend == "interpret"),
                )
        else:
            def layer_fn(h, w, wc, b):
                return sru_layer(
                    h, w, wc, b, self.hidden_size, self.bidirectional
                )

            layer0_fn = layer_fn

        h = x
        for layer in range(self.num_layers):
            h = (layer0_fn if layer == 0 else layer_fn)(
                h, weights[layer], weight_cs[layer], biases[layer]
            )
        return h
