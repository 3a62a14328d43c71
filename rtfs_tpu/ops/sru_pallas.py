"""Fused Pallas TPU kernel for the SRU recurrence (fwd + bwd).

The SRU input projection is a large MXU matmul (done by XLA outside the
kernel); this module fuses ONLY the elementwise recurrence

    f_t = sigmoid(u1_t + v_f * c_{t-1} + b_f)
    c_t = f_t * c_{t-1} + (1 - f_t) * u0_t
    r_t = sigmoid(u2_t + v_r * c_t + b_r)   # reset reads the UPDATED cell
    h_t = r_t * c_t + (1 - r_t) * xhw_t

(the ``sru`` package computes r_t from c_t, not the paper's c_{t-1} —
see ``rtfs_tpu.ops.sru`` docstring)

into one kernel — versus ``lax.scan`` which round-trips HBM and pays launch
overhead every step. On the RTFS-Net-4 forward this recurrence dominates
wall clock (~64 sequential scans per forward).

Kernel structure:
- Layout is time-major with the folded batch on the 128-wide lane axis and
  gates/hidden on sublanes, so each step is a (3H, 128) VPU tile op.
- Grid = (batch_tiles, time_chunks). TPU grids iterate sequentially with
  the LAST axis innermost, and scratch persists across grid steps — the
  cell state ``c`` is carried across time chunks in a VMEM scratch that is
  reset at chunk 0. Chunking keeps VMEM blocks small (whole-sequence
  blocks blow the 16 MB budget at RTFS sizes) and lets Pallas
  double-buffer the next chunk's DMA behind the current chunk's compute.
- The backward pass is the same structure with time chunks visited in
  reverse (index_map reverses the chunk axis) carrying ``dc``; per-tile
  (v, b) gradient partials accumulate in scratch and are flushed on the
  last chunk. Zero time-padding is grad-safe: padded dh=0 rows produce
  dc=0 contributions.

Reference semantics: sru package v2.6 as used by the reference
``src/models/layers/rnn_layers.py:99-105`` (see ``rtfs_tpu.ops.sru``).
Exactness vs the lax.scan path is covered by tests (interpret mode on CPU,
real kernel on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
T_CHUNK = 32


def _fwd_kernel(u_ref, xhw_ref, vb_ref, h_ref, c_ref, carry):
    """One (batch-tile, time-chunk) step of the forward recurrence.

    u_ref:   (Tc, 3H, B) gate pre-activations [x_tilde, f, r].
    xhw_ref: (Tc, H, B) highway input.
    vb_ref:  (4, H, B) packed [v_f, v_r, b_f, b_r] (lane-replicated).
    h_ref:   (Tc, H, B) output.
    c_ref:   (Tc, H, B) saved cell states (for backward).
    carry:   (H, B) VMEM scratch holding c across time chunks.
    """
    t_chunk, gh, b = u_ref.shape
    h = gh // 3

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[...] = jnp.zeros((h, b), carry.dtype)

    v_f = vb_ref[0]
    v_r = vb_ref[1]
    b_f = vb_ref[2]
    b_r = vb_ref[3]

    def step(t, c_prev):
        u_t = u_ref[t]
        u0 = u_t[0:h]
        u1 = u_t[h : 2 * h]
        u2 = u_t[2 * h : 3 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        c = f * c_prev + (1.0 - f) * u0
        r = jax.nn.sigmoid(u2 + v_r * c + b_r)
        h_t = r * c + (1.0 - r) * xhw_ref[t]
        c_ref[t] = c.astype(c_ref.dtype)
        h_ref[t] = h_t.astype(h_ref.dtype)
        return c

    carry[...] = jax.lax.fori_loop(0, t_chunk, step, carry[...])


def _bwd_kernel(u_ref, xhw_ref, vb_ref, c_ref, cin_ref, dh_ref,
                du_ref, dxhw_ref, dvb_ref, dc_carry, dvb_acc):
    """One (batch-tile, reversed-time-chunk) step of BPTT.

    cin_ref: (Tc, H, B) cell states shifted by one step (c_{t-1}); the first
    global step reads zeros (prepended outside).
    dvb_ref: (4, H, B) per-batch-tile gradient partials, written on the
    final (earliest-time) chunk from the scratch accumulator.
    """
    t_chunk, gh, b = u_ref.shape
    h = gh // 3

    @pl.when(pl.program_id(1) == 0)
    def _():
        dc_carry[...] = jnp.zeros((h, b), dc_carry.dtype)
        dvb_acc[...] = jnp.zeros((4, h, b), dvb_acc.dtype)

    # All backward arithmetic runs in f32 regardless of the model dtype:
    # casts happen at load so HBM/VMEM traffic stays in the param dtype.
    # (Also avoids a Mosaic verifier failure on mixed f32-scalar -> bf16-
    # vector broadcasts observed when the body ran in bf16.)
    v_f = vb_ref[0].astype(jnp.float32)
    v_r = vb_ref[1].astype(jnp.float32)
    b_f = vb_ref[2].astype(jnp.float32)
    b_r = vb_ref[3].astype(jnp.float32)

    def step(i, carry):
        t = t_chunk - 1 - i
        dc_next, dvf, dvr, dbf, dbr = carry
        c_prev = cin_ref[t].astype(jnp.float32)
        c_t = c_ref[t].astype(jnp.float32)
        u_t = u_ref[t].astype(jnp.float32)
        u0 = u_t[0:h]
        u1 = u_t[h : 2 * h]
        u2 = u_t[2 * h : 3 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        r = jax.nn.sigmoid(u2 + v_r * c_t + b_r)

        dh = dh_ref[t].astype(jnp.float32)
        dr = dh * (c_t - xhw_ref[t].astype(jnp.float32))
        dm = dr * r * (1.0 - r)
        # c_t feeds h directly AND the reset pre-activation (a_r = u2 +
        # v_r*c_t + b_r), plus the next step's recurrence
        dc = dh * r + dm * v_r + dc_next
        df = dc * (c_prev - u0)
        da = df * f * (1.0 - f)

        du_ref[t] = jnp.concatenate(
            [dc * (1.0 - f), da, dm], axis=0
        ).astype(du_ref.dtype)
        dxhw_ref[t] = (dh * (1.0 - r)).astype(dxhw_ref.dtype)

        dc_prev = dc * f + da * v_f
        return (
            dc_prev,
            dvf + da * c_prev,
            dvr + dm * c_t,
            dbf + da,
            dbr + dm,
        )

    zeros = jnp.zeros((h, b), jnp.float32)
    del zeros  # carries live in the f32 scratches below
    init = (dc_carry[...], dvb_acc[0], dvb_acc[1], dvb_acc[2], dvb_acc[3])
    dc0, dvf, dvr, dbf, dbr = jax.lax.fori_loop(0, t_chunk, step, init)
    dc_carry[...] = dc0.astype(dc_carry.dtype)
    dvb_acc[0] = dvf.astype(dvb_acc.dtype)
    dvb_acc[1] = dvr.astype(dvb_acc.dtype)
    dvb_acc[2] = dbf.astype(dvb_acc.dtype)
    dvb_acc[3] = dbr.astype(dvb_acc.dtype)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dvb_ref[...] = dvb_acc[...].astype(dvb_ref.dtype)


def _pad_to(x, axis, size):
    if x.shape[axis] == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pads)


def _prep(u, xhw, v, b):
    t_len, gh, bsz = u.shape
    hdim = gh // 3
    b_pad = max(LANE, -(-bsz // LANE) * LANE)
    t_pad = max(T_CHUNK, -(-t_len // T_CHUNK) * T_CHUNK)
    u_p = _pad_to(_pad_to(u, 2, b_pad), 0, t_pad)
    x_p = _pad_to(_pad_to(xhw, 2, b_pad), 0, t_pad)
    vb = jnp.broadcast_to(
        jnp.concatenate([v, b], axis=0)[:, :, None], (4, hdim, LANE)
    )
    return u_p, x_p, vb, hdim, b_pad, t_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sru_recurrence(u, xhw, v, b, interpret=False):
    """SRU recurrence, one direction.

    Args:
      u: (T, 3H, B) gate pre-activations (chunk order: x_tilde, f, r).
      xhw: (T, H, B) highway input.
      v, b: (2, H) recurrence vectors / biases.

    Returns:
      h: (T, H, B)
    """
    h, _ = _sru_fwd_impl(u, xhw, v, b, interpret)
    return h


def _sru_fwd_impl(u, xhw, v, b, interpret):
    t_len, gh, bsz = u.shape
    u_p, x_p, vb, hdim, b_pad, t_pad = _prep(u, xhw, v, b)
    grid = (b_pad // LANE, t_pad // T_CHUNK)

    h_out, c_out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_CHUNK, gh, LANE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, hdim, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_CHUNK, hdim, LANE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, hdim, b_pad), u.dtype),
            jax.ShapeDtypeStruct((t_pad, hdim, b_pad), u.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((hdim, LANE), jnp.float32)],
        interpret=interpret,
    )(u_p, x_p, vb)
    return h_out[:t_len, :, :bsz], c_out


def _sru_vjp_fwd(u, xhw, v, b, interpret):
    h, c = _sru_fwd_impl(u, xhw, v, b, interpret)
    return h, (u, xhw, v, b, c)


def _sru_vjp_bwd(interpret, residuals, dh):
    u, xhw, v, b, c = residuals  # c is already (t_pad, H, b_pad)
    t_len, gh, bsz = u.shape
    u_p, x_p, vb, hdim, b_pad, t_pad = _prep(u, xhw, v, b)
    dh_p = _pad_to(_pad_to(dh, 2, b_pad), 0, t_pad)
    # c_{t-1} stream: zeros prepended, last step dropped.
    cin = jnp.concatenate(
        [jnp.zeros((1, hdim, b_pad), c.dtype), c[:-1]], axis=0
    )
    n_tiles = b_pad // LANE
    n_chunks = t_pad // T_CHUNK

    def rev_t(i, j):
        return (n_chunks - 1 - j, 0, i)

    du, dxhw, dvb = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((T_CHUNK, gh, LANE), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, hdim, LANE), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), rev_t,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T_CHUNK, gh, LANE), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((T_CHUNK, hdim, LANE), rev_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, hdim, LANE), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, gh, b_pad), u.dtype),
            jax.ShapeDtypeStruct((t_pad, hdim, b_pad), u.dtype),
            jax.ShapeDtypeStruct((4, hdim, b_pad), u.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((hdim, LANE), jnp.float32),
            pltpu.VMEM((4, hdim, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(u_p, x_p, vb, c, cin, dh_p)

    dvb_sum = jnp.sum(dvb[..., :bsz], axis=-1)  # (4, H)
    return (
        du[:t_len, :, :bsz],
        dxhw[:t_len, :, :bsz],
        dvb_sum[:2],
        dvb_sum[2:],
    )


sru_recurrence.defvjp(_sru_vjp_fwd, _sru_vjp_bwd)


def sru_layer_tpu(
    x: jax.Array,
    weight: jax.Array,
    weight_c: jax.Array,
    bias: jax.Array,
    hidden: int,
    bidirectional: bool,
    interpret: bool = False,
) -> jax.Array:
    """Full SRU layer with the Pallas recurrence (drop-in for sru.sru_layer).

    x: (B, L, D); weight: (D, dirs*k*H); weight_c/bias: (dirs, 2, H).
    Returns (B, L, dirs*H).
    """
    dirs = 2 if bidirectional else 1
    d_in = x.shape[-1]
    d_out = dirs * hidden
    k = 4 if d_in != d_out else 3
    bsz, length = x.shape[:2]

    # U inherits the compute dtype: f32 models keep an f32 recurrence;
    # bf16 models halve U's HBM traffic (the recurrence is gate-saturating
    # and short-range, tolerating bf16 well — parity tests pin f32).
    u = jnp.einsum("bld,dk->blk", x.astype(weight.dtype), weight)
    u = u.reshape(bsz, length, dirs, k, hidden)

    outs = []
    for d in range(dirs):
        u_d = u[:, :, d]  # (B, L, k, H)
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
        # (B, L, 3, H) -> (L, 3H, B): time-major, batch on lanes.
        u_t = u_gates.reshape(bsz, length, 3 * hidden).transpose(1, 2, 0)
        x_t = x_hw.transpose(1, 2, 0)
        h = sru_recurrence(u_t, x_t, weight_c[d], bias[d], interpret)
        h = h.transpose(2, 0, 1)  # (B, L, H)
        if d == 1:
            h = jnp.flip(h, axis=1)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1) if dirs > 1 else outs[0]


def sru_layer_tpu_windowed(
    x: jax.Array,
    weight: jax.Array,
    weight_c: jax.Array,
    bias: jax.Array,
    hidden: int,
    bidirectional: bool,
    kernel: int,
    stride: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """First SRU layer fused with the DualPathRNN window: conv formulation.

    The reference unfolds (kernel k, stride s) and feeds C*k channels to the
    SRU (``rnn_layers.py:97,148``); materializing the unfolded tensor costs
    ~2x its (large) size in HBM traffic. But unfold-then-matmul IS a 1D
    convolution: U = conv1d(x, W') with W'[j, c, :] = W[c*k + j, :]
    (channel-major unfold ordering). XLA's conv never materializes the
    windows.

    x: (B, T, C) RAW (padded) input; weight: (C*kernel, dirs*kc*H).
    Returns (B, T', dirs*H) with T' = (T - kernel)//stride + 1.
    """
    dirs = 2 if bidirectional else 1
    d_out = dirs * hidden
    d_in_unf = weight.shape[0]
    c = d_in_unf // kernel
    k_chunks = 4 if d_in_unf != d_out else 3  # always 4 in practice (2048 != 64)
    bsz = x.shape[0]

    # (C*k, O) channel-major rows -> conv kernel (k, C, O)
    w_conv = weight.reshape(c, kernel, -1).transpose(1, 0, 2)
    u = jax.lax.conv_general_dilated(
        x.astype(w_conv.dtype), w_conv,
        window_strides=(stride,), padding="VALID",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w_conv.shape, ("NWC", "WIO", "NWC")
        ),
    )  # (B, T', dirs*kc*H), dtype follows the params (see sru_layer_tpu)
    length = u.shape[1]
    u = u.reshape(bsz, length, dirs, k_chunks, hidden)

    outs = []
    for d in range(dirs):
        u_d = u[:, :, d]
        x_hw = u_d[:, :, 3] if k_chunks == 4 else None
        assert x_hw is not None, "windowed layer always projects the highway"
        u_gates = u_d[:, :, :3]
        if d == 1:
            u_gates = jnp.flip(u_gates, axis=1)
            x_hw = jnp.flip(x_hw, axis=1)
        u_t = u_gates.reshape(bsz, length, 3 * hidden).transpose(1, 2, 0)
        x_t = x_hw.transpose(1, 2, 0)
        h = sru_recurrence(u_t, x_t, weight_c[d], bias[d], interpret)
        h = h.transpose(2, 0, 1)
        if d == 1:
            h = jnp.flip(h, axis=1)
        outs.append(h)
    return jnp.concatenate(outs, axis=-1) if dirs > 1 else outs[0]
