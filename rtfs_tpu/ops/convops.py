"""Functional convolution / resize primitives with torch-parity semantics.

Everything here is channels-LAST (NWC / NHWC): the TPU-fast layout. The
reference (PyTorch) is channels-first; the semantics matched here are:

- torch ``Conv1d/2d`` with ``padding="same"`` (asymmetric for even kernels:
  left = total//2, right = total - left, total = dilation*(k-1)), integer
  padding, ``groups`` (incl. depthwise), ``dilation``.
  Reference: ``src/models/layers/conv_layers.py:100-115``.
- torch ``ConvTranspose1d/2d`` with ``padding`` / ``output_padding``.
  Reference: ``src/models/TDAVNet/decoder.py:44-57``, ``rnn_layers.py:129``.
- torch ``F.interpolate(mode="nearest")`` index convention
  (src = floor(dst * in/out)). Reference: fusion/interp call sites in
  ``src/models/layers/fusion.py`` and ``separators/frcnn.py``.
- torch ``F.adaptive_avg_pool1d/2d`` bucket boundaries
  (start = floor(o*in/out), end = ceil((o+1)*in/out)), implemented as a
  compile-time pooling matrix applied on the MXU.
  Reference: ``src/models/separators/tdanet.py:32,116``.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _same_pads(kernel: Sequence[int], dilation: Sequence[int]):
    """torch padding='same' pad pairs (low, high) per spatial dim."""
    pads = []
    for k, d in zip(kernel, dilation):
        total = d * (k - 1)
        lo = total // 2
        pads.append((lo, total - lo))
    return pads


def conv(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: Sequence[int] | int = 1,
    padding: str | int | Sequence[int] = "same",
    dilation: Sequence[int] | int = 1,
    groups: int = 1,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Grouped N-D convolution, channels-last.

    Args:
      x: (B, *spatial, Cin).
      w: (*kernel_spatial, Cin // groups, Cout)  (HWIO).
      padding: "same" (torch asymmetric convention), an int (symmetric,
        torch integer-padding convention), or explicit (lo, hi) pairs.
    """
    nd = x.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    kernel = w.shape[:nd]
    if padding == "same":
        pads = _same_pads(kernel, dilation)
    elif isinstance(padding, int):
        pads = [(padding, padding)] * nd
    else:
        pads = [(p, p) if isinstance(p, int) else tuple(p) for p in padding]

    x = x.astype(w.dtype)  # mixed-precision: compute in the param dtype

    # Pointwise (1x1, stride 1, dense) convs lower as plain matmuls: XLA's
    # classic conv emitter picks windowed iteration even for 1x1 backward
    # passes (profiled at >10x off the HBM roofline for the RTFS
    # projection convs); dot_general fwd AND its transpose-dW/dx are
    # straight MXU GEMMs.
    if (
        groups == 1
        and all(k == 1 for k in kernel)
        and all(s == 1 for s in stride)
        and all(p == (0, 0) for p in pads)
    ):
        out = jnp.einsum(
            "b...i,io->b...o", x, w.reshape(w.shape[-2], w.shape[-1])
        )
        if bias is not None:
            out = out + bias
        return out

    # Pointwise DEPTHWISE convs (k=1, groups == Cin == Cout — the RTFS
    # block "gateway") are a per-channel scale: as an elementwise multiply
    # XLA fuses them into the surrounding ops (residual add, projection
    # GEMM input) instead of paying a standalone conv dispatch + a full
    # HBM round-trip of the 256-channel full-res map per repeat.
    if (
        groups == x.shape[-1]
        and w.shape[-1] == groups
        and w.shape[-2] == 1
        and all(k == 1 for k in kernel)
        and all(s == 1 for s in stride)
        and all(p == (0, 0) for p in pads)
    ):
        out = x * w.reshape(w.shape[-1])
        if bias is not None:
            out = out + bias
        return out

    spatial = "".join("DHW"[3 - nd + i] for i in range(nd))
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
    )
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding=pads,
        rhs_dilation=tuple(dilation),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def conv_transpose(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: Sequence[int] | int = 1,
    padding: Sequence[int] | int = 0,
    output_padding: Sequence[int] | int = 0,
    dilation: Sequence[int] | int = 1,
    groups: int = 1,
    bias: jax.Array | None = None,
) -> jax.Array:
    """torch ConvTranspose-parity transposed convolution, channels-last.

    Implemented as an input-dilated regular convolution with the spatially
    flipped kernel — the exact adjoint of torch's convolution, so outputs
    match torch bit-for-bit up to float accumulation order.

    Args:
      x: (B, *spatial, Cin).
      w: (*kernel_spatial, Cout, Cin // groups) — note IO order mirrors
        torch's ConvTranspose weight (Cin, Cout // groups, *k) transposed
        to spatial-first (for groups > 1, Cout is the global channel and
        the last axis the within-group input channel; group g's outputs
        read group g's inputs, exactly torch's blocking).
      padding/output_padding: torch ints (out = (in-1)*s - 2p + d(k-1) + op + 1).
    """
    nd = x.ndim - 2
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(padding, int):
        padding = (padding,) * nd
    if isinstance(output_padding, int):
        output_padding = (output_padding,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    kernel = w.shape[:nd]

    # Flip spatial dims; kernel layout becomes HWIO with I=Cin (x's channels).
    w_flipped = jnp.flip(w, axis=tuple(range(nd)))
    w_flipped = jnp.swapaxes(w_flipped, -1, -2)  # (*k, Cin, Cout)

    pads = [
        (d * (k - 1) - p, d * (k - 1) - p + op)
        for k, p, op, d in zip(kernel, padding, output_padding, dilation)
    ]
    spatial = "".join("DHW"[3 - nd + i] for i in range(nd))
    dn = jax.lax.conv_dimension_numbers(
        x.shape,
        w_flipped.shape,
        (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
    )
    x = x.astype(w.dtype)  # mixed-precision: compute in the param dtype
    out = jax.lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=tuple(stride),
        rhs_dilation=tuple(dilation),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def _nearest_axis_idx(in_sz: int, out_sz: int) -> np.ndarray:
    # torch computes src = floor(float32(i) * (float32(in)/float32(out)))
    # in single precision (upsample_nearest CPU/CUDA kernels); double
    # precision floor(i * in/out) is 1 ulp off at exact multiples
    # (e.g. 3280->25 at i=15). Match torch bit-for-bit.
    scale = np.float32(in_sz) / np.float32(out_sz)
    idx = np.floor(
        np.arange(out_sz, dtype=np.float32) * scale
    ).astype(np.int64)
    return np.minimum(idx, in_sz - 1)


def _repeat_factor(in_sz: int, out_sz: int):
    """r if the torch-nearest index map equals ``arange(out) // r`` (pure
    integer upsample-by-repeat, e.g. 126->251 or 65->129 in the RTFS
    pyramid), else None."""
    if out_sz <= in_sz:
        return None
    r = -(-out_sz // in_sz)  # ceil
    if np.array_equal(_nearest_axis_idx(in_sz, out_sz),
                      np.arange(out_sz) // r):
        return r
    return None


def _interp_nearest_fwd_impl(x: jax.Array, size) -> jax.Array:
    nd = x.ndim - 2

    # Integer-repeat upsampling: broadcast+reshape+slice instead of a
    # gather. XLA fuses the repeat into consumers as a cheap producer
    # (the gather was a standalone kCustom fusion with 2x-padded temps).
    # Mixed plans (one gather axis + one repeat axis, e.g. the CAF's
    # video (T_v, 1) -> (T, F)) run the gather FIRST on the small tensor,
    # then the free repeats.
    reps = [
        None if x.shape[1 + a] == int(size[a])
        else _repeat_factor(x.shape[1 + a], int(size[a]))
        for a in range(nd)
    ]
    gather_axes = [a for a in range(nd)
                   if x.shape[1 + a] != int(size[a]) and reps[a] is None]
    if len(gather_axes) < nd or any(r is not None for r in reps):
        for a in gather_axes:
            x = jnp.take(
                x,
                jnp.asarray(_nearest_axis_idx(x.shape[1 + a], int(size[a]))),
                axis=1 + a,
            )
        for a in range(nd):
            if reps[a] is None:
                continue
            r, out_sz = reps[a], int(size[a])
            shp = list(x.shape)
            bshape = shp[:2 + a] + [r] + shp[2 + a:]
            x = jnp.broadcast_to(jnp.expand_dims(x, 2 + a), bshape)
            shp[1 + a] = shp[1 + a] * r
            x = x.reshape(shp)
            if shp[1 + a] != out_sz:
                x = jax.lax.slice_in_dim(x, 0, out_sz, axis=1 + a)
        return x

    if nd == 2 and x.shape[1] != size[0] and x.shape[2] != size[1]:
        # Both spatial axes resize: ONE merged gather over the flattened
        # (T*F) axis instead of two takes with a materialized intermediate.
        b, t_in, f_in, c = x.shape
        t_out, f_out = int(size[0]), int(size[1])
        ti = _nearest_axis_idx(t_in, t_out)
        fj = _nearest_axis_idx(f_in, f_out)
        flat_idx = (ti[:, None] * f_in + fj[None, :]).reshape(-1)
        out = jnp.take(x.reshape(b, t_in * f_in, c),
                       jnp.asarray(flat_idx), axis=1)
        return out.reshape(b, t_out, f_out, c)

    for axis in range(nd):
        in_sz = x.shape[1 + axis]
        out_sz = int(size[axis])
        if in_sz == out_sz:
            continue
        x = jnp.take(
            x, jnp.asarray(_nearest_axis_idx(in_sz, out_sz)), axis=1 + axis
        )
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _interp_nearest_cv(x: jax.Array, size) -> jax.Array:
    return _interp_nearest_fwd_impl(x, size)


def _interp_nearest_cv_fwd(x, size):
    return _interp_nearest_fwd_impl(x, size), x.shape


def _interp_nearest_cv_bwd(size, in_shape, g):
    # The autodiff adjoint of a gather is a scatter-add — catastrophically
    # slow on TPU (profiled at ~25% of an RTFS train step). The nearest
    # index map is separable and compile-time static, so the adjoint is a
    # per-axis matmul with the transposed one-hot gather matrix instead:
    # din[i] = sum_{o: idx(o)=i} dout[o].
    nd = g.ndim - 2
    for axis in range(nd):
        in_sz = int(in_shape[1 + axis])
        out_sz = g.shape[1 + axis]
        if in_sz == out_sz:
            continue
        r = _repeat_factor(in_sz, out_sz)
        if r is not None:
            # adjoint of repeat-by-r (+trailing trim): pad back to in*r,
            # fold (in, r), sum the r copies — no gather matrix needed
            pad = [(0, 0)] * g.ndim
            pad[1 + axis] = (0, in_sz * r - out_sz)
            gp = jnp.pad(g, pad)
            shp = list(gp.shape)
            shp[1 + axis:2 + axis] = [in_sz, r]
            g = gp.reshape(shp).sum(axis=2 + axis)
            continue
        idx = _nearest_axis_idx(in_sz, out_sz)
        m = np.zeros((out_sz, in_sz), dtype=np.float32)
        m[np.arange(out_sz), idx] = 1.0
        g = jnp.moveaxis(g, 1 + axis, -1)
        # 0/1 selection matrix: HIGHEST precision so f32 cotangents don't
        # get squeezed through the TPU's default bf16 matmul inputs.
        g = jnp.matmul(g, jnp.asarray(m, g.dtype),
                       precision=jax.lax.Precision.HIGHEST)
        g = jnp.moveaxis(g, -1, 1 + axis)
    return (g,)


_interp_nearest_cv.defvjp(_interp_nearest_cv_fwd, _interp_nearest_cv_bwd)


def interp_nearest(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """torch F.interpolate(mode="nearest") over the spatial dims.

    x: (B, *spatial, C); size: target spatial sizes (static). Forward is a
    (merged) static gather; backward is a scatter-free per-axis matmul
    (see ``_interp_nearest_cv_bwd``).
    """
    nd = x.ndim - 2
    assert len(size) == nd
    return _interp_nearest_cv(x, tuple(int(s) for s in size))


def _adaptive_pool_matrix(in_sz: int, out_sz: int) -> np.ndarray:
    """(out, in) averaging matrix with torch adaptive_avg_pool boundaries."""
    m = np.zeros((out_sz, in_sz), dtype=np.float32)
    for o in range(out_sz):
        start = (o * in_sz) // out_sz
        end = -((-(o + 1) * in_sz) // out_sz)  # ceil((o+1)*in/out)
        m[o, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x: jax.Array, size: Sequence[int]) -> jax.Array:
    """torch F.adaptive_avg_pool parity over spatial dims, channels-last.

    Static output sizes make the pooling a compile-time matrix product —
    this rides the MXU instead of torch's gather/segment kernels.
    """
    nd = x.ndim - 2
    assert len(size) == nd
    # einsum with the output order spelled out: the dot emits the pooled
    # axis in place, so no moveaxis transpose follows (the tensordot +
    # moveaxis form cost ~0.9 ms/step of layout copies in the r3 profile).
    if nd == 1:
        if x.shape[1] == int(size[0]):
            return x
        m = jnp.asarray(_adaptive_pool_matrix(x.shape[1], int(size[0])),
                        x.dtype)
        return jnp.einsum("ot,btc->boc", m, x)
    assert nd == 2
    t_in, f_in = x.shape[1], x.shape[2]
    t_out, f_out = int(size[0]), int(size[1])
    if t_in != t_out:
        mt = jnp.asarray(_adaptive_pool_matrix(t_in, t_out), x.dtype)
        x = jnp.einsum("ot,btfc->bofc", mt, x)
    if f_in != f_out:
        mf = jnp.asarray(_adaptive_pool_matrix(f_in, f_out), x.dtype)
        x = jnp.einsum("of,btfc->btoc", mf, x)
    return x


def unfold_1d(x: jax.Array, kernel: int, stride: int = 1) -> jax.Array:
    """torch nn.Unfold((k,1)) over the time axis, channels-last.

    x: (B, T, C) -> (B, T', k*C) where T' = (T - kernel)//stride + 1 and the
    feature axis is ordered [c0 k0, c0 k1, ...]? No: torch Unfold on
    (B, C, T, 1) yields channel-major ordering (C blocks of k). We keep
    (k, C) -> flattened [k major? ...] — see note below.

    torch's Unfold flattens as C*k with channel-major order: output channel
    index = c * k + j (c = channel, j = kernel tap). We produce exactly that
    ordering so downstream weights are interchangeable: result[..., c*k + j]
    = x[..., t*stride + j, c].
    """
    t = x.shape[-2]
    n = (t - kernel) // stride + 1
    taps = [x[..., j : j + n * stride : stride, :] for j in range(kernel)]
    stacked = jnp.stack(taps, axis=-1)  # (B, T', C, k)
    return stacked.reshape(*stacked.shape[:-2], -1)  # (B, T', C*k)
