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
import os
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

    # Narrow-channel convs lower as tap-decomposed einsums: XLA's conv
    # emitter drives the MXU with C_out (or C_in) as the minor GEMM axis,
    # so a 256->2 decoder ConvT or 2->256 encoder conv uses 2 of 128
    # lanes (profiled at 169 / 452 GB/s vs the ~750 GB/s big-fusion
    # roofline on v5e). With stride 1 the same computation is one full-
    # width GEMM plus K cheap shifted slice-adds over the narrow side.
    if (
        groups == 1
        and all(s == 1 for s in stride)
        and any(k > 1 for k in kernel)
        and min(w.shape[-2], w.shape[-1]) <= _TAP_LOWER_MAX_CH
        and (
            "conv" in _TAP_LOWER_SITES
            # Small problems (bs=1 serving) always take the tap plan:
            # XLA's narrow-channel conv is iteration-bound there (the
            # 2->256 encoder conv profiled at 67 GB/s, 0.25 ms of a
            # 4.5 ms latency). At batch>=8 the plan is off by default —
            # it perturbed fusion choices net-negative (see
            # _TAP_LOWER_SITES above).
            or int(np.prod(x.shape[:-1])) <= _TAP_LOWER_SMALL_M
        )
    ):
        out = _conv_tap_einsum(x, w, pads, tuple(dilation))
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


_TAP_LOWER_MAX_CH = 16  # tap-decompose when either channel side is <= this
# Which call sites use the tap lowering. "convT" (the STFT decoder) is a
# pure win; enabling "conv" (STFT encoder 2->256) perturbed XLA's fusion
# choices inside the refinement block at bs 8 and lost more than it saved
# (r5 profile) — override via env for experiments.
_TAP_LOWER_SITES = tuple(
    s for s in os.environ.get("RTFS_TAP_LOWER", "convT").split(",") if s
)
_TAP_LOWER_SMALL_M = 65536  # batch*spatial below which "conv" always taps


def _conv_tap_einsum(x, w, pads, dilation):
    """Stride-1 dense conv as GEMM + K shifted adds, for narrow channels.

    x: (B, *spatial, Cin) already cast to w.dtype; w: (*k, Cin, Cout);
    pads: per-dim (lo, hi). Two symmetric plans, both touching the wide-
    channel tensor exactly once:

      Cout small:  z = x @ w.reshape(Cin, K*Cout)   (full-width GEMM)
                   y[t] = sum_k z[t + off_k, k-th Cout slice]
      Cin  small:  z[t] = concat_k x[t + off_k]     (narrow stack)
                   y = z @ w.reshape(K*Cin, Cout)   (full-width GEMM)

    The shifted reads run over the NARROW (K*Cnarrow-channel) tensor, so
    the K-fold re-read amplification costs K*narrow bytes, not K*wide.
    """
    nd = x.ndim - 2
    kernel = w.shape[:nd]
    cin, cout = w.shape[-2], w.shape[-1]
    taps = list(np.ndindex(*kernel))

    def shifted(z, tap, out_sizes):
        # z is padded along spatial dims; take the window starting at the
        # dilated tap offset with the output's spatial extent.
        starts = [d * t for d, t in zip(dilation, tap)]
        idx = (slice(None),) + tuple(
            slice(s, s + o) for s, o in zip(starts, out_sizes)
        ) + (slice(None),)
        return z[idx]

    pad_cfg = [(0, 0)] + [tuple(p) for p in pads] + [(0, 0)]
    out_sizes = [
        x.shape[1 + a] + sum(pads[a]) - dilation[a] * (kernel[a] - 1)
        for a in range(nd)
    ]

    if cout <= cin:
        # GEMM first: (B, *sp, Cin) @ (Cin, K*Cout), then overlap-add.
        z = jnp.einsum("b...i,io->b...o", x, w.reshape(-1, cin, cout)
                       .transpose(1, 0, 2).reshape(cin, len(taps) * cout))
        z = jnp.pad(z, pad_cfg)
        out = None
        for k, tap in enumerate(taps):
            part = shifted(z, tap, out_sizes)[..., k * cout:(k + 1) * cout]
            out = part if out is None else out + part
        return out
    # Stack first: (B, *sp, K*Cin) from shifted narrow reads, then GEMM.
    xp = jnp.pad(x, pad_cfg)
    stack = jnp.concatenate(
        [shifted(xp, tap, out_sizes) for tap in taps], axis=-1
    )
    return jnp.einsum(
        "b...i,io->b...o", stack, w.reshape(len(taps) * cin, cout)
    )


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

    # Stride-1 ConvTranspose == regular conv with the flipped kernel, so
    # the narrow-channel tap lowering applies (the STFT decoder's
    # 256 -> 2*n_src ConvT2d ran at 169 GB/s under XLA's conv emitter).
    if (
        "convT" in _TAP_LOWER_SITES
        and groups == 1
        and all(s == 1 for s in stride)
        and any(k > 1 for k in kernel)
        and min(w_flipped.shape[-2], w_flipped.shape[-1]) <= _TAP_LOWER_MAX_CH
        and all(p[0] >= 0 and p[1] >= 0 for p in pads)
        # f32 at large batch keeps XLA's lowering: the k*C_out f32
        # intermediate doubles and the plan measured +2.6 ms on the bs-8
        # f32 forward (r5 A/B), while bf16 and small problems win.
        and (x.dtype.itemsize <= 2
             or int(np.prod(x.shape[:-1])) <= _TAP_LOWER_SMALL_M)
    ):
        out = _conv_tap_einsum(x, w_flipped, pads, tuple(dilation))
        if bias is not None:
            out = out + bias
        return out

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
    plan = _shift_repeat_plan(in_sz, out_sz)
    return plan[0] if plan is not None and plan[1] == 0 else None


def _repeat_factor_plan(in_sz: int, out_sz: int):
    """(r, 0) for pure repeats, else None (forward-lowering plan)."""
    r = _repeat_factor(in_sz, out_sz)
    return (r, 0) if r is not None else None


@functools.lru_cache(maxsize=None)
def _shift_repeat_plan(in_sz: int, out_sz: int):
    """(r, a) if the torch-nearest index map equals
    ``clip((arange(out) - a) // r, 0, in - 1)``, else None.

    a == 0 is the pure repeat; a > 0 covers the RTFS "2n+1" upsamples
    ((125, 64) -> (251, 129): r=2, a=1) and the CAF video resize
    (50 -> 251: r=5, a=1), both of which are otherwise gathers — profiled
    r5 at 2.0 ms/step of gather-driven custom fusions in the bs-8 bf16
    forward. The shift-repeat form lowers to broadcast+reshape+slice
    (plus a one-dup-row concat at the SMALL resolution when a > 0), all
    of which XLA fuses into the consumer."""
    if out_sz <= in_sz:
        return None
    idx = _nearest_axis_idx(in_sz, out_sz)
    i = np.arange(out_sz)
    for r in range(2, 9):
        if r * in_sz + r - 1 < out_sz:
            continue
        for a in range(0, r):
            if out_sz > r * in_sz + a:
                continue
            if np.array_equal(idx, np.clip((i - a) // r, 0, in_sz - 1)):
                return (r, a)
    return None


def _apply_shift_repeat(x: jax.Array, axis: int, r: int, a: int,
                        out_sz: int) -> jax.Array:
    """Apply a (r, a) shift-repeat plan along spatial ``axis`` (absolute
    array axis). out[i] = x[clip((i - a)//r, 0, in-1)]."""
    if a > 0:
        first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        x = jnp.concatenate([first, x], axis=axis)
    shp = list(x.shape)
    bshape = shp[: axis + 1] + [r] + shp[axis + 1:]
    x = jnp.broadcast_to(jnp.expand_dims(x, axis + 1), bshape)
    shp[axis] = shp[axis] * r
    x = x.reshape(shp)
    start = (r - a) % r
    if start != 0 or shp[axis] != out_sz:
        x = jax.lax.slice_in_dim(x, start, start + out_sz, axis=axis)
    return x


def _interp_nearest_fwd_impl(x: jax.Array, size) -> jax.Array:
    nd = x.ndim - 2

    # Shift-repeat upsampling: broadcast+reshape+slice instead of a
    # gather. XLA fuses the repeat into consumers as a cheap producer
    # (the gather was a standalone kCustom fusion at ~330 GB/s).
    # Mixed plans (one gather axis + one repeat axis, e.g. the CAF's
    # video (T_v, 1) -> (T, F)) run the gather FIRST on the small tensor,
    # then the free repeats.
    # Only a == 0 (pure repeat) plans run in the forward: the a > 0
    # shift-repeat lowering was MEASURED SLOWER than the fused gather
    # (r5: XLA materializes the broadcast instead of fusing through the
    # dup-row concat + offset slice — 2.3 ms of standalone broadcasts vs
    # the 2.0 ms of gather fusions it replaced). The backward still uses
    # the (r, a) plan for its scatter-free fold-sum adjoint.
    reps = [
        None if x.shape[1 + a] == int(size[a])
        else _repeat_factor_plan(x.shape[1 + a], int(size[a]))
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
            r, sh = reps[a]
            x = _apply_shift_repeat(x, 1 + a, r, sh, int(size[a]))
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
        # a == 0 plans only: the a > 0 fold-sum adjoint was A/B-profiled
        # at +2.9 GB/step in the bf16 train step (the pad/fold chain on
        # the full-res cotangent materializes; the one-hot matmul form
        # stays inside the big backward fusions).
        plan = _repeat_factor_plan(in_sz, out_sz)
        if plan is not None:
            # adjoint of [repeat-r -> slice(0, out)]: pad the cotangent
            # back to the repeated extent, fold (rows, r), sum the r
            # copies — no gather matrix.
            r, a = plan
            rows = in_sz + (1 if a > 0 else 0)
            start = (r - a) % r
            pad = [(0, 0)] * g.ndim
            pad[1 + axis] = (start, rows * r - start - out_sz)
            gp = jnp.pad(g, pad)
            shp = list(gp.shape)
            shp[1 + axis:2 + axis] = [rows, r]
            g = gp.reshape(shp).sum(axis=2 + axis)
            if a > 0:
                head = jax.lax.slice_in_dim(g, 0, 2, axis=1 + axis).sum(
                    axis=1 + axis, keepdims=True
                )
                tail = jax.lax.slice_in_dim(g, 2, rows, axis=1 + axis)
                g = jnp.concatenate([head, tail], axis=1 + axis)
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
