"""Packed time-frequency layout: (B, T, F, C) stored as (B, T, F*C).

WHY: TPU arrays tile the minor dimension to 128 lanes. Every 64-channel
(hid_chan) full-resolution TF map in the RTFS block is therefore stored —
and DMA'd — 2x padded; the r3 profile put the train step at 85% of the
HBM roofline with lane padding as the dominant remaining byte tax
(docs/design.md §8). Folding the channel axis into the frequency axis,
``(B, T, F, C) -> (B, T, F*C)``, makes the minor dimension 128-aligned
(F*C = 129*64 = 8256 for the flagship) so XLA stores it unpadded.

The packed tensor is an ordinary XLA array: elementwise ops, residual
adds, PReLU/sigmoid and gLN (with lane-tiled affine params, see
``gln_packed``) run on it directly — already at half the HBM bytes. Only
ops that interpret the (F, C) structure need Pallas kernels:

- ``dw_conv_packed``   depthwise kT x kF conv: F-taps are 64-lane rolls
                       with boundary masks folded into the weight vectors,
                       T-taps are sublane shifts of a VMEM-resident slab.
- ``pw_proj_packed``   1x1 dense conv (B,T,F,Ci) -> packed (the RTFS
                       block's hid projection), per-F-block MXU dots.
- ``pw_unproj_packed`` 1x1 dense conv packed -> (B,T,F,Co) (the residual
                       projection back to the bottleneck width).
- ``spatial_down_packed`` / ``spatial_up_packed``  separable static
                       spatial maps: T side as a one-hot/averaging matrix
                       on the MXU, F side as a static F-block
                       select/combine — cover adaptive_avg_pool,
                       torch-nearest interpolation (both directions) and
                       stride-2 subsampling, each pair being the other's
                       transpose (so each is the other's VJP).

All kernels carry custom VJPs built from the same kernel set (a depthwise
conv's dx is a depthwise conv with flipped taps; a pointwise conv's dx is
the opposite-direction pointwise conv; the spatial maps transpose), plus
small weight-gradient accumulation kernels.

This is the Pallas-level completion of the r3 ``batch_fold`` attempt: the
fold removed the padding but XLA's fold/unfold reshapes cost ~10.7 ms of
retiling copies (docs/design.md §8). Here the packed layout survives
end-to-end across each full-resolution segment, entered/exited only
through kernels that read/write the packed form natively.

Semantics parity targets (verified in tests/test_packed_tf.py against
``convops``/``layers.Conv``): torch Conv2d depthwise with 'same'
(asymmetric) or integer padding; torch 1x1 Conv2d; torch
F.adaptive_avg_pool2d bucket boundaries; torch F.interpolate nearest.
Reference behavior: ``src/models/separators/tdanet.py:8-131`` (the RTFS
block these ops compose into).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Grid T-chunk for the depthwise kernels; 64 keeps the worst-case VMEM
# (slab + f32 accumulator + double-buffered out blocks) under ~9 MB.
_TT = 64

# XLA's default scoped-VMEM limit is 16 MB; the v5e has plenty more.
# The dw kernels' whole-sample double-buffered block + window temps need
# ~20 MB at flagship shapes (probed OK on chip).
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Layout helpers (XLA-side; used at world boundaries and in tests)
# ---------------------------------------------------------------------------


def pack_tf(x4: jax.Array) -> jax.Array:
    """(B, T, F, C) -> (B, T, F*C). A retiling copy under XLA: use only at
    packed-world boundaries that no kernel covers."""
    b, t, f, c = x4.shape
    return x4.reshape(b, t, f * c)


def unpack_tf(xp: jax.Array, f: int, c: int) -> jax.Array:
    """(B, T, F*C) -> (B, T, F, C)."""
    b, t, n = xp.shape
    assert n == f * c, (n, f, c)
    return xp.reshape(b, t, f, c)


def gln_packed(xp, gamma, beta, *, F: int, eps: float = 1e-5):
    """GlobalLayerNorm on a packed map — plain XLA, unpadded traffic.

    Statistics over (T, F*C) per batch row are identical to gLN's
    (T, F, C) statistics; the per-channel affine is lane-tiled F times.
    Single-pass sibling E[x]/E[x^2] reductions (see layers.GlobalLayerNorm
    for the numerics note)."""
    gamma_p = jnp.tile(gamma.reshape(-1), F)
    beta_p = jnp.tile(beta.reshape(-1), F)
    xf = xp.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    sq = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    norm = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(xp.dtype)
    return norm * gamma_p + beta_p


def _lane_roll(x, shift: int):
    """Circular lane shift along the minor axis; wrapped lanes must be
    zero-masked by the caller (the dw weight vectors carry the masks).

    Shifts are compile-time static, so this lowers as slice+concat
    (pltpu.roll emits tpu.dynamic_rotate, which Mosaic does not implement
    for non-32-bit data — bf16 operands failed to compile)."""
    n = x.shape[-1]
    shift = shift % n
    if shift == 0:
        return x
    return jnp.concatenate([x[..., n - shift:], x[..., :n - shift]],
                           axis=-1)


# ---------------------------------------------------------------------------
# Depthwise conv, packed -> packed
# ---------------------------------------------------------------------------
#
# out[t, f*C + c] = bias[c] + sum_{dt, df} w[dt, df, c]
#                   * x[t + dt - pt_lo, (f + df - pf_lo)*C + c]
# F-taps: the whole packed row shifted by (df - pf_lo)*C lanes; out-of-range
# f positions get a zero in the weight vector, so the circular wraparound
# of the roll is harmless. T-taps: sublane-shifted slices of a zero-framed
# VMEM slab holding the entire sample (copied once per batch row).


def _dw_wvecs(w, F_in, F_out, pf_lo, dtype):
    """(kT*kF, F_out*C) weight vectors with F-boundary masks folded in."""
    kt, kf, c = w.shape
    f = np.arange(F_out)
    vecs = []
    for dt in range(kt):
        for df in range(kf):
            delta = df - pf_lo
            mask = ((f + delta >= 0) & (f + delta < F_in)).astype(np.float32)
            vecs.append(jnp.reshape(
                w[dt, df][None, :] * jnp.asarray(mask)[:, None], (-1,)
            ))
    return jnp.stack(vecs).astype(dtype)


def _window_plan(n_chunks, tt, kt, pt_lo, t_in):
    """Static per-chunk plan for assembling the (tt+kt-1)-row T-window.

    For out rows [j*tt, (j+1)*tt) the taps read x rows
    [j*tt - pt_lo, j*tt - pt_lo + tt + kt - 1); rows outside [0, t_in)
    are zeros. Returns, per j: (zero_head, src_start, copy_len) — all
    static, so every chunk is a fixed slice + fixed zero fills."""
    win = tt + kt - 1
    plan = []
    for j in range(n_chunks):
        lo = j * tt - pt_lo
        hi = lo + win
        src_start = max(lo, 0)
        src_end = min(hi, t_in)
        plan.append((src_start - lo, src_start, max(src_end - src_start, 0)))
    return plan


def _window_fill(wbuf, x_ref, j, plan, n_in):
    """Write the j-th T-window into wbuf via statically unrolled chunks.

    wbuf may be wider than the sample (n_out > n_in); the extra lanes and
    the T-halo rows are zeroed once per chunk."""
    win = wbuf.shape[0]
    for jj, (zero_head, src_start, copy_len) in enumerate(plan):
        @pl.when(j == jj)
        def _(zero_head=zero_head, src_start=src_start, copy_len=copy_len):
            if zero_head or copy_len < win - zero_head or \
                    n_in < wbuf.shape[1]:
                wbuf[:, :] = jnp.zeros_like(wbuf[:, :])
            if copy_len:
                wbuf[zero_head:zero_head + copy_len, :n_in] = (
                    x_ref[0, src_start:src_start + copy_len, :]
                )


def _make_dw_kernel(kt, kf, pf_lo, pt_lo, t_in, n_in, n_out, c, tt,
                    n_chunks):
    """Fwd depthwise kernel: whole sample as a (re-used) VMEM block, the
    per-chunk T-window assembled with static slices; F-taps are lane
    shifts with boundary masks folded into the weight vectors."""
    plan = _window_plan(n_chunks, tt, kt, pt_lo, t_in)

    def kernel(x_ref, wvec_ref, bvec_ref, o_ref, wbuf):
        j = pl.program_id(1)
        _window_fill(wbuf, x_ref, j, plan, n_in)
        window = wbuf[:, :]
        acc = jnp.zeros((tt, n_out), jnp.float32)
        for df in range(kf):
            shift = (df - pf_lo) * c
            # keep the rolled window in the input dtype — an f32 copy per
            # F-tap kept ~4 x 2.2 MB live and blew the 16 MB scoped VMEM
            # at model scale; the per-FMA f32 cast below is transient
            shifted = _lane_roll(window, -shift)[:, :n_out]
            for dt in range(kt):
                wv = wvec_ref[dt * kf + df, :].astype(jnp.float32)
                acc = acc + wv[None, :] * shifted[dt:dt + tt, :].astype(
                    jnp.float32
                )
        acc = acc + bvec_ref[0, :].astype(jnp.float32)[None, :]
        o_ref[0] = acc.astype(o_ref.dtype)

    return kernel


_TT_DW = 32  # dw kernels carry an f32 accumulator + window buffer


def _dw_conv_fwd_impl(xp, wvecs, bvec, *, kt, kf, pf_lo, pt_lo, t_out,
                      n_out, c, interpret=False):
    b, t_in, n_in = xp.shape
    tt = min(_TT_DW, t_out)
    n_chunks = _cdiv(t_out, tt)
    kernel = _make_dw_kernel(kt, kf, pf_lo, pt_lo, t_in, n_in, n_out, c,
                             tt, n_chunks)
    return pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            # whole sample per b; constant-in-j index map so Pallas keeps
            # (not re-fetches) the block across the T chunks
            pl.BlockSpec((1, t_in, n_in), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt * kf, n_out), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, n_out), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_out, n_out), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((tt + kt - 1, max(n_in, n_out)), xp.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(xp, wvecs, bvec)


def _dw_masks(F_in, F_out, kf, pf_lo, c):
    """(kF, F_out*C) lane-validity masks (1 where the F-tap is in range)."""
    f = np.arange(F_out)
    rows = []
    for df in range(kf):
        delta = df - pf_lo
        m = ((f + delta >= 0) & (f + delta < F_in)).astype(np.float32)
        rows.append(np.repeat(m, c))
    return np.stack(rows)


def _make_dw_wgrad_kernel(kt, kf, pf_lo, pt_lo, t_in, n_in, n_out,
                          c, tt, n_valid_out, n_chunks):
    plan = _window_plan(n_chunks, tt, kt, pt_lo, t_in)

    def kernel(x_ref, g_ref, mask_ref, acc_ref, wbuf):
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((b == 0) & (j == 0))
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref[:, :])

        _window_fill(wbuf, x_ref, j, plan, n_in)
        window = wbuf[:, :]
        row0 = j * tt
        # mask out the grid's ragged-T overhang: rows >= t_out contribute 0
        g = g_ref[0].astype(jnp.float32)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0) + row0
        g = jnp.where(row_ids < n_valid_out, g, 0.0)
        for df in range(kf):
            shift = (df - pf_lo) * c
            shifted = _lane_roll(window, -shift)[:, :n_out]
            mvec = mask_ref[df, :].astype(jnp.float32)[None, :]
            for dt in range(kt):
                tap = dt * kf + df
                prod = g * shifted[dt:dt + tt, :].astype(jnp.float32) * mvec
                acc_ref[tap, :] += jnp.sum(prod, axis=0)

    return kernel


def _dw_conv_wgrad_impl(xp, g, *, kt, kf, pf_lo, pt_lo, c,
                        interpret=False):
    b, t_in, n_in = xp.shape
    _, t_out, n_out = g.shape
    tt = min(_TT_DW, t_out)
    n_chunks = _cdiv(t_out, tt)
    kernel = _make_dw_wgrad_kernel(kt, kf, pf_lo, pt_lo, t_in,
                                   n_in, n_out, c, tt, t_out, n_chunks)
    f_out = n_out // c
    f_in = n_in // c
    masks = jnp.asarray(_dw_masks(f_in, f_out, kf, pf_lo, c), xp.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, t_in, n_in), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, n_out), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kf, n_out), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kt * kf, n_out), lambda b, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kt * kf, n_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tt + kt - 1, max(n_in, n_out)), xp.dtype),
        ],
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(xp, g, masks)
    return out


def _dw_geometry(t_in, f_in, kt, kf, pads_t, pads_f):
    t_out = t_in + pads_t[0] + pads_t[1] - kt + 1
    f_out = f_in + pads_f[0] + pads_f[1] - kf + 1
    return t_out, f_out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8)
)
def dw_conv_packed(xp, w, bias, F_in, C, pads_t, pads_f, kt_kf,
                   interpret=False):
    """Depthwise conv on packed (B, T, F*C); stride 1, static padding.

    Args:
      xp: (B, T_in, F_in*C) packed map.
      w: (kT, kF, C) depthwise taps (torch weight (C,1,kT,kF) transposed).
      bias: (C,) or None.
      pads_t/pads_f: (lo, hi) pairs (torch 'same' = (1, 2) for k=4).
    Returns packed (B, T_out, F_out*C) with torch Conv2d output sizes.
    """
    return _dw_conv_fwd(xp, w, bias, F_in, C, pads_t, pads_f, kt_kf,
                        interpret)[0]


def _dw_conv_fwd(xp, w, bias, F_in, C, pads_t, pads_f, kt_kf, interpret):
    kt, kf = kt_kf
    t_in = xp.shape[1]
    t_out, f_out = _dw_geometry(t_in, F_in, kt, kf, pads_t, pads_f)
    n_out = f_out * C
    wvecs = _dw_wvecs(w, F_in, f_out, pads_f[0], xp.dtype)
    bv = bias if bias is not None else jnp.zeros((C,), xp.dtype)
    bvec = jnp.tile(bv.astype(xp.dtype).reshape(-1), f_out).reshape(1, n_out)
    out = _dw_conv_fwd_impl(
        xp, wvecs, bvec, kt=kt, kf=kf, pf_lo=pads_f[0], pt_lo=pads_t[0],
        t_out=t_out, n_out=n_out, c=C, interpret=interpret,
    )
    return out, (xp, w, bias is not None)


def _dw_conv_bwd(F_in, C, pads_t, pads_f, kt_kf, interpret, res, g):
    xp, w, has_bias = res
    kt, kf = kt_kf
    t_in = xp.shape[1]
    t_out, f_out = _dw_geometry(t_in, F_in, kt, kf, pads_t, pads_f)

    # dx: full correlation = depthwise conv of g with taps flipped and
    # complementary padding (k-1-lo, k-1-hi), mapping (T_out,F_out) back
    # to (T_in, F_in).
    wflip = jnp.flip(w, axis=(0, 1))
    bpt = (kt - 1 - pads_t[0], kt - 1 - pads_t[1])
    bpf = (kf - 1 - pads_f[0], kf - 1 - pads_f[1])
    wvecs = _dw_wvecs(wflip, f_out, F_in, bpf[0], g.dtype)
    zb = jnp.zeros((C,), g.dtype).reshape(1, -1)
    dx = _dw_conv_fwd_impl(
        g, wvecs, jnp.tile(zb, (1, F_in)), kt=kt, kf=kf, pf_lo=bpf[0],
        pt_lo=bpt[0], t_out=t_in, n_out=F_in * C, c=C, interpret=interpret,
    )

    # dw: per-tap lane accumulation, folded over F outside the kernel.
    acc = _dw_conv_wgrad_impl(
        xp, g, kt=kt, kf=kf, pf_lo=pads_f[0], pt_lo=pads_t[0], c=C,
        interpret=interpret,
    )  # (kt*kf, F_out*C) f32
    dw = acc.reshape(kt, kf, f_out, C).sum(axis=2).astype(w.dtype)

    db = None
    if has_bias:
        db = g.astype(jnp.float32).sum(axis=(0, 1)).reshape(
            f_out, C
        ).sum(axis=0).astype(w.dtype)
    return dx, dw, db


dw_conv_packed.defvjp(_dw_conv_fwd, _dw_conv_bwd)


# ---------------------------------------------------------------------------
# Pointwise (1x1) dense convs: rank-4 <-> packed
# ---------------------------------------------------------------------------


def _make_pw_proj_kernel(f, ci, co, tt):
    # Statically unrolled F loop: Mosaic rejects dynamic (loop-carried)
    # sublane/lane indices ("cannot statically prove index is a multiple
    # of 8"), but static per-f reads and one concatenated row write
    # compile cleanly (probed on v5e).
    def kernel(x_ref, w_ref, bvec_ref, o_ref):
        w = w_ref[:, :]
        ys = []
        for fi in range(f):
            xs = x_ref[0, :, fi, :]  # (tt, ci)
            ys.append(jax.lax.dot_general(
                xs, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        row = jnp.concatenate(ys, axis=1)
        row = row + bvec_ref[0, :].astype(jnp.float32)[None, :]
        o_ref[0] = row.astype(o_ref.dtype)

    return kernel


def _pw_proj_impl(x4, w, bvec, interpret=False):
    b, t, f, ci = x4.shape
    co = w.shape[1]
    tt = min(_TT, t)
    grid = (b, _cdiv(t, tt))
    return pl.pallas_call(
        _make_pw_proj_kernel(f, ci, co, tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, f, ci), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f * co), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, f * co), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f * co), x4.dtype),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x4, w, bvec)


def _make_pw_unproj_kernel(f, ci, co, tt):
    def kernel(xp_ref, w_ref, b_ref, o_ref):
        w = w_ref[:, :]
        row = xp_ref[0]  # (tt, f*ci); static value slices per f
        bias = b_ref[0, :].astype(jnp.float32)
        for fi in range(f):
            xs = row[:, fi * ci:(fi + 1) * ci]
            y = jax.lax.dot_general(
                xs, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, fi, :] = (y + bias).astype(o_ref.dtype)

    return kernel


def _pw_unproj_impl(xp, w, b1, f, interpret=False):
    b, t, n = xp.shape
    ci = n // f
    co = w.shape[1]
    tt = min(_TT, t)
    grid = (b, _cdiv(t, tt))
    return pl.pallas_call(
        _make_pw_unproj_kernel(f, ci, co, tt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, n), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, f, co), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, f, co), xp.dtype),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(xp, w, b1)


def _make_pw_wgrad_kernel(f, ca, cb, tt, t_valid):
    # acc (ca, cb) += sum_f a4[:, f, :]^T @ bp[:, f*cb:(f+1)*cb]
    def kernel(a_ref, bp_ref, acc_ref):
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((b == 0) & (j == 0))
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref[:, :])

        row0 = j * tt
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0) + row0
        # where(), not multiply: the grid's ragged-T padding rows can hold
        # garbage (NaN), and NaN * 0 = NaN
        valid = row_ids < t_valid

        # mask BOTH operands: garbage rows appear in whichever input the
        # ragged grid padded
        grow = jnp.where(valid, bp_ref[0].astype(jnp.float32), 0.0)
        acc = jnp.zeros_like(acc_ref[:, :])
        for fi in range(f):
            a = jnp.where(valid, a_ref[0, :, fi, :].astype(jnp.float32),
                          0.0)
            g = grow[:, fi * cb:(fi + 1) * cb]
            acc = acc + jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:, :] += acc

    return kernel


def _pw_wgrad_impl(a4, bp, interpret=False):
    b, t, f, ca = a4.shape
    cb = bp.shape[2] // f
    tt = min(_TT, t)
    grid = (b, _cdiv(t, tt))
    return pl.pallas_call(
        _make_pw_wgrad_kernel(f, ca, cb, tt, t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, f, ca), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, f * cb), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ca, cb), lambda b, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ca, cb), jnp.float32),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(a4, bp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pw_proj_packed(x4, w, bias, interpret=False):
    """1x1 dense conv (B,T,F,Ci) @ (Ci,Co) -> packed (B,T,F*Co)."""
    return _pw_proj_fwd(x4, w, bias, interpret)[0]


def _pw_proj_fwd(x4, w, bias, interpret):
    f = x4.shape[2]
    co = w.shape[1]
    bv = bias if bias is not None else jnp.zeros((co,), x4.dtype)
    bvec = jnp.tile(bv.astype(x4.dtype).reshape(-1), f).reshape(1, f * co)
    out = _pw_proj_impl(x4, w.astype(x4.dtype), bvec, interpret)
    return out, (x4, w, bias is not None)


def _pw_proj_bwd(interpret, res, g):
    x4, w, has_bias = res
    f = x4.shape[2]
    # dx: packed cotangent -> rank-4 via the opposite-direction kernel
    dx = _pw_unproj_impl(
        g, jnp.transpose(w).astype(g.dtype),
        jnp.zeros((1, w.shape[0]), g.dtype), f, interpret,
    )
    dw = _pw_wgrad_impl(x4, g, interpret).astype(w.dtype)
    db = None
    if has_bias:
        co = w.shape[1]
        db = g.astype(jnp.float32).sum(axis=(0, 1)).reshape(f, co).sum(
            axis=0
        ).astype(w.dtype)
    return dx, dw, db


pw_proj_packed.defvjp(_pw_proj_fwd, _pw_proj_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pw_unproj_packed(xp, w, bias, F, interpret=False):
    """1x1 dense conv packed (B,T,F*Ci) @ (Ci,Co) -> (B,T,F,Co)."""
    return _pw_unproj_fwd(xp, w, bias, F, interpret)[0]


def _pw_unproj_fwd(xp, w, bias, F, interpret):
    co = w.shape[1]
    bv = bias if bias is not None else jnp.zeros((co,), xp.dtype)
    out = _pw_unproj_impl(
        xp, w.astype(xp.dtype), bv.astype(xp.dtype).reshape(1, co), F,
        interpret,
    )
    return out, (xp, w, bias is not None)


def _pw_unproj_bwd(F, interpret, res, g):
    xp, w, has_bias = res
    f = F
    ci = xp.shape[2] // f
    co = w.shape[1]
    bvec = jnp.zeros((1, f * ci), g.dtype)
    dx = _pw_proj_impl(g, jnp.transpose(w).astype(g.dtype), bvec, interpret)
    # dw[i, o] = sum x_packed[.., f*ci+i] g4[.., f, o]
    dwT = _pw_wgrad_impl(g, xp, interpret)  # (co, ci)
    dw = jnp.transpose(dwT).astype(w.dtype)
    db = None
    if has_bias:
        db = g.astype(jnp.float32).sum(axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


pw_unproj_packed.defvjp(_pw_unproj_fwd, _pw_unproj_bwd)


# ---------------------------------------------------------------------------
# Separable static spatial maps: packed <-> rank-4 (pooled)
# ---------------------------------------------------------------------------
#
# down:  y[b, t2, f2, c] = sum_t M[t2, t] * sum_i fw[f2][i] * x[b, t, fs[f2][i]*C + c]
# up:    y[b, t, f*C + c] = fw[f] * sum_t2 M[t, t2]^T ... (nnz-1 F side)
# These cover adaptive_avg_pool (M = averaging matrix, F buckets),
# torch-nearest resize in both directions, and stride-2 spatial
# subsampling (M = row selector, F-block selector). Each direction is the
# other's linear transpose, which is exactly its VJP.


def _make_spatial_down_kernel(f2n, c, fs, fw):
    # fs/fw are static Python maps, baked into the (unrolled) kernel:
    # Mosaic rejects dynamic sublane/lane indices, and static slices at
    # C-multiples compile cleanly (probed on v5e).
    def kernel(xp_ref, m_ref, o_ref):
        m = m_ref[:, :]
        row = xp_ref[0]  # (t, n)
        for f2 in range(f2n):
            col = None
            for i in range(fs.shape[1]):
                wgt = float(fw[f2, i])
                if wgt == 0.0:
                    continue
                src = int(fs[f2, i])
                sl = row[:, src * c:(src + 1) * c].astype(jnp.float32)
                col = wgt * sl if col is None else col + wgt * sl
            y = jax.lax.dot_general(
                m, col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, f2, :] = y.astype(o_ref.dtype)

    return kernel


def _spatial_down_impl(xp, m, fs, fw, f2n, c, interpret=False):
    # The rank-4 side is f32: Mosaic crashes on bf16 rank-4 VMEM blocks
    # whose minor dim is < 128 lanes (v5e, probed) — sliced reads AND
    # writes. Pooled tensors are small, so the boundary convert is cheap.
    b, t, n = xp.shape
    m = np.asarray(m, np.float32)
    fs = np.asarray(fs, np.int32)
    fw = np.asarray(fw, np.float32)
    t2 = m.shape[0]
    return pl.pallas_call(
        _make_spatial_down_kernel(f2n, c, fs, fw),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t2, t), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t2, f2n, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t2, f2n, c), jnp.float32),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(xp, jnp.asarray(m))


def _make_spatial_up_kernel(fn, c, fs, fw):
    def kernel(x4_ref, m_ref, o_ref):
        m = m_ref[:, :]
        ys = []
        for f in range(fn):
            src = int(fs[f, 0])
            col = x4_ref[0, :, src, :].astype(jnp.float32)  # (t2, c)
            y = jax.lax.dot_general(
                m, col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * float(fw[f, 0])
            ys.append(y)
        o_ref[0] = jnp.concatenate(ys, axis=1).astype(o_ref.dtype)

    return kernel


def _spatial_up_impl(x4, m, fs, fw, fn, interpret=False,
                     out_dtype=None):
    # rank-4 side f32 (see _spatial_down_impl); packed output in the
    # caller's working dtype.
    out_dtype = out_dtype or x4.dtype
    x4 = x4.astype(jnp.float32)
    b, t2, f2n, c = x4.shape
    m = np.asarray(m, np.float32)
    fs = np.asarray(fs, np.int32)
    fw = np.asarray(fw, np.float32)
    t = m.shape[0]
    return pl.pallas_call(
        _make_spatial_up_kernel(fn, c, fs, fw),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t2, f2n, c), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, t2), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, fn * c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, fn * c), out_dtype),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x4, jnp.asarray(m))


def _transpose_fmap(fs, fw, f_in_n):
    """Transpose a (F2 -> many F) map into (F -> one F2) and vice versa."""
    nnz_rows = [[] for _ in range(f_in_n)]
    for f2 in range(fs.shape[0]):
        for i in range(fs.shape[1]):
            w = float(fw[f2, i])
            if w != 0.0:
                nnz_rows[int(fs[f2, i])].append((f2, w))
    nnz = max(1, max(len(r) for r in nnz_rows))
    tfs = np.zeros((f_in_n, nnz), np.int32)
    tfw = np.zeros((f_in_n, nnz), np.float32)
    for f, row in enumerate(nnz_rows):
        for i, (f2, w) in enumerate(row):
            tfs[f, i] = f2
            tfw[f, i] = w
    return tfs, tfw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def spatial_down_packed(xp, m, fs, fw, f2n, c, interpret=False):
    """Packed (B,T,F*C) -> rank-4 (B,T2,F2,C) via static separable map.

    m: (T2, T) numpy matrix (tuple-of-tuples for hashability); fs/fw:
    (F2, nnz) int/float tuples — out block f2 = sum_i fw[f2,i] *
    in block fs[f2,i].
    """
    return _spatial_down_impl(xp, m, fs, fw, f2n, c, interpret).astype(
        xp.dtype
    )


def _spatial_down_fwd(xp, m, fs, fw, f2n, c, interpret):
    out = _spatial_down_impl(xp, m, fs, fw, f2n, c, interpret)
    return out.astype(xp.dtype), xp.shape


def _spatial_down_bwd(m, fs, fw, f2n, c, interpret, in_shape, g):
    f_in_n = in_shape[2] // c
    mT = np.asarray(m, np.float32).T
    tfs, tfw = _transpose_fmap(
        np.asarray(fs, np.int32), np.asarray(fw, np.float32), f_in_n
    )
    if tfs.shape[1] == 1:
        dx = _spatial_up_impl(g, mT, tfs, tfw, f_in_n, interpret)
    else:
        # multi-source transpose rows: sum of single-source passes
        dx = None
        for i in range(tfs.shape[1]):
            part = _spatial_up_impl(
                g, mT, tfs[:, i:i + 1], tfw[:, i:i + 1], f_in_n, interpret,
            )
            dx = part if dx is None else dx + part
    return (dx.astype(g.dtype),)


spatial_down_packed.defvjp(_spatial_down_fwd, _spatial_down_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def spatial_up_packed(x4, m, fs, fw, fn, interpret=False):
    """Rank-4 (B,T2,F2,C) -> packed (B,T,F*C) via static separable map.

    m: (T, T2); fs/fw: (F, 1) — out block f = fw[f] * in block fs[f].
    """
    return _spatial_up_impl(x4, m, fs, fw, fn, interpret)


def _spatial_up_fwd(x4, m, fs, fw, fn, interpret):
    out = _spatial_up_impl(x4, m, fs, fw, fn, interpret)
    return out, x4.shape


def _spatial_up_bwd(m, fs, fw, fn, interpret, in_shape, g):
    f2n, c = in_shape[2], in_shape[3]
    mT = np.asarray(m, np.float32).T
    tfs, tfw = _transpose_fmap(
        np.asarray(fs, np.int32), np.asarray(fw, np.float32), f2n
    )
    # transpose of an up map scatters many f into each f2: that IS the
    # down kernel's gather form
    dx = _spatial_down_impl(g, mT, tfs, tfw, f2n, c, interpret)
    return (dx.astype(g.dtype),)


spatial_up_packed.defvjp(_spatial_up_fwd, _spatial_up_bwd)


# ---------------------------------------------------------------------------
# Static map builders (numpy, trace-time)
# ---------------------------------------------------------------------------


def nearest_up_maps(t_in: int, t_out: int, f_in: int, f_out: int):
    """torch F.interpolate(nearest) as (M_T, fs, fw) for spatial_up."""
    from . import convops

    ti = convops._nearest_axis_idx(t_in, t_out)
    m = np.zeros((t_out, t_in), np.float32)
    m[np.arange(t_out), ti] = 1.0
    fj = convops._nearest_axis_idx(f_in, f_out)
    fs = fj.reshape(-1, 1).astype(np.int32)
    fw = np.ones((f_out, 1), np.float32)
    return m, fs, fw


def adaptive_pool_maps(t_in: int, t_out: int, f_in: int, f_out: int):
    """torch adaptive_avg_pool2d as (M_T, fs, fw) for spatial_down."""
    from . import convops

    m = convops._adaptive_pool_matrix(t_in, t_out)
    buckets = []
    for o in range(f_out):
        start = (o * f_in) // f_out
        end = -((-(o + 1) * f_in) // f_out)
        buckets.append([(i, 1.0 / (end - start)) for i in range(start, end)])
    nnz = max(len(b) for b in buckets)
    fs = np.zeros((f_out, nnz), np.int32)
    fw = np.zeros((f_out, nnz), np.float32)
    for o, b in enumerate(buckets):
        for i, (src, w) in enumerate(b):
            fs[o, i] = src
            fw[o, i] = w
    return m, fs, fw


def stride2_select_maps(t_conv: int, t_out: int, f_conv: int, f_out: int):
    """Row/block selectors turning a stride-1 conv output into the
    stride-2 conv output (out[i] = conv_s1[2 i])."""
    m = np.zeros((t_out, t_conv), np.float32)
    m[np.arange(t_out), 2 * np.arange(t_out)] = 1.0
    fs = (2 * np.arange(f_out)).reshape(-1, 1).astype(np.int32)
    fw = np.ones((f_out, 1), np.float32)
    return m, fs, fw


def _hashable(a):
    """numpy array -> nested tuples (for custom_vjp nondiff args)."""
    return tuple(map(tuple, np.asarray(a)))


# ---------------------------------------------------------------------------
# Model integration: PackedTF carrier + activation context
# ---------------------------------------------------------------------------
#
# The model layers (models/layers.py Conv / GlobalLayerNorm, the
# InjectionMultiSum fusion cell and TDANetBlock) dispatch on these types:
# a PackedTF flowing through a module means "this tensor is a packed
# (B, T, F*C) full-resolution map — use the packed kernels"; a PackRequest
# wraps a rank-4 tensor handed to a 1x1 projection that should EMIT a
# packed map (the packed world's entry point). Parameters are unchanged —
# packing is a pure computation-layout choice, like AVNet.batch_fold.

import contextlib
import threading

_PACKED_STATE = threading.local()


@contextlib.contextmanager
def packed_scope(on: bool):
    """Enable the packed-TF layout for module applications in scope."""
    old = getattr(_PACKED_STATE, "on", False)
    _PACKED_STATE.on = bool(on)
    try:
        yield
    finally:
        _PACKED_STATE.on = old


def packed_enabled() -> bool:
    return getattr(_PACKED_STATE, "on", False)


def use_interpret() -> bool:
    """Pallas interpret mode off the TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


@jax.tree_util.register_pytree_node_class
class PackedTF:
    """A (B, T, F*C) packed map carrying its logical (F, C) split.

    Presents the LOGICAL rank-4 view through .shape/.ndim so shape-driven
    module code (spatial-size comparisons) works unchanged; elementwise
    arithmetic with other PackedTF of the same geometry is overloaded.
    """

    __slots__ = ("data", "f", "c")

    def __init__(self, data, f, c):
        self.data = data
        self.f = int(f)
        self.c = int(c)

    @property
    def shape(self):
        b, t, n = self.data.shape
        return (b, t, self.f, self.c)

    @property
    def ndim(self):
        return 4

    @property
    def dtype(self):
        return self.data.dtype

    def astype(self, dtype):
        return PackedTF(self.data.astype(dtype), self.f, self.c)

    def unpack(self):
        return unpack_tf(self.data, self.f, self.c)

    def _binop(self, other, op):
        if isinstance(other, PackedTF):
            assert (other.f, other.c) == (self.f, self.c)
            other = other.data
        return PackedTF(op(self.data, other), self.f, self.c)

    def __add__(self, other):
        return self._binop(other, lambda a, b: a + b)

    __radd__ = __add__

    def __mul__(self, other):
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __sub__(self, other):
        return self._binop(other, lambda a, b: a - b)

    def tree_flatten(self):
        return (self.data,), (self.f, self.c)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


class PackRequest:
    """Marker: rank-4 input to a 1x1 projection that should emit packed."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim


def spatial_up_to(x4, t_out: int, f_out: int) -> PackedTF:
    """torch-nearest upsample of a rank-4 pooled map into a packed map."""
    b, t2, f2, c = x4.shape
    m, fs, fw = nearest_up_maps(t2, t_out, f2, f_out)
    out = spatial_up_packed(x4, _hashable(m), _hashable(fs), _hashable(fw),
                            f_out, use_interpret())
    return PackedTF(out, f_out, c)


def adaptive_pool_from(xp: PackedTF, t_out: int, f_out: int):
    """torch adaptive_avg_pool2d of a packed map -> rank-4 pooled map."""
    b, t, f, c = xp.shape
    m, fs, fw = adaptive_pool_maps(t, t_out, f, f_out)
    return spatial_down_packed(
        xp.data, _hashable(m), _hashable(fs), _hashable(fw), f_out, c,
        use_interpret(),
    )


def dw_stride2_from(xp_conv: PackedTF, t_out: int, f_out: int):
    """Select the stride-2 conv output from a stride-1 packed conv
    (out[i] = conv_s1[2 i] when both pad by dilation*(k-1)//2)."""
    b, t_conv, f_conv, c = xp_conv.shape
    m, fs, fw = stride2_select_maps(t_conv, t_out, f_conv, f_out)
    return spatial_down_packed(
        xp_conv.data, _hashable(m), _hashable(fs), _hashable(fw), f_out, c,
        use_interpret(),
    )
