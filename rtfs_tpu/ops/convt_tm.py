"""Time-major fused ConvTranspose1d + overlap-add for the DualPathRNN tail.

The reference DualPathRNN closes with ``ConvTranspose1d(2H, C, k, stride 1)``
(``src/models/layers/rnn_layers.py:129,153``) projecting the SRU window
stream back to the scan axis. Under XLA this lowers to a tap-looped conv
whose 8x window expansion round-trips HBM (profiled r5: 2.0 ms/step at
~330 GB/s effective across the 8 call sites of the bf16 bs-8 forward).

Algorithmically the op only needs to read h once and write out once: this
kernel consumes the SRU stack's NATIVE time-major ``(L, C_in, B)`` layout
(``ops.sru_fused.sru_stack_tpu`` output before its exit transpose) and
keeps the k-fold tap expansion entirely in VMEM:

  out[t] = sum_j 1[0 <= t-j < L] x[t-j] @ W[j] + b     (t in [0, L+k-1))

computed per output step as ONE MXU dot ``W_flat (C, k*C_in) @ window
(k*C_in, lanes)`` over a zero-padded VMEM copy of the block. The backward
is the mirrored stencil for dx plus a VMEM-accumulated dW, one batch-lane
tile per grid step (the whole L fits in VMEM at RTFS sizes: L <= ~256).

Weight layout matches ``models.layers.ConvTranspose``: ``(k, C_out, C_in)``
(no spatial flip stored). Stride 1, padding 0 only — exactly the
DualPathRNN geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sru_fused import _pad_to, _pick_lanes


def _fwd_kernel(k: int, x_ref, wf_ref, out_ref, xa_ref):
    length = x_ref.shape[0]
    t_out = out_ref.shape[0]
    xa_ref[: k - 1] = jnp.zeros_like(xa_ref[: k - 1])
    xa_ref[k - 1 + length :] = jnp.zeros_like(xa_ref[k - 1 + length :])
    xa_ref[k - 1 : k - 1 + length] = x_ref[:]
    wf = wf_ref[:]

    def body(t, carry):
        win = xa_ref[pl.ds(t, k)]  # (k, C_in, lanes)
        winf = win.reshape(k * win.shape[1], win.shape[2])
        acc = jax.lax.dot_general(
            wf, winf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[t] = acc.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, t_out, body, 0)


def _bwd_kernel(k: int, g_ref, w2_ref, x_ref, dx_ref, dw_ref, dwa_ref):
    length = dx_ref.shape[0]
    w2 = w2_ref[:]  # (C_in, k*C_out)
    dwa_ref[:] = jnp.zeros_like(dwa_ref)

    def body(l, carry):
        gwin = g_ref[pl.ds(l, k)]  # (k, C_out, lanes)
        gflat = gwin.reshape(k * gwin.shape[1], gwin.shape[2])
        dx = jax.lax.dot_general(
            w2, gflat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ref[l] = dx.astype(dx_ref.dtype)
        # dW[j, o, i] += g[l + j, o, :] . x[l, i, :]  (contract lanes)
        dwa_ref[:] += jax.lax.dot_general(
            gflat, x_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry

    jax.lax.fori_loop(0, length, body, 0)
    dw_ref[0] = dwa_ref[:]


def _xla_reference(x_tm, w, b):
    """Pure-XLA fallback (CPU / correctness oracle): same math, any backend."""
    x = x_tm.transpose(2, 0, 1)  # (B, L, C_in)
    from . import convops

    out = convops.conv_transpose(x, w, stride=1, padding=0, bias=b)
    return out.transpose(1, 2, 0)  # (T_out, C_out, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def convt1d_ola_tm(x_tm, w, interpret=False):
    """Fused ConvTranspose1d(stride 1) on a time-major ``(L, C_in, B)`` map.

    Bias (if any) is added by the caller at the XLA level — it fuses into
    the following transpose/residual and keeps the kernel + VJP minimal.

    Args:
      x_tm: (L, C_in, B) — the SRU stack's pre-exit-transpose layout.
      w: (k, C_out, C_in) ConvTranspose weight (``layers.ConvTranspose``).

    Returns:
      (L + k - 1, C_out, B) time-major.
    """
    return _fwd_impl(x_tm, w, interpret)


def _fwd_impl(x_tm, w, interpret):
    length, c_in, bsz = x_tm.shape
    k, c_out, _ = w.shape
    t_out = length + k - 1
    lanes = _pick_lanes(bsz, x_tm.dtype.itemsize)
    b_pad = -(-bsz // lanes) * lanes
    xp = _pad_to(x_tm, 2, b_pad)
    n_tiles = b_pad // lanes

    # W[j] applied at out offset +j; windowed over the left-padded buffer
    # the tap order reverses: wf[o, j*C_in + i] = W[k-1-j, o, i].
    wf = jnp.flip(w, 0).transpose(1, 0, 2).reshape(c_out, k * c_in)
    wf = wf.astype(x_tm.dtype)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((length, c_in, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wf.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_out, c_out, lanes), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_out, c_out, b_pad), x_tm.dtype),
        scratch_shapes=[
            pltpu.VMEM((length + 2 * (k - 1), c_in, lanes), x_tm.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wf)
    return out[:, :, :bsz]


def _vjp_fwd(x_tm, w, interpret):
    return _fwd_impl(x_tm, w, interpret), (x_tm, w)


def _vjp_bwd(interpret, residuals, g):
    x_tm, w = residuals
    length, c_in, bsz = x_tm.shape
    k, c_out, _ = w.shape
    t_out = length + k - 1
    lanes = _pick_lanes(bsz, x_tm.dtype.itemsize)
    b_pad = -(-bsz // lanes) * lanes
    xp = _pad_to(x_tm, 2, b_pad)
    gp = _pad_to(g.astype(x_tm.dtype), 2, b_pad)
    n_tiles = b_pad // lanes

    # dx[l] = sum_j W[j]^T @ g[l + j]: w2[i, j*C_out + o] = W[j, o, i].
    w2 = w.transpose(2, 0, 1).reshape(c_in, k * c_out).astype(x_tm.dtype)

    dx, dw_t = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((t_out, c_out, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((length, c_in, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((length, c_in, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * c_out, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, c_in, b_pad), x_tm.dtype),
            jax.ShapeDtypeStruct((n_tiles, k * c_out, c_in), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k * c_out, c_in), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(gp, w2, xp)

    dx = dx[:, :, :bsz]
    # dwa rows are (j, o)-major with gwin's flat order [g[l+0] .. g[l+k-1]]:
    # row j*C_out + o pairs g[l + j] with x[l] -> exactly dW[j, o, i].
    dw = jnp.sum(dw_t, axis=0).reshape(k, c_out, c_in).astype(w.dtype)
    return dx, dw


convt1d_ola_tm.defvjp(_vjp_fwd, _vjp_bwd)
