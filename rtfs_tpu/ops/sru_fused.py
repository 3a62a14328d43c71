"""Fully-fused bidirectional SRU stack kernels (projection + recurrence).

Second-generation Pallas kernels for the RTFS DualPathRNN SRU stack
(semantics: ``rtfs_tpu.ops.sru``; reference ``src/models/layers/
rnn_layers.py:99-105``). The first-generation kernel
(``sru_pallas.sru_recurrence``) fuses only the elementwise recurrence; the
layer around it still pays, per layer and direction, an XLA matmul that
writes U (3-4x the activation size) to HBM, two ``jnp.flip``s for the
reverse direction, and (B,L,C) <-> (L,C,B) transposes. At RTFS sizes those
HBM round-trips dominate the step.

This module removes all of them:

- ONE ``pallas_call`` per layer handles BOTH directions. The reverse
  direction is realised with reversed BlockSpec index maps (the rev stream
  reads time chunk J-1-j at grid step j) — no flipped copies exist.
- For hidden layers (k == 3: input dim == dirs*H) the input projection
  ``U = x @ W`` runs INSIDE the kernel as per-timestep MXU dots on
  VMEM-resident tiles; U never exists in HBM. The backward pass recomputes
  U the same way (FLOPs are free here — the kernel is VPU/latency bound).
- Layers chain in time-major ``(L, H, B)`` layout as (h_fwd, h_rev) array
  pairs; the only layout changes are one transpose at stack entry and one
  at exit.
- BPTT: the forward kernel checkpoints the cell state c (needed to
  recompute the gates) plus the per-chunk entry carries; the backward
  kernel mirrors the index maps (fwd-direction gradient walks chunks
  reversed, rev-direction gradient walks them forward) and accumulates
  dW / dv / db in VMEM scratch, flushed on each stream's last chunk.

Zero padding (time to a multiple of the chunk, batch to the lane width) is
safe in both directions: padded U rows are exactly zero (x padding is zero
and the projection is linear), so c stays 0 through padded steps and
gradient contributions from padded dh rows vanish.

Layouts inside kernels: time is the leading (grid-blocked) axis, channels
on sublanes, the folded batch on the lane axis. The block lane width
widens with the folded batch (``_pick_lanes``: 512 lanes bf16 / 256 f32) —
batch-lane grid tiles execute sequentially on the single TensorCore, so
wider blocks shorten the serial chain; time chunks shrink adaptively
(``_pick_chunk``) to keep the backward kernels inside the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
T_CHUNK = 32
_VMEM_BUDGET = 11 << 20  # leave headroom under the 16 MB scoped-vmem limit


def _pick_chunk(row_bytes: int) -> int:
    """Largest time-chunk (power of two, 8..T_CHUNK) whose double-buffered
    block traffic fits the VMEM budget. ``row_bytes`` = total bytes all
    in/out blocks contribute per timestep row."""
    tc = T_CHUNK
    while tc > 8 and row_bytes * tc * 2 > _VMEM_BUDGET:
        tc //= 2
    return tc


def _pad_to(x, axis, size):
    if x.shape[axis] == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pads)


def _pick_lanes(bsz: int, itemsize: int) -> int:
    """Block lane width: batch-lane tiles run sequentially on the one
    TensorCore, so wider blocks shorten the serial grid ~linearly until
    the layer-0 backward kernel's VMEM blocks stop fitting (at 8-step
    time chunks: 512 lanes bf16 / 256 lanes f32 for RTFS sizes)."""
    cap = 512 if itemsize <= 2 else 256
    lanes = LANE
    while lanes < cap and bsz > lanes:
        lanes *= 2
    return lanes


def _round_up(n, m):
    return max(m, -(-n // m) * m)


def _vb_pack(v, b, lanes=LANE):
    """(dirs, 2, H) v and b -> (dirs*4, H, lanes) lane-replicated constants.

    Row blocks per direction: [v_f, v_r, b_f, b_r].
    """
    dirs = v.shape[0]
    vb = jnp.concatenate([v, b], axis=1)  # (dirs, 4, H)
    vb = vb.reshape(dirs * 4, v.shape[-1])
    return jnp.broadcast_to(vb[:, :, None], (*vb.shape, lanes))


# ---------------------------------------------------------------------------
# Layer-0 kernel: recurrence only (U precomputed by the XLA windowed conv),
# k == 4 (highway row block lives in U), both directions fused.
# ---------------------------------------------------------------------------


def _lay0_fwd_kernel(uf_ref, ur_ref, vb_ref,
                     hf_ref, hr_ref, cf_ref, cr_ref, cbf_ref, cbr_ref,
                     carry_f, carry_r):
    """Grid (batch_tiles, time_chunks); rev streams use reversed chunk maps.

    uf_ref/ur_ref: (Tc, 4H, B) per-direction U [x_tilde, f, r, highway].
    h*/c*: (Tc, H, B) outputs; cb*: (1, H, B) carry at chunk ENTRY.
    """
    t_chunk, gh, b = uf_ref.shape
    h = gh // 4

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_f[...] = jnp.zeros((h, b), carry_f.dtype)
        carry_r[...] = jnp.zeros((h, b), carry_r.dtype)

    cbf_ref[0] = carry_f[...].astype(cbf_ref.dtype)
    cbr_ref[0] = carry_r[...].astype(cbr_ref.dtype)

    v_ff, v_rf, b_ff, b_rf = vb_ref[0], vb_ref[1], vb_ref[2], vb_ref[3]
    v_fr, v_rr, b_fr, b_rr = vb_ref[4], vb_ref[5], vb_ref[6], vb_ref[7]

    def gates(u_t, c_prev, v_f, v_r, b_f, b_r):
        u0 = u_t[0:h]
        u1 = u_t[h:2 * h]
        u2 = u_t[2 * h:3 * h]
        xhw = u_t[3 * h:4 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        c = f * c_prev + (1.0 - f) * u0
        r = jax.nn.sigmoid(u2 + v_r * c + b_r)
        h_t = r * c + (1.0 - r) * xhw
        return c, h_t

    def step(i, carry):
        c_f, c_r = carry
        # forward direction: local time i of chunk j
        c_f, h_f = gates(uf_ref[i], c_f, v_ff, v_rf, b_ff, b_rf)
        cf_ref[i] = c_f.astype(cf_ref.dtype)
        hf_ref[i] = h_f.astype(hf_ref.dtype)
        # reverse direction: local time Tc-1-i of chunk J-1-j
        t_r = t_chunk - 1 - i
        c_r, h_r = gates(ur_ref[t_r], c_r, v_fr, v_rr, b_fr, b_rr)
        cr_ref[t_r] = c_r.astype(cr_ref.dtype)
        hr_ref[t_r] = h_r.astype(hr_ref.dtype)
        return c_f, c_r

    carry_f[...], carry_r[...] = jax.lax.fori_loop(
        0, t_chunk, step, (carry_f[...], carry_r[...])
    )


def _lay0_bwd_kernel(uf_ref, ur_ref, vb_ref, cf_ref, cr_ref,
                     cbf_ref, cbr_ref, dhf_ref, dhr_ref,
                     duf_ref, dur_ref, dvb_ref,
                     dcf_carry, dcr_carry, dvb_acc):
    """Mirror of the forward: fwd-direction gradient walks chunks reversed
    (grid step j -> time chunk J-1-j, t descending), rev-direction walks
    them forward (chunk j, t ascending). All math in f32.
    """
    t_chunk, gh, b = duf_ref.shape
    h = gh // 4

    @pl.when(pl.program_id(1) == 0)
    def _():
        dcf_carry[...] = jnp.zeros((h, b), dcf_carry.dtype)
        dcr_carry[...] = jnp.zeros((h, b), dcr_carry.dtype)
        dvb_acc[...] = jnp.zeros((8, h, b), dvb_acc.dtype)

    def bstep(u_t, c_prev, c_t, dh, dc_next, v_f, v_r, b_f, b_r):
        u0 = u_t[0:h]
        u1 = u_t[h:2 * h]
        u2 = u_t[2 * h:3 * h]
        xhw = u_t[3 * h:4 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        r = jax.nn.sigmoid(u2 + v_r * c_t + b_r)
        dr = dh * (c_t - xhw)
        dm = dr * r * (1.0 - r)
        dc = dh * r + dm * v_r + dc_next
        df = dc * (c_prev - u0)
        da = df * f * (1.0 - f)
        du = jnp.concatenate(
            [dc * (1.0 - f), da, dm, dh * (1.0 - r)], axis=0
        )
        dc_prev = dc * f + da * v_f
        return du, dc_prev, (da * c_prev, dm * c_t, da, dm)

    v_ff = vb_ref[0].astype(jnp.float32)
    v_rf = vb_ref[1].astype(jnp.float32)
    b_ff = vb_ref[2].astype(jnp.float32)
    b_rf = vb_ref[3].astype(jnp.float32)
    v_fr = vb_ref[4].astype(jnp.float32)
    v_rr = vb_ref[5].astype(jnp.float32)
    b_fr = vb_ref[6].astype(jnp.float32)
    b_rr = vb_ref[7].astype(jnp.float32)

    def step(i, carry):
        dc_f, dc_r, acc = carry
        # fwd direction, t descending within chunk J-1-j
        t = t_chunk - 1 - i
        c_prev = jnp.where(
            t > 0,
            cf_ref[jnp.maximum(t - 1, 0)].astype(jnp.float32),
            cbf_ref[0].astype(jnp.float32),
        )
        du, dc_f, (dvf, dvr, dbf, dbr) = bstep(
            uf_ref[t].astype(jnp.float32), c_prev,
            cf_ref[t].astype(jnp.float32), dhf_ref[t].astype(jnp.float32),
            dc_f, v_ff, v_rf, b_ff, b_rf,
        )
        duf_ref[t] = du.astype(duf_ref.dtype)
        # rev direction, t ascending within chunk j; its "previous" cell in
        # scan order is c at time t+1 (chunk-top boundary = entry carry)
        t2 = i
        c_prev_r = jnp.where(
            t2 < t_chunk - 1,
            cr_ref[jnp.minimum(t2 + 1, t_chunk - 1)].astype(jnp.float32),
            cbr_ref[0].astype(jnp.float32),
        )
        du_r, dc_r, (dvf2, dvr2, dbf2, dbr2) = bstep(
            ur_ref[t2].astype(jnp.float32), c_prev_r,
            cr_ref[t2].astype(jnp.float32), dhr_ref[t2].astype(jnp.float32),
            dc_r, v_fr, v_rr, b_fr, b_rr,
        )
        dur_ref[t2] = du_r.astype(dur_ref.dtype)
        acc = (acc[0] + dvf, acc[1] + dvr, acc[2] + dbf, acc[3] + dbr,
               acc[4] + dvf2, acc[5] + dvr2, acc[6] + dbf2, acc[7] + dbr2)
        return dc_f, dc_r, acc

    init_acc = tuple(dvb_acc[k] for k in range(8))
    dc_f, dc_r, acc = jax.lax.fori_loop(
        0, t_chunk, step, (dcf_carry[...], dcr_carry[...], init_acc)
    )
    dcf_carry[...] = dc_f
    dcr_carry[...] = dc_r
    for k in range(8):
        dvb_acc[k] = acc[k]

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dvb_ref[...] = dvb_acc[...].astype(dvb_ref.dtype)


def _lay0_prep(u_f, u_r):
    t_len, gh, bsz = u_f.shape
    hdim = gh // 4
    lanes = _pick_lanes(bsz, u_f.dtype.itemsize)
    # Chunk sized for the HEAVIER (backward) kernel so fwd/bwd agree on the
    # c / cb chunk layout: per t-row, bwd touches u_f+u_r (8H) + c (2H) +
    # dh (2H) in and du (8H) out = 20H channel-rows.
    tc = _pick_chunk(20 * hdim * lanes * u_f.dtype.itemsize)
    b_pad = _round_up(bsz, lanes)
    t_pad = _round_up(t_len, tc)
    u_fp = _pad_to(_pad_to(u_f, 2, b_pad), 0, t_pad)
    u_rp = _pad_to(_pad_to(u_r, 2, b_pad), 0, t_pad)
    return u_fp, u_rp, hdim, b_pad, t_pad, tc, lanes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sru_dual_recurrence(u_f, u_r, vb, interpret=False):
    """Both directions of one k==4 SRU layer in one kernel.

    Args:
      u_f, u_r: (T, 4H, B) per-direction gate pre-activations
        [x_tilde, f, r, highway] (time-major; u_r is NOT pre-flipped — the
        kernel scans it back-to-front).
      vb: (dirs*4, H, LANE) packed recurrence constants (``_vb_pack``).

    Returns:
      (h_f, h_r): (T, H, B) each.
    """
    h_f, h_r, *_ = _lay0_fwd_impl(u_f, u_r, vb, interpret)
    return h_f, h_r


def _lay0_fwd_impl(u_f, u_r, vb, interpret):
    t_len, gh, bsz = u_f.shape
    u_fp, u_rp, hdim, b_pad, t_pad, tc, lanes = _lay0_prep(u_f, u_r)
    n_tiles, n_chunks = b_pad // lanes, t_pad // tc

    def fwd_t(i, j):
        return (j, 0, i)

    def rev_t(i, j):
        return (n_chunks - 1 - j, 0, i)

    def cb_fwd(i, j):
        return (j, 0, i)

    def cb_rev(i, j):
        return (n_chunks - 1 - j, 0, i)

    blk = lambda c: pl.BlockSpec((tc, c, lanes), fwd_t,
                                 memory_space=pltpu.VMEM)
    blk_r = lambda c: pl.BlockSpec((tc, c, lanes), rev_t,
                                   memory_space=pltpu.VMEM)
    out = lambda c: jax.ShapeDtypeStruct((t_pad, c, b_pad), u_f.dtype)
    cb_shape = jax.ShapeDtypeStruct((n_chunks, hdim, b_pad), u_f.dtype)

    h_f, h_r, c_f, c_r, cb_f, cb_r = pl.pallas_call(
        _lay0_fwd_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            blk(gh),
            blk_r(gh),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk(hdim), blk_r(hdim), blk(hdim), blk_r(hdim),
            pl.BlockSpec((1, hdim, lanes), cb_fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim, lanes), cb_rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[out(hdim), out(hdim), out(hdim), out(hdim),
                   cb_shape, cb_shape],
        scratch_shapes=[pltpu.VMEM((hdim, lanes), jnp.float32),
                        pltpu.VMEM((hdim, lanes), jnp.float32)],
        interpret=interpret,
    )(u_fp, u_rp, vb)
    return (h_f[:t_len, :, :bsz], h_r[:t_len, :, :bsz],
            c_f, c_r, cb_f, cb_r)


def _lay0_vjp_fwd(u_f, u_r, vb, interpret):
    h_f, h_r, c_f, c_r, cb_f, cb_r = _lay0_fwd_impl(u_f, u_r, vb, interpret)
    return (h_f, h_r), (u_f, u_r, vb, c_f, c_r, cb_f, cb_r)


def _lay0_vjp_bwd(interpret, residuals, cot):
    dh_f, dh_r = cot
    u_f, u_r, vb, c_f, c_r, cb_f, cb_r = residuals
    t_len, gh, bsz = u_f.shape
    u_fp, u_rp, hdim, b_pad, t_pad, tc, lanes = _lay0_prep(u_f, u_r)
    dh_fp = _pad_to(_pad_to(dh_f, 2, b_pad), 0, t_pad)
    dh_rp = _pad_to(_pad_to(dh_r, 2, b_pad), 0, t_pad)
    n_tiles, n_chunks = b_pad // lanes, t_pad // tc

    def fwd_t(i, j):
        return (j, 0, i)

    def rev_t(i, j):
        return (n_chunks - 1 - j, 0, i)

    blk = lambda c, m: pl.BlockSpec((tc, c, lanes), m,
                                    memory_space=pltpu.VMEM)
    cb_blk = lambda m: pl.BlockSpec((1, hdim, lanes), m,
                                    memory_space=pltpu.VMEM)
    out = lambda c: jax.ShapeDtypeStruct((t_pad, c, b_pad), u_f.dtype)

    du_f, du_r, dvb = pl.pallas_call(
        _lay0_bwd_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            blk(gh, rev_t), blk(gh, fwd_t),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(hdim, rev_t), blk(hdim, fwd_t),
            cb_blk(rev_t), cb_blk(fwd_t),
            blk(hdim, rev_t), blk(hdim, fwd_t),
        ],
        out_specs=[
            blk(gh, rev_t), blk(gh, fwd_t),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out(gh), out(gh),
                   jax.ShapeDtypeStruct((8, hdim, b_pad), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((hdim, lanes), jnp.float32),
                        pltpu.VMEM((hdim, lanes), jnp.float32),
                        pltpu.VMEM((8, hdim, lanes), jnp.float32)],
        interpret=interpret,
    )(u_fp, u_rp, vb, c_f, c_r, cb_f, cb_r, dh_fp, dh_rp)

    # vb reached the kernel lane-replicated (``_vb_pack`` broadcast_to);
    # returning the full sum in lane 0 only keeps the upstream
    # broadcast-AD sum-over-lanes exact.
    dvb_sum = jnp.sum(dvb[..., :bsz], axis=-1)  # (8, H)
    dvb_full = jnp.pad(
        dvb_sum[:, :, None], ((0, 0), (0, 0), (0, lanes - 1))
    ).astype(vb.dtype)
    return (du_f[:t_len, :, :bsz], du_r[:t_len, :, :bsz], dvb_full)


sru_dual_recurrence.defvjp(_lay0_vjp_fwd, _lay0_vjp_bwd)


# ---------------------------------------------------------------------------
# Hidden-layer kernel: projection + recurrence, k == 3 (highway = input
# slice), both directions fused. Input/output are (h_fwd, h_rev) pairs in
# (T, H, B) layout, so layers chain with zero layout changes.
# ---------------------------------------------------------------------------


def _hid_fwd_kernel(xfj_ref, xrj_ref, xfr_ref, xrr_ref, wt_ref, vb_ref,
                    hf_ref, hr_ref, cf_ref, cr_ref, cbf_ref, cbr_ref,
                    carry_f, carry_r):
    """xfj/xrj: prev-layer (h_f, h_r) at chunk j (feeds the fwd direction);
    xfr/xrr: the same arrays at chunk J-1-j (feeds the rev direction).
    wt_ref: (dirs*3H, 2H) pre-transposed projection weight, dir-major rows.
    """
    t_chunk, h, b = xfj_ref.shape
    dt = jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_f[...] = jnp.zeros((h, b), carry_f.dtype)
        carry_r[...] = jnp.zeros((h, b), carry_r.dtype)

    cbf_ref[0] = carry_f[...].astype(cbf_ref.dtype)
    cbr_ref[0] = carry_r[...].astype(cbr_ref.dtype)

    wt_f = wt_ref[0:3 * h]
    wt_r = wt_ref[3 * h:6 * h]
    v_ff, v_rf, b_ff, b_rf = (vb_ref[k].astype(dt) for k in range(4))
    v_fr, v_rr, b_fr, b_rr = (vb_ref[k].astype(dt) for k in range(4, 8))

    def gates(u_t, xhw, c_prev, v_f, v_r, b_f, b_r):
        u0 = u_t[0:h]
        u1 = u_t[h:2 * h]
        u2 = u_t[2 * h:3 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        c = f * c_prev + (1.0 - f) * u0
        r = jax.nn.sigmoid(u2 + v_r * c + b_r)
        h_t = r * c + (1.0 - r) * xhw
        return c, h_t

    def step(i, carry):
        c_f, c_r = carry
        x_t = jnp.concatenate([xfj_ref[i], xrj_ref[i]], axis=0)
        u_t = jax.lax.dot(wt_f, x_t,
                          preferred_element_type=dt)
        c_f, h_f = gates(u_t, xfj_ref[i].astype(dt), c_f,
                         v_ff, v_rf, b_ff, b_rf)
        cf_ref[i] = c_f.astype(cf_ref.dtype)
        hf_ref[i] = h_f.astype(hf_ref.dtype)

        t_r = t_chunk - 1 - i
        x_tr = jnp.concatenate([xfr_ref[t_r], xrr_ref[t_r]], axis=0)
        u_tr = jax.lax.dot(wt_r, x_tr,
                           preferred_element_type=dt)
        c_r, h_r = gates(u_tr, xrr_ref[t_r].astype(dt), c_r,
                         v_fr, v_rr, b_fr, b_rr)
        cr_ref[t_r] = c_r.astype(cr_ref.dtype)
        hr_ref[t_r] = h_r.astype(hr_ref.dtype)
        return c_f, c_r

    carry_f[...], carry_r[...] = jax.lax.fori_loop(
        0, t_chunk, step, (carry_f[...], carry_r[...])
    )


def _hid_bwd_kernel(xfj_ref, xrj_ref, xfr_ref, xrr_ref, wt_ref,
                    wf_ref, wr_ref,
                    vb_ref, cf_ref, cr_ref, cbf_ref, cbr_ref,
                    dhf_ref, dhr_ref,
                    dxa_ref, dxb_ref, dwf_ref, dwr_ref, dvb_ref,
                    dcf_carry, dcr_carry, dwf_acc, dwr_acc, dvb_acc):
    """fwd-direction gradient: chunk J-1-j, t descending (x refs with the
    rev map: xfr/xrr here point at chunk J-1-j). rev-direction gradient:
    chunk j, t ascending (xfj/xrj). dxa collects the fwd-direction's input
    gradient (written at chunk J-1-j); dxb the rev-direction's (chunk j);
    the caller adds them. dW accumulates in scratch, flushed on the last
    grid step.
    """
    t_chunk, h, b = xfj_ref.shape
    dt = jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _():
        dcf_carry[...] = jnp.zeros((h, b), dt)
        dcr_carry[...] = jnp.zeros((h, b), dt)
        dwf_acc[...] = jnp.zeros((2 * h, 3 * h), dt)
        dwr_acc[...] = jnp.zeros((2 * h, 3 * h), dt)
        dvb_acc[...] = jnp.zeros((8, h, b), dt)

    wt_f = wt_ref[0:3 * h]
    wt_r = wt_ref[3 * h:6 * h]
    w_f = wf_ref[...]
    w_r = wr_ref[...]
    v_ff, v_rf, b_ff, b_rf = (vb_ref[k].astype(dt) for k in range(4))
    v_fr, v_rr, b_fr, b_rr = (vb_ref[k].astype(dt) for k in range(4, 8))

    def bstep(u_t, xhw, c_prev, c_t, dh, dc_next, v_f, v_r, b_f, b_r):
        u0 = u_t[0:h]
        u1 = u_t[h:2 * h]
        u2 = u_t[2 * h:3 * h]
        f = jax.nn.sigmoid(u1 + v_f * c_prev + b_f)
        r = jax.nn.sigmoid(u2 + v_r * c_t + b_r)
        dr = dh * (c_t - xhw)
        dm = dr * r * (1.0 - r)
        dc = dh * r + dm * v_r + dc_next
        df = dc * (c_prev - u0)
        da = df * f * (1.0 - f)
        du = jnp.concatenate([dc * (1.0 - f), da, dm], axis=0)
        dxhw = dh * (1.0 - r)
        dc_prev = dc * f + da * v_f
        return du, dxhw, dc_prev, (da * c_prev, dm * c_t, da, dm)

    def step(i, carry):
        dc_f, dc_r, dw_fa, dw_ra, acc = carry
        # ---- fwd direction, chunk J-1-j, t descending ----
        t = t_chunk - 1 - i
        x_t = jnp.concatenate([xfr_ref[t], xrr_ref[t]], axis=0)
        u_t = jax.lax.dot(wt_f, x_t, preferred_element_type=dt)
        c_prev = jax.lax.select(
            t > 0,
            cf_ref[jnp.maximum(t - 1, 0)].astype(dt),
            cbf_ref[0].astype(dt),
        )
        du, dxhw, dc_f, dvbs1 = bstep(
            u_t, xfr_ref[t].astype(dt), c_prev, cf_ref[t].astype(dt),
            dhf_ref[t].astype(dt), dc_f, v_ff, v_rf, b_ff, b_rf,
        )
        dx = jax.lax.dot(w_f.astype(dt), du, preferred_element_type=dt)
        dx = jnp.concatenate([dx[0:h] + dxhw, dx[h:2 * h]], axis=0)
        dxa_ref[t] = dx.astype(dxa_ref.dtype)
        dw_fa = dw_fa + jax.lax.dot_general(
            x_t.astype(dt), du,
            (((1,), (1,)), ((), ())), preferred_element_type=dt,
        )
        # ---- rev direction, chunk j, t ascending ----
        t2 = i
        x_t2 = jnp.concatenate([xfj_ref[t2], xrj_ref[t2]], axis=0)
        u_t2 = jax.lax.dot(wt_r, x_t2, preferred_element_type=dt)
        c_prev_r = jax.lax.select(
            t2 < t_chunk - 1,
            cr_ref[jnp.minimum(t2 + 1, t_chunk - 1)].astype(dt),
            cbr_ref[0].astype(dt),
        )
        du2, dxhw2, dc_r, dvbs2 = bstep(
            u_t2, xrj_ref[t2].astype(dt), c_prev_r, cr_ref[t2].astype(dt),
            dhr_ref[t2].astype(dt), dc_r, v_fr, v_rr, b_fr, b_rr,
        )
        dx2 = jax.lax.dot(w_r.astype(dt), du2, preferred_element_type=dt)
        dx2 = jnp.concatenate([dx2[0:h], dx2[h:2 * h] + dxhw2], axis=0)
        dxb_ref[t2] = dx2.astype(dxb_ref.dtype)
        dw_ra = dw_ra + jax.lax.dot_general(
            x_t2.astype(dt), du2,
            (((1,), (1,)), ((), ())), preferred_element_type=dt,
        )
        acc = tuple(a + g for a, g in zip(acc, dvbs1 + dvbs2))
        return dc_f, dc_r, dw_fa, dw_ra, acc

    init_acc = tuple(dvb_acc[k] for k in range(8))
    dc_f, dc_r, dw_fa, dw_ra, acc = jax.lax.fori_loop(
        0, t_chunk, step,
        (dcf_carry[...], dcr_carry[...],
         dwf_acc[...], dwr_acc[...], init_acc),
    )
    dcf_carry[...] = dc_f
    dcr_carry[...] = dc_r
    dwf_acc[...] = dw_fa
    dwr_acc[...] = dw_ra
    for k in range(8):
        dvb_acc[k] = acc[k]

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dwf_ref[0] = dwf_acc[...].astype(dwf_ref.dtype)
        dwr_ref[0] = dwr_acc[...].astype(dwr_ref.dtype)
        dvb_ref[...] = dvb_acc[...].astype(dvb_ref.dtype)


def _hid_prep(x_f, x_r):
    t_len, hdim, bsz = x_f.shape
    lanes = _pick_lanes(bsz, x_f.dtype.itemsize)
    # bwd-dominant per-row traffic: x (4H in) + c (2H) + dh (2H) + dx (4H).
    tc = _pick_chunk(12 * hdim * lanes * x_f.dtype.itemsize)
    b_pad = _round_up(bsz, lanes)
    t_pad = _round_up(t_len, tc)
    x_fp = _pad_to(_pad_to(x_f, 2, b_pad), 0, t_pad)
    x_rp = _pad_to(_pad_to(x_r, 2, b_pad), 0, t_pad)
    return x_fp, x_rp, hdim, b_pad, t_pad, tc, lanes


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sru_hidden_layer(x_f, x_r, wt, vb, interpret=False):
    """One full hidden SRU layer (projection + both directions).

    Args:
      x_f, x_r: (T, H, B) previous layer's per-direction outputs.
      wt: (dirs*3H, 2H) transposed projection weight (dir-major rows, each
        direction's rows ordered [x_tilde, f, r] x H).
      vb: (dirs*4, H, LANE) packed recurrence constants.

    Returns:
      (h_f, h_r): (T, H, B).
    """
    h_f, h_r, *_ = _hid_fwd_impl(x_f, x_r, wt, vb, interpret)
    return h_f, h_r


def _hid_fwd_impl(x_f, x_r, wt, vb, interpret):
    t_len, hdim, bsz = x_f.shape
    x_fp, x_rp, hdim, b_pad, t_pad, tc, lanes = _hid_prep(x_f, x_r)
    n_tiles, n_chunks = b_pad // lanes, t_pad // tc

    def fwd_t(i, j):
        return (j, 0, i)

    def rev_t(i, j):
        return (n_chunks - 1 - j, 0, i)

    blk = lambda m: pl.BlockSpec((tc, hdim, lanes), m,
                                 memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((t_pad, hdim, b_pad), x_f.dtype)
    cb_shape = jax.ShapeDtypeStruct((n_chunks, hdim, b_pad), x_f.dtype)

    h_f, h_r, c_f, c_r, cb_f, cb_r = pl.pallas_call(
        _hid_fwd_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            blk(fwd_t), blk(fwd_t), blk(rev_t), blk(rev_t),
            pl.BlockSpec(wt.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk(fwd_t), blk(rev_t), blk(fwd_t), blk(rev_t),
            pl.BlockSpec((1, hdim, lanes), fwd_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim, lanes), rev_t, memory_space=pltpu.VMEM),
        ],
        out_shape=[out, out, out, out, cb_shape, cb_shape],
        scratch_shapes=[pltpu.VMEM((hdim, lanes), jnp.float32),
                        pltpu.VMEM((hdim, lanes), jnp.float32)],
        interpret=interpret,
    )(x_fp, x_rp, x_fp, x_rp, wt, vb)
    return (h_f[:t_len, :, :bsz], h_r[:t_len, :, :bsz],
            c_f, c_r, cb_f, cb_r)


def _hid_vjp_fwd(x_f, x_r, wt, vb, interpret):
    h_f, h_r, c_f, c_r, cb_f, cb_r = _hid_fwd_impl(x_f, x_r, wt, vb,
                                                   interpret)
    return (h_f, h_r), (x_f, x_r, wt, vb, c_f, c_r, cb_f, cb_r)


def _hid_vjp_bwd(interpret, residuals, cot):
    dh_f, dh_r = cot
    x_f, x_r, wt, vb, c_f, c_r, cb_f, cb_r = residuals
    t_len, hdim, bsz = x_f.shape
    x_fp, x_rp, hdim, b_pad, t_pad, tc, lanes = _hid_prep(x_f, x_r)
    dh_fp = _pad_to(_pad_to(dh_f, 2, b_pad), 0, t_pad)
    dh_rp = _pad_to(_pad_to(dh_r, 2, b_pad), 0, t_pad)
    n_tiles, n_chunks = b_pad // lanes, t_pad // tc
    w_f = wt[0:3 * hdim].T  # (2H, 3H) per-direction natural-layout weights
    w_r = wt[3 * hdim:].T

    def fwd_t(i, j):
        return (j, 0, i)

    def rev_t(i, j):
        return (n_chunks - 1 - j, 0, i)

    blk = lambda m: pl.BlockSpec((tc, hdim, lanes), m,
                                 memory_space=pltpu.VMEM)
    blk2 = lambda m: pl.BlockSpec((tc, 2 * hdim, lanes), m,
                                  memory_space=pltpu.VMEM)
    cb_blk = lambda m: pl.BlockSpec((1, hdim, lanes), m,
                                    memory_space=pltpu.VMEM)
    out2 = jax.ShapeDtypeStruct((t_pad, 2 * hdim, b_pad), x_f.dtype)

    dxa, dxb, dwf, dwr, dvb = pl.pallas_call(
        _hid_bwd_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            blk(fwd_t), blk(fwd_t), blk(rev_t), blk(rev_t),
            pl.BlockSpec(wt.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_r.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk(rev_t), blk(fwd_t),
            cb_blk(rev_t), cb_blk(fwd_t),
            blk(rev_t), blk(fwd_t),
        ],
        out_specs=[
            blk2(rev_t), blk2(fwd_t),
            pl.BlockSpec((1, 2 * hdim, 3 * hdim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * hdim, 3 * hdim), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hdim, lanes), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out2, out2,
            jax.ShapeDtypeStruct((n_tiles, 2 * hdim, 3 * hdim),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 2 * hdim, 3 * hdim),
                                 jnp.float32),
            jax.ShapeDtypeStruct((8, hdim, b_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hdim, lanes), jnp.float32),
            pltpu.VMEM((hdim, lanes), jnp.float32),
            pltpu.VMEM((2 * hdim, 3 * hdim), jnp.float32),
            pltpu.VMEM((2 * hdim, 3 * hdim), jnp.float32),
            pltpu.VMEM((8, hdim, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(x_fp, x_rp, x_fp, x_rp, wt, w_f, w_r, vb, c_f, c_r, cb_f, cb_r,
      dh_fp, dh_rp)

    dx = (dxa + dxb)[:t_len, :, :bsz]
    dx_f, dx_r = dx[:, :hdim], dx[:, hdim:]
    # dW per direction: (2H, 3H) summed over batch tiles; wt rows are
    # dir-major so dwt = [dW_f^T; dW_r^T].
    dwt = jnp.concatenate(
        [jnp.sum(dwf, axis=0).T, jnp.sum(dwr, axis=0).T], axis=0
    ).astype(wt.dtype)  # (6H, 2H)
    # lane-0 trick: see _lay0_vjp_bwd.
    dvb_sum = jnp.sum(dvb[..., :bsz], axis=-1)
    dvb_full = jnp.pad(
        dvb_sum[:, :, None], ((0, 0), (0, 0), (0, lanes - 1))
    ).astype(vb.dtype)
    return dx_f, dx_r, dwt, dvb_full


sru_hidden_layer.defvjp(_hid_vjp_fwd, _hid_vjp_bwd)


# ---------------------------------------------------------------------------
# Stack driver: windowed conv layer 0 + fused hidden layers.
# ---------------------------------------------------------------------------


def sru_stack_tpu(x, weights, weight_cs, biases, hidden, window=None,
                  interpret=False, time_major=False):
    """Full multi-layer bidirectional SRU on the fused dual-direction path.

    Args:
      x: (B, L, D) raw input (if ``window`` is set, the un-unfolded
        sequence; layer 0's projection runs as a 1D conv).
      weights / weight_cs / biases: per-layer lists, shapes as in
        ``ops.sru.SRU`` (weight (D_in, dirs*k*H); weight_c/bias
        (dirs, 2, H)).
      hidden: per-direction hidden size H.
      window: optional (kernel, stride) for layer 0.

    Returns:
      (B, L', dirs*H) with both directions concatenated (fwd, rev).
    """
    bsz = x.shape[0]
    w0 = weights[0]
    if window is not None:
        kernel, stride = window
        d_unf = w0.shape[0]
        c = d_unf // kernel
        w_conv = w0.reshape(c, kernel, -1).transpose(1, 0, 2)
        u = jax.lax.conv_general_dilated(
            x.astype(w_conv.dtype), w_conv,
            window_strides=(stride,), padding="VALID",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w_conv.shape, ("NWC", "WIO", "NWC")
            ),
        )
    else:
        u = jnp.einsum("bld,dk->blk", x.astype(w0.dtype), w0)
    length = u.shape[1]
    k0 = u.shape[-1] // (2 * hidden)
    if k0 != 4:
        raise NotImplementedError(
            "fused stack expects a projected highway on layer 0 (k=4)"
        )

    # The kernels' block lane width widens with the folded batch (wider
    # blocks -> fewer sequential grid tiles on the single TensorCore); vb
    # must be replicated to the same width the preps will pick.
    lanes = _pick_lanes(bsz, u.dtype.itemsize)

    # (B, L, 8H) -> (L, 8H, B): the stack's single entry transpose.
    u_t = u.transpose(1, 2, 0)
    vb0 = _vb_pack(weight_cs[0], biases[0], lanes).astype(u.dtype)
    h_f, h_r = sru_dual_recurrence(
        u_t[:, : 4 * hidden], u_t[:, 4 * hidden :], vb0, interpret
    )

    for layer in range(1, len(weights)):
        wt = weights[layer].T.astype(h_f.dtype)  # (6H, 2H)
        vb = _vb_pack(weight_cs[layer], biases[layer], lanes).astype(
            h_f.dtype
        )
        h_f, h_r = sru_hidden_layer(h_f, h_r, wt, vb, interpret)

    # (L, H, B) pair -> (B, L, 2H): the single exit transpose. With
    # ``time_major`` the caller consumes the native (L, 2H, B) layout
    # directly (the fused ConvT+OLA back-projection, ops.convt_tm) and no
    # exit transpose happens here at all.
    h = jnp.concatenate([h_f, h_r], axis=1)
    if time_major:
        return h
    return h.transpose(2, 0, 1)
