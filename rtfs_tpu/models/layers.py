"""Core layer zoo: norms, activations, conv blocks (channels-last, TPU-first).

This is the TPU-native counterpart of the reference's
``src/models/layers/{conv_layers,normalizations,activations}.py``. The layers
are flax.linen modules operating on channels-LAST tensors:

- 1D feature maps: ``(B, T, C)``  (reference: ``(B, C, T)``)
- 2D time-frequency maps: ``(B, T, F, C)``  (reference: ``(B, C, T, F)``)

Semantics matched against the reference (verified by golden tests vs torch):

- ``ConvNormAct`` (= reference ``conv_layers.py:65-139``): optional
  pre-norm/pre-act, conv with torch ``padding="same"`` for stride 1 /
  symmetric ``dilation*(k-1)//2`` for stride > 1, optional post norm + act,
  ``kernel_size <= 0`` ⇒ identity passthrough with ``out_chan := in_chan``.
- ``ConvActNorm`` (= ``conv_layers.py:142-215``): conv → act → norm, and
  stride > 1 ⇒ padding 0.
- ``gLN`` = GroupNorm(1 group) (= ``normalizations.py:8-17``), eps 1e-5.
- ``LayerNormalization4D`` (= ``normalizations.py:20-37``): stats over
  (C, F) when n_freqs > 1, over C alone when n_freqs == 1, eps 1e-5,
  biased variance.
- ``PReLU``: torch default — a single shared scalar initialised to 0.25.
- ``DropPath``: timm stochastic depth, train-only, per-sample.

Parameter initialisation mirrors torch defaults (kaiming-uniform a=sqrt(5)
for conv kernels, fan-in uniform for biases) so training dynamics match; the
``xavier_init`` flag switches to xavier-uniform exactly where the reference
does.
"""

from __future__ import annotations

import contextlib
import math
import threading
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import convops
from ..ops import packed_tf as P


# --------------------------------------------------------------------------
# Initialisers (torch parity)
# --------------------------------------------------------------------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv default: kaiming_uniform(a=sqrt(5)) on OIHW weight.

    Our kernel layout is (*spatial, Cin//groups, Cout); torch fan_in =
    Cin//groups * prod(spatial) = prod(shape[:-1]).
    """
    fan_in = int(np.prod(shape[:-1]))
    gain = math.sqrt(2.0 / (1 + 5.0))  # leaky_relu gain with a=sqrt(5)
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform_conv_init(key, shape, dtype=jnp.float32):
    """xavier_uniform over torch's (Cout, Cin/g, *k) fan convention."""
    receptive = int(np.prod(shape[:-2]))
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# --------------------------------------------------------------------------
# Batch-pair channel folding
# --------------------------------------------------------------------------
#
# TPU arrays tile the minor dimension to 128 lanes, so every 64-channel
# (hid_chan) tensor in the RTFS block is stored — and DMA'd — 2x padded
# (profiled: ~55% of train-step HBM traffic touches 64-lane tensors).
# Folding BATCH PAIRS into the channel axis, (B,*sp,C) -> (B/f,*sp,f*C),
# makes every channel axis a multiple of 128 with EXACTLY the same math:
#   - depthwise convs stay depthwise (weights tiled f times),
#   - dense convs become groups=f with the weights replicated per group
#     (pointwise ones: one block-diagonal GEMM, keeping the MXU path),
#   - gLN takes per-(batch,group) statistics,
#   - elementwise ops, resizes, pools and spatial padding are untouched.
# Parameters are UNCHANGED — folding is a pure computation-layout choice,
# entered per-trace via the ``batch_fold`` context (an AVNet attribute
# sets it; see ``avnet.AVNet.batch_fold``). Regions that must see the
# plain layout (the globalatt stack, the video path, cross-modal fusion)
# re-enter ``batch_fold(1)`` around an unfold/refold island.

# Thread-local (ADVICE r3): tracing a second model concurrently from
# another thread must not see this trace's fold factor.
_FOLD_STATE = threading.local()


@contextlib.contextmanager
def batch_fold(f: int):
    """Run the enclosed module applications with batch-fold factor f."""
    old = getattr(_FOLD_STATE, "fold", 1)
    _FOLD_STATE.fold = int(f)
    try:
        yield
    finally:
        _FOLD_STATE.fold = old


def fold_factor() -> int:
    return getattr(_FOLD_STATE, "fold", 1)


@contextlib.contextmanager
def scan_sharding(sharding):
    """Sharding constraint for the DualPathRNN's folded scan batches.

    Under a DP x TP mesh the naive F-shard propagates INTO the sequential
    F-scan (per-step collective-permutes + while-body all-gathers,
    TP_ANALYSIS_r03). Setting this context to
    NamedSharding(mesh, P(("data", "model"), None, None)) makes every
    DualPathRNN constrain its folded (B*other_axis, scan_axis, C) input so
    the combined batch axis shards over BOTH mesh axes: the scan runs
    entirely local and resharding happens once per block edge instead of
    per scan step."""
    old = getattr(_FOLD_STATE, "scan_sharding", None)
    _FOLD_STATE.scan_sharding = sharding
    try:
        yield
    finally:
        _FOLD_STATE.scan_sharding = old


def scan_sharding_value():
    return getattr(_FOLD_STATE, "scan_sharding", None)


def fold_batch(x: jax.Array, f: int) -> jax.Array:
    """(B, *spatial, C) -> (B//f, *spatial, f*C), batch-major groups."""
    if f == 1:
        return x
    b, c = x.shape[0], x.shape[-1]
    xr = x.reshape(b // f, f, *x.shape[1:])
    xr = jnp.moveaxis(xr, 1, -2)
    return xr.reshape(b // f, *x.shape[1:-1], f * c)


def unfold_batch(x: jax.Array, f: int) -> jax.Array:
    """Inverse of ``fold_batch``."""
    if f == 1:
        return x
    c = x.shape[-1] // f
    xr = x.reshape(*x.shape[:-1], f, c)
    xr = jnp.moveaxis(xr, -2, 1)
    return xr.reshape(x.shape[0] * f, *x.shape[1:-1], c)


def fold_concat(parts, axis: int = -1) -> jax.Array:
    """Channel concat that stays group-consistent under batch_fold.

    Folded tensors carry channels as [g0: C_i | g1: C_i | ...]; a naive
    concat would interleave groups and parts wrongly. Splits each part's
    minor dim into (f, C_i), concats per group, merges back — all minor-dim
    reshapes (bitcasts)."""
    assert axis in (-1, parts[0].ndim - 1)
    f = fold_factor()
    if f == 1:
        return jnp.concatenate(parts, axis=-1)
    rs = [p.reshape(*p.shape[:-1], f, p.shape[-1] // f) for p in parts]
    out = jnp.concatenate(rs, axis=-1)
    return out.reshape(*out.shape[:-2], out.shape[-2] * out.shape[-1])


# --------------------------------------------------------------------------
# Normalisations
# --------------------------------------------------------------------------


class GlobalLayerNorm(nn.Module):
    """gLN: GroupNorm with one group — stats over every non-batch axis.

    Reference ``normalizations.py:8-17`` (``nn.GroupNorm(1, C, eps=1e-5)``).
    Channels-last: affine parameters are per-channel on the last axis.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        if isinstance(x, P.PackedTF):
            assert x.c == self.features
            return P.PackedTF(
                P.gln_packed(x.data, gamma, beta, F=x.f, eps=self.eps),
                x.f, x.c,
            )
        f = fold_factor()
        if f > 1 and x.shape[-1] == f * self.features:
            # batch-fold: statistics per (batch row, fold group) — exactly
            # the per-batch-element stats of the unfolded layout. The
            # minor-dim split (f*C)->(f,C) is a free bitcast; gamma/beta
            # broadcast over the group axis.
            xr = x.reshape(*x.shape[:-1], f, self.features)
            xf = xr.astype(jnp.float32)
            axes = tuple(range(1, xr.ndim - 2)) + (xr.ndim - 1,)
            mean = jnp.mean(xf, axis=axes, keepdims=True)
            sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            norm = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(
                x.dtype
            )
            return (norm * gamma + beta).reshape(x.shape)
        # Single-pass statistics: E[x] and E[x^2] are sibling reductions
        # over the same operand, so XLA fuses them into ONE sweep of the
        # tensor (the dependent two-pass form costs an extra full HBM read
        # per gLN — profiled at ~1/3 of the norm's cost at RTFS sizes).
        # NUMERICS ASSUMPTION: E[x^2]-E[x]^2 loses ~2*log2(|mean|/std)
        # bits to cancellation; with f32 accumulation this is exact enough
        # for zero-centered post-conv activations (all RTFS presets,
        # golden-tested) but degrades ~6% in std at a 1e3-sigma DC offset
        # (pinned in tests/test_norms.py). A shifted-center variant was
        # tried and REVERTED: the data-dependent center slice fuses into
        # strided producer convs and makes them 15x slower (r3 profile,
        # 4.1 ms vs 0.27 ms for the pyramid's stride-2 DW conv).
        axes = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        norm = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return norm * gamma + beta


class LayerNormalization4D(nn.Module):
    """Per-(C,F) affine LayerNorm over a TF map (B, T, F, C).

    Reference ``normalizations.py:20-37``: params shaped (1, C, 1, F) in
    NCTF; stats over (C, F) if F > 1 else over C alone; biased variance,
    eps 1e-5.
    """

    features: int
    n_freqs: int = 1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C); n_freqs == 1 means per-(B,T,F) channel stats.
        # Unconditional guard (ADVICE r3): a folded tensor whose f*C
        # happens to equal `features` would otherwise silently mix the
        # folded batch pair into the statistics.
        if fold_factor() > 1:
            raise NotImplementedError(
                "LayerNormalization4D under batch_fold: wrap the caller in "
                "an unfold island (layers.batch_fold(1))"
            )
        if self.n_freqs > 1:
            axes = (-2, -1)
            pshape = (1, 1, self.n_freqs, self.features)
        else:
            axes = (-1,)
            pshape = (1, 1, 1, self.features) if x.ndim == 4 else (1, 1, self.features)
        # single-pass sibling reductions, f32 stats — see GlobalLayerNorm
        # for the cancellation analysis and the reverted shifted variant
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        gamma = self.param("scale", nn.initializers.ones, pshape)
        beta = self.param("bias", nn.initializers.zeros, pshape)
        norm = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return norm * gamma + beta


class BatchNorm(nn.Module):
    """torch BatchNorm1d/2d parity: momentum 0.1 (flax decay 0.9), eps 1e-5.

    Cross-replica statistics: pass ``axis_name="data"`` so batch stats are
    the mesh-wide mean — the TPU equivalent of the reference's
    ``sync_batchnorm=True`` (``train.py:145``).
    """

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if fold_factor() > 1:
            raise NotImplementedError(
                "BatchNorm under batch_fold: keep BN paths (video net) in "
                "an unfold island (layers.batch_fold(1))"
            )
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
        )(x)


class TorchLayerNorm(nn.Module):
    """nn.LayerNorm over the trailing channel axis (eps 1e-5)."""

    features: int

    @nn.compact
    def __call__(self, x):
        if fold_factor() > 1:
            raise NotImplementedError(
                "TorchLayerNorm under batch_fold: wrap the caller in an "
                "unfold island (layers.batch_fold(1))"
            )
        return nn.LayerNorm(epsilon=1e-5)(x)


# --------------------------------------------------------------------------
# Activations
# --------------------------------------------------------------------------


class PReLU(nn.Module):
    """torch nn.PReLU(): single shared scalar slope, init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", lambda k, s: jnp.full(s, self.init, jnp.float32), (1,)
        )
        return jnp.where(x >= 0, x, a * x)


_ACTIVATIONS: dict[str, Callable[[], Any]] = {
    "ReLU": lambda: jax.nn.relu,
    "PReLU": PReLU,
    "Tanh": lambda: jnp.tanh,
    "Sigmoid": lambda: jax.nn.sigmoid,
    "GELU": lambda: jax.nn.gelu,
    "SiLU": lambda: jax.nn.silu,
    "Softmax": lambda: (lambda x: jax.nn.softmax(x, axis=-1)),
}


def make_act(act_type: Optional[str]):
    """Activation registry (reference ``activations.py:4-18``).

    Returns a module or plain callable; ``None`` ⇒ identity.
    """
    if act_type is None or act_type == "":
        return lambda x: x
    if act_type not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation: {act_type}")
    return _ACTIVATIONS[act_type]()


def make_norm(
    norm_type: Optional[str],
    features: int,
    n_freqs: int = -1,
    axis_name: Optional[str] = None,
):
    """Norm registry (reference ``normalizations.py:44-58``).

    Maps the reference's config strings (incl. raw torch.nn names like
    ``BatchNorm1d``) onto TPU-native channels-last modules. ``None`` ⇒ None
    (caller skips).
    """
    if norm_type is None or norm_type == "":
        return None
    if norm_type == "gLN":
        return GlobalLayerNorm(features)
    if norm_type in ("LayerNormalization4D", "LN4d"):
        return LayerNormalization4D(features, n_freqs=max(n_freqs, 1))
    if norm_type in ("BatchNorm1d", "BatchNorm2d", "BatchNorm3d"):
        return BatchNorm(features, axis_name=axis_name)
    if norm_type == "LayerNorm":
        return TorchLayerNorm(features)
    raise ValueError(f"Unknown normalization: {norm_type}")


def _apply_norm(norm, x, train: bool):
    if norm is None:
        return x
    if isinstance(norm, BatchNorm):
        return norm(x, train=train)
    if isinstance(x, P.PackedTF) and not isinstance(norm, GlobalLayerNorm):
        raise NotImplementedError(
            f"packed_tf: norm {type(norm).__name__} on a packed map"
        )
    return norm(x)


def _apply_act(act, x):
    if act is None:
        return x
    if isinstance(x, P.PackedTF):
        # activations are elementwise: apply on the packed data directly
        # (PReLU's scalar slope broadcasts over any layout)
        return P.PackedTF(act(x.data), x.f, x.c)
    return act(x)


# --------------------------------------------------------------------------
# DropPath (stochastic depth)
# --------------------------------------------------------------------------


class DropPath(nn.Module):
    """timm DropPath: drop the residual branch per-sample during training."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask / keep


# --------------------------------------------------------------------------
# Conv blocks
# --------------------------------------------------------------------------


class Conv(nn.Module):
    """Bare grouped conv, channels-last, torch-parity padding and init.

    padding: "same" (torch asymmetric), int, or explicit pairs; stride>1
    callers pass ints per the reference's conventions.
    """

    in_chan: int
    out_chan: int
    kernel_size: int | Sequence[int]
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Any = "same"
    use_bias: bool = True
    xavier_init: bool = False
    nd: int = 1  # 1 => (B,T,C); 2 => (B,T,F,C)

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        kernel = tuple(ks) if hasattr(ks, "__len__") else (ks,) * self.nd
        kshape = (*kernel, self.in_chan // self.groups, self.out_chan)
        kinit = xavier_uniform_conv_init if self.xavier_init else torch_conv_kernel_init
        w = self.param("kernel", kinit, kshape)
        b = None
        if self.use_bias:
            fan_in = int(np.prod(kshape[:-1]))
            b = self.param("bias", torch_conv_bias_init(fan_in), (self.out_chan,))

        if isinstance(x, (P.PackedTF, P.PackRequest)):
            return self._packed_call(x, kernel, w, b)

        f = fold_factor()
        if f > 1:
            # batch-fold: input is (B/f, *sp, f*in_chan); every group of
            # the fold gets the SAME weights, so the op is a groups*f conv
            # with the kernel replicated along the output-channel axis —
            # gradients to the shared weights sum over groups via the
            # concat adjoint, identical to the unfolded math.
            if x.shape[-1] != f * self.in_chan:
                raise ValueError(
                    f"batch_fold={f}: conv expected {f * self.in_chan} "
                    f"folded input channels, got {x.shape[-1]}"
                )
            b_eff = None if b is None else jnp.tile(b, f)
            stride1 = (
                self.stride == 1
                or (hasattr(self.stride, "__len__")
                    and all(s == 1 for s in self.stride))
            )
            if (
                self.groups == 1
                and all(k == 1 for k in kernel)
                and stride1
                and self.padding in ("same", 0)
            ):
                # pointwise dense: ONE block-diagonal GEMM (kron with I_f)
                # keeps the MXU path and emits the folded lane-aligned
                # output directly; the zero blocks cost FLOPs the
                # memory-bound step has to spare.
                wm = w.reshape(self.in_chan, self.out_chan)
                x = x.astype(wm.dtype)
                wbd = jnp.kron(jnp.eye(f, dtype=wm.dtype), wm)
                out = jnp.einsum("b...i,io->b...o", x, wbd)
                return out if b_eff is None else out + b_eff
            w_eff = jnp.concatenate([w] * f, axis=-1)
            return convops.conv(
                x,
                w_eff,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups * f,
                bias=b_eff,
            )

        return convops.conv(
            x,
            w,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            bias=b,
        )

    def _packed_call(self, x, kernel, w, b):
        """Packed-TF dispatch (ops/packed_tf.py): same params, packed
        (B, T, F*C) layout kernels for the RTFS block's full-resolution
        segment. Covers exactly the shapes that segment uses."""
        interp = P.use_interpret()
        stride = self.stride if not hasattr(self.stride, "__len__") else (
            self.stride[0]
        )
        if self.dilation != 1 and self.dilation != (1, 1):
            raise NotImplementedError("packed_tf: dilation unsupported")
        if isinstance(x, P.PackRequest):
            # packed-world entry: 1x1 dense projection, emit packed
            assert self.groups == 1 and all(k == 1 for k in kernel) \
                and stride == 1 and self.nd == 2
            x4 = x.data
            wm = w.reshape(self.in_chan, self.out_chan)
            out = P.pw_proj_packed(x4.astype(w.dtype), wm, b, interp)
            return P.PackedTF(out, x4.shape[2], self.out_chan)
        # x is PackedTF
        xd = x.data.astype(w.dtype)
        if all(k == 1 for k in kernel) and self.groups == 1 and stride == 1:
            # 1x1 dense on a packed map: packed-world exit to rank-4
            wm = w.reshape(self.in_chan, self.out_chan)
            return P.pw_unproj_packed(xd, wm, b, x.f, interp)
        if (
            self.groups == self.in_chan
            and self.out_chan == self.in_chan
            and self.nd == 2
            and all(k > 1 for k in kernel)
        ):
            # depthwise kT x kF conv (stride 1 'same' or stride-2 int pad)
            kt, kf = kernel
            if self.padding == "same":
                pads_t = ((kt - 1) // 2, kt - 1 - (kt - 1) // 2)
                pads_f = ((kf - 1) // 2, kf - 1 - (kf - 1) // 2)
            elif isinstance(self.padding, int):
                pads_t = (self.padding, self.padding)
                pads_f = (self.padding, self.padding)
            else:
                raise NotImplementedError(
                    f"packed_tf: padding {self.padding}"
                )
            wd = w.reshape(kt, kf, self.out_chan)
            out = P.dw_conv_packed(
                xd, wd, b, x.f, x.c, pads_t, pads_f, (kt, kf), interp
            )
            b_, t, f, c = x.shape
            t_conv = t + sum(pads_t) - kt + 1
            f_conv = f + sum(pads_f) - kf + 1
            y = P.PackedTF(out, f_conv, x.c)
            if stride == 1:
                return y
            if stride == 2:
                # torch output size, then select conv_s1[2 i]
                t_out = (t + sum(pads_t) - kt) // 2 + 1
                f_out = (f + sum(pads_f) - kf) // 2 + 1
                return P.dw_stride2_from(y, t_out, f_out)
        raise NotImplementedError(
            f"packed_tf: conv k={kernel} groups={self.groups} "
            f"stride={self.stride} has no packed lowering"
        )


class ConvTranspose(nn.Module):
    """torch ConvTranspose1d/2d parity, channels-last."""

    in_chan: int
    out_chan: int
    kernel_size: int | Sequence[int]
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    groups: int = 1
    use_bias: bool = True
    xavier_init: bool = False
    nd: int = 1

    @nn.compact
    def __call__(self, x, time_major: bool = False):
        ks = self.kernel_size
        kernel = tuple(ks) if hasattr(ks, "__len__") else (ks,) * self.nd
        # Stored as (*spatial, Cout, Cin//groups) — see convops.conv_transpose.
        kshape = (*kernel, self.out_chan, self.in_chan // self.groups)

        def kinit(key, shape, dtype=jnp.float32):
            # torch ConvTranspose default init: kaiming-uniform on weight
            # (Cin, Cout//g, *k); _calculate_fan_in treats dim1 as in, so
            # fan_in = (Cout//g) * prod(k).
            receptive = int(np.prod(shape[:-2]))
            fan_in = (self.out_chan // self.groups) * receptive
            if self.xavier_init:
                fan_out = shape[-1] * self.groups * receptive
                bound = math.sqrt(6.0 / (fan_in + fan_out))
            else:
                gain = math.sqrt(2.0 / 6.0)
                bound = gain * math.sqrt(3.0 / fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", kinit, kshape)
        b = None
        if self.use_bias:
            receptive = int(np.prod(kernel))
            b = self.param(
                "bias",
                torch_conv_bias_init(
                    (self.out_chan // self.groups) * receptive
                ),
                (self.out_chan,),
            )
        if time_major:
            # x is (L, Cin, B) — the SRU stack's native layout. Apply the
            # fused ConvT+OLA Pallas kernel (ops.convt_tm) and return
            # (L + k - 1, Cout, B); bias adds at the XLA level (fuses into
            # the caller's transpose/residual). Geometry: stride 1, pad 0,
            # 1D — exactly the DualPathRNN back-projection.
            assert self.nd == 1 and self.stride == 1 and self.groups == 1
            assert self.padding == 0 and self.output_padding == 0
            from ..ops import sru as _sru
            from ..ops.convt_tm import _xla_reference, convt1d_ola_tm

            backend = _sru.resolve_backend()
            if backend == "pallas":
                out = convt1d_ola_tm(x, w.astype(x.dtype))
            elif backend == "interpret":
                out = convt1d_ola_tm(x, w.astype(x.dtype), True)
            else:
                return _xla_reference(x, w.astype(x.dtype), b)
            if b is not None:
                out = out + b.astype(out.dtype)[None, :, None]
            return out
        if fold_factor() > 1 and x.shape[-1] != self.in_chan:
            raise NotImplementedError(
                "ConvTranspose under batch_fold: unfold first (decoder and "
                "DualPathRNN run outside the folded region)"
            )
        return convops.conv_transpose(
            x,
            w,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            groups=self.groups,
            bias=b,
        )


class ConvNormAct(nn.Module):
    """pre_norm → pre_act → conv → norm → act (reference conv_layers.py:65).

    ``kernel_size <= 0`` ⇒ conv is identity and ``out_chan := in_chan``
    (the reference's Identity-passthrough trick used for e.g. the video
    bottleneck, ``config/lrs2_RTFSNet_4_layer.yaml:12-13``).
    """

    in_chan: int
    out_chan: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Any = None
    pre_norm_type: Optional[str] = None
    pre_act_type: Optional[str] = None
    norm_type: Optional[str] = None
    act_type: Optional[str] = None
    xavier_init: bool = False
    use_bias: bool = True
    is2d: bool = False
    bn_axis_name: Optional[str] = None

    @property
    def real_out_chan(self) -> int:
        return self.out_chan if self.kernel_size > 0 else self.in_chan

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_chan = self.real_out_chan
        padding = self.padding
        if padding is None:
            padding = (
                self.dilation * (self.kernel_size - 1) // 2
                if self.stride > 1
                else "same"
            )
        x = _apply_norm(
            make_norm(self.pre_norm_type, self.in_chan, axis_name=self.bn_axis_name),
            x,
            train,
        )
        x = _apply_act(make_act(self.pre_act_type), x)
        if self.kernel_size > 0:
            x = Conv(
                self.in_chan,
                out_chan,
                self.kernel_size,
                stride=self.stride,
                groups=self.groups,
                dilation=self.dilation,
                padding=padding,
                use_bias=self.use_bias,
                xavier_init=self.xavier_init,
                nd=2 if self.is2d else 1,
            )(x)
        x = _apply_norm(
            make_norm(self.norm_type, out_chan, axis_name=self.bn_axis_name),
            x,
            train,
        )
        x = _apply_act(make_act(self.act_type), x)
        return x


class ConvActNorm(nn.Module):
    """conv → act → norm (reference conv_layers.py:142-215).

    stride > 1 ⇒ padding 0 (NOT symmetric) per the reference; supports
    LayerNormalization4D via ``n_freqs``.
    """

    in_chan: int
    out_chan: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    norm_type: Optional[str] = None
    act_type: Optional[str] = None
    n_freqs: int = -1
    xavier_init: bool = False
    use_bias: bool = True
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel_size > 0:
            padding = 0 if self.stride > 1 else "same"
            x = Conv(
                self.in_chan,
                self.out_chan,
                self.kernel_size,
                stride=self.stride,
                groups=self.groups,
                dilation=self.dilation,
                padding=padding,
                use_bias=self.use_bias,
                xavier_init=self.xavier_init,
                nd=2 if self.is2d else 1,
            )(x)
        x = _apply_act(make_act(self.act_type), x)
        x = _apply_norm(
            make_norm(self.norm_type, self.out_chan, n_freqs=self.n_freqs), x, train
        )
        return x


class FeedForwardNetwork(nn.Module):
    """Conv FFN: 1×1 → DW k → 1×1 with DropPath (conv_layers.py:218-259)."""

    in_chan: int
    hid_chan: int
    kernel_size: int = 5
    norm_type: str = "gLN"
    act_type: str = "ReLU"
    dropout: float = 0.0
    is2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        x = ConvNormAct(
            self.in_chan, self.hid_chan, 1, norm_type=self.norm_type,
            use_bias=False, is2d=self.is2d,
        )(x, train)
        x = ConvNormAct(
            self.hid_chan, self.hid_chan, self.kernel_size,
            groups=self.hid_chan, act_type=self.act_type, is2d=self.is2d,
        )(x, train)
        drop = DropPath(self.dropout)
        x = drop(x, train)
        x = ConvNormAct(
            self.hid_chan, self.in_chan, 1, norm_type=self.norm_type,
            use_bias=False, is2d=self.is2d,
        )(x, train)
        return DropPath(self.dropout)(x, train) + res
