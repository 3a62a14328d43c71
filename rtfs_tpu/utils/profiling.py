"""Profiling / tracing: jax.profiler wrappers + roofline estimates.

The reference had only thop MACs prints and wall-clock timers (SURVEY §5.1).
TPU-native observability here:

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of every XLA/Pallas kernel.
- ``roofline(fn, *args)``: compiled-HLO FLOPs + bytes from XLA cost
  analysis, plus the speed-of-light time on the current chip and achieved
  fraction — the per-kernel "are we at speed of light" check.
- ``chip_specs()``: peak FLOP/s + HBM bandwidth for the local TPU
  generation (fallback table; used by roofline).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional


@dataclass
class ChipSpec:
    name: str
    peak_flops_f32: float  # FLOP/s
    peak_flops_bf16: float
    hbm_bw: float  # bytes/s


_SPECS = {
    # public figures; bf16 MXU peak / fp32 ~= bf16/2 on v4+, HBM GB/s
    "v4": ChipSpec("v4", 137.5e12, 275e12, 1.2e12),
    "v5e": ChipSpec("v5e", 98.5e12, 197e12, 0.82e12),
    "v5p": ChipSpec("v5p", 229.5e12, 459e12, 2.77e12),
    "v6e": ChipSpec("v6e", 459e12, 918e12, 1.64e12),
    "cpu": ChipSpec("cpu", 1e11, 1e11, 5e10),
}


def chip_specs() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, spec in _SPECS.items():
        if key in kind.replace(" ", ""):
            return spec
    if "v5" in kind and "lite" in kind:
        return _SPECS["v5e"]
    return _SPECS["cpu"] if jax.default_backend() == "cpu" else _SPECS["v5e"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rtfs_tpu_trace"):
    """Capture a jax.profiler trace (open with TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def roofline(fn, *args, n_iter: int = 10) -> dict:
    """Measure fn and compare to the chip's compute/memory roofline.

    Returns {flops, bytes, measured_s, sol_s, achieved_fraction,
    bound}: ``sol_s`` is max(flops/peak, bytes/bw) — the speed-of-light
    time; ``achieved_fraction`` = sol_s / measured_s.
    """
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = compiled(*args)
    jax.block_until_ready(out)
    measured = (time.perf_counter() - t0) / n_iter

    spec = chip_specs()
    t_compute = flops / spec.peak_flops_f32
    t_memory = bytes_accessed / spec.hbm_bw
    sol = max(t_compute, t_memory)
    return {
        "flops": flops,
        "bytes": bytes_accessed,
        "measured_s": measured,
        "sol_s": sol,
        "achieved_fraction": sol / measured if measured > 0 else 0.0,
        "bound": "compute" if t_compute >= t_memory else "memory",
        "chip": spec.name,
    }
