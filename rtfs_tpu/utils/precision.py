"""Mixed-precision helpers: parameter casting for bf16 compute.

Used with ``AVNet(compute_dtype="bfloat16")``: parameters are cast to bf16
at the call boundary (keeping an fp32 master copy for training), so the
memory-bound refinement core moves half the HBM bytes. Norm statistics and
anything feeding the complex mask / iSTFT remain fp32 inside the model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(variables, dtype=jnp.bfloat16):
    """Cast float params/stats to ``dtype`` (non-floats untouched)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, variables)
