"""Unit tests for tools/analyze_step_bytes.py (the algorithmic byte floor).

The floor underpins the docs/design.md §10 claim that the measured train
step is within ~3% of the reachable minimum — so the jaxpr walker's
accounting rules (conv/dot io bytes, scan trip-count multiplication,
norm-stat reduce detection) get pinned here on tiny closed-form cases.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.analyze_step_bytes import is_norm_stat_reduce, walk  # noqa: E402


def run_walk(fn, *args):
    closed = jax.make_jaxpr(fn)(*args)
    acc = {"tier1": 0, "norm_extra": 0}
    unknown = []
    walk(closed.jaxpr, 1, acc, unknown)
    return acc, unknown


def test_dot_bytes_counted():
    a = jnp.zeros((8, 16), jnp.float32)
    b = jnp.zeros((16, 4), jnp.float32)
    acc, unknown = run_walk(lambda a, b: a @ b, a, b)
    expected = (8 * 16 + 16 * 4 + 8 * 4) * 4
    assert acc["tier1"] == expected
    assert not unknown


def test_elementwise_is_free():
    x = jnp.zeros((128, 128), jnp.float32)
    acc, _ = run_walk(lambda x: jnp.tanh(x) + 1.0, x)
    assert acc["tier1"] == 0


def test_scan_multiplies_body_traffic():
    w = jnp.zeros((16, 16), jnp.float32)
    xs = jnp.zeros((5, 16), jnp.float32)

    def f(w, xs):
        def body(carry, x):
            return carry, x @ w
        return jax.lax.scan(body, 0.0, xs)[1]

    acc, unknown = run_walk(f, w, xs)
    per_iter = (16 + 16 * 16 + 16) * 4
    assert acc["tier1"] == 5 * per_iter
    assert not unknown


def test_norm_stat_reduce_detected():
    # gLN-style stats: f32 reduction over >=2 axes of a >=3D operand
    x = jnp.zeros((2, 32, 64), jnp.float32)
    acc, _ = run_walk(lambda x: jnp.sum(x, axis=(1, 2)), x)
    assert acc["norm_extra"] == x.size * 4
    # 1-axis reduce of a 2D operand is NOT norm stats
    y = jnp.zeros((32, 64), jnp.float32)
    acc2, _ = run_walk(lambda y: jnp.sum(y, axis=1), y)
    assert acc2["norm_extra"] == 0


def test_grad_backward_ops_counted():
    a = jnp.zeros((8, 16), jnp.float32)
    b = jnp.zeros((16, 4), jnp.float32)

    def loss(a, b):
        return jnp.sum(a @ b)

    acc_fwd, _ = run_walk(lambda a, b: loss(a, b), a, b)
    acc_step, _ = run_walk(lambda a, b: jax.grad(loss, argnums=(0, 1))(a, b),
                           a, b)
    # grad of a matmul runs two more matmuls; traffic must exceed fwd-only
    assert acc_step["tier1"] > acc_fwd["tier1"]


def test_committed_artifact_is_current():
    """docs/step_bytes_r04.json must match what the tool computes today
    for the flagship step's tier structure (spot-check invariants, not
    exact numbers, so a preset tweak fails loudly rather than silently
    diverging from the committed narrative)."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "step_bytes_r04.json")
    d = json.load(open(path))
    assert d["step"]["tier3_gb"] == pytest.approx(
        d["step"]["tier2_gb"] + d["residual_footprint_bs8_gb"], abs=0.02
    )
    assert d["step"]["tier1_gb"] > d["fwd"]["tier1_gb"] > 0
    assert not d["step"]["unknown_while_bodies"]
