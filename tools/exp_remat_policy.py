"""Measure remat-policy variants of the bf16 train step on the real TPU.

Round 3 tried FULL remat of the shared RTFS block (recompute everything)
and rejected it (160 vs 201 audio-s/s). This experiment tries the milder
policy-based checkpointing on the whole loss: save only matmul/conv
outputs (or offload nothing), recompute elementwise/norm chains in the
backward where XLA fuses them into their consumers — a byte-reduction
lever for a step measured at 86-87% of the HBM roofline.

Usage: python tools/exp_remat_policy.py [--policies dots,none,baseline]
Prints ms/step per policy (median of N timed loops of 10 chained steps).
"""

from __future__ import annotations

import argparse
import dataclasses as _dc
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--policies", default="baseline,dots,dots_no_batch,offload_none"
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _host_init_params
    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.losses import pairwise_neg_snr, pit_loss
    from rtfs_tpu.utils.precision import cast_params

    print(jax.devices(), file=sys.stderr)

    conf = load_config("lrs2_RTFSNet_4_layer")
    model = build_avnet(conf)
    wav1 = jnp.zeros((1, 32000), jnp.float32)
    emb1 = jnp.zeros((1, 50, 512), jnp.float32)
    variables = jax.device_put(_host_init_params(model, wav1, emb1))
    model = _dc.replace(model, compute_dtype="bfloat16")
    variables = cast_params(variables)

    rng = np.random.default_rng(0)
    bs = 8
    wav = jnp.asarray(rng.standard_normal((bs, 32000)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((bs, 50, 512)).astype(np.float32))
    tgt = wav[:, None] * 0.7
    opt = optax.adamw(1e-3)
    bstats = variables.get("batch_stats", {})
    opt_state0 = opt.init(variables["params"])

    cp = jax.checkpoint_policies
    policies = {
        "baseline": None,  # no remat
        "dots": cp.dots_saveable,
        "dots_no_batch": cp.dots_with_no_batch_dims_saveable,
        "offload_none": cp.nothing_saveable,
    }

    results = {}
    for name in args.policies.split(","):
        pol = policies[name]

        def fwd(params, bstats):
            ests = model.apply(
                {"params": params, "batch_stats": bstats}, wav, emb
            )
            return pit_loss(pairwise_neg_snr, ests, tgt)

        if pol is not None:
            fwd = jax.checkpoint(fwd, policy=pol)

        def step_body(params, opt_state, fwd=fwd):
            grads = jax.grad(fwd)(params, bstats)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        @partial(jax.jit, static_argnames="n_iter")
        def train_loop(params, opt_state, n_iter, step_body=step_body):
            def body(_, carry):
                return step_body(carry[0], carry[1])

            params, opt_state = jax.lax.fori_loop(
                0, n_iter, body, (params, opt_state)
            )
            leaf = jax.tree_util.tree_leaves(params)[0]
            return jnp.sum(leaf.astype(jnp.float32))

        try:
            out = train_loop(variables["params"], opt_state0, n_iter=args.iters)
            out.block_until_ready()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            results[name] = None
            continue
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = train_loop(
                variables["params"], opt_state0, n_iter=args.iters
            )
            out.block_until_ready()
            times.append((time.perf_counter() - t0) / args.iters)
        ms = statistics.median(times) * 1e3
        thr = bs * 2.0 / (ms / 1e3)
        results[name] = ms
        print(f"{name}: {ms:.1f} ms/step ({thr:.0f} audio-s/s), "
              f"spread {100*(max(times)-min(times))/statistics.median(times):.1f}%")

    print({k: (round(v, 2) if v else None) for k, v in results.items()})


if __name__ == "__main__":
    main()
