"""Smoke test: short synthetic-data train run of the full system.

Counterpart of the reference ``local_test.py`` (fake random dataset, 1-epoch
fit, wall-time print; ``--check-only`` stops after model build + complexity
report). Runs on whatever backend JAX resolves (TPU if available, else CPU).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", default="lrs2_RTFSNet_4_layer")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--check-only", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    import jax

    if args.cpu or jax.default_backend() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.data import SyntheticAVDataset
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.train import AVSystem, make_optimizer
    from rtfs_tpu.utils.flops import model_complexity_report

    conf = load_config(args.conf)
    model = build_avnet(conf)
    video_model = make_video_model(conf["videonet"])

    dataset = SyntheticAVDataset(
        n_samples=args.steps * args.batch_size,
        n_src=conf["audionet"]["n_src"],
        sample_rate=conf["data"]["sample_rate"],
        segment=conf["data"]["segment"] or 2.0,
    )
    sample = next(dataset.batches(args.batch_size))
    sample.pop("key", None)

    if args.check_only:
        report = model_complexity_report(model, video_model, sample)
        print(report)
        return

    optim_conf = conf.get("optim", {})
    system = AVSystem(
        model,
        video_model=video_model,
        optimizer=make_optimizer(
            optim_conf.get("optimizer", "adamw"),
            lr=optim_conf.get("lr", 1e-3),
            weight_decay=optim_conf.get("weight_decay", 0.0),
        ),
    )

    t0 = time.time()
    state = system.create_state(jax.random.PRNGKey(0), sample)
    print(f"state created in {time.time()-t0:.1f}s")

    t0 = time.time()
    rng = jax.random.PRNGKey(1)
    for i, batch in enumerate(dataset.batches(args.batch_size)):
        rng, step_rng = jax.random.split(rng)
        batch.pop("key", None)
        state, metrics = system.train_step(state, batch, step_rng)
        loss = float(metrics["train_loss"])
        print(f"step {i}: train_loss={loss:.3f}")
        assert np.isfinite(loss), "non-finite training loss"
    val = system.val_step(state, sample)
    print(f"val_loss={float(val['val_loss']):.3f}")
    print(f"total train time: {time.time()-t0:.1f}s for {args.steps} steps")


if __name__ == "__main__":
    main()
