"""AE video-backbone pretraining (counterpart of reference train_autoencoder.py).

Trains the mouth-frame conv autoencoder (``rtfs_tpu.models.video.EncoderAE``
+ ``DecoderAE``) with MSE reconstruction, Adam 1e-4, data-parallel over all
local devices; exports the encoder weights for ``AEVideoModel(pretrain=...)``.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train-dir", default=None,
                        help="AVSpeech manifest dir (mouth npz); synthetic if unset")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--steps-per-epoch", type=int, default=50)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--base-channels", type=int, default=4)
    parser.add_argument("--num-layers", type=int, default=3)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--out", default="ae_encoder.msgpack")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from rtfs_tpu.models.video import DecoderAE, EncoderAE

    enc = EncoderAE(1, args.base_channels, args.num_layers)
    dec = DecoderAE(1, args.base_channels, args.num_layers)

    def batches(rng):
        if args.train_dir:
            from rtfs_tpu.data import AVSpeechDataset

            ds = AVSpeechDataset(args.train_dir, n_src=1)
            for batch in ds.batches(args.batch_size):
                m = batch["mouth"]  # (B, T, 88, 88)
                yield m.reshape(-1, 88, 88)[: args.batch_size, ..., None]
        else:
            for _ in range(args.steps_per_epoch):
                yield rng.standard_normal(
                    (args.batch_size, 88, 88, 1)
                ).astype(np.float32)

    rng = jax.random.PRNGKey(0)
    sample = np.zeros((args.batch_size, 88, 88, 1), np.float32)
    ev = enc.init({"params": rng}, sample)
    z = enc.apply(ev, sample)
    dv = dec.init({"params": jax.random.PRNGKey(1)}, z)
    params = {"enc": ev["params"], "dec": dv["params"]}

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            z = enc.apply({"params": p["enc"]}, x)
            recon = dec.apply({"params": p["dec"]}, z)
            return jnp.mean((recon - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    nrng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for x in batches(nrng):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(x))
            losses.append(float(loss))
        print(f"epoch {epoch}: mse={np.mean(losses):.5f} "
              f"({time.time()-t0:.1f}s)")

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes({"params": params["enc"]}))
    print("saved encoder to", args.out)


if __name__ == "__main__":
    main()
