"""Dead-parameter check: every trainable parameter must receive gradient.

Counterpart of the reference ``find_unused_params.py:19-35`` (backward pass
on random tensors, print params with ``grad is None``). The JAX version
checks for all-zero gradient cotangents, which is the analogous signal.
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", default="lrs2_RTFSNet_4_layer")
    parser.add_argument("--wav-len", type=int, default=8000)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # analysis tool: always CPU
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.losses import pairwise_neg_snr, pit_loss

    conf = load_config(args.conf)
    model = build_avnet(conf)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((2, args.wav_len)).astype(np.float32) * 0.1)
    mouth = jnp.asarray(rng.standard_normal((2, 13, 512)).astype(np.float32))
    target = jnp.asarray(
        rng.standard_normal((2, conf["audionet"]["n_src"], args.wav_len)).astype(
            np.float32
        )
        * 0.1
    )

    variables = model.init({"params": jax.random.PRNGKey(0)}, wav, mouth)

    def loss_fn(params):
        ests = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            wav,
            mouth,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )[0]
        return pit_loss(pairwise_neg_snr, ests, target)

    grads = jax.grad(loss_fn)(variables["params"])
    dead = []
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        if float(jnp.abs(g).max()) == 0.0:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            dead.append(name)
    if dead:
        print(f"{len(dead)} parameters receive ZERO gradient:")
        for d in dead:
            print(" ", d)
    else:
        print("all parameters receive nonzero gradients")


if __name__ == "__main__":
    main()
