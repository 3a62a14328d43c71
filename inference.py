"""Single-file inference: separate one wav given a mouth-crop ``.npz``.

Counterpart of the reference ``inference.py:23-65`` (LRS2-style test file +
``.npz`` lip crops → separated wav). Loads the exported model bundle, runs
the frozen video backbone + AVNet, writes ``<out>/{key}_est{i}.wav``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def write_wav(path, wav, sr):
    from scipy.io import wavfile

    wavfile.write(path, sr, np.clip(wav, -1.0, 1.0).astype(np.float32))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", required=True, help="exp conf.yaml")
    parser.add_argument("--wav", required=True)
    parser.add_argument("--mouth", required=True, help="mouth .npz (key 'data')")
    parser.add_argument("--model", default=None)
    parser.add_argument("--out-dir", default="separated")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument(
        "--packed-tf", action="store_true",
        help="packed-TF Pallas kernels: lower single-utterance TPU latency",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.data import preprocess_mouth
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.train.checkpoints import load_exported
    from rtfs_tpu.utils.separator import separate_sample

    conf = load_config(args.conf_dir)
    sr = conf["data"]["sample_rate"]
    exp_dir = os.path.dirname(os.path.abspath(args.conf_dir))

    model = build_avnet(conf)
    if args.packed_tf:
        # single-utterance serving: the packed-TF kernel path cuts bs=1
        # latency ~21% on TPU (ops/packed_tf.py; loses at batch >= 8)
        import dataclasses

        model = dataclasses.replace(model, packed_tf=True)
    video_model = make_video_model(conf["videonet"])
    bundle = load_exported(args.model or os.path.join(exp_dir, "best_model.bin"))
    state = bundle["state"]
    variables = {"params": state["params"],
                 "batch_stats": state.get("batch_stats", {})}
    video_variables = state.get("video_variables", {})

    from rtfs_tpu.data.native_wav import read_wav

    wav = read_wav(args.wav)[: sr * 2]  # 2 s parity truncation
    mouth = preprocess_mouth(np.load(args.mouth)["data"], train=False)

    emb = video_model.apply(video_variables, jnp.asarray(mouth[None]))
    est = separate_sample(model, variables, wav, np.asarray(emb[0]))

    os.makedirs(args.out_dir, exist_ok=True)
    key = os.path.splitext(os.path.basename(args.wav))[0]
    for i, src in enumerate(est):
        out = os.path.join(args.out_dir, f"{key}_est{i + 1}.wav")
        write_wav(out, src, sr)
        print("wrote", out)


if __name__ == "__main__":
    main()
