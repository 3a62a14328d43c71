"""Evaluation entry: ``python test.py --conf-dir <exp>/conf.yaml --test-dir ...``.

Counterpart of the reference ``test.py:24-152``: loads the exported model
bundle from the experiment dir, runs the test set, tracks per-utterance
SI-SNR(i)/SDR(i)/PESQ/STOI into ``metrics.csv``, and writes an aggregate
``results.csv`` (mean/std + complexity numbers).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.data import AVSpeechDataset
    from rtfs_tpu.metrics import ALLMetricsTracker
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.train.checkpoints import load_exported
    from inference import write_wav

    conf = load_config(args.conf_dir)
    exp_dir = os.path.dirname(os.path.abspath(args.conf_dir))

    model = build_avnet(conf)
    # audio-only eval (reference System(video_model=None)): n_src>=2
    # separation models trained without a lip backbone
    audio_only = not conf.get("videonet")
    video_model = None if audio_only else make_video_model(conf["videonet"])

    bundle_path = args.model or os.path.join(exp_dir, "best_model.bin")
    bundle = load_exported(bundle_path)
    from rtfs_tpu.utils.code_version import check_code_version

    warn = check_code_version(bundle.get("infos", {}))
    if warn:
        print(f"WARNING: {warn}")
    state = bundle["state"]
    variables = {
        "params": state["params"],
        "batch_stats": state.get("batch_stats", {}),
    }
    video_variables = state.get("video_variables", {})

    test_set = AVSpeechDataset(
        args.test_dir,
        n_src=conf["audionet"]["n_src"],
        sample_rate=conf["data"]["sample_rate"],
        segment=None,  # full utterances (still 2 s-truncated, parity)
        normalize_audio=conf["data"].get("normalize_audio", False),
    )

    out_dir = os.path.join(exp_dir, "results")
    os.makedirs(out_dir, exist_ok=True)
    tracker = ALLMetricsTracker(
        os.path.join(out_dir, "metrics.csv"),
        sample_rate=conf["data"]["sample_rate"],
    )

    @jax.jit
    def forward(wav, mouth):
        if video_model is None:
            return model.apply(variables, wav, None)
        emb = video_model.apply(video_variables, mouth)
        return model.apply(variables, wav, emb)

    examples_dir = os.path.join(out_dir, "examples")
    if args.save_examples:
        os.makedirs(examples_dir, exist_ok=True)

    n = 0
    for batch in test_set.batches(args.batch_size, shuffle=False,
                                  drop_last=False):
        keys = batch.pop("key")
        lengths = batch.pop("length")
        ests = np.asarray(forward(
            jnp.asarray(batch["mix"]), jnp.asarray(batch["mouth"])
        ))
        for b in range(ests.shape[0]):
            # trim batch zero-padding: metrics see only real samples
            L = int(lengths[b])
            tracker(batch["mix"][b][:L], batch["src"][b][..., :L],
                    ests[b][..., :L], keys[b])
            if n < args.save_examples:
                sr = conf["data"]["sample_rate"]
                stem = os.path.join(examples_dir, f"ex{n}_{keys[b]}")
                write_wav(stem + "_mix.wav", batch["mix"][b], sr)
                for s_i in range(ests.shape[1]):
                    write_wav(f"{stem}_est{s_i+1}.wav", ests[b, s_i], sr)
                    write_wav(f"{stem}_src{s_i+1}.wav", batch["src"][b, s_i], sr)
            n += 1
        if n % 50 == 0:
            mean = tracker.get_mean()
            print(f"{n} utts: si-snr_i={mean['si-snr_i']:.2f} "
                  f"sdr_i={mean['sdr_i']:.2f}")

    tracker.final()
    mean, std = tracker.get_mean(), tracker.get_std()
    with open(os.path.join(out_dir, "results.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metric", "mean", "std"])
        for k in mean:
            w.writerow([k, mean[k], std[k]])
        # backend provenance: conformant (pypesq/pystoi) vs bundled
        # behavioral numpy implementations — never silently mixed
        w.writerow(["pesq_backend", tracker.pesq_backend, ""])
        w.writerow(["stoi_backend", tracker.stoi_backend, ""])
    print("final:", {k: round(v, 3) for k, v in mean.items()},
          f"[pesq={tracker.pesq_backend}, stoi={tracker.stoi_backend}]")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", required=True)
    parser.add_argument("--test-dir", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--save-examples", type=int, default=0,
                        help="export this many example separations as wavs")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(args)
