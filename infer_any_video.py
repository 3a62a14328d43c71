"""In-the-wild inference: any mp4 → lip crops → separation → muxed video.

Counterpart of the reference ``infer_any_video.py:19-108``. ffmpeg extracts
audio, mediapipe extracts 88×88 lip crops (``rtfs_tpu.data.lip_extraction``,
optional deps), the model separates the target speaker, and ffmpeg muxes the
separated audio back into the video.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import time

import numpy as np


def extract_audio(video_path: str, out_wav: str, sr: int):
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path, "-vn",
         "-ac", "1", "-ar", str(sr), out_wav],
        check=True,
    )


def add_audio_to_video(video_path: str, wav_path: str, out_path: str):
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path, "-i",
         wav_path, "-map", "0:v", "-map", "1:a", "-c:v", "copy",
         "-shortest", out_path],
        check=True,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf-dir", required=True)
    parser.add_argument("--video", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--out-dir", default="separated")
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.data import preprocess_mouth
    from rtfs_tpu.data.lip_extraction import get_video_crops
    from rtfs_tpu.models.video import make_video_model
    from rtfs_tpu.train.checkpoints import load_exported
    from rtfs_tpu.utils.separator import separate_sample
    from inference import write_wav

    conf = load_config(args.conf_dir)
    sr = conf["data"]["sample_rate"]
    exp_dir = os.path.dirname(os.path.abspath(args.conf_dir))

    os.makedirs(args.out_dir, exist_ok=True)
    key = os.path.splitext(os.path.basename(args.video))[0]

    t0 = time.time()
    wav_path = os.path.join(args.out_dir, f"{key}_mix.wav")
    extract_audio(args.video, wav_path, sr)
    from rtfs_tpu.data.native_wav import read_wav

    wav = read_wav(wav_path)[: sr * 2]
    print(f"audio extracted ({time.time()-t0:.1f}s)")

    t0 = time.time()
    crops = get_video_crops(args.video)
    mouth = preprocess_mouth(crops, train=False)
    print(f"lip crops: {crops.shape} ({time.time()-t0:.1f}s)")

    model = build_avnet(conf)
    video_model = make_video_model(conf["videonet"])
    bundle = load_exported(args.model or os.path.join(exp_dir, "best_model.bin"))
    state = bundle["state"]
    variables = {"params": state["params"],
                 "batch_stats": state.get("batch_stats", {})}

    t0 = time.time()
    emb = video_model.apply(state.get("video_variables", {}),
                            jnp.asarray(mouth[None]))
    est = separate_sample(model, variables, wav, np.asarray(emb[0]))
    print(f"separated ({time.time()-t0:.1f}s)")

    for i, src in enumerate(est):
        est_wav = os.path.join(args.out_dir, f"{key}_est{i + 1}.wav")
        write_wav(est_wav, src, sr)
        out_video = os.path.join(args.out_dir, f"{key}_est{i + 1}.mp4")
        add_audio_to_video(args.video, est_wav, out_video)
        print("wrote", out_video)


if __name__ == "__main__":
    main()
