"""Generate a learnable LRS2-like audio-visual corpus on disk.

Produces the exact on-disk layout the reference training pipeline consumes
(``/root/reference/src/datas/avspeech_dataset.py:25-60``): per-split
``{mix,s1,s2}/*.wav`` + ``mouths/*.npz`` (uint8 ``data`` of shape
``(50, 96, 96)``) + ``{mix,s1,s2}.json`` manifests — so ``train.py`` /
``test.py`` run unmodified on it.

The task is genuinely audio-visual, not a toy identity map:

- each of ``n_speakers`` voices is a distinct harmonic stack (speaker f0 +
  per-harmonic decay + vibrato), articulated by a random syllable-burst
  envelope per utterance;
- the mouth video for a source shows an ellipse whose opening tracks that
  source's 25 fps amplitude envelope, on a fixed per-speaker facial
  texture — so the lips say BOTH who to extract and when they speak;
- mixtures sum two different speakers at a random ±3 dB SIR.

A model can only separate by conditioning on the video, which is what the
convergence experiment (experiments/) demonstrates.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

SR = 16000
DUR = 2.0
FPS = 25
N_FRAMES = int(DUR * FPS)
MOUTH_HW = 96


def speaker_bank(n_speakers: int, rng: np.random.Generator):
    """Per-speaker timbre parameters."""
    bank = []
    for _ in range(n_speakers):
        f0 = float(rng.uniform(85.0, 280.0))
        rolloff = float(rng.uniform(0.55, 0.85))
        n_harm = int(min(12, 4000.0 // f0))
        jitter = rng.uniform(0.6, 1.4, n_harm)
        vib_rate = float(rng.uniform(4.0, 7.0))
        vib_depth = float(rng.uniform(0.002, 0.006))
        # fixed facial texture (smooth low-freq noise), uint8 0..70
        tex = rng.standard_normal((MOUTH_HW // 8, MOUTH_HW // 8))
        tex = np.kron(tex, np.ones((8, 8)))
        tex = (tex - tex.min()) / (np.ptp(tex) + 1e-9) * 70.0
        bank.append(dict(f0=f0, rolloff=rolloff, jitter=jitter,
                         vib_rate=vib_rate, vib_depth=vib_depth, tex=tex))
    return bank


def syllable_envelope(rng: np.random.Generator) -> np.ndarray:
    """Random syllable-burst amplitude envelope, (SR*DUR,) in [0, 1]."""
    n = int(SR * DUR)
    env = np.zeros(n, np.float32)
    for _ in range(int(rng.integers(4, 9))):
        center = rng.uniform(0.05, DUR - 0.05)
        width = rng.uniform(0.08, 0.25)
        amp = rng.uniform(0.5, 1.0)
        t0 = max(0, int((center - width) * SR))
        t1 = min(n, int((center + width) * SR))
        if t1 <= t0 + 8:
            continue
        env[t0:t1] += amp * np.hanning(t1 - t0).astype(np.float32)
    return np.clip(env, 0.0, 1.0)


def utterance(spk: dict, rng: np.random.Generator):
    """One 2 s utterance for a speaker: (wav float32, frame envelope)."""
    n = int(SR * DUR)
    t = np.arange(n, dtype=np.float64) / SR
    env = syllable_envelope(rng)
    vib = 1.0 + spk["vib_depth"] * np.sin(
        2 * np.pi * spk["vib_rate"] * t + rng.uniform(0, 2 * np.pi)
    )
    phase_base = 2 * np.pi * spk["f0"] * np.cumsum(vib) / SR
    wav = np.zeros(n, np.float64)
    for h in range(1, len(spk["jitter"]) + 1):
        a = (spk["rolloff"] ** h) * spk["jitter"][h - 1]
        wav += a * np.sin(h * phase_base + rng.uniform(0, 2 * np.pi))
    wav = (wav / (np.abs(wav).max() + 1e-9)).astype(np.float32) * env
    frame_env = env.reshape(N_FRAMES, -1).mean(-1)
    frame_env = frame_env / (frame_env.max() + 1e-9)
    return wav, frame_env


def mouth_video(spk: dict, frame_env: np.ndarray,
                rng: np.random.Generator) -> np.ndarray:
    """(N_FRAMES, 96, 96) uint8: per-speaker face + articulating mouth."""
    yy, xx = np.mgrid[0:MOUTH_HW, 0:MOUTH_HW].astype(np.float32)
    cy, cx = 58.0, 48.0
    frames = np.empty((N_FRAMES, MOUTH_HW, MOUTH_HW), np.float32)
    half_w = 20.0
    for f in range(N_FRAMES):
        open_h = 2.0 + 26.0 * float(frame_env[f])
        ellipse = ((xx - cx) / half_w) ** 2 + ((yy - cy) / open_h) ** 2
        mouth = np.where(ellipse <= 1.0, 185.0, 0.0)
        lips = np.where((ellipse > 1.0) & (ellipse <= 1.45), 120.0, 0.0)
        frames[f] = spk["tex"] + mouth + lips
    frames += rng.standard_normal(frames.shape).astype(np.float32) * 4.0
    return np.clip(frames, 0, 255).astype(np.uint8)


def write_wav(path: str, wav: np.ndarray):
    from scipy.io import wavfile

    wavfile.write(path, SR, wav.astype(np.float32))


def make_split(root: str, split: str, n_mix: int, bank, rng):
    sdir = os.path.join(root, split)
    for d in ("mix", "s1", "s2", "mouths"):
        os.makedirs(os.path.join(sdir, d), exist_ok=True)
    entries = {"mix": [], "s1": [], "s2": []}
    n = int(SR * DUR)
    for i in range(n_mix):
        a, b = rng.choice(len(bank), size=2, replace=False)
        stem = f"spk{a:02d}_{split}{i:04d}_spk{b:02d}"
        wavs, mouths = [], []
        for spk_id in (a, b):
            w, fenv = utterance(bank[spk_id], rng)
            wavs.append(w)
            mouths.append(mouth_video(bank[spk_id], fenv, rng))
        # random ±3 dB SIR on the second source
        gain = 10.0 ** (rng.uniform(-3.0, 3.0) / 20.0)
        wavs[1] = wavs[1] * gain
        mix = wavs[0] + wavs[1]
        peak = np.abs(mix).max() + 1e-9
        scale = 0.9 / max(peak, 1.0)
        mix, wavs = mix * scale, [w * scale for w in wavs]

        mp = os.path.join(sdir, "mix", stem + ".wav")
        write_wav(mp, mix)
        entries["mix"].append((mp, n))
        for k, (name, spk_id) in enumerate((("s1", a), ("s2", b))):
            wp = os.path.join(sdir, name, stem + ".wav")
            write_wav(wp, wavs[k])
            zp = os.path.join(sdir, "mouths", f"{stem}_{name}.npz")
            np.savez_compressed(zp, data=mouths[k])
            entries[name].append((wp, zp, n))
    for name, info in entries.items():
        with open(os.path.join(sdir, f"{name}.json"), "w") as f:
            json.dump(info, f)
    print(f"{split}: {n_mix} mixtures -> {sdir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/synth")
    p.add_argument("--train", type=int, default=120)
    p.add_argument("--val", type=int, default=30)
    p.add_argument("--test", type=int, default=30)
    p.add_argument("--speakers", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    bank = speaker_bank(args.speakers, rng)
    make_split(args.out, "tr", args.train, bank, rng)
    make_split(args.out, "cv", args.val, bank, rng)
    make_split(args.out, "tt", args.test, bank, rng)


if __name__ == "__main__":
    main()
