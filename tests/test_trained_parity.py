"""TRAINED-weights parity vs the torch reference (r1 verdict item 6,
extended to FULL DEPTH in r3 per r2 verdict item 4).

Round 1's waveform goldens ran on random init; error accumulation on
trained weights (sharper gates, larger activations) was untested. No
published checkpoint is reachable offline, so this test trains the torch
reference itself for a short burst on synthetic data (enough for the loss
to drop well below init and gates to move off their bias init), imports
the trained state_dict through ``convert_avnet``, and asserts:

  - f32 waveform-allclose (same bar as the random-weight goldens), and
  - bf16 metric agreement: the bf16 model's SI-SNR to target within
    0.5 dB of the torch f32 model's.

Variants: a shrunk (2-repeat) fast case, the FULL-depth RTFS-Net-4
(4 shared repeats, exactly the flagship preset), and the BASELINE.md
north-star RTFS-Net-12 at full 12 shared repeats — trained-weight error
accumulation across the full recursion depth is precisely what the
shrunk case could not cover (reference depth recursion:
``src/models/TDAVNet/refinement_module.py:45-62``; trained-checkpoint
loading it models: ``base_av_model.py:24-34``).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_avnet_golden import _build_reference


def _si_snr(est, target, eps=1e-8):
    est = est - est.mean(-1, keepdims=True)
    target = target - target.mean(-1, keepdims=True)
    proj = (est * target).sum(-1, keepdims=True) * target / (
        (target**2).sum(-1, keepdims=True) + eps
    )
    noise = est - proj
    return 10 * np.log10(
        ((proj**2).sum(-1) + eps) / ((noise**2).sum(-1) + eps)
    )


def _run_trained_parity(config_name, shrink, train_steps=40):
    import torch

    from rtfs_tpu.config import build_avnet
    from rtfs_tpu.utils.precision import cast_params
    from rtfs_tpu.utils.torch_import import convert_avnet

    ref, conf = _build_reference(config_name, shrink)
    ref.train()

    # synthetic targets with distinct spectral signatures + a fixed mouth
    # embedding, so separation is learnable from the audio alone
    rng = np.random.default_rng(0)
    L, B = 8000, 2
    t = np.arange(L) / 16000.0
    tone = np.stack(
        [np.sin(2 * np.pi * (300 + 80 * b) * t) for b in range(B)]
    ).astype(np.float32)
    src = (tone * (0.5 + 0.5 * rng.standard_normal((B, L)).astype(np.float32)))
    noise = rng.standard_normal((B, L)).astype(np.float32) * 0.3
    mix = src + noise
    wav = torch.from_numpy(mix)
    target = torch.from_numpy(src)
    mouth_emb = torch.from_numpy(
        (rng.standard_normal((B, 512, 50)) * 0.5).astype(np.float32)
    )

    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    first = last = None
    for step in range(train_steps):
        opt.zero_grad()
        est = ref(wav, mouth_emb)[:, 0]  # n_src=1 extraction
        e = est - est.mean(-1, keepdim=True)
        s = target - target.mean(-1, keepdim=True)
        proj = (e * s).sum(-1, keepdim=True) * s / ((s**2).sum(-1, keepdim=True) + 1e-8)
        loss = -(10 * torch.log10(
            (proj**2).sum(-1) / ((e - proj) ** 2).sum(-1) + 1e-8
        )).mean()
        loss.backward()
        opt.step()
        if first is None:
            first = float(loss)
        last = float(loss)
    # training must have actually moved the weights
    assert last < first - 1.0, f"torch training failed to learn: {first} -> {last}"

    ref.eval()
    with torch.no_grad():
        ref_out = ref(wav, mouth_emb).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_avnet(sd, conf["audionet"])
    model = build_avnet(conf)
    jwav = jnp.asarray(mix)
    jemb = jnp.asarray(mouth_emb.numpy().transpose(0, 2, 1))

    got = np.asarray(model.apply(variables, jwav, jemb))
    scale = np.abs(ref_out).max()
    err = np.abs(got - ref_out).max()
    assert err < 5e-3 * max(scale, 1e-3), (
        f"trained-weight waveform mismatch: {err:.2e} vs scale {scale:.2e}"
    )

    # bf16: exactness is not expected; the separation METRIC must agree
    model_bf16 = dataclasses.replace(model, compute_dtype="bfloat16")
    got16 = np.asarray(
        model_bf16.apply(cast_params(variables), jwav, jemb)
    ).astype(np.float32)
    snr_ref = _si_snr(ref_out[:, 0], src).mean()
    snr_16 = _si_snr(got16[:, 0], src).mean()
    assert abs(snr_16 - snr_ref) < 0.5, (
        f"bf16 SI-SNR drifted: torch {snr_ref:.2f} dB vs bf16 {snr_16:.2f} dB"
    )


@pytest.mark.slow
def test_trained_weights_parity_shrunk():
    _run_trained_parity("lrs2_RTFSNet_4_layer", (2, 1))


@pytest.mark.slow
def test_trained_weights_parity_full_depth_rtfsnet4():
    """FULL flagship depth: 4 shared repeats, no shrink (r2 verdict #4)."""
    _run_trained_parity("lrs2_RTFSNet_4_layer", None)


@pytest.mark.slow
def test_trained_weights_parity_full_depth_rtfsnet12():
    """BASELINE.md north star: RTFS-Net-12 at full 12 shared repeats,
    trained weights (r2 verdict #4). Fewer torch steps to bound CPU time;
    the loss-drop assertion still guarantees the gates moved."""
    _run_trained_parity("lrs2_RTFSNet_12_layer", None, train_steps=25)
