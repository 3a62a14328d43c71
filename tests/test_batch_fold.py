"""Batch-pair channel folding: exact-equality vs the plain layout.

``AVNet.batch_fold=f`` runs the refinement core on (B/f, T, F, f*C)
tensors so every channel axis is a multiple of 128 lanes (removing the 2x
HBM lane-padding tax on 64-channel tensors — see layers.batch_fold). It
is a pure computation-layout transformation: SAME parameters, SAME math
(dense convs become groups=f with replicated weights, depthwise convs get
tiled kernels, gLN takes per-group stats). These tests pin that claim:
outputs and parameter gradients of fold=2 must match fold=1 to reduction-
order tolerance on every supported preset family.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.config import build_avnet, load_config


def _init(model, b=4):
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((b, 32000)).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.standard_normal((b, 50, 512)).astype(np.float32) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), wav[:1], emb[:1])
    return variables, wav, emb


@pytest.mark.parametrize(
    "preset,shrink",
    [
        ("lrs2_RTFSNet_4_layer", 2),     # STFT 2D + TDANet + CAF + RI mask
        ("lrs2_TDFNet_16_3", 2),         # conv enc 1D + GRU att + Concat
        ("lrs2_CTCNet_16_layer", 2),     # FRCNN audio/video (fold_concat)
    ],
)
def test_fold2_matches_fold1(preset, shrink):
    conf = load_config(preset)
    if shrink:
        conf["audionet"]["audio_params"]["repeats"] = shrink
        conf["audionet"]["video_params"]["repeats"] = min(
            conf["audionet"]["video_params"]["repeats"], 1
        )
    model = build_avnet(conf)
    variables, wav, emb = _init(model)

    out1 = np.asarray(model.apply(variables, wav, emb))
    model2 = dataclasses.replace(model, batch_fold=2)
    out2 = np.asarray(model2.apply(variables, wav, emb))
    np.testing.assert_allclose(out2, out1, atol=2e-5, rtol=1e-4)


def test_fold2_gradients_match():
    conf = load_config("lrs2_RTFSNet_4_layer")
    conf["audionet"]["audio_params"]["repeats"] = 2
    conf["audionet"]["video_params"]["repeats"] = 1
    model = build_avnet(conf)
    variables, wav, emb = _init(model)
    tgt = wav[:, None] * 0.5

    def make_loss(mdl):
        def loss(params):
            out = mdl.apply(
                {"params": params, **{k: v for k, v in variables.items()
                                      if k != "params"}}, wav, emb,
            )
            return jnp.mean((out - tgt) ** 2) * 1e3
        return loss

    from jax.flatten_util import ravel_pytree

    g1 = jax.grad(make_loss(model))(variables["params"])
    g2 = jax.grad(make_loss(dataclasses.replace(model, batch_fold=2)))(
        variables["params"]
    )
    flat1, _ = ravel_pytree(g1)
    flat2, _ = ravel_pytree(g2)
    np.testing.assert_allclose(
        np.asarray(flat2), np.asarray(flat1), atol=5e-5, rtol=5e-3
    )


def test_fold_rejects_odd_batch():
    conf = load_config("lrs2_RTFSNet_4_layer")
    conf["audionet"]["audio_params"]["repeats"] = 1
    conf["audionet"]["video_params"]["repeats"] = 1
    model = build_avnet(conf)
    variables, wav, emb = _init(model, b=3)
    with pytest.raises(ValueError, match="batch_fold"):
        dataclasses.replace(model, batch_fold=2).apply(variables, wav, emb)


def test_fold_bf16_close():
    """bf16 + fold: the production TPU configuration."""
    conf = load_config("lrs2_RTFSNet_4_layer")
    conf["audionet"]["audio_params"]["repeats"] = 2
    conf["audionet"]["video_params"]["repeats"] = 1
    model = build_avnet(conf)
    variables, wav, emb = _init(model)
    from rtfs_tpu.utils.precision import cast_params

    mb = dataclasses.replace(model, compute_dtype="bfloat16")
    out1 = np.asarray(mb.apply(cast_params(variables), wav, emb))
    mb2 = dataclasses.replace(mb, batch_fold=2)
    out2 = np.asarray(mb2.apply(cast_params(variables), wav, emb))
    # bf16 reduction-order differences only
    scale = np.abs(out1).max()
    assert np.abs(out2 - out1).max() < 2e-2 * max(scale, 1e-3)
