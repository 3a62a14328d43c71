"""End-to-end legacy presets: DPTNet + legacy attention zoo (verdict item 10).

Two shipped presets exercise the breadth registry for real:
  - ``legacy_lrs2_mini``: DPTNet separator whose per-repeat stack is
    CBAMBlock -> CoTAttention -> ShuffleAttention (the legacy zoo), FRCNN
    video backbone (reference config/legacy-configs/lrs2_mini.yml).
  - ``legacy_lrs2_dptnet2d_mini``: 2D DPTNet + GlobalAttention2D + AE
    (EncoderAE) video path (reference lrs2_dptnet2d_mini.yml, adapted to
    the live ``layers:`` API — the upstream yaml passes an
    ``attention_params`` key that appears nowhere in the reference source
    and crashes its own DPTNet).

Each preset is checked for exact param parity against the torch reference
built from the same config, and waveform-allclose through ``convert_avnet``
like the flagship goldens.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not available",
)


def _build_ref_from_conf(conf):
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_stubs import stub_reference_deps

    stub_reference_deps()
    import torch

    from src.models import AVNet as RefAVNet

    torch.manual_seed(0)
    a = dict(conf["audionet"])
    a["print_macs"] = False
    ref = RefAVNet(**a)
    ref.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.data.normal_(0, 0.05)
            m.running_var.data.uniform_(0.8, 1.2)
    return ref


@pytest.mark.parametrize(
    "preset,emb_shape",
    [
        ("legacy_lrs2_mini", (2, 50, 512)),          # FRCNN 1D embeddings
        ("legacy_lrs2_dptnet2d_mini", (2, 50, 16, 121)),  # AE 2D embeddings
    ],
)
def test_legacy_preset_golden(preset, emb_shape):
    import torch

    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet, load_config
    from rtfs_tpu.utils.flops import param_count
    from rtfs_tpu.utils.torch_import import convert_avnet

    conf = load_config(preset)
    ref = _build_ref_from_conf(conf)
    model = build_avnet(conf)

    torch.manual_seed(1)
    wav = torch.randn(2, 32000) * 0.1
    # reference video embeddings are channel-first: (B, C, T) for 1D,
    # (B, H'W', T, C) for the 2D AE path
    if len(emb_shape) == 3:
        emb_t = torch.randn(emb_shape[0], emb_shape[2], emb_shape[1]) * 0.5
        emb_j = jnp.asarray(emb_t.numpy().transpose(0, 2, 1))
    else:
        b, t, c, hw = emb_shape
        emb_t = torch.randn(b, hw, t, c) * 0.5
        emb_j = jnp.asarray(emb_t.numpy().transpose(0, 2, 3, 1))

    with torch.no_grad():
        ref_out = ref(wav, emb_t).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_avnet(sd, conf["audionet"])
    assert param_count(variables["params"]) == sum(
        p.numel() for p in ref.parameters()
    )

    got = np.asarray(model.apply(variables, jnp.asarray(wav.numpy()), emb_j))
    assert got.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    err = np.abs(got - ref_out).max()
    assert err < 5e-3 * max(scale, 1e-3), (
        f"{preset}: waveform mismatch {err:.2e} vs scale {scale:.2e}"
    )
