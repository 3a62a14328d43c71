"""FULL-MODEL golden parity: rtfs_tpu AVNet vs the torch reference.

Builds the reference AVNet (RTFS-Net-4 LRS2 config) from /root/reference
with randomly initialized weights (sru replaced by a faithful torch stub —
see ref_stubs), converts the state_dict with ``convert_avnet``, and compares
the separated WAVEFORMS end-to-end. This is the BASELINE.md north-star
"waveform-allclose vs PyTorch" check, runnable wherever the reference
checkout exists.
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


def _build_reference(config_name, shrink_repeats=None):
    sys.path.insert(0, os.path.dirname(__file__))
    from ref_stubs import stub_reference_deps

    stub_reference_deps()
    import torch
    import yaml

    conf = yaml.safe_load(
        open(os.path.join(REF, f"config/{config_name}.yaml"))
    )
    if shrink_repeats:
        conf["audionet"]["audio_params"]["repeats"] = shrink_repeats[0]
        conf["audionet"]["video_params"]["repeats"] = shrink_repeats[1]
    from src.models import AVNet as RefAVNet

    torch.manual_seed(0)
    a = dict(conf["audionet"])
    a["print_macs"] = False
    ref = RefAVNet(**a)
    ref.eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.data.normal_(0, 0.05)
            m.running_var.data.uniform_(0.8, 1.2)
    return ref, conf


@pytest.mark.parametrize(
    "config_name,shrink",
    [
        ("lrs2_RTFSNet_4_layer", None),
        # the BASELINE.md north star names RTFS-Net-12 specifically: full
        # 12 shared repeats, no shrink
        ("lrs2_RTFSNet_12_layer", None),
        ("lrs2_TDFNet_16_3", (3, 2)),   # shrink repeats for CPU speed
        ("lrs2_CTCNet_16_layer", (3, 2)),
    ],
)
def test_avnet_waveform_allclose(config_name, shrink):
    import torch

    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet
    from rtfs_tpu.utils.torch_import import convert_avnet

    ref, conf = _build_reference(config_name, shrink)
    torch.manual_seed(1)
    wav = torch.randn(2, 32000) * 0.1
    mouth_emb = torch.randn(2, 512, 50) * 0.5  # reference layout (B, C, T)

    with torch.no_grad():
        ref_out = ref(wav, mouth_emb).numpy()  # (B, n_src, L)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_avnet(sd, conf["audionet"])

    model = build_avnet(conf)
    got = model.apply(
        variables,
        jnp.asarray(wav.numpy()),
        jnp.asarray(mouth_emb.numpy().transpose(0, 2, 1)),  # (B, T, C)
    )
    got = np.asarray(got)

    assert got.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    err = np.abs(got - ref_out).max()
    assert err < 5e-3 * max(scale, 1e-3), (
        f"waveform mismatch: max abs err {err:.2e} vs scale {scale:.2e}"
    )
