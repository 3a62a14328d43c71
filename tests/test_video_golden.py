"""Golden parity: FRCNNVideoModel vs the torch reference (weights converted).

Builds the REFERENCE torch video model from /root/reference (read-only, with
thop stubbed), randomizes its weights, converts them with
``rtfs_tpu.utils.torch_import``, and compares eval-mode outputs. Skips when
the reference checkout is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not available",
)


def _load_reference_videomodel():
    from ref_stubs import stub_reference_deps

    stub_reference_deps()
    from src.models.videomodels.frcnn_videomodel import FRCNNVideoModel

    return FRCNNVideoModel


@pytest.mark.parametrize("backbone", ["resnet", "shufflenet"])
def test_frcnn_videomodel_matches_reference(backbone):
    import torch

    import jax
    import jax.numpy as jnp

    from rtfs_tpu.models.video import FRCNNVideoModel as JaxModel
    from rtfs_tpu.utils.torch_import import convert_frcnn_video

    RefModel = _load_reference_videomodel()
    torch.manual_seed(0)
    ref = RefModel(backbone_type=backbone, relu_type="prelu",
                   pretrain=None, print_macs=False)
    ref.eval()
    # randomize BN running stats so eval-mode parity is actually exercised
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.data.normal_(0, 0.05)
            m.running_var.data.uniform_(0.5, 1.5)

    x = torch.randn(2, 1, 6, 88, 88)
    with torch.no_grad():
        ref_out = ref(x).numpy()  # (B, 512, T)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_frcnn_video(sd, backbone_type=backbone)

    model = JaxModel(backbone_type=backbone, relu_type="prelu")
    got = model.apply(variables, jnp.asarray(x.numpy()[:, 0]))  # (B, T, C)
    got = np.asarray(got).transpose(0, 2, 1)

    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)
