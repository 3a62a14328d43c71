"""Model-zoo coverage: every config family builds with the reference's exact
parameter count and runs a finite forward pass.

Reference counts were measured by instantiating the torch reference with
each config (sru/timm/thop stubbed); they pin the wiring of all families:
RTFS-Net (shared 2D TDANet + SRU dual-path + CAF), TDFNet (time-domain
enc/dec, 1D TDANet, GRU/MHSA global layers, per-repeat ConcatFusion, gated
mask), CTCNet (FRCNN audio+video nets).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtfs_tpu.config import build_avnet, load_config

REFERENCE_PARAM_COUNTS = {
    "lrs2_RTFSNet_4_layer": 739_952,
    "lrs2_RTFSNet_6_layer": 739_952,   # shared block: depth-free
    "lrs2_RTFSNet_12_layer": 739_952,
    "lrs2_TDFNet_16_3": 6_545_414,
    "lrs2_TDFNet_4_1": 5_776_644,
    "lrs2_TDFNet_16_3_mhsa_shared": 4_245_443,
    "lrs2_CTCNet_16_layer": 7_043_482,
}

WAV_LEN = 8000  # short but structurally valid (F=129 for STFT configs)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("name", sorted(REFERENCE_PARAM_COUNTS))
def test_param_count_matches_reference(name):
    conf = load_config(name)
    # shrink repeats for build speed where the count is repeat-invariant
    # (shared audio blocks); per-repeat models keep their true repeats.
    model = build_avnet(conf)
    wav = jnp.zeros((1, WAV_LEN), jnp.float32)
    mouth = jnp.zeros((1, 13, 512), jnp.float32)
    variables = jax.eval_shape(
        model.init, {"params": jax.random.PRNGKey(0)}, wav, mouth
    )
    n = _count(variables["params"])
    assert n == REFERENCE_PARAM_COUNTS[name], (
        f"{name}: {n} != reference {REFERENCE_PARAM_COUNTS[name]}"
    )


@pytest.mark.parametrize(
    "name", ["lrs2_TDFNet_4_1", "lrs2_CTCNet_16_layer"]
)
def test_forward_runs_finite(name):
    """Run the non-RTFS families forward (RTFS covered by the golden test).

    Repeats are shrunk to keep CPU compile fast; shapes/weights are real.
    """
    conf = load_config(name)
    conf["audionet"]["audio_params"]["repeats"] = 2
    conf["audionet"]["video_params"]["repeats"] = min(
        2, conf["audionet"]["video_params"]["repeats"]
    )
    model = build_avnet(conf)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, WAV_LEN)).astype(np.float32) * 0.1)
    mouth = jnp.asarray(rng.standard_normal((1, 13, 512)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav, mouth)
    out = model.apply(variables, wav, mouth)
    assert out.shape == (1, 1, WAV_LEN)
    assert bool(jnp.isfinite(out).all())
