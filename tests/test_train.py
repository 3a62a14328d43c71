"""End-to-end training-step tests on a micro RTFS config (fast CPU compile).

Covers: system build, train/val steps, finite losses, param updates, BN
stat mutation, and 8-device data-parallel sharding — the same machinery the
full configs use, at toy sizes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

MICRO_AUDIONET = {
    "n_src": 1,
    "pretrained_vout_chan": 32,
    "video_bn_params": {"kernel_size": -1},
    "audio_bn_params": {
        "pre_norm_type": "gLN", "pre_act_type": "ReLU",
        "out_chan": 16, "kernel_size": 1, "is2d": True,
    },
    "enc_dec_params": {
        "encoder_type": "STFTEncoder", "decoder_type": "STFTDecoder",
        "win": 64, "hop_length": 32, "out_chan": 16, "kernel_size": 3,
        "stride": 1, "bias": False, "act_type": None, "norm_type": None,
    },
    "audio_params": {
        "audio_net": "TDANet", "hid_chan": 8, "kernel_size": 4, "stride": 2,
        "norm_type": "gLN", "act_type": "PReLU", "upsampling_depth": 2,
        "repeats": 2, "shared": True, "is2d": True,
        "layers": {
            "layer_1": {
                "layer_type": "DualPathRNN", "hid_chan": 4, "dim": 4,
                "kernel_size": 4, "stride": 1, "rnn_type": "SRU",
                "num_layers": 2, "bidirectional": True,
            },
            "layer_2": {
                "layer_type": "MultiHeadSelfAttention2D", "dim": 3,
                "n_freqs": 16, "n_head": 2, "hid_chan": 2,
                "act_type": "PReLU", "norm_type": "LayerNormalization4D",
            },
        },
    },
    "video_params": {
        "video_net": "TDANet", "hid_chan": 8, "kernel_size": 3, "stride": 2,
        "norm_type": "BatchNorm1d", "act_type": "PReLU",
        "upsampling_depth": 2, "repeats": 1, "shared": True, "is2d": False,
        "layers": {
            "layer_1": {
                "layer_type": "GlobalAttention", "kernel_size": 3,
                "n_head": 2, "dropout": 0.1,
            }
        },
    },
    "fusion_params": {
        "fusion_type": "ATTNFusion", "fusion_shared": True,
        "kernel_size": 4, "is2d": True,
    },
    "mask_generation_params": {
        "mask_generator_type": "MaskGenerator", "mask_act": "ReLU",
        "RI_split": True, "is2d": True,
    },
}

WAV_LEN = 1024  # -> T=33 frames, F=33 bins; pooled F'=16 (n_freqs=16)


def _make_model():
    from rtfs_tpu.models.avnet import AVNet

    a = MICRO_AUDIONET
    return AVNet(
        n_src=a["n_src"],
        enc_dec_params=a["enc_dec_params"],
        audio_bn_params=a["audio_bn_params"],
        audio_params=a["audio_params"],
        mask_generation_params=a["mask_generation_params"],
        pretrained_vout_chan=a["pretrained_vout_chan"],
        video_bn_params=a["video_bn_params"],
        video_params=a["video_params"],
        fusion_params=a["fusion_params"],
    )


def _batch(b=2):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((b, 1, WAV_LEN)).astype(np.float32) * 0.1
    return {
        "mix": src[:, 0],
        "src": src,
        "mouth": rng.standard_normal((b, 6, 32)).astype(np.float32),
    }


class _MouthEmbed:
    """Stand-in frozen video backbone: linear proj of flattened mouths."""

    def init(self, rngs, mouth):
        return {"params": {}}

    def apply(self, variables, mouth):
        b, t = mouth.shape[0], mouth.shape[1]
        reps = -(-32 // mouth.shape[-1])
        return jnp.tile(mouth, (1, 1, reps))[..., :32]


def test_train_and_val_step():
    from rtfs_tpu.train import AVSystem, make_optimizer

    model = _make_model()
    system = AVSystem(
        model, video_model=_MouthEmbed(),
        optimizer=make_optimizer("adamw", lr=1e-3, weight_decay=0.1),
        donate_state=False,
    )
    batch = _batch()
    state = system.create_state(jax.random.PRNGKey(0), batch)

    state2, metrics = system.train_step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["train_loss"])
    assert np.isfinite(loss)

    # params must change
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0

    # another step: loss stays finite
    _, m2 = system.train_step(state2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["train_loss"]))

    val = system.val_step(state2, batch)
    assert np.isfinite(float(val["val_loss"]))


def test_batchnorm_stats_update():
    from rtfs_tpu.train import AVSystem, make_optimizer

    model = _make_model()
    system = AVSystem(model, video_model=_MouthEmbed(),
                      optimizer=make_optimizer("adam", lr=1e-3),
                      donate_state=False)
    batch = _batch()
    state = system.create_state(jax.random.PRNGKey(0), batch)
    state2, _ = system.train_step(state, batch, jax.random.PRNGKey(1))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.batch_stats, state2.batch_stats,
    )
    assert max(jax.tree.leaves(diffs)) > 0, "BN running stats did not update"


def test_data_parallel_sharded_step():
    from rtfs_tpu.parallel import make_mesh, replicate, shard_batch
    from rtfs_tpu.train import AVSystem, make_optimizer

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=8)
    model = _make_model()
    system = AVSystem(model, video_model=_MouthEmbed(),
                      optimizer=make_optimizer("adamw", lr=1e-3), mesh=mesh,
                      donate_state=False)
    batch = _batch(b=8)
    state = system.create_state(jax.random.PRNGKey(0), batch)
    state = replicate(mesh, state)
    sbatch = shard_batch(mesh, batch)
    rng = replicate(mesh, jax.random.PRNGKey(1))
    state2, metrics = system.train_step(state, sbatch, rng)
    assert np.isfinite(float(metrics["train_loss"]))

    # single-device reference: same batch un-sharded must give ~same loss
    system1 = AVSystem(model, video_model=_MouthEmbed(),
                       optimizer=make_optimizer("adamw", lr=1e-3),
                       donate_state=False)
    state1 = system1.create_state(jax.random.PRNGKey(0), batch)
    _, m1 = system1.train_step(state1, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["train_loss"]), float(m1["train_loss"]),
        rtol=1e-4, atol=1e-4,
    )


class _MouthEmbed5D:
    """Stand-in backbone taking folded (N, T, H, W) mouths -> (N, T, 32)."""

    def init(self, rngs, mouth):
        assert mouth.ndim == 4, "system must fold the speaker dim"
        return {"params": {}}

    def apply(self, variables, mouth):
        feat = mouth.mean((-1, -2))
        return jnp.repeat(feat[..., None], 32, axis=-1)


def test_n_src2_av_per_speaker_extraction():
    """Per-source mouths (B, 2, T, H, W) run as per-speaker extraction."""
    from rtfs_tpu.train import AVSystem, make_optimizer

    model = _make_model()  # 1-mask model
    system = AVSystem(model, video_model=_MouthEmbed5D(),
                      optimizer=make_optimizer("adam", lr=1e-3),
                      donate_state=False)
    rng = np.random.default_rng(0)
    b = 2
    src = rng.standard_normal((b, 2, WAV_LEN)).astype(np.float32) * 0.1
    batch = {
        "mix": src.sum(1),
        "src": src,
        "mouth": rng.standard_normal((b, 2, 4, 8, 8)).astype(np.float32),
    }
    state = system.create_state(jax.random.PRNGKey(0), batch)
    state2, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train_loss"]))
    val = system.val_step(state2, batch)
    assert np.isfinite(float(val["val_loss"]))


def test_unfold_speakers_rejects_multimask():
    """n_src>=2 mouths with a multi-mask model must fail loudly."""
    from rtfs_tpu.train.system import _fold_speakers, _unfold_speakers

    m, s = _fold_speakers(np.zeros((2, 3, 4, 8, 8), np.float32))
    assert m.shape == (6, 4, 8, 8) and s == 3
    m4, s4 = _fold_speakers(np.zeros((2, 4, 8, 8), np.float32))
    assert m4.shape == (2, 4, 8, 8) and s4 == 1

    ests = jnp.zeros((4, 1, 16))
    assert _unfold_speakers(ests, 2).shape == (2, 2, 16)
    with pytest.raises(ValueError, match="1-mask"):
        _unfold_speakers(jnp.zeros((4, 2, 16)), 2)


def test_online_mixing():
    """Online mixing preserves per-slot energies and mix = sum(src)."""
    from rtfs_tpu.data.mixing import online_mixing

    rng = np.random.default_rng(0)
    src = rng.standard_normal((4, 2, 100)).astype(np.float32)
    batch = {"src": jnp.asarray(src), "mix": jnp.asarray(src.sum(1))}
    out = online_mixing(batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out["mix"]), np.asarray(out["src"]).sum(1), atol=1e-5
    )
    e_in = (src**2).sum(-1)
    e_out = (np.asarray(out["src"]) ** 2).sum(-1)
    np.testing.assert_allclose(e_out, e_in, rtol=1e-3)


def test_training_determinism():
    """Same seeds -> bitwise-identical first-step loss and params."""
    from rtfs_tpu.train import AVSystem, make_optimizer

    losses, leaves = [], []
    for _ in range(2):
        model = _make_model()
        system = AVSystem(model, video_model=_MouthEmbed(),
                          optimizer=make_optimizer("adamw", lr=1e-3),
                          donate_state=False)
        batch = _batch()
        state = system.create_state(jax.random.PRNGKey(7), batch)
        state, m = system.train_step(state, batch, jax.random.PRNGKey(8))
        losses.append(float(m["train_loss"]))
        leaves.append(np.asarray(jax.tree.leaves(state.params)[0]))
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(leaves[0], leaves[1])


def test_audio_only_training():
    """No video branch: empty video/fusion params + video_model=None."""
    from rtfs_tpu.models.avnet import AVNet
    from rtfs_tpu.train import AVSystem, make_optimizer

    a = {k: v for k, v in MICRO_AUDIONET.items()}
    model = AVNet(
        n_src=1,
        enc_dec_params=a["enc_dec_params"],
        audio_bn_params=a["audio_bn_params"],
        audio_params=a["audio_params"],
        mask_generation_params=a["mask_generation_params"],
    )
    system = AVSystem(model, video_model=None,
                      optimizer=make_optimizer("adam", lr=1e-3),
                      donate_state=False)
    rng = np.random.default_rng(0)
    src = rng.standard_normal((2, 1, WAV_LEN)).astype(np.float32) * 0.1
    batch = {"mix": src[:, 0], "src": src}
    state = system.create_state(jax.random.PRNGKey(0), batch)
    state2, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train_loss"]))
    val = system.val_step(state2, batch)
    assert np.isfinite(float(val["val_loss"]))


def test_joint_video_training():
    """train_video_model=True: video params receive gradients and update."""
    from flax import linen as nn

    from rtfs_tpu.train import AVSystem, make_optimizer

    class TinyVideoNet(nn.Module):
        @nn.compact
        def __call__(self, mouth, train=False):  # (B, T, 32) -> (B, T, 32)
            return nn.Dense(32)(mouth)

    model = _make_model()
    system = AVSystem(model, video_model=TinyVideoNet(),
                      optimizer=make_optimizer("adam", lr=1e-3),
                      train_video_model=True, donate_state=False)
    batch = _batch()
    state = system.create_state(jax.random.PRNGKey(0), batch)
    assert "video" in state.params and "audio" in state.params
    state2, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train_loss"]))
    dv = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      state.params["video"], state2.params["video"])
    assert max(jax.tree.leaves(dv)) > 0, "video params did not update"
    val = system.val_step(state2, batch)
    assert np.isfinite(float(val["val_loss"]))
