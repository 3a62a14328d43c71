"""Long-form chunked inference (``separate_long``) golden tests.

The reference hard-truncates every utterance to 2 s
(``/root/reference/src/datas/avspeech_dataset.py:167,215``); this repo's
``separate_long`` serves arbitrary lengths through the one fixed-shape
compiled forward by 50%-overlap chunking with Hann cross-fade and per-chunk
PIT permutation alignment (``rtfs_tpu/utils/separator.py:55-169``). These
tests pin the stitching contract: a chunk-wise oracle whose output order
flips arbitrarily per chunk (exactly what a PIT-trained model does) must be
stitched back into permutation-stable, near-perfect full-length sources.
"""

import numpy as np
import pytest

from rtfs_tpu.utils.separator import separate_long, separate_sample

SR = 16000
SEG = 32000  # the flagship 2 s compiled shape


def _speechlike(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    f0 = 110.0 + 25.0 * np.sin(2 * np.pi * (0.5 + 0.1 * seed) * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    x = sum(np.sin(k * phase) / k for k in range(1, 6))
    x = x * (0.5 + 0.5 * np.sin(2 * np.pi * 3.7 * t + seed))
    x = x + 0.05 * rng.standard_normal(n)
    return (x / np.std(x)).astype(np.float32)


class ChunkOracle:
    """Stand-in 'model' that separates perfectly but permutes its output
    order per chunk — the adversarial case for stitching.

    Locates the incoming chunk inside the stored full mixture by exact
    prefix match (chunks are literal slices of it), returns the true
    sources there, and flips their order on every other chunk start.
    """

    def __init__(self, mix, sources, flip_rule="parity"):
        self.mix = mix
        self.sources = sources  # (n_src, L)
        self.flip_rule = flip_rule
        self.calls = []

    def apply(self, variables, wav, emb=None):
        wav = np.asarray(wav)  # forces the jit fallback path, by design
        assert wav.ndim == 2 and wav.shape[0] == 1
        chunk = wav[0]
        probe = chunk[:256]
        L = len(self.mix)
        offset = None
        for s0 in range(0, L):
            if s0 + 256 <= L and np.array_equal(self.mix[s0:s0 + 256], probe):
                offset = s0
                break
        assert offset is not None, "chunk is not a slice of the mixture"
        self.calls.append(offset)
        n = chunk.shape[-1]
        out = np.zeros((1, self.sources.shape[0], n), np.float32)
        avail = min(n, L - offset)
        out[0, :, :avail] = self.sources[:, offset:offset + avail]
        if self.flip_rule == "parity" and (len(self.calls) % 2 == 0):
            out = out[:, ::-1]
        return out


def _si_snr(est, ref):
    est = est - est.mean()
    ref = ref - ref.mean()
    proj = np.dot(est, ref) / (np.dot(ref, ref) + 1e-12) * ref
    noise = est - proj
    return 10 * np.log10(np.dot(proj, proj) / (np.dot(noise, noise) + 1e-12))


def _best_perm_sisnr(est, refs):
    """Global-permutation SI-SNR: high only if NO chunk mixed speakers."""
    import itertools

    best = -np.inf
    for perm in itertools.permutations(range(refs.shape[0])):
        score = np.mean([_si_snr(est[p], refs[i])
                         for i, p in enumerate(perm)])
        best = max(best, score)
    return best


def test_separate_long_stitches_permuted_chunks():
    """5 s mixture, 2 s chunks at 50% overlap, oracle flips source order on
    every other chunk: the stitched output must be permutation-stable and
    near-perfect (>=30 dB SI-SNR). Without ``_align_permutation`` this
    would mix speakers mid-utterance and score near 0 dB."""
    L = 5 * SR
    s1, s2 = _speechlike(L, 1), _speechlike(L, 2)
    sources = np.stack([s1, s2])
    mix = (s1 + s2).astype(np.float32)
    oracle = ChunkOracle(mix, sources)

    out = separate_long(oracle, {}, mix, segment_samples=SEG)
    assert out.shape == (2, L)
    assert len(oracle.calls) >= 4  # actually chunked
    score = _best_perm_sisnr(out, sources)
    assert score > 30.0, score


def test_separate_long_matches_full_reference():
    """Chunked output must agree with the oracle's direct full-length
    separation after the same energy renormalization — i.e. the Hann
    cross-fade + overlap-add itself is transparent (allclose, not just
    high SI-SNR)."""
    from rtfs_tpu.utils.separator import _energy_renormalize

    L = 4 * SR
    s1, s2 = _speechlike(L, 3), _speechlike(L, 4)
    sources = np.stack([s1, s2])
    mix = (s1 + s2).astype(np.float32)
    oracle = ChunkOracle(mix, sources, flip_rule="none")

    out = separate_long(oracle, {}, mix, segment_samples=SEG)
    full = _energy_renormalize(sources[None], mix[None])[0]
    np.testing.assert_allclose(out, full, atol=2e-3)


def test_separate_long_short_input_uses_single_chunk():
    """length <= segment: single padded forward, trimmed back exactly."""
    L = SR  # 1 s < 2 s segment
    s1, s2 = _speechlike(L, 5), _speechlike(L, 6)
    mix = (s1 + s2).astype(np.float32)
    oracle = ChunkOracle(mix, np.stack([s1, s2]))
    out = separate_long(oracle, {}, mix, segment_samples=SEG)
    assert out.shape == (2, L)
    assert len(oracle.calls) == 1
    assert _best_perm_sisnr(out, np.stack([s1, s2])) > 30.0


def test_separate_long_rejects_batch():
    with pytest.raises(ValueError, match="one .L,. utterance"):
        separate_long(None, {}, np.zeros((2, SR), np.float32))


def test_separate_long_real_model_smoke():
    """The real AVNet path end-to-end on a 3 s input through 2 s chunks:
    jitted fixed-shape forward, video-embedding segmentation per chunk
    (_emb_segment), finite stitched output of the right shape."""
    import jax

    from rtfs_tpu.config import build_avnet, load_config

    conf = load_config("legacy_lrs2_mini")
    model = build_avnet(conf)
    L = 3 * SR
    mix = (_speechlike(L, 7) + _speechlike(L, 8)).astype(np.float32)
    n_frames = int(round(L / SR * 25))
    emb = np.random.default_rng(0).standard_normal(
        (n_frames, conf["audionet"]["pretrained_vout_chan"])
    ).astype(np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, SEG), np.float32),
        np.zeros((1, 50, emb.shape[-1]), np.float32),
    )
    out = separate_long(model, variables, mix, mouth_emb=emb,
                        segment_samples=SEG)
    assert out.shape == (conf["audionet"]["n_src"], L)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_separate_long_real_trained_model_full_vs_chunked():
    """The REAL trained flagship, full-length vs chunked (VERDICT r3 #5).

    A trained RTFS-Net-4 bundle (tests/fixtures/, r04_synth_convergence
    epoch 54, val SI-SNR 20.4 dB) separates a 6 s mixture once at full
    length (one big jitted forward) and once through ``separate_long``'s
    2 s / 50%-overlap serving path. The stitched output must agree with
    the full pass to the model's own context sensitivity: gLN statistics
    are per-utterance, so bit-equality is impossible by construction —
    the pinned contract is >=20 dB SI-SNR and >=0.995 correlation against
    the full pass (measured 27.7 dB / 0.9991 at fixture creation), which
    an unstable PIT permutation or a broken cross-fade would demolish.
    """
    import jax
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet
    from rtfs_tpu.train.checkpoints import load_exported
    from rtfs_tpu.utils.separator import _energy_renormalize

    b = load_exported("tests/fixtures/r04_rtfsnet4_avnet.bundle")
    model = build_avnet({"audionet": b["model_args"]})
    variables = {
        "params": b["state"]["params"],
        "batch_stats": b["state"].get("batch_stats", {}),
    }
    L = 6 * SR
    rng = np.random.default_rng(0)

    def long_speech(seed):
        r = np.arange(L) / SR
        f0 = 110 + 30 * np.sin(2 * np.pi * 0.5 * r + seed)
        ph = 2 * np.pi * np.cumsum(f0) / SR
        x = sum(np.sin(k * ph) / k for k in range(1, 6))
        x = x * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * r + seed) ** 2)
        return (x / x.std()).astype(np.float32)

    mix = (long_speech(1) + long_speech(2)).astype(np.float32) * 0.1
    emb = rng.standard_normal((150, 512)).astype(np.float32)

    full = np.asarray(
        jax.jit(model.apply)(
            variables, jnp.asarray(mix[None]), jnp.asarray(emb[None])
        )
    )
    full = _energy_renormalize(full, mix[None])[0]
    chunked = separate_long(model, variables, mix, mouth_emb=emb,
                            segment_samples=SEG)
    assert chunked.shape == full.shape

    for i in range(full.shape[0]):
        est, ref = chunked[i], full[i]
        est0, ref0 = est - est.mean(), ref - ref.mean()
        s = (est0 @ ref0) / (ref0 @ ref0) * ref0
        sisnr = 10 * np.log10(float(s @ s) / float((est0 - s) @ (est0 - s)))
        corr = float(np.corrcoef(est, ref)[0, 1])
        assert sisnr > 20.0, (i, sisnr)
        assert corr > 0.995, (i, corr)


@pytest.mark.slow
def test_separate_long_real_2src_permutation_stable():
    """n_src=2: a trained audio-only 2-source separation model
    (tests/fixtures/, r04_synth_convergence_2src, val SI-SNR 15.2 dB)
    serves a 6 s two-speaker mixture built from the SAME synthetic
    speaker bank it was trained on. The chunked output must (a) agree
    with the full-length pass under ONE global permutation — a PIT flip
    at any chunk boundary would collapse one source's score — and (b)
    genuinely separate (score vs the true sources well above 0 dB), so
    (a) is not vacuously satisfied by near-mixture outputs. Measured at
    fixture creation: 17.1/17.6 dB vs full, 9.8/7.8 dB vs truth.
    """
    import itertools
    import os
    import sys

    import jax
    import jax.numpy as jnp

    from rtfs_tpu.config import build_avnet
    from rtfs_tpu.train.checkpoints import load_exported
    from rtfs_tpu.utils.separator import _energy_renormalize

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synth_corpus import speaker_bank, utterance

    b = load_exported("tests/fixtures/r04_rtfsnet4_2src_avnet.bundle")
    model = build_avnet({"audionet": b["model_args"]})
    variables = {
        "params": b["state"]["params"],
        "batch_stats": b["state"].get("batch_stats", {}),
    }
    bank = speaker_bank(20, np.random.default_rng(0))  # the corpus bank
    urng = np.random.default_rng(42)

    def long_src(spk):
        return np.concatenate([utterance(spk, urng)[0] for _ in range(3)])

    s1, s2 = long_src(bank[0]), long_src(bank[7])
    mix = (s1 + s2).astype(np.float32)

    full = np.asarray(
        jax.jit(lambda v, w: model.apply(v, w, None))(
            variables, jnp.asarray(mix[None])
        )
    )
    full = _energy_renormalize(full, mix[None])[0]
    chunked = separate_long(model, variables, mix, mouth_emb=None,
                            segment_samples=SEG)
    assert chunked.shape == (2, len(mix))

    def si_snr(est, ref):
        est = est - est.mean()
        ref = ref - ref.mean()
        s = (est @ ref) / (ref @ ref) * ref
        return 10 * np.log10(float(s @ s) / float((est - s) @ (est - s)))

    # (a) one global permutation explains the whole stitched output
    best = max(
        (min(si_snr(chunked[p[i]], full[i]) for i in range(2))
         for p in itertools.permutations(range(2))),
    )
    assert best > 14.0, best
    # (b) the model is genuinely separating on this input
    sep = max(
        (min(si_snr(chunked[p[0]], s1), si_snr(chunked[p[1]], s2))
         for p in itertools.permutations(range(2))),
    )
    assert sep > 5.0, sep
