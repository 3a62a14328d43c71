"""Checkpoint-spec resume tests: epoch number, other-run path, path@epoch.

Reference resumes from an explicit checkpoint path
(``/root/reference/train.py:148``); we cover that plus bare-epoch and
cross-run restore.
"""

import numpy as np
import pytest


def _save_epochs(ckpt, n):
    for e in range(n):
        ckpt.save(e, {"w": np.full(3, e, np.float32)}, val_loss=10.0 - e)


def test_checkpoint_spec_resume(tmp_path):
    from rtfs_tpu.train.checkpoints import (
        CheckpointManager,
        resolve_checkpoint_spec,
    )

    template = {"w": np.zeros(3, np.float32)}
    run_a = tmp_path / "runA"
    ckpt_a = CheckpointManager(str(run_a))
    _save_epochs(ckpt_a, 3)

    # bare epoch -> that epoch of the current run (not latest)
    mgr, step = resolve_checkpoint_spec("1", ckpt_a)
    assert step == 1
    assert mgr.restore(template, step)["w"][0] == 1

    # other-run path -> its latest epoch
    ckpt_b = CheckpointManager(str(tmp_path / "runB"))
    mgr2, step2 = resolve_checkpoint_spec(str(run_a), ckpt_b)
    assert step2 == 2
    assert mgr2.restore(template, step2)["w"][0] == 2

    # path@epoch -> that epoch of the other run; checkpoints/ subdir works
    mgr3, step3 = resolve_checkpoint_spec(f"{run_a}/checkpoints@0", ckpt_b)
    assert step3 == 0
    assert mgr3.restore(template, step3)["w"][0] == 0

    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_spec(str(tmp_path / "nope"), ckpt_b)


def test_export_bundle_pins_code_version(tmp_path):
    """Export bundle round-trip carries the framework git SHA + dirty flag
    (the TPU-native analogue of the reference's src/models snapshot,
    ``/root/reference/train.py:95``) and ``check_code_version`` warns when
    the evaluating checkout differs."""
    from rtfs_tpu.train.checkpoints import export_model, load_exported
    from rtfs_tpu.utils.code_version import check_code_version, code_version

    path = str(tmp_path / "best_model.bin")
    params = {"conv": {"kernel": np.ones((3, 2, 4), np.float32)}}
    export_model(path, {"n_src": 2}, params, {}, None,
                 infos={"best_epoch": 7})
    bundle = load_exported(path)

    assert bundle["model_name"] == "AVNet"
    assert bundle["model_args"]["n_src"] == 2
    assert bundle["infos"]["best_epoch"] == 7
    np.testing.assert_array_equal(
        bundle["state"]["params"]["conv"]["kernel"], params["conv"]["kernel"]
    )

    pinned = bundle["infos"]["code_version"]
    cur = code_version()
    assert pinned["git_sha"] == cur["git_sha"]
    if cur["git_sha"] != "unknown":
        assert len(pinned["git_sha"]) == 40
        # same checkout, clean-or-dirty consistent -> warning only if dirty
        warn = check_code_version(bundle["infos"])
        if pinned.get("git_dirty") == "true":
            assert warn is not None and "DIRTY" in warn
        else:
            assert warn is None
        # a different SHA must warn
        other = {"code_version": {"git_sha": "f" * 40, "git_dirty": "false"}}
        assert "exported at framework commit" in check_code_version(other)
    # unknown pins never warn
    assert check_code_version({"code_version": {"git_sha": "unknown"}}) is None
    assert check_code_version({}) is None
