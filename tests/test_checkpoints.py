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
