"""TensorBoard event writer: roundtrip + crc framing + torch cross-check."""

import glob
import os

import numpy as np
import pytest

from rtfs_tpu.utils import tb_writer


def test_scalar_roundtrip(tmp_path):
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("train_loss", -3.25, step=0)
    w.add_scalar("train_loss", -4.5, step=1)
    w.add_scalar("lr", 1e-3, step=1)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    scalars = tb_writer.read_scalars(path)
    assert ("train_loss", pytest.approx(-3.25), 0) == scalars[0]
    assert ("train_loss", pytest.approx(-4.5), 1) == scalars[1]
    assert scalars[2][0] == "lr"


def test_crc_detects_corruption(tmp_path):
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.0, step=0)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    raw = bytearray(open(path, "rb").read())
    raw[-6] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(AssertionError):
        tb_writer.read_scalars(path)


def test_torch_tensorboard_can_read(tmp_path):
    """Cross-check with torch's event file reader if available."""
    try:
        from tensorboard.backend.event_processing import event_file_loader
    except ImportError:
        pytest.skip("tensorboard not installed")
    w = tb_writer.SummaryWriter(str(tmp_path))
    w.add_scalar("metric", 2.5, step=7)
    w.close()
    (path,) = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    events = list(event_file_loader.EventFileLoader(path).Load())
    vals = []
    for e in events:
        for v in e.summary.value:
            # newer tensorboard migrates simple_value into a DT_FLOAT tensor
            if v.HasField("tensor") and v.tensor.float_val:
                vals.append((v.tag, v.tensor.float_val[0], e.step))
            else:
                vals.append((v.tag, v.simple_value, e.step))
    assert ("metric", 2.5, 7) in vals
