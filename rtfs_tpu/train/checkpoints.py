"""Checkpointing: orbax top-k + last, self-describing export bundle.

Counterpart of the reference's Lightning ModelCheckpoint (top-5 by val_loss
+ save_last, ``train.py:117-127``), best_k_models.json dump
(``train.py:151-153``), and the serialized ``best_model.pth`` bundle with
model args + versions (``base_av_model.py:36-51``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


class CheckpointManager:
    """Top-k (by val_loss, lower=better) + last checkpoint management."""

    def __init__(self, exp_dir: str, top_k: int = 5):
        self.exp_dir = os.path.abspath(exp_dir)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.top_k = top_k
        self.best_k: Dict[str, float] = {}
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=top_k + 1,
                best_fn=lambda m: m["val_loss"],
                best_mode="min",
            ),
        )

    def save(self, epoch: int, state, val_loss: float):
        """Must be called by ALL processes in a multi-host run (orbax
        synchronizes internally; only the primary host writes metadata)."""
        self._mgr.save(
            epoch,
            args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            metrics={"val_loss": float(val_loss)},
        )
        self._mgr.wait_until_finished()
        self.best_k[f"epoch={epoch}"] = float(val_loss)
        self.best_k = dict(
            sorted(self.best_k.items(), key=lambda kv: kv[1])[: self.top_k]
        )
        if jax.process_index() == 0:
            with open(os.path.join(self.exp_dir, "best_k_models.json"),
                      "w") as f:
                json.dump(self.best_k, f, indent=2)

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                jax.tree.map(np.asarray, state_template)
            ),
        )

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()


def resolve_checkpoint_spec(spec: str, default_ckpt: "CheckpointManager"):
    """Resolve a ``--checkpoint`` value to ``(manager, step)``.

    Accepted forms (reference resumes from an explicit ckpt path,
    ``/root/reference/train.py:148``; we additionally accept bare epochs):

    - ``"7"``               -> epoch 7 of the current run's manager
    - ``"/path/to/exp"``    -> latest epoch of another run (its
      ``checkpoints/`` subdir is used if present)
    - ``"/path/to/exp@7"``  -> epoch 7 of another run
    """
    step: Optional[int] = None
    if "@" in spec:
        spec, step_s = spec.rsplit("@", 1)
        step = int(step_s)
    if spec.isdigit():
        return default_ckpt, int(spec)
    path = os.path.abspath(spec)
    # accept either the exp dir or its checkpoints/ subdir directly
    if os.path.basename(path) == "checkpoints":
        path = os.path.dirname(path)
    if not os.path.isdir(os.path.join(path, "checkpoints")):
        raise FileNotFoundError(
            f"--checkpoint={spec!r}: no checkpoints/ dir under {path}"
        )
    mgr = CheckpointManager(path)
    return mgr, (step if step is not None else mgr.latest_step())


def export_model(path: str, model_conf: Dict[str, Any], params, batch_stats,
                 video_variables=None, infos: Optional[Dict] = None):
    """Self-describing export bundle (the ``best_model.pth`` analogue).

    Serialized with flax msgpack: {model_name, model_args, state, infos}.
    Loadable via ``load_exported``.
    """
    import flax
    import jax as _jax
    import optax as _optax

    from ..utils.code_version import code_version

    bundle = {
        "model_name": "AVNet",
        "model_args": model_conf,
        "state": serialization.to_state_dict(
            {
                "params": jax.tree.map(np.asarray, params),
                "batch_stats": jax.tree.map(np.asarray, batch_stats),
                "video_variables": jax.tree.map(
                    np.asarray, video_variables or {}
                ),
            }
        ),
        "infos": {
            "software_versions": {
                "jax": _jax.__version__,
                "flax": flax.__version__,
                "optax": _optax.__version__,
            },
            # reference pins code state by snapshotting src/models into the
            # exp dir (train.py:95); we pin the framework git SHA instead
            "code_version": code_version(),
            **(infos or {}),
        },
    }
    payload = serialization.msgpack_serialize(_to_plain(bundle))
    with open(path, "wb") as f:
        f.write(payload)


def load_exported(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _to_plain(obj):
    """Recursively convert to msgpack-serializable plain containers."""
    if isinstance(obj, dict):
        return {str(k): _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, (np.ndarray, np.generic)):
        return np.asarray(obj)
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):
        return np.asarray(obj)
    return obj
