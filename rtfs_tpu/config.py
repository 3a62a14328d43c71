"""Config loading: reference-style nested YAML groups → model builders.

The reference's two-level YAML schema (groups ``videonet / audionet /
training / optim / sche / data / log``; see
``config/lrs2_RTFSNet_4_layer.yaml``) is preserved verbatim so configs are
drop-in translatable. ``build_avnet`` constructs the flax AVNet from the
``audionet`` group.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml

from .models.avnet import AVNet

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def load_config(path_or_name: str) -> Dict[str, Any]:
    """Load a config by filesystem path or bundled preset name."""
    path = path_or_name
    if not os.path.exists(path):
        cand = os.path.join(CONFIG_DIR, path_or_name)
        if not cand.endswith(".yaml"):
            cand += ".yaml"
        if os.path.exists(cand):
            path = cand
        else:
            raise FileNotFoundError(path_or_name)
    with open(path) as f:
        return yaml.safe_load(f)


def list_presets() -> list[str]:
    return sorted(
        f[: -len(".yaml")] for f in os.listdir(CONFIG_DIR) if f.endswith(".yaml")
    )


def build_avnet(conf: Dict[str, Any]) -> AVNet:
    """Build the AVNet model from a full config dict (uses ``audionet``)."""
    a = conf["audionet"]
    return AVNet(
        n_src=a["n_src"],
        enc_dec_params=a["enc_dec_params"],
        audio_bn_params=a.get("audio_bn_params", {}),
        audio_params=a["audio_params"],
        mask_generation_params=a["mask_generation_params"],
        pretrained_vout_chan=a.get("pretrained_vout_chan", -1),
        video_bn_params=a.get("video_bn_params", {}),
        video_params=a.get("video_params", {}),
        fusion_params=a.get("fusion_params", {}),
        compute_dtype=a.get("compute_dtype", "float32"),
        packed_tf=a.get("packed_tf", False),
    )
