"""Config override parsing: ``--group.key value`` CLI merges onto YAML.

Counterpart of the reference ``src/utils/parser_utils.py:12-157``
(dict→argparse→nested-dict round trip). Here overrides are dotted paths,
which compose better with the two-level YAML groups:

    python train.py --conf-dir X.yaml --training.batch_size 8 \
        --optim.lr 5e-4 --data.synthetic true
"""

from __future__ import annotations

from typing import Any, Dict, List

import yaml


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def parse_overrides(conf: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``--a.b.c value`` style overrides to a nested config dict."""
    i = 0
    while i < len(overrides):
        key = overrides[i]
        if not key.startswith("--"):
            raise ValueError(f"unexpected argument: {key}")
        key = key[2:]
        if "=" in key:
            key, value = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(overrides):
                raise ValueError(f"missing value for --{key}")
            value = overrides[i + 1]
            i += 2
        node = conf
        parts = key.replace("-", "_").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return conf


def flatten_dict(d: Dict[str, Any], parent_key: str = "", sep: str = "_"):
    """Flatten nested dict (reference ``core.py:27-47`` parity helper)."""
    items = {}
    for k, v in d.items():
        new_key = parent_key + sep + k if parent_key else k
        if isinstance(v, dict):
            items.update(flatten_dict(v, new_key, sep=sep))
        else:
            items[new_key] = v
    return items
