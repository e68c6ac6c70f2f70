"""Dict-merging yaml config (`deeplabv3plus/lib/config/config.py`).

A mutable global config that yaml files merge into — kept for API parity
with the reference's edict-based loader (which the hair experiments don't
use, `config.py:24-39`). Prefer the dataclasses in `core.config`.
"""

from typing import Any, Dict

import yaml


class AttrDict(dict):
    """edict-like: attribute access over dict entries."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


cfg = AttrDict()


def load_config(config_path: str) -> AttrDict:
    with open(config_path, "r") as f:
        loaded: Dict[str, Any] = yaml.safe_load(f) or {}
    for k, v in loaded.items():
        if k in cfg and isinstance(v, dict):
            for vk, vv in v.items():
                cfg[k][vk] = vv
        elif isinstance(v, dict):
            cfg[k] = AttrDict(v)
        else:
            cfg[k] = v
    return cfg
