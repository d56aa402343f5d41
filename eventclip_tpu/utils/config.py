"""Attribute-style experiment configuration.

Mirrors the config contract of the reference (`nerv.training.BaseParams`
subclasses under configs/**, loaded by importlib in train.py:111-115): a
config is a Python class whose class attributes are hyper-parameters, with a
`.get(key, default)` accessor (reference usage e.g. datasets/caltech.py:216).
"""

from __future__ import annotations

import copy
import importlib
import importlib.util
import os
import sys
from typing import Any


class Params:
    """Base class for experiment configs.

    Class attributes defined on subclasses become per-instance attributes on
    construction (deep-copied so CLI overrides never mutate the class).
    """

    # defaults shared by every experiment
    project = "EventCLIP-TPU"
    seed = 0

    def __init__(self, **overrides: Any):
        for klass in reversed(type(self).__mro__):
            for k, v in vars(klass).items():
                if k.startswith("__") or callable(v) or isinstance(v, (classmethod, staticmethod, property)):
                    continue
                setattr(self, k, copy.deepcopy(v))
        for k, v in overrides.items():
            setattr(self, k, copy.deepcopy(v))

    def get(self, key: str, default: Any = None) -> Any:
        return getattr(self, key, default)

    def to_dict(self) -> dict:
        return {k: v for k, v in vars(self).items() if not k.startswith("_")}

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        body = ",\n  ".join(f"{k}={v!r}" for k, v in sorted(self.to_dict().items()))
        return f"{type(self).__name__}(\n  {body}\n)"


def load_params(path: str, cls_name: str = "EventCLIPParams") -> Params:
    """Load a config class from a python file path or module path.

    Matches the reference CLI contract (train.py:111-115): `--params
    configs/zsclip/zsclip_ncaltech_params.py` imports the module and
    instantiates its `EventCLIPParams` class.
    """
    if path.endswith(".py"):
        path = path[:-3]
    if os.sep in path or os.path.exists(path + ".py"):
        file_path = path + ".py"
        mod_name = os.path.basename(path)
        spec = importlib.util.spec_from_file_location(mod_name, file_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = module
        spec.loader.exec_module(module)
    else:
        module = importlib.import_module(path)
    return getattr(module, cls_name)()
