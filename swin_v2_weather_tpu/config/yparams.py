"""YAML configuration system.

Behavioral equivalent of the reference's ``utils/YParams.py:4-54``: a YAML file
holds named config sections (with anchor-based inheritance, see the reference
``config/swin.yaml``); a ``YParams`` object exposes one section with both
attribute and dict access, coerces the string ``'None'`` to ``None``
(reference ``utils/YParams.py:18``), and supports ``update_params`` for
sweep-style overrides (reference ``utils/YParams.py:43-46``).

Implemented on PyYAML (anchors/merge keys are core YAML features) instead of
ruamel; runtime-derived parameters (channel counts, batch splits — reference
``train.py:88-98,147-148``) are injected by the trainer just as in the
reference.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Iterator

import yaml

logger = logging.getLogger(__name__)

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def default_config_path() -> str:
    """Path of the bundled config file with the swin config families."""
    return os.path.join(_PKG_DIR, "swin.yaml")


class YParams:
    """A single named section of a YAML config file.

    Both ``params.key`` and ``params['key']`` work; assignment through either
    keeps the backing dict and attributes in sync.
    """

    def __init__(self, yaml_filename: str, config_name: str, print_params: bool = False):
        self._yaml_filename = yaml_filename
        self._config_name = config_name
        self.params: Dict[str, Any] = {}

        with open(yaml_filename) as f:
            doc = yaml.safe_load(f)
        if config_name not in doc:
            raise KeyError(
                f"config {config_name!r} not found in {yaml_filename} "
                f"(available: {sorted(doc)})"
            )
        for key, val in doc[config_name].items():
            if val == "None":
                val = None
            self.params[key] = val
            object.__setattr__(self, key, val)

        if print_params:
            self.log()

    # -- dict-style access ------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self.params[key]

    def __setitem__(self, key: str, val: Any) -> None:
        self.params[key] = val
        object.__setattr__(self, key, val)

    def __contains__(self, key: str) -> bool:
        return key in self.params

    def __iter__(self) -> Iterator[str]:
        return iter(self.params)

    def get(self, key: str, default: Any = None) -> Any:
        return self.params.get(key, default)

    # -- attribute-style assignment keeps dict in sync --------------------
    def __setattr__(self, key: str, val: Any) -> None:
        object.__setattr__(self, key, val)
        if not key.startswith("_") and key != "params":
            if "params" in self.__dict__:
                self.params[key] = val

    def update_params(self, config: Dict[str, Any]) -> None:
        for key, val in config.items():
            self[key] = val

    def to_dict(self) -> Dict[str, Any]:
        """Plain-dict copy, for dumping to hyperparams.yaml."""
        out = {}
        for k, v in self.params.items():
            if hasattr(v, "tolist"):
                v = v.tolist()
            out[k] = v
        return out

    def log(self) -> None:
        logger.info("------------------ Configuration ------------------")
        logger.info("Configuration file: %s", self._yaml_filename)
        logger.info("Configuration name: %s", self._config_name)
        for key, val in self.params.items():
            logger.info("%s %s", key, val)
        logger.info("---------------------------------------------------")
