"""Python-file experiment configs with inheritance and registries.

Keeps the reference's config UX (`grasp_ldm/utils/config.py:70-333`):
experiment configs are plain ``.py`` files whose top-level names become config
entries; ``_base_`` pulls in parent configs (deep-merged, child wins); a
``_delete_: True`` key in a child dict replaces the parent dict instead of
merging. Components are declared as ``dict(type="Name", args=dict(...))`` and
resolved against string registries (`models/builder.py:28-116`,
`dataset/builder.py:7-42`, `losses/builder.py:3-16`).
"""

from __future__ import annotations

import importlib.util
import os
from typing import Any, Callable, Dict, Optional

__all__ = ["ConfigDict", "Config", "Registry", "MODELS", "DATASETS", "LOSSES",
           "AUGMENTATIONS", "build_from_cfg", "dump_config"]


class ConfigDict(dict):
    """dict with attribute access (nested dicts are wrapped lazily)."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def _deep_merge(base: Dict, override: Dict) -> Dict:
    """Merge ``override`` into ``base`` (copy); ``_delete_`` replaces wholesale."""
    out = dict(base)
    for k, v in override.items():
        if (
            isinstance(v, dict)
            and k in out
            and isinstance(out[k], dict)
            and not v.get("_delete_", False)
        ):
            out[k] = _deep_merge(out[k], v)
        else:
            if isinstance(v, dict):
                v = {kk: vv for kk, vv in v.items() if kk != "_delete_"}
            out[k] = v
    return out


class Config:
    """Loader for python-file configs."""

    @staticmethod
    def _exec_file(path: str) -> Dict[str, Any]:
        path = os.path.abspath(path)
        spec = importlib.util.spec_from_file_location(
            f"_graspldm_cfg_{abs(hash(path))}", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return {
            k: v
            for k, v in vars(mod).items()
            if not k.startswith("__") and not callable(v) and not _is_module(v)
        }

    @classmethod
    def fromfile(cls, path: str) -> ConfigDict:
        cfg_dict = cls._exec_file(path)
        bases = cfg_dict.pop("_base_", [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for base_rel in bases:
            base_path = os.path.join(os.path.dirname(os.path.abspath(path)), base_rel)
            merged = _deep_merge(merged, cls.fromfile(base_path))
        merged = _deep_merge(merged, cfg_dict)
        out = ConfigDict(merged)
        out["filename"] = os.path.abspath(path)
        return out


def _is_module(v: Any) -> bool:
    import types

    return isinstance(v, types.ModuleType)


def dump_config(cfg: Dict[str, Any], path: str) -> None:
    """Serialize a config dict to JSON (the reference's Config.dump analogue)."""
    import json

    def default(o):
        if hasattr(o, "tolist"):
            return o.tolist()
        return repr(o)

    with open(path, "w") as f:
        json.dump({k: v for k, v in cfg.items()}, f, indent=1, default=default)


class Registry:
    """String -> constructor registry."""

    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable] = {}

    def register(self, obj: Optional[Callable] = None, *, name: Optional[str] = None):
        def deco(o):
            key = name or o.__name__
            if key in self._entries:
                raise KeyError(f"{key} already registered in {self.name}")
            self._entries[key] = o
            return o

        return deco(obj) if obj is not None else deco

    def get(self, key: str) -> Callable:
        if key not in self._entries:
            raise KeyError(
                f"{key!r} not registered in {self.name}. "
                f"Available: {sorted(self._entries)}"
            )
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return self._entries.keys()


MODELS = Registry("models")
DATASETS = Registry("datasets")
LOSSES = Registry("losses")
AUGMENTATIONS = Registry("augmentations")


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, **extra_args) -> Any:
    """Instantiate ``dict(type=..., args=...)`` against a registry.

    Nested component configs inside ``args`` that themselves look like
    ``dict(type=..., args=...)`` are passed through verbatim — modules decide
    how to consume them (mirrors `models/builder.py:57-93` without the
    implicit recursion magic).
    """
    if "type" not in cfg:
        raise KeyError(f"Component config missing 'type': {cfg}")
    ctor = registry.get(cfg["type"])
    args = dict(cfg.get("args", {}))
    args.update(extra_args)
    return ctor(**args)
