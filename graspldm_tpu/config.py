"""Python-file experiment configs with inheritance and registries.

Keeps the reference's config UX (`grasp_ldm/utils/config.py:70-333`):
experiment configs are plain ``.py`` files whose top-level names become config
entries; ``_base_`` pulls in parent configs (deep-merged, child wins); a
``_delete_: True`` key in a child dict replaces the parent dict instead of
merging; ``{{ fileDirname }}``-style predefined template variables are
substituted before execution (`config.py:107-127`); dotted CLI overrides
merge via :func:`merge_from_dict` (`config.py:268-324,522-568`). Components
are declared as ``dict(type="Name", args=dict(...))`` and resolved against
string registries (`models/builder.py:28-116`, `dataset/builder.py:7-42`,
`losses/builder.py:3-16`).
"""

from __future__ import annotations

import ast
import os
import re
from typing import Any, Callable, Dict, List, Optional

__all__ = ["ConfigDict", "Config", "Registry", "MODELS", "DATASETS", "LOSSES",
           "AUGMENTATIONS", "build_from_cfg", "dump_config",
           "merge_from_dict", "parse_cfg_options"]


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


def _substitute_predefined_vars(text: str, path: str) -> str:
    """``{{ fileDirname }}``-style template substitution (the reference's
    predefined variable set, `grasp_ldm/utils/config.py:107-127`)."""
    base = os.path.basename(path)
    stem, ext = os.path.splitext(base)
    templates = {
        "fileDirname": os.path.dirname(path),
        "fileBasename": base,
        "fileBasenameNoExtension": stem,
        "fileExtname": ext,
    }
    for key, value in templates.items():
        text = re.sub(
            r"\{\{\s*" + key + r"\s*\}\}", value.replace("\\", "/"), text
        )
    return text


# `{{ _base_.a.b }}` placeholders are swapped for sentinel STRINGS before the
# config executes (so the file still parses), then resolved against the merged
# base configs afterwards — the reference's base-variable mechanism
# (`grasp_ldm/utils/config.py:129-176`).
_BASE_VAR_RE = re.compile(r"\{\{\s*_base_\.([\w.]+)\s*\}\}")
_BASE_VAR_SENTINEL = "\x00_base_\x00"


def _quote_base_var_placeholders(text: str) -> str:
    return _BASE_VAR_RE.sub(
        lambda m: repr(_BASE_VAR_SENTINEL + m.group(1)), text
    )


def _resolve_base_vars(node: Any, base_cfg: Dict[str, Any]) -> Any:
    if isinstance(node, str) and node.startswith(_BASE_VAR_SENTINEL):
        dotted = node[len(_BASE_VAR_SENTINEL):]
        value: Any = base_cfg
        for part in dotted.split("."):
            if not isinstance(value, dict) or part not in value:
                raise KeyError(
                    f"{{{{ _base_.{dotted} }}}} does not resolve in the "
                    "merged base configs"
                )
            value = value[part]
        return value
    if isinstance(node, dict):
        return {k: _resolve_base_vars(v, base_cfg) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return type(node)(_resolve_base_vars(v, base_cfg) for v in node)
    return node


class Config:
    """Loader for python-file configs."""

    @staticmethod
    def _exec_file(path: str) -> Dict[str, Any]:
        path = os.path.abspath(path)
        with open(path, encoding="utf-8") as f:
            text = _substitute_predefined_vars(f.read(), path)
        text = _quote_base_var_placeholders(text)
        ns: Dict[str, Any] = {"__file__": path}
        exec(compile(text, path, "exec"), ns)
        return {
            k: v
            for k, v in ns.items()
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
        cfg_dict = _resolve_base_vars(cfg_dict, merged)
        merged = _deep_merge(merged, cfg_dict)
        out = ConfigDict(merged)
        out["filename"] = os.path.abspath(path)
        return out


def _is_module(v: Any) -> bool:
    import types

    return isinstance(v, types.ModuleType)


def _merge_options(a: Any, b: Any, allow_list_keys: bool = True) -> Any:
    """Merge override tree ``a`` into ``b`` (a wins); digit string keys
    index into lists when ``allow_list_keys`` (reference `_merge_a_into_b`,
    `grasp_ldm/utils/config.py:268-324`)."""
    if not isinstance(a, dict):
        return a
    if allow_list_keys and isinstance(b, list):
        out_list = list(b)
        for k, v in a.items():
            if not str(k).isdigit():
                raise KeyError(f"non-index key {k!r} for a list target")
            i = int(k)
            if i >= len(out_list):
                raise KeyError(f"index {i} exceeds list length {len(out_list)}")
            out_list[i] = _merge_options(v, out_list[i], allow_list_keys)
        return out_list
    if not isinstance(b, dict) or a.get("_delete_", False):
        return {k: v for k, v in a.items() if k != "_delete_"}
    out = dict(b)
    for k, v in a.items():
        out[k] = _merge_options(v, b.get(k), allow_list_keys)
    return out


def merge_from_dict(
    cfg: Dict[str, Any], options: Dict[str, Any], allow_list_keys: bool = True
) -> ConfigDict:
    """Merge ``{"a.b.c": value}`` dotted options into a config (the
    reference's ``Config.merge_from_dict``, `config.py:522-568`).

    Digit path segments index into lists (``pipeline.0.type=X``). Returns a
    new ConfigDict; ``cfg`` is not mutated.
    """
    tree: Dict[str, Any] = {}
    for full_key, v in options.items():
        d = tree
        parts = full_key.split(".")
        for sub in parts[:-1]:
            d = d.setdefault(sub, {})
        d[parts[-1]] = v
    return ConfigDict(_merge_options(tree, dict(cfg), allow_list_keys))


def parse_cfg_options(pairs: List[str]) -> Dict[str, Any]:
    """Parse ``KEY=VALUE`` CLI override strings (mmcv DictAction semantics):
    values go through literal_eval with int/float/bool/None handling, and
    top-level commas build lists (``a.b=1,2,3`` -> ``[1, 2, 3]``)."""

    def parse_value(s: str) -> Any:
        try:
            return ast.literal_eval(s)
        except (ValueError, SyntaxError):
            pass
        low = s.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        return s

    out: Dict[str, Any] = {}
    for pair in pairs:
        if "=" not in pair:
            raise ValueError(f"cfg option {pair!r} is not KEY=VALUE")
        key, value = pair.split("=", 1)
        if "," in value:
            try:  # a bracketed/quoted literal may legitimately hold commas
                lit = ast.literal_eval(value)
                # a bare "1,2,3" parses as a tuple — normalize to list
                out[key] = list(lit) if isinstance(lit, tuple) else lit
                continue
            except (ValueError, SyntaxError):
                items = [v for v in value.split(",") if v != ""]
                out[key] = [parse_value(v) for v in items]
                continue
        out[key] = parse_value(value)
    return out


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
