"""Python-file config system with `_base_` inheritance and CLI overrides.

Mirrors the public config surface of the reference (executable ``.py``
configs, ``_base_ = [...]`` inheritance, ``--options k=v`` overrides,
dump-back-to-file for reproducibility; reference util/slconfig.py:80-111,
118+, 357-440) with a small, dependency-free implementation.
"""

from __future__ import annotations

import ast
import copy
import os
import pprint
import runpy
from typing import Any, Dict, Iterable


_RESERVED = ("_base_", "_delete_")


class Config(dict):
    """dict with attribute access; nested dicts are wrapped on the fly."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as exc:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from exc
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]

    def copy(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))

    def get_default(self, name: str, default: Any = None) -> Any:
        return self[name] if name in self else default


def _exec_py_config(path: str) -> Dict[str, Any]:
    ns = runpy.run_path(path)
    return {
        k: v
        for k, v in ns.items()
        if not k.startswith("__") and not callable(v) and not isinstance(v, type(os))
    }


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (override wins).

    A nested dict carrying ``_delete_: True`` replaces the base subtree
    instead of merging into it.
    """
    out = dict(base)
    for key, value in override.items():
        if (
            isinstance(value, dict)
            and isinstance(out.get(key), dict)
            and not value.get("_delete_", False)
        ):
            out[key] = _merge(out[key], value)
        else:
            if isinstance(value, dict):
                value = {k: v for k, v in value.items() if k != "_delete_"}
            out[key] = value
    return out


def load_config(path: str) -> Config:
    """Load a ``.py`` config file, resolving ``_base_`` recursively."""
    path = os.path.abspath(path)
    raw = _exec_py_config(path)
    bases = raw.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for base_rel in bases:
        base_cfg = load_config(os.path.join(os.path.dirname(path), base_rel))
        merged = _merge(merged, base_cfg)
    merged = _merge(merged, raw)
    for key in _RESERVED:
        merged.pop(key, None)
    return Config(merged)


def dump_config(cfg: Dict[str, Any], path: str) -> None:
    """Write a config back out as an executable .py file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        fh.write("# auto-dumped config (dtlr_tpu)\n")
        for key in sorted(cfg):
            fh.write(f"{key} = {pprint.pformat(cfg[key], width=100)}\n")


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("none", "null"):
            return None
        return text


def parse_options(pairs: Iterable[str] | None) -> Dict[str, Any]:
    """Parse ``key=value`` CLI override pairs (reference DictAction)."""
    out: Dict[str, Any] = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise ValueError(f"--options entries must be key=value, got {pair!r}")
        key, _, value = pair.partition("=")
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_value(value)
    return out


def apply_options(cfg: Config, options: Dict[str, Any]) -> Config:
    return Config(_merge(cfg, options))
