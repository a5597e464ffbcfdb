"""Configuration: YAML/JSON -> flat dotted properties with scope overrides.

Reference parity:
- M/common/configuration/Configuration.java:51-124 — loads YAML, flattens
  nested maps into dot-separated property keys, getProperty with default.
- M/common/configuration/ConfigScopeResolver.java — a config file may carry
  per-scope subtrees (e.g. ``bootstrap`` vs ``incremental``); resolving a
  scope deep-merges the selected scope's subtree over the base tree, then
  drops all scope subtrees. Golden-file semantics mirrored from
  marmaray/src/test/resources/configWithScopes.yaml and its two expected
  outputs.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml

KEY_SEP = "."
SCOPE_OVERRIDE_MAPPING_KEY = "scope_override_map"  # Configuration.java constant


def resolve_scope_map(tree: Mapping[str, Any], scope: str | None) -> dict[str, Any]:
    """ConfigScopeResolver.projectOverrideScopeOverDefault semantics
    (M/common/configuration/ConfigScopeResolver.java, golden-filed by
    configWithScopes.yaml + the two expected outputs):

    - ``scope_override_map`` maps scope -> parent scope.
    - No scope requested -> the tree is returned UNCHANGED (identity,
      TestConfigScopeResolver.testNoConfigOverrideWhenScopeIsAbsent).
    - Resolving scope s: deep-merge subtree s over its parent's subtree,
      promote the result to the top level, and drop every scope subtree
      and the map itself. Unknown scope raises.
    """
    if scope is None:
        return dict(tree)
    tree = dict(tree)
    smap = tree.pop(SCOPE_OVERRIDE_MAPPING_KEY, None)
    if not isinstance(smap, Mapping) or scope not in smap:
        raise KeyError(f"unknown config scope {scope!r}")
    scope_names = set(smap) | set(smap.values())
    unscoped = {k: v for k, v in tree.items() if k not in scope_names}
    parent = smap[scope]
    merged = _deep_merge(dict(tree.get(parent) or {}), tree.get(scope) or {})
    return _deep_merge(unscoped, merged)


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Iterator[tuple[str, Any]]:
    for k, v in tree.items():
        key = f"{prefix}{KEY_SEP}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            yield from _flatten(v, key)
        else:
            yield key, v


def _deep_merge(base: dict[str, Any], override: Mapping[str, Any]) -> dict[str, Any]:
    """Deep-merge ``override`` over ``base`` (override wins on leaves)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = _deep_merge(dict(out[k]), v)
        else:
            out[k] = v
    return out


class Configuration:
    """Flat dotted-key properties with typed getters and scope resolution."""

    def __init__(self, props: Mapping[str, Any] | None = None) -> None:
        self._props: dict[str, str] = {}
        if props:
            for k, v in props.items():
                self.set(k, v)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_yaml(cls, path: str | Path, scope: str | None = None,
                  scope_root: str = "scope_overrides") -> "Configuration":
        with open(path) as f:
            tree = yaml.safe_load(f) or {}
        return cls.from_tree(tree, scope=scope, scope_root=scope_root)

    @classmethod
    def from_json(cls, text: str, scope: str | None = None) -> "Configuration":
        return cls.from_tree(json.loads(text), scope=scope)

    @classmethod
    def from_tree(cls, tree: Mapping[str, Any], scope: str | None = None,
                  scope_root: str = "scope_overrides") -> "Configuration":
        tree = dict(tree)
        if SCOPE_OVERRIDE_MAPPING_KEY in tree:
            # reference-style scope->parent mapping (ConfigScopeResolver)
            return cls(dict(_flatten(resolve_scope_map(tree, scope))))
        scopes = tree.pop(scope_root, None)
        if scope is not None:
            if not isinstance(scopes, Mapping) or scope not in scopes:
                raise KeyError(f"unknown config scope {scope!r}")
            tree = _deep_merge(tree, scopes[scope])
        return cls(dict(_flatten(tree)))

    # -- accessors ---------------------------------------------------------

    def set(self, key: str, value: Any) -> None:
        self._props[key] = "" if value is None else str(value)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._props.get(key, default)

    def get_required(self, key: str) -> str:
        if key not in self._props:
            raise KeyError(f"missing required property {key!r}")
        return self._props[key]

    def get_int(self, key: str, default: int) -> int:
        v = self._props.get(key)
        return default if v is None or v == "" else int(v)

    def get_float(self, key: str, default: float) -> float:
        v = self._props.get(key)
        return default if v is None or v == "" else float(v)

    def get_bool(self, key: str, default: bool) -> bool:
        v = self._props.get(key)
        if v is None or v == "":
            return default
        return v.strip().lower() in ("1", "true", "yes", "on")

    def subset(self, prefix: str, strip: bool = False) -> "Configuration":
        """Properties under ``prefix.`` (optionally with the prefix stripped)."""
        p = prefix if prefix.endswith(KEY_SEP) else prefix + KEY_SEP
        out = Configuration()
        for k, v in self._props.items():
            if k.startswith(p):
                out.set(k[len(p):] if strip else k, v)
        return out

    def as_dict(self) -> dict[str, str]:
        return dict(self._props)

    def __contains__(self, key: str) -> bool:
        return key in self._props

    def __len__(self) -> int:
        return len(self._props)

    def __repr__(self) -> str:
        return f"Configuration({len(self._props)} props)"
