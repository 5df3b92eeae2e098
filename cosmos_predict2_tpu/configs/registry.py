"""Config system: typed dataclass tree + named groups + experiments +
dotlist overrides.

Replaces the reference's three-layer config stack (attrs ``Config`` tree +
detectron2 LazyCall/omegaconf + Hydra ConfigStore groups,
imaginaire/config.py:397-448, lazy_config/lazy.py:87-230,
configs/video2world/config.py:37-103) with one system:

* every component config is a frozen dataclass (already typed);
* ``register(group, name, node)`` stores named nodes per group
  (net / model / optimizer / trainer / ...);
* an *experiment* is a dict of {group: name} selections + a dict of
  dotlist overrides, registered under its own name;
* ``make_config(experiment=..., overrides=[...])`` composes the tree and
  applies ``a.b.c=value`` overrides, preserving the reference's
  ``experiment=NAME key=value`` CLI semantics (config_helper.override).

Everything stays a plain dataclass — no lazy instantiation is needed since
model classes take configs directly.
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any, Callable

_REGISTRY: dict[str, dict[str, Any]] = {}
_EXPERIMENTS: dict[str, "Experiment"] = {}


@dataclasses.dataclass
class Experiment:
    """A named recipe: group selections + dotlist overrides."""

    name: str
    groups: dict[str, str] = dataclasses.field(default_factory=dict)
    overrides: dict[str, Any] = dataclasses.field(default_factory=dict)
    base: str | None = None  # inherit another experiment


def register(group: str, name: str, node: Any) -> None:
    _REGISTRY.setdefault(group, {})[name] = node


def register_experiment(exp: Experiment) -> None:
    _EXPERIMENTS[exp.name] = exp


def get_node(group: str, name: str) -> Any:
    try:
        return _REGISTRY[group][name]
    except KeyError:
        known = sorted(_REGISTRY.get(group, {}))
        raise KeyError(f"no '{name}' in group '{group}'; known: {known}") from None


def list_group(group: str) -> list[str]:
    return sorted(_REGISTRY.get(group, {}))


def list_experiments() -> list[str]:
    return sorted(_EXPERIMENTS)


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def apply_override(node: Any, dotted: str, value: Any) -> Any:
    """Return a copy of a (nested) dataclass with field a.b.c replaced."""
    head, _, rest = dotted.partition(".")
    if not dataclasses.is_dataclass(node):
        if isinstance(node, dict):
            new = dict(node)
            new[head] = apply_override(node[head], rest, value) if rest else value
            return new
        raise TypeError(f"cannot override '{dotted}' on {type(node)}")
    if not hasattr(node, head):
        raise AttributeError(f"{type(node).__name__} has no field '{head}'")
    if rest:
        new_value = apply_override(getattr(node, head), rest, value)
    else:
        field_types = {f.name: f for f in dataclasses.fields(node)}
        current = getattr(node, head)
        new_value = value
        # coerce strings from CLI dotlists to the field's current type
        if isinstance(value, str) and not isinstance(current, str):
            new_value = _parse_value(value)
    return dataclasses.replace(node, **{head: new_value})


def compose(base: Any, overrides: list[str] | dict[str, Any] | None = None) -> Any:
    """Apply 'a.b.c=value' dotlist (or dict) overrides to a dataclass tree."""
    if overrides is None:
        return base
    items = overrides.items() if isinstance(overrides, dict) else (o.split("=", 1) for o in overrides)
    node = base
    for key, value in items:
        node = apply_override(node, key.strip(), value)
    return node


def config_to_dict(node: Any) -> Any:
    """Dataclass tree -> plain dict (for yaml/json export; LazyConfig.save
    parity, reference lazy_config/lazy.py:230)."""
    import dataclasses as dc

    if dc.is_dataclass(node) and not isinstance(node, type):
        return {f.name: config_to_dict(getattr(node, f.name)) for f in dc.fields(node)}
    if isinstance(node, dict):
        return {k: config_to_dict(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [config_to_dict(v) for v in node]
    if isinstance(node, type):  # e.g. jnp dtypes stored as classes
        return getattr(node, "__name__", str(node))
    return node


def save_config(node: Any, path: str) -> None:
    """Write the composed config as json (or yaml if the path says so)."""
    import json
    import os

    data = config_to_dict(node)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml

            with open(path, "w") as f:
                yaml.safe_dump(data, f, sort_keys=False)
            return
        except ImportError:
            path = path.rsplit(".", 1)[0] + ".json"
    with open(path, "w") as f:
        json.dump(data, f, indent=2, default=str)


def resolve_experiment(name: str) -> Experiment:
    if name not in _EXPERIMENTS:
        raise KeyError(f"unknown experiment '{name}'; known: {list_experiments()}")
    exp = _EXPERIMENTS[name]
    if exp.base is None:
        return exp
    parent = resolve_experiment(exp.base)
    groups = dict(parent.groups)
    groups.update(exp.groups)
    overrides = dict(parent.overrides)
    overrides.update(exp.overrides)
    return Experiment(name=exp.name, groups=groups, overrides=overrides)
