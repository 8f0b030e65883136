"""YAML recipe loading with dotted ``-o key=value`` overrides.

Mirrors the reference launch surface
``nest task run config/cod.yml -o work_dir=./output -o launcher=pytorch -m val``
(/root/reference/script/train.sh:1): same YAML schema (train_cfg,
train_dataloader, model, optim_wrapper, param_scheduler, val_evaluator,
default_hooks, custom_hooks — /root/reference/config/cod.yml:6-144), same
``-o`` dotted-path override semantics, plus ``_base_`` includes.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, List, Optional

import yaml


def _deep_update(base: dict, new: dict) -> dict:
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def _parse_value(text: str) -> Any:
    """Parse an override value: python literal if possible, else string."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return text


def _as_int(p: str):
    """int(p) for plain (optionally negative) integer segments, else None —
    'lstrip-and-isdigit' accepted strings like '--3' whose int() raises."""
    try:
        return int(p)
    except ValueError:
        return None


#: recipe keys whose values are LISTS (the full set across configs/): a
#: numeric segment under one of these is always a list index, so a skipped
#: index under a missing parent is diagnosable at override time
_LIST_TYPED_KEYS = frozenset({"custom_hooks", "val_evaluator", "vis_backends"})


def set_dotted(cfg: dict, dotted_key: str, value: Any) -> None:
    """Integer path segments address (and create) LIST entries, so
    ``-o custom_hooks.0.type=our_init`` works on a recipe with no
    custom_hooks block — matching the MMEngine/nest override surface.

    Numeric segments under a MISSING parent create a fresh list only when
    they look like a small list index (< 10 — and only index 0 can actually
    land, larger ones fail the hole check below); larger ones create DICT
    string keys so override-built numeric blocks (``-o foo.384.bar=x``)
    work. Exception: under the schema's known LIST-typed keys
    (``custom_hooks``, ``val_evaluator``, ``vis_backends``) a numeric
    segment >= 10 with a missing parent raises immediately — a skipped list
    index can never resolve. Numeric keys into an EXISTING dict always work
    (``-o sizes.384.bs=8`` on a recipe that defines ``sizes``)."""
    parts = dotted_key.split(".")

    def list_index(node, p):
        try:
            i = int(p)
        except ValueError:
            raise ValueError(
                f"override '{dotted_key}': segment {p!r} addresses a LIST "
                f"(length {len(node)}) and must be an integer index"
            ) from None
        if i > len(node):
            raise ValueError(
                f"override '{dotted_key}': list index {i} skips entries "
                f"(list has {len(node)}) — indices must be existing or "
                "one-past-the-end"
            )
        return i

    def dict_key(node, p):
        # YAML parses unquoted numeric mapping keys as ints (`384:` →
        # {384: ...}); a dotted segment is always a string, so resolve
        # digit segments against an existing int key before falling back
        # to the string key — otherwise `-o sizes.384.bs=8` would silently
        # create a parallel {'384': ...} subtree and the override would
        # never reach the recipe's value.
        if p not in node and _as_int(p) is not None and _as_int(p) in node:
            return _as_int(p)
        return p

    node = cfg
    for p, nxt in zip(parts[:-1], parts[1:]):
        # Missing-parent heuristic: a small numeric next segment creates a
        # LIST (custom_hooks.0.type); larger numeric segments create DICT
        # string keys (override-built numeric blocks like foo.384.bar). For
        # the schema's KNOWN list-typed keys a numeric segment >= 10 under a
        # missing parent can never be right — it would skip indices 0..9 of
        # a brand-new list — so fail loudly here instead of surfacing as a
        # confusing downstream consumer error (ADVICE r3). Non-list keys
        # keep the dict behavior: an override-created parent has no recipe
        # key to shadow. (Numeric keys on EXISTING mappings always resolve
        # via dict_key above.)
        # (node is always a dict here: p ∈ _LIST_TYPED_KEYS is a non-numeric
        # name, and a list node would have rejected it in list_index —
        # ADVICE r4 removed the unreachable list branch)
        if nxt.isdigit() and int(nxt) >= 10 and p in _LIST_TYPED_KEYS and isinstance(node, dict):
            if node.get(dict_key(node, p)) is None:
                raise KeyError(
                    f"override segment '{nxt}' in '{dotted_key}': list index "
                    f">= 10 under missing parent '{p}' skips entries and can "
                    "never resolve — add the parent block to the recipe first"
                )
        empty: Any = [] if nxt.isdigit() and int(nxt) < 10 else {}
        if isinstance(node, list):
            i = list_index(node, p)
            if i == len(node):
                node.append(empty)
            if node[i] is None:
                node[i] = empty
            node = node[i]
        else:
            k = dict_key(node, p)
            if node.get(k) is None:
                node[k] = empty
            node = node[k]
    last = parts[-1]
    if isinstance(node, list):
        i = list_index(node, last)
        if i == len(node):
            node.append(value)
        else:
            node[i] = value
    else:
        node[dict_key(node, last)] = value


def get_dotted(cfg: dict, dotted_key: str, default: Any = None) -> Any:
    node: Any = cfg
    for p in dotted_key.split("."):
        if isinstance(node, list):
            try:
                node = node[int(p)]
            except (ValueError, IndexError):
                return default
        elif isinstance(node, dict) and p in node:
            node = node[p]
        elif (
            isinstance(node, dict)
            and _as_int(p) is not None
            and _as_int(p) in node
        ):  # YAML int keys (see set_dotted.dict_key)
            node = node[_as_int(p)]
        else:
            return default
    return node


def load_config(path: str, overrides: Optional[List[str]] = None) -> dict:
    """Load a YAML recipe, resolving ``_base_`` includes and ``-o`` overrides.

    ``overrides`` entries are ``"dotted.key=value"`` strings.
    """
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}

    bases = cfg.pop("_base_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        base_path = base if os.path.isabs(base) else os.path.join(os.path.dirname(path), base)
        _deep_update(merged, load_config(base_path))
    _deep_update(merged, cfg)

    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        set_dotted(merged, key.strip(), _parse_value(raw.strip()))
    return merged


def clone(cfg: dict) -> dict:
    return copy.deepcopy(cfg)
