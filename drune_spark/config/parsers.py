"""Constraint rule-string mini-grammar parser.

Re-implements the semantics of the reference's rule parser
(reference: src/drune/utils/parsers.py:1-74): a rule string like

    "func1:p1,key='v'|func2|func3:[1, 2]"

parses into a list of ``{"function": name, "params": {...}}`` dicts.
Positional params land in ``params["positional"]`` (a list); ``key=value``
pairs land as named params. Values are interpreted with
``ast.literal_eval`` when possible (so ``[1,2]``, ``'a'``, ``3.5`` work,
including quoted strings containing commas / pipes); otherwise kept as
raw strings.
"""

from __future__ import annotations

import ast
from typing import Any


def _literal(value: str) -> Any:
    value = value.strip()
    # Simple quoted strings are unquoted RAW: rule values are usually
    # regexes ("pattern:'...\\.[a-z]'"), where Python escape handling is
    # both wrong (\n would become a newline) and noisy (literal_eval
    # emits "invalid escape sequence" DeprecationWarnings from
    # <unknown>:1). Only strings with no interior quote qualify — the
    # rest (including anything needing real escapes) still goes through
    # literal_eval.
    if (
        len(value) >= 2
        and value[0] == value[-1]
        and value[0] in "'\""
        and value[0] not in value[1:-1]
    ):
        return value[1:-1]
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on ``sep`` ignoring separators inside quotes or brackets."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    current: list[str] = []
    for ch in text:
        if quote:
            current.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            current.append(ch)
            continue
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(current))
            current = []
        else:
            current.append(ch)
    parts.append("".join(current))
    return parts


def parse_rules(rule_string: str) -> list[dict[str, Any]]:
    """Parse ``"f1:a,b=2|f2"`` into ``[{function, params}, ...]``."""
    rules: list[dict[str, Any]] = []
    for chunk in _split_top_level(rule_string, "|"):
        chunk = chunk.strip()
        if not chunk:
            continue
        name, _, param_str = chunk.partition(":")
        params: dict[str, Any] = {}
        positional: list[Any] = []
        if param_str.strip():
            for raw in _split_top_level(param_str, ","):
                raw = raw.strip()
                if not raw:
                    continue
                if "=" in raw and not raw.startswith(("[", "(", "{", "'", '"')):
                    key, _, val = raw.partition("=")
                    params[key.strip()] = _literal(val)
                else:
                    positional.append(_literal(raw))
        if positional:
            params["positional"] = positional
        rules.append({"function": name.strip(), "params": params})
    return rules
