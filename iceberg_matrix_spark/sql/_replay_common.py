"""Shared AST helpers for the reference-suite replay modules.

One implementation of the f-string-to-template extraction used by all
five replays (``sql/replay*.py``), so a fix to placeholder handling
(nested braces, conversion specs) lands everywhere at once.
"""

from __future__ import annotations

import ast


def fstring_template(node: ast.expr) -> str | None:
    """A string constant or f-string rendered as a template: literal
    parts verbatim, each interpolation as ``{<unparsed expr>}`` for the
    caller's placeholder substitution. None for non-string nodes."""
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
        return node.value
    if isinstance(node, ast.JoinedStr):
        parts = []
        for v in node.values:
            if isinstance(v, ast.Constant):
                parts.append(str(v.value))
            elif isinstance(v, ast.FormattedValue):
                parts.append("{" + ast.unparse(v.value) + "}")
        return "".join(parts)
    return None
