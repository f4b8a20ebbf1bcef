"""Shared AST helpers for the reference-suite replay modules.

One implementation of the f-string-to-template extraction used by all
five replays (``sql/replay*.py``), so a fix to placeholder handling
(nested braces, conversion specs) lands everywhere at once.
"""

from __future__ import annotations

import ast


class TestFunctionVisitor(ast.NodeVisitor):
    """AST visitor base that attributes every node to its OUTERMOST
    enclosing ``test_*`` function — statements inside nested closures
    (the DuckDB suite's ``body`` functions) belong to the test, not the
    closure. Subclasses read :meth:`test_func` inside ``visit_Call``."""

    def __init__(self):
        self._stack: list[str] = []

    def test_func(self) -> str | None:
        for name in self._stack:
            if name.startswith("test_"):
                return name
        return None

    def visit_FunctionDef(self, node):
        self._stack.append(node.name)
        self.generic_visit(node)
        self._stack.pop()

    visit_AsyncFunctionDef = visit_FunctionDef


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
