"""Module-hygiene guards.

A duplicate top-level ``def`` silently shadows the earlier one — in
round 4 a re-added ``degree_assortativity`` changed an already-green
registered query's output schema without any import error.  This walks
every package module's AST and fails on duplicate top-level
function/class names, so the mistake dies in CI instead of in the
correctness gate.
"""

from __future__ import annotations

import ast
import os

import twitter_followers_patterns_mapreduce_spark as pkg

PKG_ROOT = os.path.dirname(pkg.__file__)


def _py_files():
    for dirpath, _dirnames, filenames in os.walk(PKG_ROOT):
        for f in filenames:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def test_no_duplicate_toplevel_defs():
    offenders = []
    for path in _py_files():
        with open(path) as fh:
            tree = ast.parse(fh.read(), filename=path)
        seen: dict[str, int] = {}
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    offenders.append(
                        f"{os.path.relpath(path, PKG_ROOT)}: `{node.name}` defined at "
                        f"lines {seen[node.name]} and {node.lineno}"
                    )
                else:
                    seen[node.name] = node.lineno
    assert not offenders, "shadowed top-level definitions:\n" + "\n".join(offenders)
