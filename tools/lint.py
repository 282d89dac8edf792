#!/usr/bin/env python
"""Lint gate: ruff when available, else a built-in fallback.

CI installs ruff (`ruff check .`, config in pyproject.toml). Hermetic
environments without ruff still get a meaningful gate: per-file syntax
compilation plus an AST pass flagging unused imports (ruff F401) — the
lint class that actually catches rot in a pure-Python codebase.
"""

from __future__ import annotations

import ast
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SKIP_DIRS = {".git", "native", "__pycache__", ".claude", "tests/data"}


def iter_py_files():
    for dirpath, dirnames, filenames in os.walk(ROOT):
        rel = os.path.relpath(dirpath, ROOT)
        dirnames[:] = [
            d
            for d in dirnames
            if d not in SKIP_DIRS and os.path.join(rel, d).replace("./", "") not in SKIP_DIRS
        ]
        for f in filenames:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


class ImportUseVisitor(ast.NodeVisitor):
    def __init__(self):
        self.imported: dict[str, int] = {}  # name -> lineno
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = getattr(a, "lineno", node.lineno)

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = getattr(a, "lineno", node.lineno)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def fallback_lint() -> int:
    errors = 0
    for path in iter_py_files():
        rel = os.path.relpath(path, ROOT)
        src = open(path, encoding="utf-8").read()
        try:
            tree = ast.parse(src, filename=rel)
        except SyntaxError as e:
            print(f"{rel}:{e.lineno}: syntax error: {e.msg}")
            errors += 1
            continue
        if os.path.basename(path) == "__init__.py":
            continue  # re-export shims (F401 exempt, as in pyproject)
        v = ImportUseVisitor()
        v.visit(tree)
        # Names referenced anywhere in the source text-wise (covers strings
        # in __all__, doctests) are not flagged.
        lines = src.splitlines()
        for name, lineno in sorted(v.imported.items(), key=lambda kv: kv[1]):
            if name in v.used or name == "annotations":
                continue
            if f'"{name}"' in src or f"'{name}'" in src:
                continue
            if "noqa" in lines[lineno - 1]:
                continue
            print(f"{rel}:{lineno}: F401 unused import: {name}")
            errors += 1
    return errors


def main() -> int:
    if shutil.which("ruff"):
        return subprocess.call(["ruff", "check", ROOT])
    print("ruff not found; running built-in fallback lint (syntax + F401)")
    errors = fallback_lint()
    if errors:
        print(f"\n{errors} finding(s)")
        return 1
    print("fallback lint clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
