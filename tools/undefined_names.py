#!/usr/bin/env python
"""Minimal pyflakes stand-in: report names a module's functions read
from the global scope that are neither defined at module level,
imported, nor builtins. Used to verify file-split refactors moved
every helper a section depends on (a missed one only explodes at
query-call time otherwise)."""

from __future__ import annotations

import ast
import builtins
import sys


def module_globals(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        names.add(n.id)
        elif isinstance(node, (ast.AnnAssign, ast.AugAssign)):
            if isinstance(node.target, ast.Name):
                names.add(node.target.id)
    return names


class Scope(ast.NodeVisitor):
    """Collect Name loads not bound locally anywhere in the fn."""

    def __init__(self):
        self.bound: set[str] = set()
        self.loads: set[str] = set()

    def visit_FunctionDef(self, node):
        if hasattr(node, "name"):
            self.bound.add(node.name)
        args = node.args
        for a in (args.posonlyargs + args.args + args.kwonlyargs):
            self.bound.add(a.arg)
        if args.vararg:
            self.bound.add(args.vararg.arg)
        if args.kwarg:
            self.bound.add(args.kwarg.arg)
        self.generic_visit(node)

    visit_AsyncFunctionDef = visit_FunctionDef
    visit_Lambda = visit_FunctionDef

    def visit_ClassDef(self, node):
        self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Import(self, node):
        for a in node.names:
            self.bound.add((a.asname or a.name).split(".")[0])

    visit_ImportFrom = visit_Import

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self.bound.add(node.id)
        else:
            self.loads.add(node.id)
        self.generic_visit(node)

    def visit_ExceptHandler(self, node):
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_comprehension(self, node):
        for n in ast.walk(node.target):
            if isinstance(n, ast.Name):
                self.bound.add(n.id)
        self.generic_visit(node)


def undefined(path: str) -> set[str]:
    with open(path) as f:
        tree = ast.parse(f.read(), path)
    g = module_globals(tree)
    sc = Scope()
    sc.visit(tree)
    known = g | sc.bound | set(dir(builtins)) | {"__file__", "__name__"}
    return {n for n in sc.loads if n not in known}


if __name__ == "__main__":
    bad = False
    for p in sys.argv[1:]:
        u = undefined(p)
        if u:
            bad = True
            print(f"{p}: UNDEFINED {sorted(u)}")
        else:
            print(f"{p}: ok")
    sys.exit(1 if bad else 0)
