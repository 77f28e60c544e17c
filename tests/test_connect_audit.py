"""Spark Connect compatibility audit (SURVEY §6 backlog): engine code
must not touch classic-only internals unguarded. Plan-shape asserts via
``_jdf`` are a TESTS-ONLY tool; engine modules may use
``sparkContext``/``.rdd`` only inside a try/except fallback (the Connect
degradation contract functions/partitioning.py documents)."""

from __future__ import annotations

import ast
import os

import stock_data_pipeline_spark as pkg

ENGINE_ROOT = os.path.dirname(os.path.abspath(pkg.__file__))

# Attribute accesses that would crash a Connect client outright.
FORBIDDEN_ANYWHERE = {"_jdf", "_jvm", "_jsc", "_jsparkSession"}
# Classic-only attributes allowed ONLY inside a try: guard.
GUARDED_ONLY = {"sparkContext", "rdd"}


def _engine_sources():
    for dirpath, _dirnames, filenames in os.walk(ENGINE_ROOT):
        for fn in filenames:
            if fn.endswith(".py"):
                yield os.path.join(dirpath, fn)


def _try_spans(tree: ast.AST) -> list[tuple[int, int]]:
    """(start, end) line spans of every `try` body (the guarded region)."""
    spans = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            start = node.body[0].lineno
            end = max(n.end_lineno or n.lineno for n in node.body)
            spans.append((start, end))
    return spans


def test_no_classic_only_internals_outside_guards():
    violations = []
    for path in _engine_sources():
        src = open(path).read()
        tree = ast.parse(src)
        guarded = _try_spans(tree)
        for node in ast.walk(tree):
            if not isinstance(node, ast.Attribute):
                continue
            rel = os.path.relpath(path, ENGINE_ROOT)
            if node.attr in FORBIDDEN_ANYWHERE:
                violations.append(f"{rel}:{node.lineno} .{node.attr}")
            elif node.attr in GUARDED_ONLY:
                if not any(a <= node.lineno <= b for a, b in guarded):
                    violations.append(
                        f"{rel}:{node.lineno} unguarded .{node.attr}"
                    )
    assert not violations, (
        "classic-only Spark internals in engine code (wrap in try/except "
        f"with a Connect fallback, or move to tests): {violations}"
    )


def test_plan_asserts_live_in_tests_only():
    """The plan-hygiene sweep itself uses _jdf — which is exactly why it
    lives in tests/, not the engine. Double-check the engine never grew
    a plan-text dependency."""
    for path in _engine_sources():
        assert "_jdf" not in open(path).read(), path
