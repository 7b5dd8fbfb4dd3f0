"""input_hint requirement: 'vectorized pandas/Arrow UDFs (no per-row
Python) throughout'. Enforced by scanning the package source for
row-at-a-time UDF constructs."""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "tbbid_scrapy_spark"


def _calls(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            yield node


def test_no_row_at_a_time_udf():
    offenders = []
    for py in PKG.rglob("*.py"):
        tree = ast.parse(py.read_text())
        for call in _calls(tree):
            fn = call.func
            # F.udf(...) / udf(...) — the non-pandas, per-row variant
            name = None
            if isinstance(fn, ast.Attribute):
                name = fn.attr
            elif isinstance(fn, ast.Name):
                name = fn.id
            if name == "udf":
                offenders.append(f"{py}:{call.lineno}")
        # decorator form @F.udf / @udf
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for dec in node.decorator_list:
                    target = dec.func if isinstance(dec, ast.Call) else dec
                    nm = (
                        target.attr
                        if isinstance(target, ast.Attribute)
                        else getattr(target, "id", None)
                    )
                    if nm == "udf":
                        offenders.append(f"{py}:{node.lineno}")
    assert not offenders, f"row-at-a-time UDFs found: {offenders}"


def test_no_collect_in_hot_operators():
    """Driver-side .collect() is allowed only in control-plane modules
    (plans/ wave loop driver decisions, frontier robots-rule folding);
    data-plane operator modules must stay fully distributed."""
    data_plane = [
        PKG / "operators" / "dedup.py",
        PKG / "operators" / "similarity.py",
        PKG / "operators" / "text.py",
        PKG / "operators" / "bloom.py",
        PKG / "functions",
    ]
    offenders = []
    for root in data_plane:
        files = root.rglob("*.py") if root.is_dir() else [root]
        for py in files:
            tree = ast.parse(py.read_text())
            for call in _calls(tree):
                if isinstance(call.func, ast.Attribute) and call.func.attr == "collect":
                    offenders.append(f"{py}:{call.lineno}")
    assert not offenders, f".collect() in data-plane operators: {offenders}"
