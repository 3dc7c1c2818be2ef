"""VERDICT r6 item 4 ("done" condition): no UNDOCUMENTED
single-partition window anywhere in the package.

A window spec built from ``Window.orderBy(...)`` / ``Window.rowsBetween``
/ ``Window.rangeBetween`` with no ``partitionBy`` in the chain plans an
``Exchange SinglePartition`` — every row through one task. That is
sometimes fine (ranking a <=k-row top-k frame, a prefix over one row
per range partition, per-day aggregates) but it must be a DOCUMENTED
decision: each such site carries a ``# bounded-serial: <why the input
is bounded>`` marker on one of the three preceding lines. This test
walks the package AST and fails on any unmarked site, so a new
scale-killer-shaped window cannot land silently.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "ironman_medallion_lakehouse_spark"
MARKER = "bounded-serial:"
_SPEC_METHODS = {"orderBy", "rowsBetween", "rangeBetween"}


def _chain_has_partition_by(node: ast.AST) -> bool:
    """True if the attribute/call chain under ``node`` contains a
    ``partitionBy`` call."""
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            if cur.attr == "partitionBy":
                return True
            cur = cur.value
        else:
            return False


def _rooted_at_window(node: ast.AST) -> bool:
    cur = node
    while True:
        if isinstance(cur, ast.Call):
            cur = cur.func
        elif isinstance(cur, ast.Attribute):
            cur = cur.value
        else:
            return isinstance(cur, ast.Name) and cur.id == "Window"


def _unpartitioned_specs(tree: ast.AST):
    """Outermost Window.<spec> call chains with no partitionBy link.

    Walk top-down and do not descend into a flagged chain twice."""
    flagged: list[ast.Call] = []
    seen: set[int] = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call) or id(node) in seen:
            continue
        f = node.func
        if not (isinstance(f, ast.Attribute) and f.attr in _SPEC_METHODS):
            continue
        if not _rooted_at_window(node):
            continue
        if _chain_has_partition_by(node):
            continue
        # mark inner calls of this chain as seen so one chain = one site
        for inner in ast.walk(node):
            seen.add(id(inner))
        flagged.append(node)
    return flagged


def test_every_unpartitioned_window_is_documented():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        src = path.read_text()
        lines = src.splitlines()
        tree = ast.parse(src)
        for call in _unpartitioned_specs(tree):
            lo = max(0, call.lineno - 4)
            context = "\n".join(lines[lo : call.lineno])
            if MARKER not in context:
                offenders.append(f"{path.relative_to(PKG.parent)}:{call.lineno}")
    assert not offenders, (
        "unpartitioned Window specs without a '# bounded-serial:' marker "
        f"(single-partition sort over unbounded input?): {offenders}"
    )


def test_marker_sites_exist():
    """The convention is live: the known bounded sites carry markers."""
    n = sum(p.read_text().count(MARKER) for p in PKG.rglob("*.py"))
    assert n >= 8, f"expected >=8 bounded-serial markers in package, found {n}"
