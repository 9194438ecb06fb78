"""Persist-hygiene audit (VERDICT r15 #5).

Statically scans every function in chyme_spark/ops/*.py (plus cli.py)
for ``.persist()`` calls and flags any function that persists without a
matching release — either an ``.unpersist(...)`` in the same function,
a ``localCheckpoint`` hand-off (ContextCleaner releases those blocks
when the frame is dropped), or an explicit documentation marker on or
near the persist line (``until-dropped``, ``ContextCleaner``, or
``session-scoped``) recording that the retention is deliberate and
bounded.

The r15 precedent: x_pagerank's leaked nodes/deg persists were fixed
while x_cross_source_leakage's identical leak was waved through with a
comment — this check makes the trade explicit for every future persist.

Usage: python tools/check_persists.py      # exit 1 on violations
Wired into tests/test_cli.py::test_persist_hygiene.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = [
    os.path.join(REPO, "chyme_spark", "ops"),
]
EXTRA_FILES = [os.path.join(REPO, "chyme_spark", "cli.py")]
MARKERS = ("until-dropped", "ContextCleaner", "session-scoped")
# how many lines above a persist call a justification comment may sit
MARKER_WINDOW = 6


def _functions(tree: ast.Module):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node


def _calls(fn: ast.AST, attr: str) -> list[tuple[int, int]]:
    out = []
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == attr
        ):
            # a persist at the end of a multi-line expression carries
            # the expression's START lineno; the justification comment
            # sits on the `.persist()` line itself — scan the whole span
            out.append((node.lineno, getattr(node, "end_lineno", node.lineno)))
    return out


def check_file(path: str) -> list[str]:
    src = open(path).read()
    lines = src.splitlines()
    tree = ast.parse(src)
    violations = []
    for fn in _functions(tree):
        persists = _calls(fn, "persist")
        if not persists:
            continue
        releases = _calls(fn, "unpersist") + _calls(fn, "localCheckpoint")
        if releases:
            # a release exists in the function: assume the author paired
            # them (the per-object pairing is a review concern, not a
            # mechanical one — names flow through reassignment)
            continue
        for ln, end_ln in persists:
            window = "\n".join(lines[max(0, ln - MARKER_WINDOW): end_ln + 1])
            if any(m in window for m in MARKERS):
                continue
            violations.append(
                f"{os.path.relpath(path, REPO)}:{ln} — persist() in "
                f"{fn.name}() has no unpersist/localCheckpoint in scope "
                f"and no justification marker {MARKERS} within "
                f"{MARKER_WINDOW} lines"
            )
    return violations


def main() -> int:
    files = list(EXTRA_FILES)
    for d in SCAN:
        files += [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".py")
        ]
    violations = []
    for path in files:
        violations += check_file(path)
    for v in violations:
        print(v)
    if not violations:
        print(f"persist hygiene OK across {len(files)} files")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
