"""Snapshot the hashes that back the grading-cut auto-promote rule
(r10 verdict item 2).

The r10 weak-mark root cause: GRADE_PRIORITY was re-cut at 13:36 and
the exact_quantile/ccnet changes landed at 13:49 — AFTER the cut — so
four semantics-touched entries sat below the 50-entry driver budget
with no post-change proof. The mechanical rule that prevents a repeat:

  tests/test_registry_order.py::test_changed_since_cut_auto_promoted
  recomputes these hashes; any registry entry that changed since this
  snapshot MUST be inside the graded top-50 or be named in
  CHANGED_LOCAL_ONLY with a justification.

"Changed" is computed at three granularities, balancing precision
against the 50-entry budget:
  (a) the entry's query-function source (inspect.getsource),
  (b) the entry's DuckDB oracle text,
  (c) any NON-QUERY helper module (operators/, functions/, sources/,
      queries/__init__, ...) that the entry's query module imports,
      one hop — this catches the r10 class, where
      operators/exact_quantile.py changed but the query functions of
      the entries it broke did not.
Edits to OTHER functions in the same query module do not flag an
entry. Known blind spot: a module-level constant edit that surfaces
in neither the function source nor the oracle f-string.

Regenerate ONLY in the same commit that finalizes GRADE_PRIORITY for
the round (the snapshot asserts "the cut saw this code"):

    python tools/grade_cut.py        # rewrites tools/grade_cut_snapshot.json
"""

from __future__ import annotations

import hashlib
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(ROOT, "tools", "grade_cut_snapshot.json")
PKG = "data_validator_spark"
QUERY_PKG_DIR = os.path.join(PKG, "queries")


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()


def source_hashes(root: str = ROOT) -> dict[str, str]:
    """{relpath: sha256} for every non-test package source file."""
    out: dict[str, str] = {}
    for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in sorted(filenames):
            if not f.endswith(".py"):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            with open(p, "rb") as fh:
                out[rel] = hashlib.sha256(fh.read()).hexdigest()
    return out


def is_helper(rel: str) -> bool:
    """Helper = any package file that is not a query submodule; the
    queries package __init__ (dsum/_hash60/load/spread) counts as a
    helper since every entry rides its conventions."""
    if not rel.startswith(QUERY_PKG_DIR + os.sep):
        return True
    return rel.endswith("__init__.py")


def entry_hashes(root: str = ROOT) -> dict[str, str]:
    """{entry: sha256(query-fn source + oracle text)} for the whole
    registry. Importable without a Spark session."""
    import inspect
    import sys

    if root not in sys.path:
        sys.path.insert(0, root)
    from data_validator_spark.queries import build_registry

    queries, oracles = build_registry()
    out = {}
    for name, fn in queries.items():
        out[name] = _sha(inspect.getsource(fn) + "\n#oracle\n" + oracles.get(name, ""))
    return out


def module_deps(root: str = ROOT) -> dict[str, set[str]]:
    """One-hop static import map: {relpath: set of package relpaths it
    references}."""
    import re

    hashes = source_hashes(root)
    by_mod = {rel[: -len(".py")].replace(os.sep, "."): rel for rel in hashes}
    for rel in list(hashes):
        if rel.endswith("__init__.py"):
            by_mod[os.path.dirname(rel).replace(os.sep, ".")] = rel
    deps: dict[str, set[str]] = {}
    pat = re.compile(rf"{PKG}(?:\.\w+)*")
    for rel in hashes:
        with open(os.path.join(root, rel)) as fh:
            src = fh.read()
        found = {by_mod[m] for m in pat.findall(src) if m in by_mod}
        found.discard(rel)
        deps[rel] = found
    return deps


def main() -> int:
    snap = {"files": source_hashes(), "entries": entry_hashes()}
    with open(SNAPSHOT, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {SNAPSHOT} ({len(snap['files'])} files, {len(snap['entries'])} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
