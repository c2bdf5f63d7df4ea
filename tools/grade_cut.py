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

"Changed" is computed at two granularities (r14 — the r13 scheme's
module-level helper hop forced an 11-entry CHANGED_LOCAL_ONLY
declaration for entries whose MODULES imported the changed
bucketing.py but whose plans never executed the changed code):
  (a) the entry's query-function source (inspect.getsource) plus its
      DuckDB oracle text,
  (b) any package FUNCTION / class / module constant / import binding
      the query function TRANSITIVELY references, resolved by static
      AST analysis (function_hashes + entry_deps below) — so an
      operators/bucketing.py edit flags exactly the entries whose
      call graphs reach the edited function, not every entry sharing
      a module with a caller. This subsumes the r10 failure class
      (operators/exact_quantile.py changed under unchanged query fns)
      AND closes the old same-module blind spot (a private helper in
      the entry's own query module now flags its callers).
Remaining blind spots, both conservative-on-miss only through
dynamic dispatch: getattr()-style indirect calls, and a changed
function reached only via a data structure (neither occurs in the
query call graphs today). References that cannot be resolved to a
single name (bare module refs with no attribute) depend on the WHOLE
target file, never on nothing.

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


# --- function-level dependency tracking (r14, r13 verdict item 2) ---------
#
# Granularity keys, all relative to the repo root:
#   "<rel>::<name>"          top-level def / class / constant <name>
#   "<rel>::<import:name>"   the BINDING of an imported name (hash =
#                            where it comes from, so re-pointing an
#                            import flags its users while ADDING an
#                            unrelated import flags nobody)
#   "<rel>::<module-body>"   residual top-level statements (try/if
#                            blocks etc.) — every function in <rel>
#                            depends on it
#   "<rel>"                  the whole file (fallback for unresolvable
#                            module references)


def _pkg_modules(root: str) -> dict[str, str]:
    """{dotted module name: relpath} for the package, including the
    package dirs themselves (mapped to their __init__.py)."""
    out: dict[str, str] = {}
    for rel in source_hashes(root):
        if rel.endswith("__init__.py"):
            out[os.path.dirname(rel).replace(os.sep, ".")] = rel
        else:
            out[rel[: -len(".py")].replace(os.sep, ".")] = rel
    return out


class _ModuleInfo:
    """Static per-module facts: top-level name bindings, per-name AST
    hashes, and per-function referenced names."""

    def __init__(self, rel: str, tree):
        import ast

        self.rel = rel
        self.func_hashes: dict[str, str] = {}  # key -> sha
        self.bindings: dict[str, tuple] = {}  # local name -> target
        self.func_refs: dict[str, list] = {}  # def name -> [(root, attr|None)]
        self.func_imports: dict[str, dict] = {}  # def name -> local bindings
        body_residue = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.func_hashes[f"{rel}::{node.name}"] = _sha(
                    ast.dump(_strip_docstrings(node), include_attributes=False)
                )
                self.bindings[node.name] = ("func", rel, node.name)
                self.func_refs[node.name] = _collect_refs(node)
                self.func_imports[node.name] = _collect_local_imports(node)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                for name, tgt in _import_bindings(node).items():
                    self.bindings[name] = tgt
                    self.func_hashes[f"{rel}::<import:{name}>"] = _sha(repr(tgt))
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = node.targets if isinstance(node, ast.Assign) else [node.target]
                names = []
                for t in targets:
                    if isinstance(t, ast.Name):
                        names.append(t.id)
                    elif isinstance(t, (ast.Tuple, ast.List)):
                        names += [e.id for e in t.elts if isinstance(e, ast.Name)]
                h = _sha(ast.dump(node, include_attributes=False))
                for n in names:
                    self.func_hashes[f"{rel}::{n}"] = h
                    self.bindings[n] = ("func", rel, n)
                    # a constant's VALUE may reference other names
                    # (e.g. SQL f-string built from another constant)
                    self.func_refs[n] = _collect_refs(node)
                    self.func_imports[n] = {}
                if not names:
                    body_residue.append(node)
            elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
                pass  # module docstring — doc-only edits flag nobody
            else:
                body_residue.append(node)
        self.func_hashes[f"{rel}::<module-body>"] = _sha(
            "\n".join(ast.dump(n, include_attributes=False) for n in body_residue)
        )


def _import_bindings(node) -> dict[str, tuple]:
    """{bound name: ('import', dotted source)} for one import stmt."""
    import ast

    out = {}
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.name.startswith(PKG):
                out[a.asname or a.name.split(".")[0]] = ("import", a.name)
    elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
        if node.module == PKG or node.module.startswith(PKG + "."):
            for a in node.names:
                out[a.asname or a.name] = ("import", f"{node.module}.{a.name}")
    return out


def _collect_local_imports(fn_node) -> dict[str, tuple]:
    import ast

    out = {}
    for node in ast.walk(fn_node):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            out.update(_import_bindings(node))
    return out


def _strip_docstrings(node):
    """Deep-copied ``node`` with every docstring removed (the node's
    own and those of any nested def/class). Hashing the stripped AST
    makes doc-only edits flag nobody — the same rule _ModuleInfo
    already applied to MODULE docstrings, extended to function/class
    ones (r16): a docstring cannot change an executed plan, and
    honoring ADVICE documentation fixes must not force a re-grade of
    every consumer of a shared helper."""
    import ast
    import copy

    node = copy.deepcopy(node)
    for n in ast.walk(node):
        if isinstance(
            n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(n, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                n.body = body[1:] or [ast.Pass()]
    return node


def _collect_refs(node) -> list:
    """[(root name, first attribute or None)] for every Name /
    Attribute reference under ``node``."""
    import ast

    refs = []
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            refs.append((n.value.id, n.attr))
        elif isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
            refs.append((n.id, None))
    return refs


def _analyze(root: str) -> dict[str, "_ModuleInfo"]:
    import ast

    infos = {}
    for rel in source_hashes(root):
        with open(os.path.join(root, rel)) as fh:
            infos[rel] = _ModuleInfo(rel, ast.parse(fh.read()))
    return infos


def function_hashes(root: str = ROOT) -> dict[str, str]:
    """{granularity key: sha256} over every package module — the
    snapshot side of the function-level tripwire."""
    out = {}
    for info in _analyze(root).values():
        out.update(info.func_hashes)
    return out


def _resolve(tgt: tuple, attr, mods: dict, infos: dict, out: set, seen: set):
    """Follow one binding target; add dep keys to ``out`` and recurse
    through same-package functions."""
    if tgt[0] == "import":
        dotted = tgt[1]
        if dotted in mods:  # imported a module
            rel2 = mods[dotted]
            if attr is None:
                out.add(rel2)  # bare module ref: whole-file dep
            else:
                _resolve_name(rel2, attr, mods, infos, out, seen)
        else:  # imported a name FROM a module
            mod, _, name = dotted.rpartition(".")
            if mod in mods:
                _resolve_name(mods[mod], name, mods, infos, out, seen)
    elif tgt[0] == "func":
        _resolve_name(tgt[1], tgt[2], mods, infos, out, seen)


def _resolve_name(rel: str, name: str, mods, infos, out: set, seen: set):
    info = infos.get(rel)
    if info is None:
        return
    key = (rel, name)
    if key in seen:
        return
    seen.add(key)
    tgt = info.bindings.get(name)
    if tgt is None:
        # not defined at top level (re-export via __init__ star, or a
        # dynamic attr): depend on the whole file — never on nothing
        out.add(rel)
        return
    if tgt[0] == "import":
        out.add(f"{rel}::<import:{name}>")
        _resolve(tgt, None, mods, infos, out, seen)
        return
    out.add(f"{rel}::{name}")
    out.add(f"{rel}::<module-body>")
    local = info.func_imports.get(name, {})
    for root_name, attr in info.func_refs.get(name, []):
        t = local.get(root_name) or info.bindings.get(root_name)
        if t is None:
            continue
        if t[0] == "import" and root_name in local:
            _resolve(t, attr, mods, infos, out, seen)
        elif t[0] == "import":
            out.add(f"{rel}::<import:{root_name}>")
            _resolve(t, attr, mods, infos, out, seen)
        else:
            _resolve(t, attr, mods, infos, out, seen)


def entry_deps(root: str = ROOT) -> dict[str, set[str]]:
    """{registry entry: transitive granularity-key dep set}, computed
    by static AST closure from the entry's query function. The entry's
    OWN source+oracle hash lives in entry_hashes(); this set covers
    everything else its execution can reach."""
    import sys

    if root not in sys.path:
        sys.path.insert(0, root)
    from data_validator_spark.queries import build_registry

    infos = _analyze(root)
    mods = _pkg_modules(root)
    queries, _ = build_registry()
    out = {}
    for name, fn in queries.items():
        rel = fn.__module__.replace(".", os.sep) + ".py"
        deps: set[str] = set()
        _resolve_name(rel, fn.__name__, mods, infos, deps, set())
        deps.discard(f"{rel}::{fn.__name__}")  # own hash tracked per-entry
        out[name] = deps
    return out


def changed_keys(snap_funcs: dict, cur_funcs: dict, snap_files: dict, cur_files: dict) -> set:
    """Granularity keys changed since the snapshot, plus the bare-file
    keys for changed/removed files (whole-file deps intersect these)."""
    keys = {k for k in cur_funcs if snap_funcs.get(k) != cur_funcs[k]}
    keys |= set(snap_funcs) - set(cur_funcs)
    keys |= {rel for rel in cur_files if snap_files.get(rel) != cur_files[rel]}
    keys |= set(snap_files) - set(cur_files)
    return keys


def main() -> int:
    snap = {"files": source_hashes(), "entries": entry_hashes(), "funcs": function_hashes()}
    with open(SNAPSHOT, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {SNAPSHOT} ({len(snap['files'])} files, {len(snap['entries'])} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
