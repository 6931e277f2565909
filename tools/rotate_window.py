"""Suggest the next round's driver window (change-aware).

The round driver's CORRECTNESS gate verifies only the FIRST 50 entries
of ``queries()``.  This tool unions every ``CORRECTNESS_r*.json`` in the
repo, reports which catalog queries have (a) never been sampled, (b)
been sampled but never green, and prints a suggested
``_DRIVER_WINDOW_ORDER`` prefix for ``catalog/__init__.py``.

Priority order (earlier displaces later when the 50 slots run out):

1. never-green, then never-sampled queries;
2. **force-included changed queries** — any catalog query whose backing
   module set (the catalog module plus everything it transitively
   imports from the package) contains a file changed since the previous
   round boundary (the latest ``round N: verdict...`` commit).  The r11
   judge flagged that staleness-only rotation let the only code-touched
   queries of that round (multimodal) miss the window; this closes it.
3. the least-recently-verified greens (stalest first, catalog order as
   tie-break).

Usage: python tools/rotate_window.py [--since <rev>] [--changed f1 f2 ...]
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

WINDOW = 50
_PKG = "foglamp_filter_python35_spark"


def latest_green_map() -> tuple[dict[str, int], set[str]]:
    """(query -> newest green round, set of ever-sampled queries)."""
    latest_green: dict[str, int] = {}
    sampled: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            sampled.add(name)
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") is None
            )
            if ok:
                latest_green[name] = max(latest_green.get(name, -1), rnd)
    return latest_green, sampled


# ------------------------------------------------- change -> query map


def _module_file(name: str) -> str | None:
    """Dotted package module name -> repo-relative file, if it exists."""
    rel = name.replace(".", os.sep)
    for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
        if os.path.isfile(os.path.join(_REPO, cand)):
            return cand
    return None


def _direct_imports(relpath: str) -> set[str]:
    """Repo-relative package files imported directly by ``relpath``
    (module- and function-level imports both appear in the AST)."""
    try:
        tree = ast.parse(open(os.path.join(_REPO, relpath)).read())
    except (OSError, SyntaxError):
        return set()
    out: set[str] = set()
    for node in ast.walk(tree):
        names: list[str] = []
        if isinstance(node, ast.Import):
            names = [a.name for a in node.names if a.name.startswith(_PKG)]
        elif isinstance(node, ast.ImportFrom) and (
            node.module or ""
        ).startswith(_PKG):
            # the module itself, plus any imported names that are
            # themselves submodules (``from pkg.functions import dedup``)
            names = [node.module] + [
                f"{node.module}.{a.name}" for a in node.names
            ]
        for n in names:
            f = _module_file(n)
            if f:
                out.add(f)
    return out


def transitive_modules(relpath: str) -> set[str]:
    """``relpath`` plus every package file it transitively imports.

    ``__init__.py`` files are leaves: they are INCLUDED (a change to
    one affects every importer) but not traversed — ``catalog/__init__``
    lazily imports every catalog module inside ``all_queries()``, so
    walking through it would mark all 153 queries changed on any edit."""
    seen: set[str] = set()
    todo = [relpath]
    while todo:
        cur = todo.pop()
        if cur in seen:
            continue
        seen.add(cur)
        if cur.endswith("__init__.py") and cur != relpath:
            continue
        todo.extend(_direct_imports(cur) - seen)
    return seen


def query_module_map() -> dict[str, str]:
    """query name -> repo-relative catalog module file defining it."""
    import importlib  # noqa: PLC0415

    out: dict[str, str] = {}
    cat_dir = os.path.join(_PKG, "catalog")
    for fname in sorted(os.listdir(os.path.join(_REPO, cat_dir))):
        if not fname.endswith(".py") or fname == "__init__.py":
            continue
        mod = importlib.import_module(f"{_PKG}.catalog.{fname[:-3]}")
        for spec in getattr(mod, "SPECS", ()):
            out[spec.name] = os.path.join(cat_dir, fname)
    return out


# rotation bookkeeping, not query semantics: editing the window order
# itself must not mark every query "changed" (else each round's
# rotation commit would force the next round back to staleness-only)
_NON_SEMANTIC = {os.path.join(_PKG, "catalog", "window.py")}


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    """Remove bare string-constant expression statements (docstrings)."""
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if isinstance(body, list):
            node.body = [  # type: ignore[attr-defined]
                st for st in body
                if not (
                    isinstance(st, ast.Expr)
                    and isinstance(st.value, ast.Constant)
                    and isinstance(st.value.value, str)
                )
            ] or body[:1]
    return tree


def is_semantic_change(relpath: str, rev: str | None) -> bool:
    """True if ``relpath`` differs from its ``rev`` version beyond
    comments/docstrings (AST-equality after docstring stripping).

    A comment-only or docstring-only edit to a widely-imported file
    (e.g. catalog/__init__.py) must not force every query into the
    window — the r12 advisor showed that degenerates into truncating
    the forced block and stalling staleness rotation."""
    if rev is None:
        return True
    try:
        old_src = subprocess.run(
            ["git", "show", f"{rev}:{relpath}"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout
        new_src = open(os.path.join(_REPO, relpath)).read()
        old = ast.dump(_strip_docstrings(ast.parse(old_src)))
        new = ast.dump(_strip_docstrings(ast.parse(new_src)))
        return old != new
    except (subprocess.CalledProcessError, OSError, SyntaxError, ValueError):
        return True  # added/unparseable file: assume semantic


def forced_queries(
    changed_files: list[str], boundary: str | None = None
) -> tuple[list[str], dict[str, list[str]], list[str]]:
    """(forced queries, changed-file -> forced-query attribution,
    non-semantic changed files skipped).  Catalog order preserved."""
    candidates = [
        f for f in changed_files
        if f.startswith(_PKG) and f not in _NON_SEMANTIC
    ]
    skipped = [f for f in candidates if not is_semantic_change(f, boundary)]
    changed = set(candidates) - set(skipped)
    if not changed:
        return [], {}, skipped
    qmap = query_module_map()
    closure: dict[str, set[str]] = {}
    forced: list[str] = []
    attribution: dict[str, list[str]] = {}
    for name, cat_file in qmap.items():
        if cat_file not in closure:
            closure[cat_file] = transitive_modules(cat_file)
        hits = closure[cat_file] & changed
        if hits:
            forced.append(name)
            for f in hits:
                attribution.setdefault(f, []).append(name)
    return forced, attribution, skipped


def round_boundary_rev() -> str | None:
    """SHA of the latest driver round-boundary commit."""
    try:
        sha = subprocess.run(
            ["git", "log", "--grep", "^round [0-9]*: verdict", "-n", "1",
             "--format=%H"],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout.strip()
        return sha or None
    except (subprocess.CalledProcessError, OSError):
        return None


def changed_since(rev: str) -> list[str]:
    """Files changed between ``rev`` and the working tree (committed
    AND uncommitted — mid-round runs see their own edits)."""
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", rev],
            cwd=_REPO, capture_output=True, text=True, check=True,
        ).stdout
        return [ln.strip() for ln in out.splitlines() if ln.strip()]
    except (subprocess.CalledProcessError, OSError):
        return []


def suggest_window(
    names: list[str],
    latest_green: dict[str, int],
    sampled: set[str],
    forced: list[str],
    window: int = WINDOW,
) -> list[str]:
    """Assemble the window: never-green + never-sampled first, then the
    forced (code-changed) queries, then stalest greens; the forced block
    displaces the freshest greens, never the never-green/never-sampled
    block.

    The forced block itself is ordered by STALENESS (oldest driver
    evidence first), not catalog order: when a widely-imported file
    forces more queries than the window holds, the truncation then
    drops the freshest-evidence forced queries — rotation still
    advances — instead of silently repeating the current prefix
    (r12 advisor finding)."""
    never_sampled = [n for n in names if n not in sampled]
    never_green = [n for n in names if n in sampled and n not in latest_green]
    forced_set = set(forced)
    head = never_green + never_sampled
    head += sorted(
        (n for n in names if n in forced_set and n not in set(head)),
        key=lambda n: (latest_green.get(n, -1), names.index(n)),
    )
    greens = sorted(
        (n for n in names if n in latest_green and n not in set(head)),
        key=lambda n: (latest_green[n], names.index(n)),
    )
    return (head + greens)[:window]


def main() -> None:
    from foglamp_filter_python35_spark.catalog import all_queries

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--since", default=None,
        help="rev to diff against (default: latest 'round N: verdict' commit)",
    )
    ap.add_argument(
        "--changed", nargs="*", default=None,
        help="explicit changed-file list (overrides the git diff)",
    )
    args = ap.parse_args()

    names = list(all_queries())
    latest_green, sampled = latest_green_map()

    if args.changed is not None:
        changed = args.changed
        boundary_rev = args.since or round_boundary_rev()
        boundary = "(explicit --changed list)"
    else:
        boundary_rev = args.since or round_boundary_rev()
        boundary = boundary_rev
        changed = changed_since(boundary_rev) if boundary_rev else []
    forced, attribution, skipped = forced_queries(changed, boundary_rev)

    never_sampled = [n for n in names if n not in sampled]
    never_green = [n for n in names if n in sampled and n not in latest_green]
    suggestion = suggest_window(names, latest_green, sampled, forced)

    print(f"catalog queries: {len(names)}")
    print(f"ever sampled:    {len(sampled)}")
    print(f"never sampled:   {len(never_sampled)} -> {never_sampled}")
    print(f"sampled, never green: {len(never_green)} -> {never_green}")
    print(f"round boundary:  {boundary}")
    pkg_changed = sorted(f for f in changed if f.startswith(_PKG))
    print(f"changed package files since boundary: {len(pkg_changed)}")
    for f in pkg_changed:
        note = " [non-semantic: comment/docstring-only, skipped]" \
            if f in skipped else ""
        print(f"    {f}{note}")
    print(f"FORCED (code-changed) queries: {len(forced)} -> {forced}")
    if attribution:
        print("forcing attribution (changed file -> #queries forced):")
        for f, qs in sorted(attribution.items(), key=lambda kv: -len(kv[1])):
            print(f"    {f}: {len(qs)}")
    dropped_forced = [n for n in forced if n not in set(suggestion)]
    if dropped_forced:
        print(
            "\n" + "!" * 72
            + f"\n!! WARNING: {len(dropped_forced)} FORCED (code-changed) "
            f"queries DO NOT FIT the {WINDOW}-slot window\n"
            "!! and will NOT be driver-sampled this round (freshest "
            "evidence dropped first):\n!!   "
            + ", ".join(dropped_forced)
            + "\n!! If a single widely-imported file caused this, check the "
            "attribution above;\n!! re-run with --changed excluding it if "
            "the edit was window bookkeeping.\n" + "!" * 72
        )
    print("\nsuggested _DRIVER_WINDOW_ORDER (first %d):" % WINDOW)
    for n in suggestion:
        tag = (
            "NEVER-GREEN"
            if n in never_green
            else "NEVER-SAMPLED"
            if n in never_sampled
            else f"green r{latest_green[n]}"
        )
        if n in forced:
            tag += " FORCED(changed)"
        print(f'    "{n}",  # {tag}')


if __name__ == "__main__":
    main()
