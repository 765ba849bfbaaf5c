"""Generate the driver-sampler front-list MECHANICALLY from the round's
git diff (VERDICT r11 #1: the hand-maintained rotation list silently
missed the rewritten q21 in r11 — its driver check stayed pre-rewrite).

Method — static, no Spark session:

1. Boundary = the most recent commit whose subject matches
   ``round N: ...`` (the driver's round-artifact commit) — everything
   after it is "this round's changes".
2. ``git diff boundary..HEAD`` → changed (file, new-line-range) hunks
   for the package + ``__spark_entry__.py``.
3. Parse each changed module's CURRENT source with ``ast``; a
   top-level ``def``/``class``/assignment whose span intersects a
   changed range is a *changed symbol*.
4. A registry query is front-listed when
   (a) its own function is a changed symbol,
   (b) its function's source text references a changed symbol by name
       (computed to a FIXPOINT over all package modules, so a helper
       chain like ``_long_sum_ok`` → ``_rev_plan`` → ``q_tpch_q7``
       propagates, not just one hop), or
   (c) its oracle SQL object IS the value of a changed top-level
       assignment (catches oracle-only edits).

Over-matching is safe (the driver just verifies more of the changed
surface); under-matching is the failure mode this replaces.  Output is
written to ``front_list_generated.py`` at the repo root, which
``__spark_entry__`` imports (with a pinned-first override list for
rows the round notes call out explicitly).

Usage: python scripts/gen_front_list.py [boundary_rev]
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round_boundary() -> str:
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "-n", "200"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+:", subject):
            return sha
    return out.splitlines()[-1].split()[0]        # fall back: repo root


def changed_ranges(boundary: str) -> dict[str, list[tuple[int, int]]]:
    """{repo-relative path: [(new_start, new_end), ...]} from the diff."""
    out = subprocess.run(
        ["git", "diff", "--unified=0", boundary, "HEAD", "--",
         "dataframe_pipeline_spark", "__spark_entry__.py"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    ranges: dict[str, list[tuple[int, int]]] = {}
    path = None
    for line in out.splitlines():
        if line.startswith("+++ b/"):
            path = line[6:]
        elif line.startswith("@@") and path and path.endswith(".py"):
            m = re.search(r"\+(\d+)(?:,(\d+))?", line)
            start = int(m.group(1))
            n = int(m.group(2)) if m.group(2) is not None else 1
            # a pure deletion (n == 0) still marks the neighborhood
            ranges.setdefault(path, []).append((start, start + max(n, 1) - 1))
    return ranges


def changed_symbols(ranges: dict[str, list[tuple[int, int]]]) -> set[str]:
    syms: set[str] = set()
    for path, spans in ranges.items():
        full = os.path.join(REPO, path)
        if not os.path.exists(full):
            continue
        tree = ast.parse(open(full).read())
        for node in tree.body:
            lo, hi = node.lineno, node.end_lineno
            if not any(s <= hi and e >= lo for s, e in spans):
                continue
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                syms.add(node.name)
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        syms.add(t.id)
            elif isinstance(node, ast.AnnAssign) and \
                    isinstance(node.target, ast.Name):
                syms.add(node.target.id)
    return syms


def close_over_references(syms: set[str]) -> set[str]:
    """Expand the changed-symbol set to a fixpoint: any top-level
    symbol in the package whose source references a changed symbol is
    itself changed (its behavior may have changed transitively).
    Over-matching is safe; convergence is bounded by the symbol
    count."""
    word = re.compile(r"\w+")
    table: dict[str, set[str]] = {}          # symbol -> referenced names
    pkg = os.path.join(REPO, "dataframe_pipeline_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            full = os.path.join(root, f)
            src = open(full).read()
            try:
                tree = ast.parse(src)
            except SyntaxError:
                continue
            lines = src.splitlines()
            for node in tree.body:
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                     ast.ClassDef)):
                    body = "\n".join(
                        lines[node.lineno - 1:node.end_lineno])
                    refs = set(word.findall(body)) - {node.name}
                    table.setdefault(node.name, set()).update(refs)
    out = set(syms)
    while True:
        added = {name for name, refs in table.items()
                 if name not in out and refs & out}
        if not added:
            return out
        out |= added


def main():
    import inspect

    import __spark_entry__ as entry

    boundary = sys.argv[1] if len(sys.argv) > 1 else round_boundary()
    ranges = changed_ranges(boundary)
    syms = close_over_references(changed_symbols(ranges))
    word = re.compile(r"\w+")

    changed: set[str] = set()
    for name, (fn, sql) in entry._MERGED.items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            changed.add(name)                      # can't prove unchanged
            continue
        if fn.__name__ in syms:
            changed.add(name)
            continue
        if syms.intersection(word.findall(src)):
            changed.add(name)
            continue
        if isinstance(sql, str):
            mod = sys.modules.get(fn.__module__)
            for s in syms:
                if getattr(mod, s, None) is sql:
                    changed.add(name)
                    break
        elif callable(sql):
            try:
                ssrc = inspect.getsource(sql)
            except OSError:
                ssrc = ""
            if sql.__name__ in syms or syms.intersection(word.findall(ssrc)):
                changed.add(name)

    ordered = sorted(changed)
    out_path = os.path.join(REPO, "front_list_generated.py")
    with open(out_path, "w") as fh:
        fh.write(
            '"""AUTO-GENERATED by scripts/gen_front_list.py — do not edit.\n'
            f"Queries whose code/oracle changed since {boundary[:12]}\n"
            '(this round\'s boundary commit), enumerated FIRST so the\n'
            "driver's correctness sampler verifies the changed surface.\n"
            '"""\n\n'
            f"BOUNDARY = {boundary!r}\n"
            f"CHANGED_QUERIES = {ordered!r}\n")
    print(f"boundary {boundary[:12]}: {len(ranges)} files, "
          f"{len(syms)} changed symbols, {len(ordered)} changed queries")
    for n in ordered:
        print(" ", n)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
