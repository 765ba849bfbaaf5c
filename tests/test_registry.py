"""Registry hygiene gate (VERDICT r5 #8): the three invariants the
judge otherwise has to verify by hand each round.

(a) every declared query has a DuckDB oracle (value-parity, not
    rows-only) — a queries() entry without an oracle_sql() twin is a
    silent downgrade of the correctness gate;
(b) the driver-sampler priority list (_NEVER_CHECKED_FIRST) only names
    real registry queries — a typo there silently wastes the sampler's
    budget;
(c) the committed PLANLINT.json covers exactly the current registry
    with zero violations — a new query that never went through the
    plan linter could hide a cartesian/row-Python regression.
"""

import json
import os

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"queries without oracle SQL: {missing}"
    extra = sorted(set(oracles) - set(qs))
    assert not extra, f"oracles without a query: {extra}"
    empty = sorted(n for n, s in oracles.items()
                   if not (isinstance(s, str) and s.strip()))
    assert not empty, f"empty oracle SQL: {empty}"


def test_sampler_priority_names_exist():
    qs = entrymod.queries()
    ghost = sorted(set(entrymod._NEVER_CHECKED_FIRST) - set(qs))
    assert not ghost, f"_NEVER_CHECKED_FIRST names not in registry: {ghost}"
    # priority entries must come FIRST in enumeration order, or the
    # sampler cap defeats the rotation
    order = list(qs)
    k = len(entrymod._NEVER_CHECKED_FIRST)
    assert set(order[:k]) == set(entrymod._NEVER_CHECKED_FIRST)


def test_planlint_covers_exactly_the_registry():
    with open(os.path.join(REPO, "PLANLINT.json")) as f:
        lint = json.load(f)
    assert lint["violations"] == [], lint["violations"]
    qs = set(entrymod.queries())
    linted = set(lint["per_query"])
    unlinted = sorted(qs - linted)
    assert not unlinted, (
        f"queries never plan-linted (run scripts/plan_lint.py): {unlinted}")
    stale = sorted(linted - qs)
    assert not stale, f"PLANLINT entries for removed queries: {stale}"
