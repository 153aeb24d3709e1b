"""Filter semantics from the reference, compiled to Column predicates.

Reimplements (from observed behavior, not code translation):

* ``BasicStringFilter`` — a list of items, each a literal, a
  ``/regex/`` literal, or a glob (``*?[]``), optionally ``!``-negated;
  the set matches when any positive matcher hits and semantics of
  negation follow the overridable variant below.
  (reference: internal/signalfx-agent/pkg/utils/filter/filter.go:41-107,
  syntax detection matching.go:12-37)
* ``OverridableStringFilter`` — gitignore-style: a value matches if a
  positive pattern matches AND no negated pattern matches; a negated
  literal match wins outright.
  (reference: internal/signalfx-agent/pkg/utils/filter/overridable.go:29-56)
* ``StringMapFilter`` — ALL key/value specs must match; a ``key?``
  suffix makes a missing key acceptable.
  (reference: utils/filter/filter.go:112-179)
* dpfilter ``FilterSet`` — datapoint dropped if ANY exclude filter
  matches (internal/signalfx-agent/pkg/core/dpfilters/set.go:10-36).

Everything compiles to pure Catalyst expressions (``isin`` for literal
sets, ``rlike`` for regex/glob unions) so the predicates push down and
stay in whole-stage codegen — no Python in the filter path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _is_regex(item: str) -> bool:
    return len(item) > 1 and item.startswith("/") and item.endswith("/")


def _is_glob(item: str) -> bool:
    return any(c in item for c in "*?[]{}!")


def _glob_to_regex(glob: str) -> str:
    """Translate the agent's glob dialect to an anchored Java regex."""
    out = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = glob.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                out.append(glob[i : j + 1])
                i = j
        elif c == "{":
            j = glob.find("}", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                alts = glob[i + 1 : j].split(",")
                out.append("(" + "|".join(re.escape(a) for a in alts) + ")")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _split_negation(items: list[str]) -> tuple[list[str], list[str]]:
    pos, neg = [], []
    for it in items:
        if it.startswith("!"):
            neg.append(it[1:])
        else:
            pos.append(it)
    return pos, neg


def _match_column(col: Column, items: list[str]) -> Column:
    """OR of matchers for a plain (non-negated) item list.

    Literals collapse into one ``isin``; regex/glob items union into
    ``rlike`` alternation — a single JVM regex evaluation per row.
    """
    literals = [i for i in items if not _is_regex(i) and not _is_glob(i)]
    regexes = [i[1:-1] for i in items if _is_regex(i)]
    regexes += [_glob_to_regex(i) for i in items if _is_glob(i) and not _is_regex(i)]
    parts: list[Column] = []
    if literals:
        parts.append(col.isin(literals))
    if regexes:
        alternation = "|".join(f"(?:{r})" for r in regexes)
        parts.append(col.rlike(alternation))
    if not parts:
        return F.lit(False)
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def basic_string_filter(col: Column, items: list[str]) -> Column:
    """True where the value matches the filter (any positive matcher
    hits and no negated matcher hits)."""
    pos, neg = _split_negation(items)
    matched = _match_column(col, pos)
    if neg:
        matched = matched & ~_match_column(col, neg)
    return matched


def overridable_string_filter(col: Column, items: list[str]) -> Column:
    """Gitignore-style: negated patterns override positive matches;
    matches `overridable.go:29-56` observed semantics."""
    return basic_string_filter(col, items)


def string_map_filter(spec: dict[str, list[str] | str]) -> Column:
    """ALL key specs must match; ``key?`` tolerates a missing key.

    ``spec`` maps a column name (optionally suffixed ``?``) to an item
    list (or single item) in BasicStringFilter syntax.  A missing
    (NULL) column fails a required key and passes an optional one
    (filter.go:120-131, 157).
    """
    conds: list[Column] = []
    for key, items in spec.items():
        ok_missing = key.endswith("?")
        name = key[:-1] if ok_missing else key
        items_list = [items] if isinstance(items, str) else list(items)
        col = F.col(name)
        m = basic_string_filter(col, items_list)
        if ok_missing:
            conds.append(F.when(col.isNull(), F.lit(True)).otherwise(m))
        else:
            conds.append(col.isNotNull() & m)
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def exclude_filter_set(filters: list[Column]) -> Column:
    """dpfilters.FilterSet: keep a row only if NO exclude filter
    matches (set.go:10-36)."""
    dropped = F.lit(False)
    for f in filters:
        dropped = dropped | f
    return ~dropped
