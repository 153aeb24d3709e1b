"""Guard: no oracle may emit a driver-unstable output type.

The driver's correctness gate hashes rows after Arrow export, where a
DuckDB HUGEINT (int128 from SUM over window/CASE arithmetic) renders as
decimal128 while Spark emits BIGINT — a guaranteed hash mismatch even
when every value is identical (the r02 red rows).  DESCRIBE binds every
oracle without executing it, so this sweep is cheap and total.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_oracle_columns(con):
    import __spark_entry__ as entry

    bad = []
    for name, sql in entry.oracle_sql().items():
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        huge = [
            (c, t)
            for c, t, *_ in desc
            if "HUGEINT" in t.upper() or "INT128" in t.upper()
        ]
        if huge:
            bad.append((name, huge))
    assert not bad, f"driver-unstable oracle output types: {bad}"


def test_gate_window_is_50_and_registered():
    from sparkcollector.queries import GATE_WINDOW, REGISTRY

    assert len(GATE_WINDOW) == 50
    assert len(set(GATE_WINDOW)) == 50
    missing = [n for n in GATE_WINDOW if n not in REGISTRY]
    assert not missing
    # gate entries must all have a real oracle (not rows-only) so the
    # driver's 50-row window is a full value-hash check
    rows_only = [n for n in GATE_WINDOW if REGISTRY[n][1] is None]
    assert not rows_only, f"gate window has rows-only entries: {rows_only}"
