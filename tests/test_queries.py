"""Driver-contract smoke: every registry query runs at sf0.001 and the
oracle keys line up.  (Full value-equality vs DuckDB is exercised by
scripts/check_correctness.py at sf0.01 and by the driver.)"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_contract_shapes():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 15
    assert set(oracles) <= set(qs)
    for sql in oracles.values():
        assert isinstance(sql, str) and "select" in sql.lower()


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_executes(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
